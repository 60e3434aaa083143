"""VI frame optimization: IMU factor + reprojection + prior, synthetic."""
import numpy as np
import jax.numpy as jnp

from ygz_tpu.geometry import lie
from ygz_tpu.imu.preintegration import preintegrate
from ygz_tpu.backend.vio_optim import vio_pose_optimization

G_W = np.array([0.0, 0.0, -9.81], np.float32)
INTR = (400.0, 400.0, 320.0, 240.0)


def test_vio_pose_optimization_fuses_imu_and_vision():
    rng = np.random.default_rng(0)
    dt_s = 0.005
    n_s = 50  # 0.25 s window

    # ground truth: body accelerates and rotates gently between two frames
    a_w = np.array([0.4, -0.2, 0.1], np.float32)       # world acceleration
    w_b = np.array([0.1, 0.2, -0.15], np.float32)      # body rate
    P0 = np.zeros(3, np.float32)
    V0 = np.array([0.3, 0.1, -0.05], np.float32)
    R0 = np.eye(3, dtype=np.float32)

    # integrate ground truth finely
    P, V, R = P0.copy(), V0.copy(), R0.copy()
    omegas, accs = [], []
    for _ in range(n_s):
        acc_body = R.T @ (a_w - G_W)
        omegas.append(w_b)
        accs.append(acc_body)
        P = P + V * dt_s + 0.5 * a_w * dt_s ** 2
        V = V + a_w * dt_s
        R = R @ np.asarray(lie.so3_exp(jnp.asarray(w_b * dt_s)))
    P1, V1, R1 = P, V, R

    cap = 64
    om = np.zeros((cap, 3), np.float32)
    ac = np.zeros((cap, 3), np.float32)
    dts = np.zeros(cap, np.float32)
    val = np.zeros(cap, bool)
    om[:n_s] = omegas
    ac[:n_s] = accs
    dts[:n_s] = dt_s
    val[:n_s] = True
    pre = preintegrate(jnp.asarray(om), jnp.asarray(ac), jnp.asarray(dts),
                       jnp.asarray(val), jnp.zeros(3), jnp.zeros(3))

    # vision: world points seen by the camera (body == camera here)
    N = 256
    X = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                  rng.uniform(4, 9, N)], 1).astype(np.float32)
    Rcb = np.eye(3, dtype=np.float32)
    tcb = np.zeros(3, np.float32)
    Xc = (X - P1) @ R1  # body frame = camera frame
    uv = np.stack([INTR[0] * Xc[:, 0] / Xc[:, 2] + INTR[2],
                   INTR[1] * Xc[:, 1] / Xc[:, 2] + INTR[3]], 1)
    uv += rng.standard_normal(uv.shape) * 0.3
    uv = uv.astype(np.float32)

    # init: perturbed propagation
    cur = (jnp.asarray(P1 + rng.standard_normal(3).astype(np.float32) * 0.05),
           jnp.asarray(V1 + rng.standard_normal(3).astype(np.float32) * 0.1),
           jnp.asarray(R1 @ np.asarray(lie.so3_exp(jnp.asarray(
               rng.standard_normal(3).astype(np.float32) * 0.02)))),
           jnp.zeros(3), jnp.zeros(3))
    prev = (jnp.asarray(P0), jnp.asarray(V0), jnp.asarray(R0),
            jnp.zeros(3), jnp.zeros(3))
    no_prior_mean = prev
    res = vio_pose_optimization(
        cur, prev, pre, (jnp.zeros(3), jnp.zeros(3)),
        no_prior_mean, jnp.eye(15), jnp.asarray(False),
        jnp.asarray(X), jnp.asarray(uv), jnp.ones(N), jnp.ones(N, bool),
        jnp.asarray(Rcb), jnp.asarray(tcb), INTR, jnp.asarray(G_W))

    assert int(res.n_inliers) > 0.9 * N
    np.testing.assert_allclose(np.asarray(res.P), P1, atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.V), V1, atol=5e-2)
    ang = np.degrees(np.arccos(np.clip(
        (np.trace(np.asarray(res.R) @ R1.T) - 1) / 2, -1, 1)))
    assert ang < 0.2, ang
    # posterior information should be PSD and strongly constrain position
    H = np.asarray(res.marg_info)
    ev = np.linalg.eigvalsh(0.5 * (H + H.T))
    assert ev.min() > -1e-3
    assert H[0, 0] > 100.0  # position is well-observed by vision


def test_vio_pose_imu_only_follows_propagation():
    """With no visual observations the optimizer should stay at the IMU
    propagation (the vision-weak fallback of the reference,
    src/Tracking.cc:684-698)."""
    dt_s = 0.005
    n_s = 40
    w_b = np.array([0.0, 0.0, 0.3], np.float32)
    P0 = np.zeros(3, np.float32)
    V0 = np.array([0.5, 0.0, 0.0], np.float32)
    R0 = np.eye(3, dtype=np.float32)
    P, V, R = P0.copy(), V0.copy(), R0.copy()
    omegas, accs = [], []
    for _ in range(n_s):
        acc_body = R.T @ (-G_W)
        omegas.append(w_b)
        accs.append(acc_body)
        P = P + V * dt_s
        R = R @ np.asarray(lie.so3_exp(jnp.asarray(w_b * dt_s)))
    P1, V1, R1 = P, V, R

    cap = 64
    om = np.zeros((cap, 3), np.float32)
    ac = np.zeros((cap, 3), np.float32)
    dts = np.zeros(cap, np.float32)
    val = np.zeros(cap, bool)
    om[:n_s] = omegas
    ac[:n_s] = accs
    dts[:n_s] = dt_s
    val[:n_s] = True
    pre = preintegrate(jnp.asarray(om), jnp.asarray(ac), jnp.asarray(dts),
                       jnp.asarray(val), jnp.zeros(3), jnp.zeros(3))

    N = 16
    cur = (jnp.asarray(P1), jnp.asarray(V1), jnp.asarray(R1),
           jnp.zeros(3), jnp.zeros(3))
    prev = (jnp.asarray(P0), jnp.asarray(V0), jnp.asarray(R0),
            jnp.zeros(3), jnp.zeros(3))
    res = vio_pose_optimization(
        cur, prev, pre, (jnp.zeros(3), jnp.zeros(3)),
        prev, jnp.eye(15), jnp.asarray(False),
        jnp.zeros((N, 3)), jnp.zeros((N, 2)), jnp.ones(N),
        jnp.zeros(N, bool),
        jnp.eye(3), jnp.zeros(3), INTR, jnp.asarray(G_W))
    np.testing.assert_allclose(np.asarray(res.P), P1, atol=2e-3)
    ang = np.degrees(np.arccos(np.clip(
        (np.trace(np.asarray(res.R) @ R1.T) - 1) / 2, -1, 1)))
    assert ang < 0.1


def test_pair_optimization_recovers_motion_and_marginalizes():
    """Two-NavState optimization (reference PoseOptimization(F, F, preint,
    gw, marg=true), Optimizer.cc:278-616): both states free, prior on the
    previous one, exact IMU factor, reprojection on both frames; the
    marginalized prior must be the Schur complement onto the current state."""
    import numpy as np
    import jax.numpy as jnp
    from ygz_tpu.backend.vio_optim import vio_pose_optimization_pair
    from ygz_tpu.imu.preintegration import PreintState
    from ygz_tpu.geometry.lie import so3_exp

    rng = np.random.default_rng(8)
    gw = np.array([0.0, 0.0, -9.81], np.float32)
    dt = 0.05
    intr = (400.0, 400.0, 320.0, 240.0)
    Rcb = np.eye(3, dtype=np.float32)
    tcb = np.zeros(3, np.float32)

    # true states (body frame == cam frame here)
    P0 = np.zeros(3, np.float32)
    V0 = np.array([0.4, 0.1, 0.0], np.float32)
    R0 = np.eye(3, dtype=np.float32)
    R1 = np.asarray(so3_exp(jnp.asarray(np.array([0.01, 0.03, -0.02],
                                                 np.float32))))
    P1 = P0 + V0 * dt + 0.5 * gw * dt * dt + np.array([0.002, 0, 0.001],
                                                      np.float32)
    V1 = V0 + gw * dt + np.array([0.04, 0.0, 0.02], np.float32)

    # exact preintegration for this motion (zero-noise factor)
    z33 = np.zeros((3, 3), np.float32)
    pre = PreintState(
        dP=jnp.asarray(R0.T @ (P1 - P0 - V0 * dt - 0.5 * gw * dt * dt)),
        dV=jnp.asarray(R0.T @ (V1 - V0 - gw * dt)),
        dR=jnp.asarray(R0.T @ R1),
        J_P_bg=jnp.asarray(z33), J_P_ba=jnp.asarray(z33),
        J_V_bg=jnp.asarray(z33), J_V_ba=jnp.asarray(z33),
        J_R_bg=jnp.asarray(z33),
        cov=jnp.asarray(np.eye(9, dtype=np.float32) * 1e-6),
        dt=jnp.asarray(np.float32(dt)))

    # landmarks + projections (pinhole; world frame)
    N = 96
    X = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                  rng.uniform(4, 8, N)], -1).astype(np.float32)

    def proj(P, R):
        Xc = (X - P) @ R
        return np.stack([intr[0] * Xc[:, 0] / Xc[:, 2] + intr[2],
                         intr[1] * Xc[:, 1] / Xc[:, 2] + intr[3]],
                        -1).astype(np.float32)

    uv0 = proj(P0, R0) + rng.normal(0, 0.2, (N, 2)).astype(np.float32)
    uv1 = proj(P1, R1) + rng.normal(0, 0.2, (N, 2)).astype(np.float32)
    ones = np.ones(N, np.float32)
    validv = np.ones(N, bool)

    bias = np.zeros(3, np.float32)
    prev = tuple(jnp.asarray(a) for a in (P0, V0, R0, bias, bias))
    # perturbed current init
    cur0 = (jnp.asarray(P1 + [0.05, -0.03, 0.04]),
            jnp.asarray(V1 + [0.3, -0.2, 0.1]),
            jnp.asarray(R1 @ np.asarray(so3_exp(jnp.asarray(
                np.array([0.02, -0.02, 0.01], np.float32))))),
            jnp.asarray(bias), jnp.asarray(bias))
    prior_info = jnp.asarray(np.eye(15, dtype=np.float32) * 1e4)

    res = vio_pose_optimization_pair(
        cur0, prev, pre, (jnp.asarray(bias), jnp.asarray(bias)),
        prev, prior_info, jnp.asarray(True),
        jnp.asarray(X), jnp.asarray(uv0), jnp.asarray(ones),
        jnp.asarray(validv),
        jnp.asarray(X), jnp.asarray(uv1), jnp.asarray(ones),
        jnp.asarray(validv),
        jnp.asarray(Rcb), jnp.asarray(tcb), intr, jnp.asarray(gw))

    P = np.asarray(res.P)
    V = np.asarray(res.V)
    R = np.asarray(res.R)
    assert int(res.n_inliers) > 80
    np.testing.assert_allclose(P, P1, atol=5e-3)
    np.testing.assert_allclose(V, V1, atol=5e-2)
    ang = np.degrees(np.arccos(np.clip((np.trace(R @ R1.T) - 1) / 2, -1, 1)))
    assert ang < 0.2, ang

    # marginalized prior: symmetric positive-semidefinite with strong
    # pose/velocity information (many reprojection edges + exact IMU)
    M = np.asarray(res.prior_info)
    np.testing.assert_allclose(M, M.T, atol=1e-2)
    ev = np.linalg.eigvalsh(M)
    assert ev.min() > -1e-2 * abs(ev.max()), ev.min()
    assert np.all(np.diag(M)[:3] > 1.0)   # position informed
    # prior mean is the optimized current state
    np.testing.assert_allclose(np.asarray(res.prior_mean[0]), P)
