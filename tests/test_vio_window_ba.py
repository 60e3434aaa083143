"""VI window BA: NavState chain + landmarks on synthetic data."""
import numpy as np
import jax.numpy as jnp

from ygz_tpu.geometry import lie
from ygz_tpu.imu.preintegration import preintegrate
from ygz_tpu.backend.vio_optim import vio_window_ba

G_W = np.array([0.0, 0.0, -9.81], np.float32)
INTR = (400.0, 400.0, 320.0, 240.0)


def test_vio_window_ba_recovers_chain():
    rng = np.random.default_rng(0)
    dt_s = 0.005
    n_s = 40  # samples per link (0.2 s)
    W = 5

    # ground-truth chain with constant world acceleration + body rate
    a_w = np.array([0.3, -0.1, 0.05], np.float32)
    w_b = np.array([0.05, 0.1, -0.08], np.float32)
    P = [np.zeros(3, np.float32)]
    V = [np.array([0.4, 0.1, 0.0], np.float32)]
    R = [np.eye(3, dtype=np.float32)]
    pre_fields = [[] for _ in range(10)]
    for k in range(W - 1):
        p, v, r = P[-1].copy(), V[-1].copy(), R[-1].copy()
        om, ac = [], []
        for _ in range(n_s):
            om.append(w_b)
            ac.append(r.T @ (a_w - G_W))
            p = p + v * dt_s + 0.5 * a_w * dt_s ** 2
            v = v + a_w * dt_s
            r = r @ np.asarray(lie.so3_exp(jnp.asarray(w_b * dt_s)))
        P.append(p)
        V.append(v)
        R.append(r)
        cap = 64
        omp = np.zeros((cap, 3), np.float32)
        acp = np.zeros((cap, 3), np.float32)
        dts = np.zeros(cap, np.float32)
        val = np.zeros(cap, bool)
        omp[:n_s] = om
        acp[:n_s] = ac
        dts[:n_s] = dt_s
        val[:n_s] = True
        pre = preintegrate(jnp.asarray(omp), jnp.asarray(acp),
                           jnp.asarray(dts), jnp.asarray(val),
                           jnp.zeros(3), jnp.zeros(3))
        for i, f in enumerate([pre.dP, pre.dV, pre.dR, pre.J_P_bg, pre.J_P_ba,
                               pre.J_V_bg, pre.J_V_ba, pre.J_R_bg, pre.cov,
                               pre.dt]):
            pre_fields[i].append(np.asarray(f))
    pre_fields = tuple(jnp.asarray(np.stack(f)) for f in pre_fields)

    # landmarks + observations (body == camera)
    L = 200
    X = np.stack([rng.uniform(-2, 2, L), rng.uniform(-1.5, 1.5, L),
                  rng.uniform(4, 9, L)], 1).astype(np.float32)
    obs_k, obs_l, obs_uv = [], [], []
    for k in range(W):
        Xb = (X - P[k]) @ R[k]
        uv = np.stack([INTR[0] * Xb[:, 0] / Xb[:, 2] + INTR[2],
                       INTR[1] * Xb[:, 1] / Xb[:, 2] + INTR[3]], 1)
        uv += rng.standard_normal(uv.shape) * 0.3
        inb = (uv > 10).all(1) & (uv < [630, 470]).all(1)
        for l in np.nonzero(inb)[0]:
            obs_k.append(k)
            obs_l.append(l)
            obs_uv.append(uv[l])
    O = 1024
    n_o = len(obs_k)
    assert n_o <= O
    pad = O - n_o
    obs_k = np.array(obs_k + [0] * pad, np.int32)
    obs_l = np.array(obs_l + [0] * pad, np.int32)
    obs_uv = np.array(obs_uv + [[0, 0]] * pad, np.float32)
    obs_w = np.array([1.0] * n_o + [0.0] * pad, np.float32)

    # perturb states 1..W-1 and landmarks
    Pp = np.stack(P).copy()
    Vp = np.stack(V).copy()
    Rp = np.stack(R).copy()
    for k in range(1, W):
        Pp[k] += rng.standard_normal(3).astype(np.float32) * 0.03
        Vp[k] += rng.standard_normal(3).astype(np.float32) * 0.05
        Rp[k] = Rp[k] @ np.asarray(lie.so3_exp(jnp.asarray(
            rng.standard_normal(3).astype(np.float32) * 0.01)))
    Xp = X + rng.standard_normal(X.shape).astype(np.float32) * 0.25
    fixed = np.array([True] + [False] * (W - 1))

    res = vio_window_ba(
        jnp.asarray(Pp), jnp.asarray(Vp), jnp.asarray(Rp),
        jnp.zeros((W, 3)), jnp.zeros((W, 3)), jnp.asarray(fixed),
        pre_fields, jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(Xp), jnp.ones(L, bool),
        jnp.asarray(obs_k), jnp.asarray(obs_l), jnp.asarray(obs_uv),
        jnp.asarray(obs_w),
        jnp.eye(3), jnp.zeros(3), INTR, jnp.asarray(G_W),
        n_win=W, n_points=L, iters=10)

    for k in range(1, W):
        perr = np.linalg.norm(np.asarray(res.P[k]) - P[k])
        verr = np.linalg.norm(np.asarray(res.V[k]) - V[k])
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(np.asarray(res.R[k]) @ R[k].T) - 1) / 2, -1, 1)))
        assert perr < 5e-3, (k, perr)
        assert verr < 5e-2, (k, verr)
        assert ang < 0.1, (k, ang)
    # depth noise floor at these baselines is ~0.08; perturbation is 0.25+
    err0 = np.linalg.norm(Xp - X, axis=1).mean()
    err1 = np.linalg.norm(np.asarray(res.points) - X, axis=1).mean()
    assert err1 < 0.5 * err0, (err0, err1)
