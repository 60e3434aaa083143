"""Stereo 3-D (u,v,u_r) BA/pose-opt edges (reference src/Optimizer.cc:1579,
1738: stereo observations optimize a 3-row residual at chi2 7.815)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ygz_tpu.backend.optim import (pose_optimization, local_bundle_adjustment,
                                   CHI2_STEREO)
from ygz_tpu.geometry import lie


INTR = (400.0, 400.0, 320.0, 240.0)
BF = 80.0  # baseline * fx (0.2 m * 400)


def _make_points(n, rng):
    return np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                     rng.uniform(4, 9, n)], 1).astype(np.float32)


def _project(X, R, t):
    fx, fy, cx, cy = INTR
    Xc = X @ R.T + t
    z = Xc[:, 2]
    u = fx * Xc[:, 0] / z + cx
    v = fy * Xc[:, 1] / z + cy
    ur = u - BF / z
    return np.stack([u, v], -1).astype(np.float32), ur.astype(np.float32)


def test_mono_path_unchanged_with_sentinel_ur():
    """ur=None and ur=-1 give identical results (mono rows are exactly the
    2-D residual)."""
    rng = np.random.default_rng(0)
    N = 128
    X = _make_points(N, rng)
    R_true = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.03, 0.01])))
    t_true = np.array([0.1, -0.05, 0.2], np.float32)
    uv, _ = _project(X, R_true, t_true)
    uv += rng.normal(0, 0.3, uv.shape).astype(np.float32)
    is2 = np.ones(N, np.float32)
    val = np.ones(N, bool)
    a = pose_optimization(jnp.asarray(X), jnp.asarray(uv), jnp.asarray(is2),
                          jnp.asarray(val), jnp.eye(3), jnp.zeros(3), INTR)
    b = pose_optimization(jnp.asarray(X), jnp.asarray(uv), jnp.asarray(is2),
                          jnp.asarray(val), jnp.eye(3), jnp.zeros(3), INTR,
                          ur=jnp.full(N, -1.0), bf=BF)
    np.testing.assert_allclose(np.asarray(a.R), np.asarray(b.R), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), atol=1e-6)
    assert int(a.n_inliers) == int(b.n_inliers)


def test_stereo_edges_recover_z_translation():
    """With a fronto-parallel-ish cloud, pure-z translation is weakly
    observable from mono 2-D edges but strongly from stereo u_r rows: the
    stereo pose opt must converge to the true z from a biased init."""
    rng = np.random.default_rng(1)
    N = 256
    X = _make_points(N, rng)
    R_true = np.eye(3, dtype=np.float32)
    t_true = np.array([0.0, 0.0, 0.4], np.float32)
    uv, ur = _project(X, R_true, t_true)
    uv += rng.normal(0, 0.2, uv.shape).astype(np.float32)
    ur += rng.normal(0, 0.2, ur.shape).astype(np.float32)
    is2 = np.ones(N, np.float32)
    val = np.ones(N, bool)
    res = pose_optimization(jnp.asarray(X), jnp.asarray(uv),
                            jnp.asarray(is2), jnp.asarray(val),
                            jnp.eye(3), jnp.zeros(3), INTR,
                            ur=jnp.asarray(ur), bf=BF)
    t_est = np.asarray(res.t)
    assert abs(t_est[2] - 0.4) < 0.01, t_est
    assert int(res.n_inliers) > 0.9 * N


def test_stereo_ba_rigidifies_scale():
    """Local BA with stereo edges must pin the metric scale: scale the
    initial points/translations by 1.2 and check BA pulls the structure back
    to metric (mono BA cannot — scale is gauge)."""
    rng = np.random.default_rng(2)
    L = 256
    X = _make_points(L, rng)
    P = 4
    kfR = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))
    kft = np.zeros((P, 3), np.float32)
    kft[:, 0] = -0.25 * np.arange(P)  # sideways baseline

    obs_p, obs_l, obs_uv, obs_ur = [], [], [], []
    for p in range(P):
        uv, ur = _project(X, kfR[p], kft[p])
        inb = (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) \
            & (uv[:, 1] < 480)
        idx = np.nonzero(inb)[0]
        obs_p.append(np.full(len(idx), p, np.int32))
        obs_l.append(idx.astype(np.int32))
        obs_uv.append(uv[idx])
        obs_ur.append(ur[idx])
    obs_p = np.concatenate(obs_p)
    obs_l = np.concatenate(obs_l)
    obs_uv = np.concatenate(obs_uv)
    obs_ur = np.concatenate(obs_ur)
    O = len(obs_p)

    scale = 1.2
    X0 = X * scale
    kft0 = kft * scale
    fixed = np.zeros(P, bool)
    fixed[0] = True  # pose gauge only; scale must come from the stereo rows

    res = local_bundle_adjustment(
        jnp.asarray(kfR), jnp.asarray(kft0), jnp.asarray(fixed),
        jnp.asarray(X0), jnp.ones(L, bool),
        jnp.asarray(obs_p), jnp.asarray(obs_l), jnp.asarray(obs_uv),
        jnp.ones(O, jnp.float32), jnp.ones(O, bool),
        INTR, n_poses=P, n_points=L, phases=(10, 10),
        obs_ur=jnp.asarray(obs_ur), bf=BF)
    t_est = np.asarray(res.kf_t)
    # baseline between KF0 and KF3 must return to metric 0.75
    base = np.linalg.norm(t_est[3] - t_est[0])
    assert abs(base - 0.75) < 0.01, base
    z_med = np.median(np.asarray(res.points)[:, 2])
    assert abs(z_med / np.median(X[:, 2]) - 1.0) < 0.02


@pytest.mark.slow
def test_stereo_e2e_has_stereo_edges_and_metric_ate():
    """Stereo tracking populates u_r observations and the map stays metric
    (6-DoF ATE without scale alignment)."""
    from ygz_tpu.geometry import camera as cam_mod
    from ygz_tpu.system import System, Sensor
    from ygz_tpu.eval.ate import ate_rmse
    from synthetic import SmoothScene
    from test_vo_e2e import make_trajectory
    from test_stereo import render_pair, BASELINE

    scene = SmoothScene(seed=22)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                              scene.w, scene.h, bf=scene.f * BASELINE)
    poses = make_trajectory(30)
    sys = System(cam, Sensor.STEREO)
    for i, (R, t) in enumerate(poses):
        imgL, imgR = render_pair(scene, R, t)
        sys.track_stereo(imgL, imgR, timestamp=i * 0.05)

    smap = sys.map
    # stereo observations actually present on bound features
    bound = smap.kf_feat_pt[: smap.n_kf] >= 0
    n_stereo_obs = int(((smap.kf_feat_ur[: smap.n_kf] >= 0) & bound).sum())
    assert n_stereo_obs > 200, n_stereo_obs
    # and they reach the BA problem
    kfs = [k for k in range(smap.n_kf) if smap.kf_valid[k]]
    pt_ids = smap.points_in_kfs(kfs)
    _, _, _, _, o_ur = smap.observations(kfs, pt_ids)
    assert (o_ur >= 0).sum() > 200

    est, gt = [], []
    for rec, (R, t) in zip(sys.trajectory, poses):
        if rec.state != "OK":
            continue
        est.append(-rec.R.T @ rec.t)
        gt.append(-R.T @ t)
    rmse, _ = ate_rmse(np.array(est), np.array(gt), with_scale=False)
    assert rmse < 0.03, f"metric ATE RMSE {rmse:.4f}"
