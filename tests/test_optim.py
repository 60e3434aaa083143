"""Tests for pose-only GN and Schur-complement local BA (stage 4 numerics)."""
import jax
import jax.numpy as jnp
import numpy as np

from ygz_tpu.backend import optim
from ygz_tpu.geometry import lie

INTR = (400.0, 400.0, 320.0, 240.0)


def make_points(rng, n):
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                  rng.uniform(4, 9, n)], axis=1)
    return X.astype(np.float32)


def project_np(R, t, X):
    Xc = X @ R.T + t
    u = INTR[0] * Xc[:, 0] / Xc[:, 2] + INTR[2]
    v = INTR[1] * Xc[:, 1] / Xc[:, 2] + INTR[3]
    return np.stack([u, v], axis=1).astype(np.float32)


class TestPoseOptimization:
    def test_recovers_pose_with_outliers(self):
        rng = np.random.default_rng(0)
        X = make_points(rng, 200)
        w_true = np.array([0.04, -0.03, 0.02], np.float32)
        R_true = np.asarray(lie.so3_exp(jnp.asarray(w_true)))
        t_true = np.array([0.2, -0.1, 0.05], np.float32)
        uv = project_np(R_true, t_true, X)
        uv += rng.standard_normal(uv.shape).astype(np.float32) * 0.5
        # 15% outliers
        n_out = 30
        uv[:n_out] += rng.uniform(20, 60, (n_out, 2)).astype(np.float32)

        # perturbed init
        R0, t0 = lie.se3_exp(jnp.asarray(
            np.concatenate([t_true + 0.05, w_true + 0.02]).astype(np.float32)))
        res = optim.pose_optimization(
            jnp.asarray(X), jnp.asarray(uv), jnp.ones(200) * (1 / 0.25),
            jnp.ones(200, bool), R0, t0, INTR)
        R_est, t_est = np.asarray(res.R), np.asarray(res.t)
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(R_est @ R_true.T) - 1) / 2, -1, 1)))
        assert ang < 0.05, f"rot err {ang}"
        assert np.linalg.norm(t_est - t_true) < 5e-3
        inl = np.asarray(res.inliers)
        assert not inl[:n_out].any()
        # chi2 gate at 5.991 keeps ~95% of true-noise 2-DoF observations
        assert inl[n_out:].mean() > 0.9

    def test_perfect_data_zero_residual(self):
        rng = np.random.default_rng(1)
        X = make_points(rng, 100)
        R_true = np.eye(3, dtype=np.float32)
        t_true = np.zeros(3, np.float32)
        uv = project_np(R_true, t_true, X)
        R0, t0 = lie.se3_exp(jnp.asarray(
            np.array([0.03, -0.02, 0.01, 0.005, 0.01, -0.005], np.float32)))
        res = optim.pose_optimization(
            jnp.asarray(X), jnp.asarray(uv), jnp.ones(100), jnp.ones(100, bool),
            R0, t0, INTR)
        assert float(jnp.max(res.chi2)) < 1e-4
        assert int(res.n_inliers) == 100


class TestLocalBA:
    def _scene(self, seed=2, P=5, L=120, noise=0.3):
        rng = np.random.default_rng(seed)
        X = make_points(rng, L)
        poses = []
        for p in range(P):
            w = rng.standard_normal(3).astype(np.float32) * 0.02
            t = np.array([0.3 * p, 0.02 * p, 0.0], np.float32)
            poses.append((np.asarray(lie.so3_exp(jnp.asarray(w))), t))
        obs_p, obs_l, obs_uv = [], [], []
        for p, (R, t) in enumerate(poses):
            uv = project_np(R, t, X)
            uv_n = uv + rng.standard_normal(uv.shape).astype(np.float32) * noise
            inb = ((uv_n > 10).all(1) & (uv_n < [630, 470]).all(1))
            for l in np.nonzero(inb)[0]:
                obs_p.append(p)
                obs_l.append(l)
                obs_uv.append(uv_n[l])
        O = len(obs_p)
        # pad observation table to fixed capacity
        cap = 1024
        pad = cap - O
        obs_p = np.array(obs_p + [0] * pad, np.int32)
        obs_l = np.array(obs_l + [0] * pad, np.int32)
        obs_uv = np.array(obs_uv + [[0, 0]] * pad, np.float32)
        obs_valid = np.array([True] * O + [False] * pad)
        return poses, X, obs_p, obs_l, obs_uv, obs_valid, rng

    def test_ba_reduces_error_and_recovers_poses(self):
        poses, X, obs_p, obs_l, obs_uv, obs_valid, rng = self._scene()
        P, L = len(poses), X.shape[0]
        # perturb poses (except 2 fixed anchors) and points
        kf_R, kf_t = [], []
        for p, (R, t) in enumerate(poses):
            if p < 2:
                kf_R.append(R)
                kf_t.append(t)
            else:
                dw = rng.standard_normal(3).astype(np.float32) * 0.01
                dt = rng.standard_normal(3).astype(np.float32) * 0.03
                kf_R.append(np.asarray(lie.so3_exp(jnp.asarray(dw))) @ R)
                kf_t.append(t + dt)
        Xp = X + rng.standard_normal(X.shape).astype(np.float32) * 0.05
        fixed = np.array([True, True] + [False] * (P - 2))

        res = optim.local_bundle_adjustment(
            jnp.asarray(np.stack(kf_R)), jnp.asarray(np.stack(kf_t)),
            jnp.asarray(fixed), jnp.asarray(Xp), jnp.ones(L, bool),
            jnp.asarray(obs_p), jnp.asarray(obs_l), jnp.asarray(obs_uv),
            jnp.ones(obs_p.shape[0]), jnp.asarray(obs_valid),
            INTR, n_poses=P, n_points=L)

        for p in range(2, P):
            R_true, t_true = poses[p]
            R_est = np.asarray(res.kf_R[p])
            t_est = np.asarray(res.kf_t[p])
            ang = np.degrees(np.arccos(np.clip(
                (np.trace(R_est @ R_true.T) - 1) / 2, -1, 1)))
            assert ang < 0.1, f"pose {p} rot err {ang} deg"
            assert np.linalg.norm(t_est - t_true) < 0.01, \
                f"pose {p} trans err {np.linalg.norm(t_est - t_true)}"
        # points pulled back toward truth
        err0 = np.linalg.norm(Xp - X, axis=1).mean()
        err1 = np.linalg.norm(np.asarray(res.points) - X, axis=1).mean()
        # noise floor: ~0.02-0.03 depth uncertainty at 0.3 px obs noise
        assert err1 < 0.04 and err1 < 0.6 * err0, (err0, err1)
        # anchors untouched
        np.testing.assert_allclose(np.asarray(res.kf_t[0]), poses[0][1])

    def test_ba_flags_outlier_observations(self):
        poses, X, obs_p, obs_l, obs_uv, obs_valid, rng = self._scene(seed=3)
        P, L = len(poses), X.shape[0]
        n_bad = 40
        bad_idx = rng.choice(np.nonzero(obs_valid)[0], n_bad, replace=False)
        obs_uv[bad_idx] += rng.uniform(15, 40, (n_bad, 2)).astype(np.float32)
        fixed = np.array([True, True] + [False] * (P - 2))
        res = optim.local_bundle_adjustment(
            jnp.asarray(np.stack([p[0] for p in poses])),
            jnp.asarray(np.stack([p[1] for p in poses])),
            jnp.asarray(fixed), jnp.asarray(X), jnp.ones(L, bool),
            jnp.asarray(obs_p), jnp.asarray(obs_l), jnp.asarray(obs_uv),
            jnp.ones(obs_p.shape[0]), jnp.asarray(obs_valid),
            INTR, n_poses=P, n_points=L)
        inl = np.asarray(res.obs_inlier)
        assert not inl[bad_idx].any()
        good_idx = np.setdiff1d(np.nonzero(obs_valid)[0], bad_idx)
        assert inl[good_idx].mean() > 0.9


def test_robust_cost_library():
    """Weight functions / scale estimators vs closed forms (reference
    include/RobustCost.h:11-151; production call sites use Huber)."""
    import numpy as np
    import jax.numpy as jnp
    from ygz_tpu.backend import optim

    chi2 = jnp.asarray(np.array([0.0, 1.0, 4.0, 25.0, 1e4], np.float32))
    # huber: 1 inside delta2, sqrt(delta2/chi2) outside
    w = np.asarray(optim.robust_weight(chi2, "huber", 4.0))
    np.testing.assert_allclose(w, [1, 1, 1, np.sqrt(4 / 25), np.sqrt(4e-4)],
                               rtol=1e-5)
    # tukey: zero beyond b^2 (hard outlier rejection)
    w = np.asarray(optim.robust_weight(chi2, "tukey", 16.0))
    assert w[0] == 1.0 and w[3] == 0.0 and w[4] == 0.0
    np.testing.assert_allclose(w[2], (1 - 4 / 16.0) ** 2, rtol=1e-6)
    # t-dist: (dof+1)/(dof+chi2), monotone decreasing
    w = np.asarray(optim.robust_weight(chi2, "tdist"))
    np.testing.assert_allclose(w, 6.0 / (5.0 + np.asarray(chi2)), rtol=1e-6)
    # unit
    np.testing.assert_array_equal(
        np.asarray(optim.robust_weight(chi2, "unit")), np.ones(5))

    rng = np.random.default_rng(0)
    res = rng.normal(0, 2.0, 4096).astype(np.float32)
    valid = np.ones(4096, bool)
    # MAD on a gaussian estimates sigma
    s = float(optim.mad_scale(jnp.asarray(res), jnp.asarray(valid)))
    assert abs(s - 2.0) < 0.15, s
    # ...robust to 10% gross outliers
    res_o = res.copy()
    res_o[:400] = 100.0
    s = float(optim.mad_scale(jnp.asarray(res_o), jnp.asarray(valid)))
    assert abs(s - 2.0) < 0.35, s  # MAD is biased up ~15% at 10% gross
    # normal scale = std
    s = float(optim.normal_scale(jnp.asarray(res), jnp.asarray(valid)))
    assert abs(s - 2.0) < 0.1, s
    # t-dist scale: on heavy-tailed data, between MAD and std
    s = float(optim.tdist_scale(jnp.asarray(res_o), jnp.asarray(valid)))
    assert 1.5 < s < 4.0, s
    # masked entries ignored
    valid2 = valid.copy()
    valid2[:400] = False
    s = float(optim.mad_scale(jnp.asarray(res_o), jnp.asarray(valid2)))
    assert abs(s - 2.0) < 0.3, s
