"""Golden tests for the geometry core (SURVEY.md §7.2 stage 1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ygz_tpu.geometry import lie, camera, triangulation, twoview

jax.config.update("jax_enable_x64", False)


def rand_rotation(rng, scale=1.0):
    w = rng.standard_normal(3) * scale
    return np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))


class TestLie:
    def test_so3_exp_log_roundtrip(self):
        rng = np.random.default_rng(0)
        for scale in [1e-6, 0.1, 1.0]:
            w = rng.standard_normal(3).astype(np.float32) * scale
            R = lie.so3_exp(jnp.asarray(w))
            np.testing.assert_allclose(np.asarray(R) @ np.asarray(R).T,
                                       np.eye(3), atol=1e-4)
            w2 = lie.so3_log(R)
            np.testing.assert_allclose(np.asarray(w2), w, atol=1e-4)
        # |w| > pi: log returns the wrapped-equivalent axis-angle; exp must match
        w = np.array([-3.163554, -1.558186, 0.103315], np.float32)
        R = lie.so3_exp(jnp.asarray(w))
        R2 = lie.so3_exp(lie.so3_log(R))
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)

    def test_so3_log_near_pi(self):
        w = np.array([0.0, 0.0, np.pi - 1e-4], dtype=np.float32)
        R = lie.so3_exp(jnp.asarray(w))
        w2 = np.asarray(lie.so3_log(R))
        np.testing.assert_allclose(np.abs(w2[2]), np.pi - 1e-4, atol=1e-2)

    def test_se3_exp_log_roundtrip(self):
        rng = np.random.default_rng(1)
        xi = rng.standard_normal(6).astype(np.float32) * 0.5
        R, t = lie.se3_exp(jnp.asarray(xi))
        xi2 = lie.se3_log(R, t)
        np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-4)

    def test_se3_group_ops(self):
        rng = np.random.default_rng(2)
        xa = jnp.asarray(rng.standard_normal(6).astype(np.float32) * 0.3)
        xb = jnp.asarray(rng.standard_normal(6).astype(np.float32) * 0.3)
        Ra, ta = lie.se3_exp(xa)
        Rb, tb = lie.se3_exp(xb)
        Rc, tc = lie.se3_mul(Ra, ta, Rb, tb)
        X = jnp.asarray(rng.standard_normal((5, 3)).astype(np.float32))
        lhs = lie.se3_apply(Rc, tc, X)
        rhs = lie.se3_apply(Ra, ta, lie.se3_apply(Rb, tb, X))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)
        Ri, ti = lie.se3_inv(Ra, ta)
        back = lie.se3_apply(Ri, ti, lie.se3_apply(Ra, ta, X))
        np.testing.assert_allclose(np.asarray(back), np.asarray(X), atol=1e-5)

    def test_right_jacobian_numeric(self):
        # exp(w + dw) ≈ exp(w) exp(Jr(w) dw)
        rng = np.random.default_rng(3)
        w = jnp.asarray(rng.standard_normal(3).astype(np.float32) * 0.7)
        dw = jnp.asarray(rng.standard_normal(3).astype(np.float32) * 1e-3)
        lhs = lie.so3_exp(w + dw)
        Jr = lie.so3_right_jacobian(w)
        rhs = lie.so3_exp(w) @ lie.so3_exp(Jr @ dw)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)
        Jri = lie.so3_right_jacobian_inv(w)
        np.testing.assert_allclose(np.asarray(Jri @ Jr), np.eye(3), atol=1e-4)

    def test_quat_roundtrip(self):
        rng = np.random.default_rng(4)
        for _ in range(10):
            R = jnp.asarray(rand_rotation(rng, 2.0))
            q = lie.rotmat_to_quat(R)
            R2 = lie.quat_to_rotmat(q)
            np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


class TestCamera:
    def _cam(self):
        return camera.Camera.make(458.654, 457.296, 367.215, 248.375, 752, 480,
                                  dist=[-0.28340811, 0.07395907,
                                        0.00019359, 1.76187114e-05])

    def test_project_unproject_no_dist(self):
        cam = camera.Camera.make(400.0, 400.0, 320.0, 240.0, 640, 480)
        X = jnp.array([[0.3, -0.2, 2.0], [0.0, 0.0, 1.0]], jnp.float32)
        uv = camera.project(cam, X)
        X2 = camera.unproject(cam, uv, depth=X[:, 2])
        np.testing.assert_allclose(np.asarray(X2), np.asarray(X), atol=1e-4)

    def test_distort_undistort_roundtrip(self):
        cam = self._cam()
        rng = np.random.default_rng(5)
        xn = jnp.asarray(rng.uniform(-0.5, 0.5, (100, 2)).astype(np.float32))
        xd = camera.distort_normalized(cam, xn)
        xn2 = camera.undistort_normalized(cam, xd)
        np.testing.assert_allclose(np.asarray(xn2), np.asarray(xn), atol=1e-4)

    def test_undistort_points_identity_when_no_dist(self):
        cam = camera.Camera.make(400.0, 400.0, 320.0, 240.0, 640, 480)
        uv = jnp.array([[10.0, 20.0], [300.0, 400.0]], jnp.float32)
        uv2 = camera.undistort_points(cam, uv)
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-4)


class TestTriangulation:
    def test_triangulate_exact(self):
        rng = np.random.default_rng(6)
        K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], np.float32)
        X = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
        X[:, 2] = rng.uniform(4, 8, 64)
        R = rand_rotation(rng, 0.1)
        t = np.array([0.5, 0.05, 0.02], np.float32)
        P1 = K @ np.hstack([np.eye(3, dtype=np.float32),
                            np.zeros((3, 1), np.float32)])
        P2 = K @ np.hstack([R, t[:, None]])

        def proj(P, X):
            h = X @ P[:, :3].T + P[:, 3]
            return h[:, :2] / h[:, 2:3]

        uv1 = proj(P1, X)
        uv2 = proj(P2, X)
        Xt = triangulation.triangulate_dlt(jnp.asarray(P1), jnp.asarray(P2),
                                           jnp.asarray(uv1), jnp.asarray(uv2))
        np.testing.assert_allclose(np.asarray(Xt), X, atol=2e-2)
        good, _ = triangulation.triangulation_checks(
            jnp.eye(3), jnp.zeros(3), jnp.asarray(R), jnp.asarray(t),
            Xt, jnp.asarray(uv1), jnp.asarray(uv2),
            400.0, 400.0, 320.0, 240.0)
        assert np.asarray(good).mean() > 0.95


class TestTwoView:
    def _scene(self, planar, seed=7, n=256, noise=0.3):
        rng = np.random.default_rng(seed)
        K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], np.float32)
        if planar:
            X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                          np.full(n, 5.0)], axis=1).astype(np.float32)
        else:
            X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                          rng.uniform(4, 9, n)], axis=1).astype(np.float32)
        R = rand_rotation(rng, 0.05)
        t = np.array([0.8, 0.1, 0.05], np.float32)

        def proj(Rm, tm, X):
            Xc = X @ Rm.T + tm
            h = Xc @ K.T
            return h[:, :2] / h[:, 2:3]

        uv1 = proj(np.eye(3, dtype=np.float32), np.zeros(3, np.float32), X)
        uv2 = proj(R, t, X)
        uv1 += rng.standard_normal(uv1.shape).astype(np.float32) * noise
        uv2 += rng.standard_normal(uv2.shape).astype(np.float32) * noise
        inb = ((uv1 > 0).all(1) & (uv1 < [640, 480]).all(1)
               & (uv2 > 0).all(1) & (uv2 < [640, 480]).all(1))
        return K, R, t, uv1, uv2, inb.astype(bool)

    @pytest.mark.parametrize("planar", [False, True])
    def test_reconstruct(self, planar):
        K, R, t, uv1, uv2, mask = self._scene(planar)
        res = twoview.two_view_reconstruct(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(mask),
            jnp.asarray(K), jax.random.PRNGKey(0))
        assert bool(res.ok), f"reconstruction failed (planar={planar}, n_good={res.n_good})"
        assert bool(res.used_h) == planar
        R_est = np.asarray(res.R)
        t_est = np.asarray(res.t)
        # rotation error in degrees
        cos_err = (np.trace(R_est @ R.T) - 1) / 2
        ang = np.degrees(np.arccos(np.clip(cos_err, -1, 1)))
        assert ang < 1.0, f"rotation error {ang} deg"
        t_dir = t / np.linalg.norm(t)
        t_est_dir = t_est / np.linalg.norm(t_est)
        assert np.dot(t_dir, t_est_dir) > 0.995, (t_dir, t_est_dir)
