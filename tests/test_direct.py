"""Tests for the direct trackers: batched Align2D and sparse image alignment
(SURVEY.md §7.2 stage 3)."""
import jax
import jax.numpy as jnp
import numpy as np

from ygz_tpu.ops import align, image as imops, fast, select
from ygz_tpu.frontend.sparse_align import sparse_image_align
from ygz_tpu.geometry import lie

from synthetic import PlaneScene


def pick_corners(img, n, border=24):
    score = fast.nonmax_3x3(fast.fast_score_map(jnp.asarray(img), 15.0))
    uv, s, valid = select.select_grid_topk(score, cell=24, max_per_cell=2,
                                           max_kp=n, border=border)
    return np.asarray(uv), np.asarray(valid)


class TestAlign2D:
    def test_recovers_known_shift(self):
        scene = PlaneScene(seed=2)
        I0 = scene.render(np.eye(3), np.zeros(3))
        R = np.eye(3, dtype=np.float32)
        t = np.array([0.02, -0.01, 0.0], np.float32)  # small translation
        I1 = scene.render(R, t)

        uv0, valid = pick_corners(I0, 128)
        Xw = scene.backproject(np.eye(3), np.zeros(3), uv0)
        uv1_true, _ = scene.project(R, t, Xw)

        # ref patches with border, no warp needed (fronto-parallel + tiny motion)
        ref_border = align.sample_patches(jnp.asarray(I0), jnp.asarray(uv0),
                                          align.PATCH + 2)
        # start 2 px off
        rng = np.random.default_rng(3)
        init = uv1_true + rng.uniform(-2, 2, uv1_true.shape).astype(np.float32)
        uv, ok, mean = align.align2d(jnp.asarray(I1), ref_border,
                                     jnp.asarray(init), jnp.asarray(valid))
        ok = np.asarray(ok)
        uv = np.asarray(uv)
        assert ok.sum() > 0.7 * valid.sum(), f"converged {ok.sum()}/{valid.sum()}"
        err = np.linalg.norm(uv[ok] - uv1_true[ok], axis=1)
        assert np.median(err) < 0.05, f"median refine error {np.median(err)}"

    def test_brightness_invariance(self):
        scene = PlaneScene(seed=4)
        I0 = scene.render(np.eye(3), np.zeros(3))
        I1 = np.clip(I0 + 20.0, 0, 255 + 40)  # global brightness offset
        uv0, valid = pick_corners(I0, 64)
        ref_border = align.sample_patches(jnp.asarray(I0), jnp.asarray(uv0),
                                          align.PATCH + 2)
        init = uv0 + np.array([1.5, -1.0], np.float32)
        uv, ok, mean = align.align2d(jnp.asarray(I1), ref_border,
                                     jnp.asarray(init), jnp.asarray(valid))
        ok = np.asarray(ok)
        err = np.linalg.norm(np.asarray(uv)[ok] - uv0[ok], axis=1)
        assert ok.sum() > 0.6 * valid.sum()
        assert np.median(err) < 0.1
        # mean-brightness DoF should absorb the +20 offset (m ~= cur - ref)
        assert abs(np.median(np.asarray(mean)[ok]) - 20.0) < 3.0


class TestSparseAlign:
    def _run(self, t_true, w_true, seed=5):
        scene = PlaneScene(seed=seed)
        I0 = scene.render(np.eye(3), np.zeros(3))
        R_true = np.asarray(lie.so3_exp(jnp.asarray(w_true, jnp.float32)))
        I1 = scene.render(R_true, t_true)

        uv0, valid = pick_corners(I0, 256)
        Xw = scene.backproject(np.eye(3), np.zeros(3), uv0)  # == X in cam0

        pyr0 = imops.build_pyramid(jnp.asarray(I0), 4)
        pyr1 = imops.build_pyramid(jnp.asarray(I1), 4)
        res = sparse_image_align(
            pyr0, pyr1, jnp.asarray(uv0), jnp.asarray(Xw), jnp.asarray(valid),
            (scene.f, scene.f, scene.cx, scene.cy),
            jnp.eye(3), jnp.zeros(3), levels=(3, 2, 1), iters=10)
        return np.asarray(res.R), np.asarray(res.t), R_true, np.asarray(
            t_true, np.float32), int(res.n_meas), float(res.mean_res)

    def test_translation(self):
        R, t, R_true, t_true, n, res = self._run(
            np.array([0.05, 0.02, 0.01], np.float32), np.zeros(3))
        assert n > 100
        np.testing.assert_allclose(t, t_true, atol=2e-3)
        np.testing.assert_allclose(R, R_true, atol=1e-3)

    def test_rotation_translation(self):
        R, t, R_true, t_true, n, res = self._run(
            np.array([0.03, -0.02, 0.0], np.float32),
            np.array([0.01, 0.005, -0.01], np.float32))
        ang = np.degrees(np.arccos(np.clip((np.trace(R @ R_true.T) - 1) / 2,
                                           -1, 1)))
        assert ang < 0.1, f"rotation error {ang} deg"
        np.testing.assert_allclose(t, t_true, atol=3e-3)

    def test_large_motion_uses_coarse_levels(self):
        # ~12 px apparent motion: solvable only through the pyramid (a 4x4
        # patch at full res has a ~2 px basin; level 3 brings 12 px to 1.5 px)
        R, t, R_true, t_true, n, res = self._run(
            np.array([0.15, 0.05, 0.0], np.float32), np.zeros(3))
        np.testing.assert_allclose(t, t_true, atol=5e-3)
        assert res < 10.0, f"mean residual {res}"


class TestAffineWarp:
    def test_identity_for_no_motion(self):
        n = 4
        X = np.array([[0.1, 0.2, 5.0]] * n, np.float32)
        uv = np.array([[300.0, 200.0]] * n, np.float32)
        A = align.affine_warp_matrix(
            jnp.asarray(X), jnp.asarray(uv), 400.0, 400.0, 320.0, 240.0,
            jnp.eye(3), jnp.zeros(3), 400.0, 400.0, 320.0, 240.0)
        np.testing.assert_allclose(np.asarray(A),
                                   np.tile(np.eye(2), (n, 1, 1)), atol=1e-3)

    def test_scale_halves_with_depth_doubling(self):
        # moving the camera back doubles depth -> features shrink by ~2
        X = np.array([[0.0, 0.0, 5.0]], np.float32)
        uv = np.array([[320.0, 240.0]], np.float32)
        A = align.affine_warp_matrix(
            jnp.asarray(X), jnp.asarray(uv), 400.0, 400.0, 320.0, 240.0,
            jnp.eye(3), jnp.asarray(np.array([0, 0, 5.0], np.float32)),
            400.0, 400.0, 320.0, 240.0)
        np.testing.assert_allclose(np.asarray(A)[0],
                                   0.5 * np.eye(2), atol=1e-2)
        lvl = align.best_search_level(A, 3)
        assert int(lvl[0]) == 0  # shrinking features -> search at level 0
