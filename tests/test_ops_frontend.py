"""Kernel-level golden tests for the image front-end (SURVEY.md §7.2 stage 2)."""
import jax
import jax.numpy as jnp
import numpy as np

from ygz_tpu.ops import image, fast, select, orb, matching


def checker_texture(h, w, seed=0, scale=8):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h // scale + 2, w // scale + 2))
    img = np.kron(base, np.ones((scale, scale)))[:h, :w]
    return img.astype(np.float32)


class TestImage:
    def test_bilinear_exact_on_grid(self):
        img = jnp.asarray(checker_texture(32, 32))
        uv = jnp.array([[5.0, 7.0], [10.0, 3.0]])
        got = image.sample_bilinear(img, uv)
        np.testing.assert_allclose(np.asarray(got),
                                   [img[7, 5], img[3, 10]], rtol=1e-6)

    def test_bilinear_interpolates(self):
        img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
        v = image.sample_bilinear(img, jnp.array([[1.5, 2.0]]))
        np.testing.assert_allclose(np.asarray(v), [(9 + 10) / 2], rtol=1e-6)

    def test_halfsample(self):
        img = jnp.asarray(checker_texture(64, 48))
        h = image.halfsample(img)
        assert h.shape == (32, 24)
        np.testing.assert_allclose(float(h[0, 0]),
                                   float(img[:2, :2].mean()), rtol=1e-6)

    def test_pyramid_shapes(self):
        img = jnp.zeros((480, 752))
        pyr = image.build_pyramid(img, 4, 2.0)
        assert [p.shape for p in pyr] == [(480, 752), (240, 376), (120, 188),
                                          (60, 94)]

    def test_gaussian_blur_preserves_mean(self):
        img = jnp.asarray(checker_texture(64, 64))
        b = image.gaussian_blur(img, 7, 2.0)
        assert abs(float(b.mean()) - float(img.mean())) < 1.0
        assert float(jnp.var(b)) < float(jnp.var(img))


class TestFast:
    def _square_img(self):
        img = np.zeros((64, 64), np.float32)
        img[20:40, 20:40] = 200.0
        return img

    def test_detects_square_corners(self):
        score = fast.fast_score_map(jnp.asarray(self._square_img()), 20.0)
        score = fast.nonmax_3x3(score)
        ys, xs = np.nonzero(np.asarray(score) > 0)
        assert len(ys) >= 4
        corners = np.array([[20, 20], [20, 39], [39, 20], [39, 39]])
        for cy, cx in corners:
            d = np.min(np.abs(ys - cy) + np.abs(xs - cx))
            assert d <= 2, f"missed corner ({cy},{cx})"

    def test_no_corners_on_flat_or_edge(self):
        flat = jnp.full((32, 32), 100.0)
        assert float(fast.fast_score_map(flat, 20.0).max()) == 0.0
        edge = np.zeros((48, 48), np.float32)
        edge[:, 24:] = 200.0  # vertical step edge
        s = np.asarray(fast.fast_score_map(jnp.asarray(edge), 20.0))
        # mid-edge points (far from image frame) must not fire
        assert s[10:38, 22:27].max() == 0.0

    def test_shi_tomasi_ranks_corner_over_edge(self):
        img = jnp.asarray(self._square_img())
        st = np.asarray(fast.shi_tomasi_map(img))
        corner = st[18:23, 18:23].max()
        edge = st[28:32, 19:22].max()
        flat = st[5:10, 5:10].max()
        assert corner > edge >= flat


class TestSelect:
    def test_budget_and_cell_cap(self):
        rng = np.random.default_rng(1)
        score = jnp.asarray(rng.uniform(0, 1, (128, 128)).astype(np.float32))
        uv, s, valid = select.select_grid_topk(score, cell=32, max_per_cell=2,
                                               max_kp=64, border=0)
        n = int(valid.sum())
        assert n <= 32  # 16 cells * 2
        uvv = np.asarray(uv)[np.asarray(valid)]
        cells = set()
        for x, y in uvv:
            cells.add((int(x) // 32, int(y) // 32))
        # max 2 per cell
        from collections import Counter
        c = Counter((int(x) // 32, int(y) // 32) for x, y in uvv)
        assert max(c.values()) <= 2

    def test_border_and_occupancy(self):
        score = jnp.ones((64, 64))
        occ = select.stamp_occupancy(64, 64, jnp.array([[32.0, 32.0]]),
                                     jnp.array([True]), radius=10)
        uv, s, valid = select.select_grid_topk(score, cell=16, max_per_cell=3,
                                               max_kp=128, border=20,
                                               occupancy=occ)
        uvv = np.asarray(uv)[np.asarray(valid)]
        assert (uvv >= 20).all() and (uvv < 44).all()
        d = np.abs(uvv - 32.0).max(axis=1)
        assert (d > 10).all()


class TestOrb:
    def test_ic_angle_gradient_direction(self):
        h = w = 64
        xs = np.tile(np.arange(w, dtype=np.float32), (h, 1))
        ys = xs.T
        uv = jnp.array([[32.0, 32.0]])
        v = jnp.array([True])
        a_x = float(orb.ic_angles(jnp.asarray(xs), uv, v)[0])
        a_y = float(orb.ic_angles(jnp.asarray(ys), uv, v)[0])
        assert abs(a_x) < 0.05
        assert abs(a_y - np.pi / 2) < 0.05

    def test_brief_rotation_invariance(self):
        img = checker_texture(96, 96, seed=3, scale=4)
        img = np.asarray(image.gaussian_blur(jnp.asarray(img), 7, 2.0))
        c = 48.0
        theta = np.deg2rad(30.0)
        # rotate image around center by theta (inverse map)
        ys, xs = np.mgrid[0:96, 0:96].astype(np.float32)
        ct, st = np.cos(-theta), np.sin(-theta)
        sx = ct * (xs - c) - st * (ys - c) + c
        sy = st * (xs - c) + ct * (ys - c) + c
        rot = np.asarray(image.remap(jnp.asarray(img), jnp.asarray(sx),
                                     jnp.asarray(sy)))
        uv = jnp.array([[c, c]])
        valid = jnp.array([True])
        d0 = orb.brief_descriptors(jnp.asarray(img), uv, jnp.array([0.0]),
                                   valid)
        # a keypoint in the rotated image has orientation rotated by +theta
        d1 = orb.brief_descriptors(jnp.asarray(rot), uv,
                                   jnp.array([theta]), valid)
        dist = int(np.sum(np.asarray(d0) != np.asarray(d1)))
        d1_wrong = orb.brief_descriptors(jnp.asarray(rot), uv,
                                         jnp.array([0.0]), valid)
        dist_wrong = int(np.sum(np.asarray(d0) != np.asarray(d1_wrong)))
        assert dist < 60, f"steered distance {dist}"
        assert dist < dist_wrong, (dist, dist_wrong)

    def test_pack_unpack(self):
        rng = np.random.default_rng(4)
        bits = jnp.asarray(rng.integers(0, 2, (5, 256)).astype(np.uint8))
        packed = orb.pack_bits(bits)
        assert packed.shape == (5, 32)
        np.testing.assert_array_equal(np.asarray(orb.unpack_bits(packed)),
                                      np.asarray(bits))


class TestMatching:
    def test_hamming_exact(self):
        rng = np.random.default_rng(5)
        b1 = rng.integers(0, 2, (10, 256)).astype(np.uint8)
        b2 = b1.copy()
        b2[0, :7] ^= 1  # 7 bit flips
        d = np.asarray(matching.hamming_matrix(jnp.asarray(b1),
                                               jnp.asarray(b2)))
        assert d[0, 0] == 7
        assert d[1, 1] == 0
        # cross-check against numpy popcount
        ref = (b1[:, None, :] != b2[None, :, :]).sum(-1)
        np.testing.assert_array_equal(d.astype(int), ref)

    def test_nn_ratio_and_mutual(self):
        rng = np.random.default_rng(6)
        b2 = rng.integers(0, 2, (20, 256)).astype(np.uint8)
        perm = rng.permutation(20)
        b1 = b2[perm].copy()
        # flip a few bits of each
        for i in range(20):
            flip = rng.choice(256, 5, replace=False)
            b1[i, flip] ^= 1
        d = matching.hamming_matrix(jnp.asarray(b1), jnp.asarray(b2))
        idx, ok = matching.nn_match(d, max_dist=50, ratio=0.9)
        assert np.asarray(ok).all()
        np.testing.assert_array_equal(np.asarray(idx), perm)

    def test_window_gate(self):
        uv1 = jnp.array([[10.0, 10.0]])
        uv2 = jnp.array([[12.0, 11.0], [30.0, 30.0]])
        pen = np.asarray(matching.window_gate(uv1, uv2, 5.0))
        assert pen[0, 0] == 0.0 and pen[0, 1] > 1e8

    def test_rotation_consistency(self):
        n = 64
        rng = np.random.default_rng(7)
        ang1 = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        ang2 = (ang1 - 0.3).astype(np.float32)  # consistent rotation 0.3 rad
        ang2[:5] = ang1[:5] + np.pi  # 5 inconsistent outliers
        idx = jnp.arange(n, dtype=jnp.int32)
        ok = jnp.ones(n, bool)
        ok2 = np.asarray(matching.rotation_consistency(
            jnp.asarray(ang1), jnp.asarray(ang2), idx, ok))
        assert ok2[5:].all()
        assert not ok2[:5].any()


def test_octree_selection_covers_and_concentrates():
    """select_octree (DistributeOctTree semantics): every textured coarse
    region keeps a corner (coverage) and remaining budget concentrates in
    texture-dense areas."""
    import numpy as np
    import jax.numpy as jnp
    from ygz_tpu.ops import select

    rng = np.random.default_rng(3)
    H, W = 240, 320
    score = np.zeros((H, W), np.float32)
    # sparse texture on the left half: one corner per 40x40 region
    for y in range(40, H - 40, 40):
        for x in range(40, W // 2 - 20, 40):
            score[y, x] = rng.uniform(1, 5)
    # dense texture in the right half
    ys = rng.integers(30, H - 30, 300)
    xs = rng.integers(W // 2 + 10, W - 30, 300)
    score[ys, xs] = rng.uniform(1, 50, 300)

    uv, s, valid = select.select_octree(jnp.asarray(score), max_kp=120,
                                        border=16)
    uv = np.asarray(uv)[np.asarray(valid)]
    assert len(uv) > 60
    # coverage: every sparse-region corner that exists is picked
    left = uv[uv[:, 0] < W // 2 - 16]
    n_left_expected = sum(1 for y in range(40, H - 40, 40)
                          for x in range(40, W // 2 - 20, 40))
    assert len(left) >= 0.8 * n_left_expected, (len(left), n_left_expected)
    # concentration: the dense half gets the majority of the budget
    right = uv[uv[:, 0] >= W // 2]
    assert len(right) > 2 * len(left)
    # all picks are actual corners
    for x, y in uv:
        assert score[int(y), int(x)] > 0
