"""Packed-buffer layer of the fused frame step (r4): stacked pyramids and
the packed cache/pred/state vectors must round-trip exactly — a silent
layout skew here corrupts every downstream tracking computation."""
import numpy as np
import jax.numpy as jnp

from ygz_tpu.frontend.framestep import (
    stack_pyramid, unstack_pyramid, pyramid_shapes, pack_cache_np,
    unpack_cache, pack_pred_np, make_carry, CACHE_COLS)
from ygz_tpu.ops.image import build_pyramid


def test_pyramid_stack_roundtrip():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (480, 752)).astype(np.float32))
    pyr = build_pyramid(img, 4, 2.0)
    stack = stack_pyramid(pyr)
    assert stack.shape == (480 + 240 + 120 + 60, 752)
    out = unstack_pyramid(stack, 4, 2.0, height=480)
    for a, b in zip(pyr, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # height inference path
    out2 = unstack_pyramid(stack, 4, 2.0)
    for a, b in zip(pyr, out2):
        assert a.shape == b.shape


def test_pyramid_shapes_odd_dims():
    shapes = pyramid_shapes(487, 753, 4, 2.0)
    assert shapes[0] == (487, 753)
    assert shapes[1] == (243, 376)  # floor-halved like ops.image.halfsample


def test_cache_pack_roundtrip():
    rng = np.random.default_rng(1)
    cap = 64
    xyz = rng.normal(size=(cap, 3)).astype(np.float32)
    valid = rng.random(cap) > 0.5
    patch = rng.uniform(0, 255, (cap, 20, 20)).astype(np.float32)
    ref_uv = rng.uniform(0, 700, (cap, 2)).astype(np.float32)
    ref_level = rng.integers(0, 4, cap).astype(np.int32)
    ref_R = np.tile(np.eye(3, dtype=np.float32), (cap, 1, 1))
    ref_t = rng.normal(size=(cap, 3)).astype(np.float32)
    packed = pack_cache_np(xyz, valid, patch, ref_uv, ref_level, ref_R,
                           ref_t)
    assert packed.shape == (cap, CACHE_COLS)
    x2, v2, p2, uv2, l2, R2, t2 = unpack_cache(jnp.asarray(packed))
    np.testing.assert_array_equal(np.asarray(x2), xyz)
    np.testing.assert_array_equal(np.asarray(v2), valid)
    np.testing.assert_array_equal(np.asarray(p2), patch)
    np.testing.assert_array_equal(np.asarray(uv2), ref_uv)
    np.testing.assert_array_equal(np.asarray(l2), ref_level)
    np.testing.assert_array_equal(np.asarray(R2), ref_R)
    np.testing.assert_array_equal(np.asarray(t2), ref_t)


def test_pred_and_carry_pack():
    v = pack_pred_np(np.eye(3) * 2.0, np.array([1.0, 2.0, 3.0]), True)
    assert v.shape == (13,)
    assert v[12] == 1.0 and v[0] == 2.0 and v[11] == 3.0
    assert pack_pred_np()[12] == 0.0

    rng = np.random.default_rng(2)
    pyr = build_pyramid(jnp.asarray(
        rng.uniform(0, 255, (480, 752)).astype(np.float32)), 4, 2.0)
    uv = rng.uniform(0, 700, (8, 2)).astype(np.float32)
    Xc = rng.normal(size=(8, 3)).astype(np.float32)
    carry = make_carry(pyr, np.eye(3), np.zeros(3), uv, Xc,
                       np.ones(8, bool))
    assert carry.pyr.shape == (900, 752)
    assert carry.state.shape == (24,)
    assert carry.pts.shape == (8, 6)
    np.testing.assert_allclose(np.asarray(carry.pts[:, :2]), uv)
