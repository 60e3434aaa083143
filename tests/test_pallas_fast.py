"""Pallas FAST kernel parity vs the jnp reference (interpreter mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from ygz_tpu.ops.fast import fast_score_map
from ygz_tpu.ops.pallas_fast import fast_score_map_pallas


def test_pallas_fast_matches_jnp():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (96, 160)).astype(np.float32))
    a = np.asarray(fast_score_map(img, 20.0))
    b = np.asarray(fast_score_map_pallas(img, 20.0, interpret=True))
    np.testing.assert_array_equal(a, b)
    assert (a > 0).sum() > 100  # the test image actually produces corners


def test_pallas_fast_nonmultiple_shapes():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 255, (101, 137)).astype(np.float32))
    a = np.asarray(fast_score_map(img, 15.0))
    b = np.asarray(fast_score_map_pallas(img, 15.0, interpret=True))
    np.testing.assert_array_equal(a, b)
