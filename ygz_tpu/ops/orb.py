"""Oriented BRIEF (ORB) descriptors: IC-angle + steered binary tests, batched.

Replaces ORBextractor's per-keypoint loops (/root/reference/src/
ORBextractor.cc — IC_Angle :77-101, computeOrbDescriptor :105-149 with its
256-pair table :152-410): all keypoints are described in one batched gather
pipeline. The 256 test pairs are a deterministic seeded Gaussian BRIEF pattern
(generated, not copied — descriptors here only need to be self-consistent;
the vocabulary used for place recognition is trained on the same pattern).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

HALF_PATCH = 15          # IC-angle circular patch radius (reference: 15)
PATTERN_RADIUS = 13      # max |coordinate| of a BRIEF test point
N_TESTS = 256


@functools.lru_cache()
def brief_pattern() -> np.ndarray:
    """[256, 4] int8 test pairs (x1,y1,x2,y2), seeded Gaussian (sigma=S/5),
    radius-clipped so any rotation stays inside the 31x31 patch."""
    rng = np.random.default_rng(20240817)
    pts = rng.normal(0.0, HALF_PATCH / 2.2, size=(N_TESTS * 2, 2))
    r = np.linalg.norm(pts, axis=1, keepdims=True)
    scale = np.minimum(1.0, PATTERN_RADIUS / np.maximum(r, 1e-9))
    pts = np.round(pts * scale).astype(np.int8)
    return pts.reshape(N_TESTS, 4)


@functools.lru_cache()
def _ic_angle_mask() -> np.ndarray:
    """Circular boolean mask + coordinate grids for the 31x31 IC-angle patch."""
    r = HALF_PATCH
    ys, xs = np.mgrid[-r: r + 1, -r: r + 1]
    mask = (xs * xs + ys * ys) <= r * r
    return np.stack([xs * mask, ys * mask]).astype(np.float32)


def ic_angles(img, uv, valid):
    """Intensity-centroid orientation for keypoints uv [N,2] on img [H,W].

    Returns angle [N] radians. (Reference IC_Angle uses the same moments
    m10/m01 over a radius-15 disc.)"""
    from .image import extract_patches

    patches = extract_patches(img, uv, HALF_PATCH)  # [N,31,31]
    xy = jnp.asarray(_ic_angle_mask())              # [2,31,31]
    m10 = jnp.sum(patches * xy[0][None], axis=(1, 2))
    m01 = jnp.sum(patches * xy[1][None], axis=(1, 2))
    ang = jnp.arctan2(m01, m10)
    return jnp.where(valid, ang, 0.0)


def brief_descriptors(img_blurred, uv, angles, valid):
    """Steered BRIEF: [N,256] uint8 bits (0/1).

    img_blurred: the 7x7 sigma=2 Gaussian-blurred level image (reference
    blurs before describing, src/ORBextractor.cc:1010).
    """
    H, W = img_blurred.shape
    pat = jnp.asarray(brief_pattern(), jnp.float32)  # [256,4]
    p1 = pat[:, 0:2]  # [256,2]
    p2 = pat[:, 2:4]

    ca = jnp.cos(angles)[:, None]  # [N,1]
    sa = jnp.sin(angles)[:, None]

    def rot(p):  # [256,2] -> [N,256,2]
        x = p[None, :, 0] * ca - p[None, :, 1] * sa
        y = p[None, :, 0] * sa + p[None, :, 1] * ca
        return jnp.stack([x, y], axis=-1)

    q1 = rot(p1) + uv[:, None, :]  # [N,256,2]
    q2 = rot(p2) + uv[:, None, :]

    def sample_nearest(q):
        xi = jnp.clip(jnp.round(q[..., 0]).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.round(q[..., 1]).astype(jnp.int32), 0, H - 1)
        return img_blurred[yi, xi]

    bits = (sample_nearest(q1) < sample_nearest(q2)).astype(jnp.uint8)
    return jnp.where(valid[:, None], bits, 0)


def pack_bits(bits):
    """[N,256] 0/1 -> [N,32] uint8 (byte-packed, row-major bit order)."""
    return jnp.packbits(bits.astype(jnp.uint8), axis=-1)


def unpack_bits(packed):
    return jnp.unpackbits(packed, axis=-1, count=N_TESTS)
