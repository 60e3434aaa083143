"""Pinhole camera model with radial-tangential distortion.

Mirrors the reference's camera handling (intrinsics + 4- or 8-coefficient
radtan distortion parsed in /root/reference/src/Tracking.cc:171-204, image
undistortion via a precomputed remap in src/Frame.cc:775-805) as pure jax
functions. Points are undistorted with a fixed-iteration Newton scheme
(jit-friendly: no data-dependent loops).

Camera intrinsics are a small named tuple of scalars; distortion is an
8-vector [k1,k2,p1,p2,k3,k4,k5,k6] (zeros => no-op, rational model when
k4..k6 nonzero — matching cv::undistort semantics closely enough for SLAM).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import jax


class Camera(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int
    dist: jnp.ndarray  # [8] radtan coefficients
    bf: float = 0.0    # stereo baseline * fx (0 for mono)

    @staticmethod
    def make(fx, fy, cx, cy, width, height, dist=None, bf=0.0):
        d = jnp.zeros(8, dtype=jnp.float32)
        if dist is not None:
            dist = jnp.asarray(dist, dtype=jnp.float32)
            d = d.at[: dist.shape[0]].set(dist)
        return Camera(float(fx), float(fy), float(cx), float(cy),
                      int(width), int(height), d, float(bf))

    @property
    def K(self):
        return jnp.array([[self.fx, 0.0, self.cx],
                          [0.0, self.fy, self.cy],
                          [0.0, 0.0, 1.0]], dtype=jnp.float32)


def distort_normalized(cam: Camera, xn):
    """Apply radtan distortion to normalized coords xn [..., 2]."""
    k1, k2, p1, p2, k3, k4, k5, k6 = [cam.dist[i] for i in range(8)]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    radial_num = 1.0 + k1 * r2 + k2 * r4 + k3 * r6
    radial_den = 1.0 + k4 * r2 + k5 * r4 + k6 * r6
    radial = radial_num / radial_den
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(cam: Camera, xd, iters: int = 8):
    """Invert radtan distortion by fixed-point iteration (cv-style)."""
    x = xd
    for _ in range(iters):
        d = distort_normalized(cam, x) - x  # distortion offset at current est.
        x = xd - d
    return x


def project(cam: Camera, Xc):
    """Camera-frame 3-D points [..., 3] -> distorted pixel coords [..., 2].

    Points behind the camera produce garbage u,v — callers must gate on
    positive depth (`Xc[...,2] > 0`)."""
    z = Xc[..., 2]
    zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xn = jnp.stack([Xc[..., 0] * zi, Xc[..., 1] * zi], axis=-1)
    xd = distort_normalized(cam, xn)
    u = cam.fx * xd[..., 0] + cam.cx
    v = cam.fy * xd[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_ideal(cam: Camera, Xc):
    """Projection without distortion (for pre-undistorted images)."""
    z = Xc[..., 2]
    zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * Xc[..., 0] * zi + cam.cx
    v = cam.fy * Xc[..., 1] * zi + cam.cy
    return jnp.stack([u, v], axis=-1)


def unproject(cam: Camera, uv, depth=None):
    """Pixel coords [..., 2] (on an undistorted image) -> normalized ray or
    3-D point if depth [...] given."""
    xn = jnp.stack([(uv[..., 0] - cam.cx) / cam.fx,
                    (uv[..., 1] - cam.cy) / cam.fy], axis=-1)
    ray = jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], axis=-1)
    if depth is None:
        return ray
    return ray * depth[..., None]


def undistort_points(cam: Camera, uv):
    """Distorted pixel coords -> undistorted pixel coords (same K)."""
    xd = jnp.stack([(uv[..., 0] - cam.cx) / cam.fx,
                    (uv[..., 1] - cam.cy) / cam.fy], axis=-1)
    xn = undistort_normalized(cam, xd)
    return jnp.stack([cam.fx * xn[..., 0] + cam.cx,
                      cam.fy * xn[..., 1] + cam.cy], axis=-1)


def undistort_remap_grid(cam: Camera):
    """Build the (map_u, map_v) sampling grid that produces an undistorted
    image: for each target (undistorted) pixel, the source (distorted)
    location to bilinearly sample. Computed once at startup (the analog of
    the reference's cv::initUndistortRectifyMap in src/Frame.cc:775-805)."""
    v, u = jnp.meshgrid(jnp.arange(cam.height, dtype=jnp.float32),
                        jnp.arange(cam.width, dtype=jnp.float32), indexing="ij")
    xn = jnp.stack([(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy], axis=-1)
    xd = distort_normalized(cam, xn)
    map_u = cam.fx * xd[..., 0] + cam.cx
    map_v = cam.fy * xd[..., 1] + cam.cy
    return map_u, map_v


def scale_camera(cam: Camera, scale: float) -> Camera:
    """Camera for a pyramid level scaled by `scale` (<1 shrinks)."""
    return Camera(cam.fx * scale, cam.fy * scale,
                  (cam.cx + 0.5) * scale - 0.5, (cam.cy + 0.5) * scale - 0.5,
                  int(round(cam.width * scale)), int(round(cam.height * scale)),
                  cam.dist, cam.bf * scale)
