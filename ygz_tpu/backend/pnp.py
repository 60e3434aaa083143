"""Robust PnP for relocalization: batched linear-PnP RANSAC + GN polish.

Replaces the reference's EPnP+RANSAC (/root/reference/src/PnPsolver.cc,
used only by relocalization, src/Tracking.cc:1826-1978). TPU-first design:
instead of EPnP's control-point machinery iterated sequentially, ALL RANSAC
hypotheses are solved simultaneously — each 6-point sample through the DLT
(12x12 normal-equations eigenvector), rotations re-orthonormalized by SVD —
then every hypothesis is scored against every correspondence in one
broadcast, and the winner is polished by the batched pose GN
(backend.optim.pose_optimization).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .optim import pose_optimization, CHI2_MONO


class PnPResult(NamedTuple):
    ok: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def _dlt_pose(X, uvn):
    """Linear PnP from k>=6 points: X [k,3] world, uvn [k,2] NORMALIZED image
    coords. Returns (R [3,3], t [3])."""
    k = X.shape[0]
    zeros = jnp.zeros((k, 4), X.dtype)
    Xh = jnp.concatenate([X, jnp.ones((k, 1), X.dtype)], axis=1)
    r1 = jnp.concatenate([Xh, zeros, -uvn[:, 0:1] * Xh], axis=1)
    r2 = jnp.concatenate([zeros, Xh, -uvn[:, 1:2] * Xh], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)  # [2k,12]
    AtA = A.T @ A
    _, V = jnp.linalg.eigh(AtA)
    p = V[:, 0].reshape(3, 4)
    Rraw = p[:, :3]
    # orthonormalize + resolve scale/sign (points must be in front)
    U, S, Vt = jnp.linalg.svd(Rraw)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], X.dtype).at[2].set(det))
    R = U @ D @ Vt
    scale = jnp.sum(S) / 3.0 * det  # signed mean singular value
    t = p[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    # flip if median depth negative
    z = X @ R.T[:, 2] + t[2]
    flip = jnp.sum(jnp.sign(z)) < 0
    R = jnp.where(flip, -R, R)
    t = jnp.where(flip, -t, t)
    # restore proper rotation if flipped (det -R = -det R for 3x3)
    U2, _, Vt2 = jnp.linalg.svd(R)
    det2 = jnp.linalg.det(U2 @ Vt2)
    D2 = jnp.diag(jnp.array([1.0, 1.0, 1.0], X.dtype).at[2].set(det2))
    R = U2 @ D2 @ Vt2
    return R, t


def pnp_ransac(X, uv, valid, intr, key, num_iters: int = 300,
               min_inliers: int = 10, chi2: float = CHI2_MONO,
               inv_sigma2=None):
    """Full robust PnP. X [N,3] world points, uv [N,2] pixel obs.

    Follows the reference's relocalization parameters
    (SetRansacParameters(0.99, 10, 300, 6->4, 0.5, 5.991),
    src/Tracking.cc:1872) with a 6-point minimal set for the linear solver.
    """
    fx, fy, cx, cy = intr
    N = X.shape[0]
    if inv_sigma2 is None:
        inv_sigma2 = jnp.ones(N)
    uvn = jnp.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], -1)

    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    keys = jax.random.split(key, num_iters)
    idx = jax.vmap(lambda k: jax.random.choice(
        k, N, shape=(6,), replace=False, p=probs))(keys)
    Rs, ts = jax.vmap(lambda i: _dlt_pose(X[i], uvn[i]))(idx)

    def count(R, t):
        Xc = X @ R.T + t
        zi = 1.0 / jnp.maximum(Xc[:, 2], 1e-6)
        u = fx * Xc[:, 0] * zi + cx
        v = fy * Xc[:, 1] * zi + cy
        e2 = ((u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2) * inv_sigma2
        inl = valid & (e2 < chi2) & (Xc[:, 2] > 0)
        return jnp.sum(inl), inl

    counts, _ = jax.vmap(count)(Rs, ts)
    best = jnp.argmax(counts)
    res = pose_optimization(X, uv, inv_sigma2, valid, Rs[best], ts[best],
                            intr, chi2_th=chi2)
    return PnPResult(ok=res.n_inliers >= min_inliers, R=res.R, t=res.t,
                     inliers=res.inliers, n_inliers=res.n_inliers)
