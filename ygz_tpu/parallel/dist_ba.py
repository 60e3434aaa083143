"""Distributed bundle adjustment over a jax device Mesh.

The reference has NO distributed computing (SURVEY.md §2.4) — this layer is
the new TPU-native capability: bundle adjustment sharded across chips.

Design (observation-parallel, the scaling-friendly axis):
  * observations (the O(10^4..10^6) axis) are sharded across the mesh;
  * every device computes partial normal-equation blocks (U_p, V_l, W coupling
    tensor, gradients) from its observation shard via segment_sum;
  * one `psum` over the mesh reduces them; the (small) reduced camera system
    and the 3x3 landmark inverses are solved replicated on every device —
    identical results, no extra broadcast step;
  * pose/landmark state is replicated; only per-observation work scales.

Communication per iteration: psum of [P,6,6]+[L,3,3]+[L,P,6,3]+[P,6]+[L,3]
blocks — independent of O, so scaling efficiency approaches the compute
fraction of the per-obs work (targeted >=70% at N>=2 hosts, BASELINE.md).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..backend.optim import (_vmapped_rj, _huber_weight, solve_preconditioned,
                             CHI2_MONO)
from ..geometry.lie import se3_exp, se3_mul


class DistBAResult(NamedTuple):
    kf_R: jnp.ndarray
    kf_t: jnp.ndarray
    points: jnp.ndarray
    total_chi2: jnp.ndarray


def _ba_iteration(kf_R, kf_t, free, points, pt_valid,
                  obs_p, obs_l, obs_uv, obs_w, intr, n_poses, n_points,
                  lam, axis_name=None):
    """One damped GN iteration with Schur complement; when `axis_name` is
    set, the block accumulations are psum-reduced across that mesh axis."""
    fx, fy, cx, cy = intr
    Pn, L = n_poses, n_points
    delta2 = CHI2_MONO

    r, A, B, z = _vmapped_rj(kf_R[obs_p], kf_t[obs_p], points[obs_l], obs_uv,
                             fx, fy, cx, cy)
    c2 = jnp.sum(r * r, axis=1) * obs_w
    w = obs_w * (z > 0.0) * _huber_weight(c2, delta2)

    Aw = A * w[:, None, None]
    Bw = B * w[:, None, None]
    U = jax.ops.segment_sum(jnp.einsum("nai,naj->nij", Aw, A), obs_p, Pn)
    V = jax.ops.segment_sum(jnp.einsum("nai,naj->nij", Bw, B), obs_l, L)
    Wb = jnp.einsum("nai,naj->nij", Aw, B)
    bp = -jax.ops.segment_sum(jnp.einsum("nai,na->ni", Aw, r), obs_p, Pn)
    bl = -jax.ops.segment_sum(jnp.einsum("nai,na->ni", Bw, r), obs_l, L)
    M = jax.ops.segment_sum(Wb, obs_l * Pn + obs_p, L * Pn).reshape(L, Pn, 6, 3)
    chi2_tot = jnp.sum(c2 * (w > 0))

    if axis_name is not None:
        U = jax.lax.psum(U, axis_name)
        V = jax.lax.psum(V, axis_name)
        bp = jax.lax.psum(bp, axis_name)
        bl = jax.lax.psum(bl, axis_name)
        M = jax.lax.psum(M, axis_name)
        chi2_tot = jax.lax.psum(chi2_tot, axis_name)

    V = V + lam * jnp.eye(3)[None]
    Vinv = jnp.linalg.inv(V)
    T_ = jnp.einsum("lpik,lkm->lpim", M, Vinv)
    S = -jnp.einsum("lpim,lqjm->piqj", T_, M)
    diag = jnp.arange(Pn)
    S = S.at[diag, :, diag, :].add(U + lam * jnp.eye(6)[None])
    g = bp - jnp.einsum("lpim,lm->pi", T_, bl)

    fm = free[:, None].astype(S.dtype)
    S = S * fm[:, :, None, None] * fm[None, None, :, :]
    S = S.at[diag, :, diag, :].add(
        (1.0 - free.astype(S.dtype))[:, None, None] * jnp.eye(6)[None])
    g = g * fm

    dp = solve_preconditioned(S.reshape(Pn * 6, Pn * 6),
                              g.reshape(Pn * 6)).reshape(Pn, 6) * fm
    rhs = bl - jnp.einsum("lpim,pi->lm", M, dp)
    dl = jnp.einsum("lij,lj->li", Vinv, rhs) * pt_valid[:, None]

    newR, newt = jax.vmap(lambda Rp, tp, d: se3_mul(*se3_exp(d), Rp, tp))(
        kf_R, kf_t, dp)
    newpts = points + dl
    return newR, newt, newpts, chi2_tot


def make_distributed_ba(mesh: Mesh, n_poses: int, n_points: int,
                        iters: int = 10, damping: float = 1e-3):
    """Build a jitted distributed-BA step over `mesh` (axis name "obs").

    Inputs at call time: replicated poses/points; observation arrays sharded
    on their leading axis (length must be divisible by the mesh size).
    """
    axis = "obs"

    def step(kf_R, kf_t, free, points, pt_valid, obs_p, obs_l, obs_uv, obs_w,
             intr):
        def body(carry, _):
            kf_R, kf_t, points, lam = carry
            newR, newt, newpts, chi_old = _ba_iteration(
                kf_R, kf_t, free, points, pt_valid, obs_p, obs_l, obs_uv,
                obs_w, intr, n_poses, n_points, lam, axis_name=axis)
            # evaluate acceptance on the new state
            r, _, _, z = _vmapped_rj(newR[obs_p], newt[obs_p],
                                     newpts[obs_l], obs_uv, *intr)
            c2 = jnp.sum(r * r, axis=1) * obs_w * (z > 0.0)
            chi_new = jax.lax.psum(jnp.sum(c2), axis)
            accept = chi_new < chi_old
            kf_R = jnp.where(accept, newR, kf_R)
            kf_t = jnp.where(accept, newt, kf_t)
            points = jnp.where(accept, newpts, points)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0),
                           1e-6, 1e3)
            return (kf_R, kf_t, points, lam), chi_new

        (kf_R, kf_t, points, _), chis = jax.lax.scan(
            body, (kf_R, kf_t, points, jnp.float32(damping)), None,
            length=iters)
        return DistBAResult(kf_R=kf_R, kf_t=kf_t, points=points,
                            total_chi2=chis[-1])

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(),
                  P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=DistBAResult(kf_R=P(), kf_t=P(), points=P(),
                               total_chi2=P()),
        check_vma=False)
    return jax.jit(sharded)
