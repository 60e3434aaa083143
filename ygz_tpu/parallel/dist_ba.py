"""Distributed bundle adjustment over a jax device Mesh.

The reference has NO distributed computing (SURVEY.md §2.4) — this layer is
the new TPU-native capability: bundle adjustment sharded across chips.

Design (landmark-block sharding + matrix-free distributed PCG — round 3;
round 1 replicated the entire Schur pipeline, round 2 materialized and
psum'd the dense [P,6,P,6] Schur complement and solved it replicated, which
capped strong-scaling efficiency at 0.59 for n=2):

  * landmarks are block-sharded: device d owns points [d·L/n, (d+1)·L/n);
  * observations are partitioned BY OWNER of their landmark
    (`partition_obs_by_landmark`), so every landmark's normal-equation
    blocks (V_l, b_l, and the L-side coupling M_l) are computed entirely
    locally — no communication for any per-landmark quantity. The coupling
    M itself is never materialized (round 5; the round-4 [Lb,P,6,3] tensor
    was 37 MB/device at Lb=8192 and memory-bound, inflating the n=1
    baseline): all M-products stream over the observation axis as
    per-edge [6,3] blocks;
  * the reduced camera system S = U + λI − Σ_l M_l V_l⁻¹ M_lᵀ is NEVER
    materialized: it is solved by block-Jacobi-preconditioned CG whose
    matvec applies the local landmark sum matrix-free and psums ONE [P,6]
    vector per CG iteration (~1.5 KB at P=64). The preconditioner's [P,6,6]
    diagonal blocks psum once per GN iteration;
  * landmark back-substitution is local to each block.

Communication per GN iteration: psum of [P,6,6]×2 + [P,6] + cg_iters×[P,6]
+ scalars — independent of BOTH the observation count and the landmark
count, and the replicated compute is only O(P·6²·cg_iters) vector work, so
scaling efficiency approaches the sharded-compute fraction (target >=70%
at N>=2, BASELINE.md).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..backend.optim import (_vmapped_rj3, _huber_weight,
                             solve_preconditioned, CHI2_MONO, CHI2_STEREO)
from ..geometry.lie import se3_exp, se3_mul


class DistBAResult(NamedTuple):
    kf_R: jnp.ndarray
    kf_t: jnp.ndarray
    points: jnp.ndarray
    total_chi2: jnp.ndarray


def partition_obs_by_landmark(obs_p, obs_l, obs_uv, obs_w, n_points: int,
                              n_dev: int, pad_to: int = None, obs_ur=None):
    """Partition the observation table by landmark owner (block sharding of
    the L axis over n_dev devices). Returns (obs_p, obs_l, obs_uv, obs_ur,
    obs_w) concatenated in device order with every shard padded to the same
    length (padding rows carry w=0), plus the per-device shard length.
    obs_l stays GLOBAL — the sharded kernel localizes with its own block
    offset. obs_ur: optional [O] right-image u for stereo/RGB-D 3-row
    edges (-1 = monocular; default all-mono)."""
    obs_p = np.asarray(obs_p)
    obs_l = np.asarray(obs_l)
    obs_uv = np.asarray(obs_uv)
    obs_w = np.asarray(obs_w)
    if obs_ur is None:
        obs_ur = np.full(len(obs_p), -1.0, np.float32)
    obs_ur = np.asarray(obs_ur, np.float32)
    Lb = n_points // n_dev
    owner = np.clip(obs_l // max(Lb, 1), 0, n_dev - 1)
    shards = [np.nonzero(owner == d)[0] for d in range(n_dev)]
    O_shard = max(max((len(s) for s in shards), default=1), 1)
    if pad_to is not None:
        O_shard = max(O_shard, pad_to)
    op = np.zeros(n_dev * O_shard, np.int32)
    ol = np.zeros(n_dev * O_shard, np.int32)
    ouv = np.zeros((n_dev * O_shard, 2), np.float32)
    our = np.full(n_dev * O_shard, -1.0, np.float32)
    ow = np.zeros(n_dev * O_shard, np.float32)
    for d, s in enumerate(shards):
        sl = slice(d * O_shard, d * O_shard + len(s))
        op[sl] = obs_p[s]
        ol[sl] = obs_l[s]
        ouv[sl] = obs_uv[s]
        our[sl] = obs_ur[s]
        ow[sl] = obs_w[s]
        # padding rows must index a LOCAL landmark of this device
        op[d * O_shard + len(s): (d + 1) * O_shard] = 0
        ol[d * O_shard + len(s): (d + 1) * O_shard] = d * Lb
    return op, ol, ouv, our, ow, O_shard


def make_distributed_ba(mesh: Mesh, n_poses: int, n_points: int,
                        iters: int = 10, damping: float = 1e-3,
                        cg_iters: int = 48, phases=None):
    """Build a jitted distributed-BA step over `mesh` (axis name "obs").

    Call-time inputs: poses replicated; points/pt_valid block-sharded on L
    (length divisible by the mesh size); observation arrays partitioned with
    `partition_obs_by_landmark` (leading axis divisible by mesh size, global
    landmark indices); obs_ur [O] right-image u (-1 = mono) making
    stereo/RGB-D 3-row edges first-class (reference src/Optimizer.cc:1579);
    bf = stereo baseline*fx (scalar, 0 for mono).

    cg_iters: inner PCG iterations for the reduced camera solve per GN step
    (block-Jacobi preconditioned; LM accept/reject guards inexact steps).

    phases: GN iteration counts between chi2-outlier drops, mirroring the
    reference LocalBundleAdjustment 5 iters -> drop chi2>5.991/7.815 or
    negative depth -> 10 iters (src/Optimizer.cc:1990-2060). Default splits
    `iters` as (min(5, ceil(iters/3)), rest).
    """
    axis = "obs"
    n_dev = mesh.devices.size
    Pn = n_poses
    Lb = n_points // n_dev
    assert Lb * n_dev == n_points, "n_points must divide by the mesh size"
    if phases is None:
        first = min(5, max(1, (iters + 2) // 3))
        phases = (first, iters - first) if iters > first else (iters,)

    def step(kf_R, kf_t, free, points, pt_valid, obs_p, obs_l, obs_uv,
             obs_ur, obs_w, intr, bf):
        # points/pt_valid: local [Lb] block; obs_l: global -> localize
        fx, fy, cx, cy = intr
        base = jax.lax.axis_index(axis) * Lb
        ol = obs_l - base
        # per-edge chi2 gate: stereo 3-row edges use the 3-DoF threshold
        delta2 = jnp.where(obs_ur >= 0, CHI2_STEREO, CHI2_MONO)
        fm = free[:, None].astype(jnp.float32)

        def chi2_of(kf_R, kf_t, pts, inlier):
            # acceptance metric: NO depth masking — a point pushed behind a
            # camera keeps its (clamped-depth, enormous) residual, so the LM
            # gate cannot be gamed by collapsing the map to negative depths
            # (masked metrics scored that state as chi2=0 and accepted it)
            r, _, _, _ = _vmapped_rj3(kf_R[obs_p], kf_t[obs_p], pts[ol],
                                      obs_uv, obs_ur, bf, fx, fy, cx, cy)
            return jax.lax.psum(
                jnp.sum(jnp.sum(r * r, axis=1) * obs_w * inlier), axis)

        def body(carry, _):
            kf_R, kf_t, pts, lam, inlier = carry
            r, A, B, z = _vmapped_rj3(kf_R[obs_p], kf_t[obs_p], pts[ol],
                                      obs_uv, obs_ur, bf, fx, fy, cx, cy)
            c2 = jnp.sum(r * r, axis=1) * obs_w
            w = obs_w * inlier * (z > 0.0) * _huber_weight(c2, delta2)
            chi_old = jax.lax.psum(jnp.sum(c2 * inlier), axis)

            Aw = A * w[:, None, None]
            Bw = B * w[:, None, None]
            # pose-side blocks: psum across devices
            U = jax.lax.psum(
                jax.ops.segment_sum(jnp.einsum("nai,naj->nij", Aw, A),
                                    obs_p, Pn), axis)
            bp = -jax.lax.psum(
                jax.ops.segment_sum(jnp.einsum("nai,na->ni", Aw, r),
                                    obs_p, Pn), axis)
            # landmark-side blocks: fully local to the owner device
            V = jax.ops.segment_sum(jnp.einsum("nai,naj->nij", Bw, B), ol, Lb)
            bl = -jax.ops.segment_sum(jnp.einsum("nai,na->ni", Bw, r), ol, Lb)
            V = V + lam * jnp.eye(3)[None]
            Vinv = jnp.linalg.inv(V)
            # The landmark-pose coupling M ([Lb,Pn,6,3]) is NEVER
            # materialized (r4 did: at Lb=8192,P=64 it is 37 MB/device and
            # memory-bound, which inflated the n=1 baseline and polluted
            # the scaling story — VERDICT r5 #4). Every product with M
            # streams over the OBSERVATION axis instead: each observation
            # is a unique (pose, landmark) pair, so its [6,3] contribution
            # AwB_n is M's only nonzero in that (l,p) block.
            AwB = jnp.einsum("nai,naj->nij", Aw, B)          # [O,6,3]
            # Schur RHS: g = bp - psum_l M V^-1 bl   (one [P,6] psum)
            u = jnp.einsum("lij,lj->li", Vinv, bl)           # [Lb,3]
            g = (bp - jax.lax.psum(
                jax.ops.segment_sum(
                    jnp.einsum("nij,nj->ni", AwB, u[ol]), obs_p, Pn),
                axis)) * fm

            # block-Jacobi preconditioner: S's [6,6] diagonal blocks only
            # (one [P,6,6] psum; the dense [P,6,P,6] S is never formed).
            # Exact when each (pose, landmark) pair carries one observation
            # (always true for our observation tables); with duplicates it
            # degrades gracefully — it only preconditions CG.
            t_n = jnp.einsum("nij,njk->nik", AwB, Vinv[ol])  # [O,6,3]
            D = (U + lam * jnp.eye(6)[None]
                 - jax.lax.psum(
                     jax.ops.segment_sum(
                         jnp.einsum("nik,njk->nij", t_n, AwB), obs_p, Pn),
                     axis))
            D = (D * fm[:, :, None]
                 + (1.0 - fm)[:, :, None] * jnp.eye(6)[None])
            Dinv = jnp.linalg.inv(D)

            def matvec(x):
                """S @ x matrix-free: observation-streamed landmark sum +
                ONE [P,6] psum (exact for any multiplicity)."""
                Ux = jnp.einsum("pij,pj->pi", U + lam * jnp.eye(6)[None], x)
                y = jax.ops.segment_sum(
                    jnp.einsum("nij,ni->nj", AwB, x[obs_p]), ol, Lb)
                z = jnp.einsum("lij,lj->li", Vinv, y)        # [Lb,3]
                s = jax.lax.psum(
                    jax.ops.segment_sum(
                        jnp.einsum("nij,nj->ni", AwB, z[ol]), obs_p, Pn),
                    axis)
                out = Ux - s
                return out * fm + x * (1.0 - fm)  # identity on fixed poses

            def precond(r):
                return jnp.einsum("pij,pj->pi", Dinv, r) * fm

            # preconditioned CG on the reduced camera system
            x0 = jnp.zeros((Pn, 6))
            r0 = g
            z0 = precond(r0)

            def cg_body(_, st):
                x, r, z, p_ = st
                Ap = matvec(p_)
                rz = jnp.sum(r * z)
                alpha = rz / jnp.maximum(jnp.sum(p_ * Ap), 1e-20)
                x = x + alpha * p_
                r = r - alpha * Ap
                z2 = precond(r)
                beta = jnp.sum(r * z2) / jnp.maximum(rz, 1e-20)
                return x, r, z2, z2 + beta * p_

            dp, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body,
                                            (x0, r0, z0, z0))
            dp = dp * fm
            rhs = bl - jax.ops.segment_sum(
                jnp.einsum("nij,ni->nj", AwB, dp[obs_p]), ol, Lb)
            dl = jnp.einsum("lij,lj->li", Vinv, rhs) * pt_valid[:, None]

            newR, newt = jax.vmap(
                lambda Rp, tp, d: se3_mul(*se3_exp(d), Rp, tp))(kf_R, kf_t, dp)
            newpts = pts + dl
            chi_new = chi2_of(newR, newt, newpts, inlier)
            accept = chi_new < chi_old
            kf_R = jnp.where(accept, newR, kf_R)
            kf_t = jnp.where(accept, newt, kf_t)
            pts = jnp.where(accept, newpts, pts)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0),
                           1e-6, 1e3)
            # report the ACCEPTED state's chi2 (a rejected candidate's value
            # would otherwise surface as total_chi2 of the whole solve)
            return (kf_R, kf_t, pts, lam, inlier), jnp.where(accept, chi_new,
                                                             chi_old)

        # phased GN with chi2-outlier drops in between (reference
        # LocalBundleAdjustment erases chi2>th / negative-depth edges after
        # the first 5 iterations, src/Optimizer.cc:1990-2060) — a local
        # mask update, no communication
        inlier = (obs_w > 0.0).astype(jnp.float32)
        lam = jnp.float32(damping)
        chis = None
        for n_it in phases:
            (kf_R, kf_t, points, lam, inlier), chis = jax.lax.scan(
                body, (kf_R, kf_t, points, lam, inlier), None,
                length=n_it)
            r, _, _, z = _vmapped_rj3(kf_R[obs_p], kf_t[obs_p],
                                      points[ol], obs_uv, obs_ur, bf,
                                      fx, fy, cx, cy)
            c2 = jnp.sum(r * r, axis=1) * obs_w
            inlier = inlier * (c2 < delta2) * (z > 0.0)
        return DistBAResult(kf_R=kf_R, kf_t=kf_t, points=points,
                            total_chi2=chis[-1])

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis),
                  P(axis), P(axis), P(axis), P(axis), P(axis), P(), P()),
        out_specs=DistBAResult(kf_R=P(), kf_t=P(), points=P(axis),
                               total_chi2=P()),
        check_vma=False)
    return jax.jit(sharded)
