"""Visual-inertial frame optimization with marginalized prior.

Re-design of the reference's NavState frame optimizers
(Optimizer::PoseOptimization(Frame, Frame|KeyFrame, preint, gw, marg)
/root/reference/src/Optimizer.cc:278-862, IMU factor src/IMU/
g2otypes.cpp:6-199). Two variants:

  * `vio_pose_optimization` — single free 15-DoF NavState against a FIXED
    previous state (IMU preintegration factor + bias random walk +
    reprojection + optional prior); the fallback when the previous frame
    has no usable observation set.
  * `vio_pose_optimization_pair` — the full reference semantics: BOTH
    NavStates free, 15x15 marginal prior on the previous one, reprojection
    on both frames, previous state Schur-marginalized out after convergence
    (computeMarginals, Optimizer.cc:598-613) to produce the next frame's
    prior.

Jacobians come from one forward-mode autodiff of the stacked residual (the
reference hand-derives ~200 lines of analytic Jacobians); IRLS Huber weights
and chi2 gating follow the reference's constants.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.lie import so3_exp, so3_log_safe
from ..imu.navstate import NavState
from ..imu.preintegration import PreintState, GYR_BIAS_RW2, ACC_BIAS_RW2
from .optim import _huber_weight, solve_preconditioned, CHI2_MONO

HUBER2_PVR = 21.666    # 0.99 chi2, 9 DoF (SURVEY.md §A.4)
HUBER2_BIAS = 16.812   # 6 DoF
HUBER2_PRIOR = 30.5779 # 15 DoF


class VioPoseResult(NamedTuple):
    P: jnp.ndarray
    V: jnp.ndarray
    R: jnp.ndarray
    bg: jnp.ndarray
    ba: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray
    marg_info: jnp.ndarray  # [15,15] posterior information = next prior


def _inc(state, d):
    P, V, R, bg, ba = state
    return (P + d[0:3], V + d[3:6], R @ so3_exp(d[6:9]),
            bg + d[9:12], ba + d[12:15])


@functools.partial(jax.jit, static_argnames=("rounds", "iters"))
def vio_pose_optimization(cur, prev, pre: PreintState, bias_lin,
                          prior_mean, prior_info, has_prior,
                          pt_xyz, uv, inv_sigma2, valid,
                          Rcb, tcb, intr, gw,
                          rounds: int = 3, iters: int = 8):
    """Optimize the current frame NavState.

    cur/prev/prior_mean: tuples (P, V, R, bg, ba) — TOTAL biases; prev fixed.
    pre: preintegration prev->cur integrated at `bias_lin` = (bg_lin, ba_lin).
    prior_info: [15,15]; has_prior: scalar bool (0-weighted when absent).
    pt_xyz [N,3] world points, uv [N,2], inv_sigma2 [N], valid [N].
    Rcb/tcb: camera-from-body extrinsic. intr: (fx, fy, cx, cy). gw: [3].
    Returns VioPoseResult.
    """
    fx, fy, cx, cy = intr
    N = pt_xyz.shape[0]
    dt = pre.dt
    bg_lin, ba_lin = bias_lin
    P0, V0, R0, bg0, ba0 = prev
    Pm, Vm, Rm, bgm, bam = prior_mean

    imu_info = jnp.linalg.inv(pre.cov + 1e-10 * jnp.eye(9))
    # symmetric weighting via Cholesky of the information
    imu_L = jnp.linalg.cholesky(0.5 * (imu_info + imu_info.T))
    bias_w = jnp.concatenate([
        jnp.full(3, 1.0 / (GYR_BIAS_RW2 * jnp.maximum(dt, 1e-3))),
        jnp.full(3, 1.0 / (ACC_BIAS_RW2 * jnp.maximum(dt, 1e-3)))])
    bias_L = jnp.sqrt(bias_w)
    _pi = 0.5 * (prior_info + prior_info.T)
    prior_L = jnp.linalg.cholesky(
        _pi + (1e-6 * jnp.trace(_pi) / 15.0 + 1e-8) * jnp.eye(15))
    prior_scale = jnp.where(has_prior, 1.0, 0.0)

    def residuals(d, state, inl_mask):
        P, V, R, bg, ba = _inc(state, d)
        # ---- IMU preintegration factor (bias-corrected) ----
        dbg = bg - bg_lin
        dba = ba - ba_lin
        dP = pre.dP + pre.J_P_bg @ dbg + pre.J_P_ba @ dba
        dV = pre.dV + pre.J_V_bg @ dbg + pre.J_V_ba @ dba
        dR = pre.dR @ so3_exp(pre.J_R_bg @ dbg)
        R0t = R0.T
        rP = R0t @ (P - P0 - V0 * dt - 0.5 * gw * dt * dt) - dP
        rV = R0t @ (V - V0 - gw * dt) - dV
        rR = so3_log_safe(dR.T @ (R0t @ R))
        r_imu = imu_L.T @ jnp.concatenate([rP, rV, rR])
        # ---- bias random walk to previous ----
        r_bias = bias_L * jnp.concatenate([bg - bg0, ba - ba0])
        # ---- prior ----
        r_pr = prior_scale * (prior_L.T @ jnp.concatenate([
            P - Pm, V - Vm, so3_log_safe(Rm.T @ R), bg - bgm, ba - bam]))
        # ---- reprojection through the body pose ----
        Xb = (pt_xyz - P[None, :]) @ R           # R_wb^T (X - P)
        Xc = Xb @ Rcb.T + tcb[None, :]
        zi = 1.0 / jnp.maximum(Xc[:, 2], 1e-6)
        u = fx * Xc[:, 0] * zi + cx
        v = fy * Xc[:, 1] * zi + cy
        w_r = jnp.sqrt(inv_sigma2 * inl_mask * (Xc[:, 2] > 0.1))
        r_uv = (jnp.stack([u - uv[:, 0], v - uv[:, 1]], -1)
                * w_r[:, None]).reshape(-1)
        return jnp.concatenate([r_imu, r_bias, r_pr, r_uv])

    def reproj_chi2(state):
        P, V, R, bg, ba = state
        Xb = (pt_xyz - P[None, :]) @ R
        Xc = Xb @ Rcb.T + tcb[None, :]
        zi = 1.0 / jnp.maximum(Xc[:, 2], 1e-6)
        u = fx * Xc[:, 0] * zi + cx
        v = fy * Xc[:, 1] * zi + cy
        e2 = ((u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2) * inv_sigma2
        return e2, Xc[:, 2]

    state = cur
    inl = valid

    def gn_round(state, inl_mask, use_huber):
        inl_f = inl_mask.astype(jnp.float32)

        def body(_, st):
            z = jnp.zeros(15)
            r = residuals(z, st, inl_f)
            J = jax.jacfwd(residuals)(z, st, inl_f)
            if use_huber:
                # IRLS on the reprojection part (2N tail)
                ntail = 2 * N
                r_uv = r[-ntail:].reshape(N, 2)
                c2 = jnp.sum(r_uv * r_uv, axis=1)
                wu = jnp.sqrt(_huber_weight(c2, CHI2_MONO))
                wfull = jnp.concatenate([
                    jnp.ones(r.shape[0] - ntail),
                    jnp.repeat(wu, 2)])
            else:
                wfull = jnp.ones(r.shape[0])
            H = (J * wfull[:, None]).T @ J
            b = (J * wfull[:, None]).T @ r
            H = H + 1e-8 * jnp.trace(H) / 15.0 * jnp.eye(15)
            d = -solve_preconditioned(H, b)
            return _inc(st, d)

        return jax.lax.fori_loop(0, iters, body, state)

    for rd in range(rounds):
        state = gn_round(state, inl, use_huber=rd < rounds - 1)
        e2, z = reproj_chi2(state)
        inl = valid & (e2 < CHI2_MONO) & (z > 0.1)

    # posterior information = final Gauss-Newton Hessian
    z15 = jnp.zeros(15)
    Jf = jax.jacfwd(residuals)(z15, state, inl.astype(jnp.float32))
    H = Jf.T @ Jf
    P, V, R, bg, ba = state
    return VioPoseResult(P=P, V=V, R=R, bg=bg, ba=ba, inliers=inl,
                         n_inliers=jnp.sum(inl), marg_info=H)


class VioPairResult(NamedTuple):
    P: jnp.ndarray         # current-frame NavState (optimized)
    V: jnp.ndarray
    R: jnp.ndarray
    bg: jnp.ndarray
    ba: jnp.ndarray
    inliers: jnp.ndarray   # [N] current-frame reprojection inliers
    n_inliers: jnp.ndarray
    prior_mean: tuple      # next frame's prior mean = optimized cur state
    prior_info: jnp.ndarray  # [15,15] marginalized information for cur


@functools.partial(jax.jit, static_argnames=("rounds", "iters"))
def vio_pose_optimization_pair(cur, prev, pre: PreintState, bias_lin,
                               prior_mean, prior_info, has_prior,
                               Xp, uvp, is2p, validp,
                               Xc, uvc, is2c, validc,
                               Rcb, tcb, intr, gw,
                               rounds: int = 3, iters: int = 8):
    """Two-NavState frame optimization with marginalization of the previous
    state — the full reference semantics (Optimizer::PoseOptimization(Frame,
    Frame|KeyFrame, preint, gw, bComputeMarg) src/Optimizer.cc:278-616):

      * BOTH the previous and the current 15-DoF NavStates are free;
      * a 15x15 prior (the previous marginalization result,
        EdgeNavStatePriorPVRBias) anchors the previous state;
      * the IMU preintegration factor + bias random walk couple the pair;
      * reprojection residuals on BOTH frames (each frame's tracked points);
      * after convergence the previous state is marginalized by Schur
        complement (computeMarginals, Optimizer.cc:598-613):
        prior_cur = H_cc - H_cp H_pp^-1 H_pc, mean = optimized cur.

    cur/prev/prior_mean: (P, V, R, bg, ba). pre: preintegration prev->cur at
    bias_lin. Xp/uvp/is2p/validp: previous-frame points; Xc/...: current.
    """
    fx, fy, cx, cy = intr
    Np = Xp.shape[0]
    Nc = Xc.shape[0]
    dt = pre.dt
    bg_lin, ba_lin = bias_lin
    Pm, Vm, Rm, bgm, bam = prior_mean

    imu_info = jnp.linalg.inv(pre.cov + 1e-10 * jnp.eye(9))
    imu_L = jnp.linalg.cholesky(0.5 * (imu_info + imu_info.T))
    bias_L = jnp.sqrt(jnp.concatenate([
        jnp.full(3, 1.0 / (GYR_BIAS_RW2 * jnp.maximum(dt, 1e-3))),
        jnp.full(3, 1.0 / (ACC_BIAS_RW2 * jnp.maximum(dt, 1e-3)))]))
    _pi = 0.5 * (prior_info + prior_info.T)
    prior_L = jnp.linalg.cholesky(
        _pi + (1e-6 * jnp.trace(_pi) / 15.0 + 1e-8) * jnp.eye(15))
    prior_scale = jnp.where(has_prior, 1.0, 0.0)

    def reproj(state, X, uv, is2, mask):
        P, V, R, bg, ba = state
        Xb = (X - P[None, :]) @ R
        Xc_ = Xb @ Rcb.T + tcb[None, :]
        zi = 1.0 / jnp.maximum(Xc_[:, 2], 1e-6)
        u = fx * Xc_[:, 0] * zi + cx
        v = fy * Xc_[:, 1] * zi + cy
        w = jnp.sqrt(is2 * mask * (Xc_[:, 2] > 0.1))
        r = jnp.stack([u - uv[:, 0], v - uv[:, 1]], -1)
        return r, w, Xc_[:, 2]

    def residuals(d, sp, sc, inlp, inlc, wup, wuc):
        """Stacked whitened residual of the 30-dim increment d.
        wup/wuc: per-point Huber IRLS sqrt-weights (computed outside)."""
        p = _inc(sp, d[:15])
        c = _inc(sc, d[15:])
        Pp, Vp, Rp, bgp, bap = p
        Pc, Vc, Rc, bgc, bac = c
        # prior on prev
        r_pr = prior_scale * (prior_L.T @ jnp.concatenate([
            Pp - Pm, Vp - Vm, so3_log_safe(Rm.T @ Rp), bgp - bgm, bap - bam]))
        # IMU preintegration factor (bias-corrected, prev biases)
        dbg = bgp - bg_lin
        dba = bap - ba_lin
        dP = pre.dP + pre.J_P_bg @ dbg + pre.J_P_ba @ dba
        dV = pre.dV + pre.J_V_bg @ dbg + pre.J_V_ba @ dba
        dR = pre.dR @ so3_exp(pre.J_R_bg @ dbg)
        Rpt = Rp.T
        rP = Rpt @ (Pc - Pp - Vp * dt - 0.5 * gw * dt * dt) - dP
        rV = Rpt @ (Vc - Vp - gw * dt) - dV
        rR = so3_log_safe(dR.T @ (Rpt @ Rc))
        r_imu = imu_L.T @ jnp.concatenate([rP, rV, rR])
        # bias random walk prev -> cur
        r_bias = bias_L * jnp.concatenate([bgc - bgp, bac - bap])
        # reprojection on both frames
        rp_, wp_, _ = reproj(p, Xp, uvp, is2p, inlp)
        rc_, wc_, _ = reproj(c, Xc, uvc, is2c, inlc)
        r_uvp = (rp_ * (wp_ * wup)[:, None]).reshape(-1)
        r_uvc = (rc_ * (wc_ * wuc)[:, None]).reshape(-1)
        return jnp.concatenate([r_pr, r_imu, r_bias, r_uvp, r_uvc])

    def chi2_of(state, X, uv, is2):
        r, w, z = reproj(state, X, uv, is2, jnp.ones(X.shape[0]))
        return jnp.sum(r * r, -1) * is2, z

    sp, sc = prev, cur
    inlp = validp.astype(jnp.float32)
    inlc = validc.astype(jnp.float32)

    def gn_round(sp, sc, inlp, inlc, use_huber):
        def body(_, st):
            sp, sc = st
            if use_huber:
                c2p, _ = chi2_of(sp, Xp, uvp, is2p)
                c2c, _ = chi2_of(sc, Xc, uvc, is2c)
                wup = jnp.sqrt(_huber_weight(c2p, CHI2_MONO))
                wuc = jnp.sqrt(_huber_weight(c2c, CHI2_MONO))
            else:
                wup = jnp.ones(Np)
                wuc = jnp.ones(Nc)
            z = jnp.zeros(30)
            r = residuals(z, sp, sc, inlp, inlc, wup, wuc)
            J = jax.jacfwd(residuals)(z, sp, sc, inlp, inlc, wup, wuc)
            H = J.T @ J
            b = J.T @ r
            H = H + 1e-8 * jnp.trace(H) / 30.0 * jnp.eye(30)
            d = -solve_preconditioned(H, b)
            return (_inc(sp, d[:15]), _inc(sc, d[15:]))

        return jax.lax.fori_loop(0, iters, body, (sp, sc))

    for rd in range(rounds):
        sp, sc = gn_round(sp, sc, inlp, inlc, use_huber=rd < rounds - 1)
        c2p, zp = chi2_of(sp, Xp, uvp, is2p)
        c2c, zc = chi2_of(sc, Xc, uvc, is2c)
        inlp = (validp & (c2p < CHI2_MONO) & (zp > 0.1)).astype(jnp.float32)
        inlc = (validc & (c2c < CHI2_MONO) & (zc > 0.1)).astype(jnp.float32)

    # posterior information and Schur marginalization of the previous state.
    # The CURRENT frame's reprojection factors are EXCLUDED from the
    # marginal (inlc=0): the caller re-adds exactly those landmark
    # observations as the next step's previous-frame edges, so keeping them
    # in the carried prior would double-count vision information (the
    # round-1 prior_forget=0.2 discount was a band-aid for this; see
    # VERDICT "VIO prior forgetting hack"). The prior therefore carries
    # history + IMU + previous-frame vision, each counted once.
    z30 = jnp.zeros(30)
    Jf = jax.jacfwd(residuals)(z30, sp, sc, inlp, jnp.zeros(Nc),
                               jnp.ones(Np), jnp.ones(Nc))
    H = Jf.T @ Jf
    Hpp = H[:15, :15] + 1e-6 * jnp.eye(15)
    Hpc = H[:15, 15:]
    Hcc = H[15:, 15:]
    marg = Hcc - Hpc.T @ jnp.linalg.solve(Hpp, Hpc)
    marg = 0.5 * (marg + marg.T)
    # project to PSD: float32 Schur complements carry O(eps*|H|) negative
    # eigenvalues that would NaN the next frame's prior Cholesky
    ew, EV = jnp.linalg.eigh(marg)
    marg = (EV * jnp.maximum(ew, 0.0)[None, :]) @ EV.T
    marg = 0.5 * (marg + marg.T)

    P, V, R, bg, ba = sc
    inl = inlc > 0
    return VioPairResult(P=P, V=V, R=R, bg=bg, ba=ba, inliers=inl,
                         n_inliers=jnp.sum(inl),
                         prior_mean=sc, prior_info=marg)


# ---------------------------------------------------------------------------
# Visual-inertial window bundle adjustment
# (reference Optimizer::LocalBundleAdjustmentNavState, Optimizer.cc:863-1279:
#  IMU local window of keyframes with a fixed previous-KF anchor, preint
#  edges along the chain, bias random-walk edges, reprojection edges, and
#  landmark optimization.)


class VioBAResult(NamedTuple):
    P: jnp.ndarray     # [W,3]
    V: jnp.ndarray     # [W,3]
    R: jnp.ndarray     # [W,3,3]
    bg: jnp.ndarray    # [W,3]
    ba: jnp.ndarray    # [W,3]
    points: jnp.ndarray
    total_chi2: jnp.ndarray


def _imu_pair_residual(di, dj, Pi, Vi, Ri, bgi, bai, Pj, Vj, Rj, bgj, baj,
                       pre_dP, pre_dV, pre_dR, JPbg, JPba, JVbg, JVba, JRbg,
                       cov, dt, bias_lin_g, bias_lin_a, gw):
    """15-D stacked [preint(9, whitened), bias-RW(6, weighted)] residual for
    a consecutive window pair, as a function of both 15-D increments."""
    Pi, Vi, Ri, bgi, bai = _inc((Pi, Vi, Ri, bgi, bai), di)
    Pj, Vj, Rj, bgj, baj = _inc((Pj, Vj, Rj, bgj, baj), dj)
    dbg = bgi - bias_lin_g
    dba = bai - bias_lin_a
    dP = pre_dP + JPbg @ dbg + JPba @ dba
    dV = pre_dV + JVbg @ dbg + JVba @ dba
    dR = pre_dR @ so3_exp(JRbg @ dbg)
    Rit = Ri.T
    rP = Rit @ (Pj - Pi - Vi * dt - 0.5 * gw * dt * dt) - dP
    rV = Rit @ (Vj - Vi - gw * dt) - dV
    rR = so3_log_safe(dR.T @ (Rit @ Rj))
    info = jnp.linalg.inv(cov + 1e-10 * jnp.eye(9))
    L = jnp.linalg.cholesky(0.5 * (info + info.T))
    r_imu = L.T @ jnp.concatenate([rP, rV, rR])
    w_bias = jnp.sqrt(jnp.concatenate([
        jnp.full(3, 1.0 / (GYR_BIAS_RW2 * jnp.maximum(dt, 1e-3))),
        jnp.full(3, 1.0 / (ACC_BIAS_RW2 * jnp.maximum(dt, 1e-3)))]))
    r_bias = w_bias * jnp.concatenate([bgj - bgi, baj - bai])
    return jnp.concatenate([r_imu, r_bias])


_imu_pair_rj = jax.vmap(
    lambda *a: (
        _imu_pair_residual(jnp.zeros(15), jnp.zeros(15), *a),
        jax.jacfwd(_imu_pair_residual, argnums=0)(
            jnp.zeros(15), jnp.zeros(15), *a),
        jax.jacfwd(_imu_pair_residual, argnums=1)(
            jnp.zeros(15), jnp.zeros(15), *a),
    ))


def _reproj_ns(d15, dl, P, R, X, uv, Rcb, tcb, fx, fy, cx, cy):
    """Reprojection residual through the body pose, as a function of the
    pose increment (only P/phi columns are non-zero) and the landmark inc."""
    Pn = P + d15[0:3]
    Rn = R @ so3_exp(d15[6:9])
    Xb = Rn.T @ (X + dl - Pn)
    Xc = Rcb @ Xb + tcb
    zi = 1.0 / jnp.maximum(Xc[2], 1e-6)
    return jnp.stack([fx * Xc[0] * zi + cx - uv[0],
                      fy * Xc[1] * zi + cy - uv[1]])


_reproj_ns_rj = jax.vmap(
    lambda P, R, X, uv, Rcb, tcb, fx, fy, cx, cy: (
        _reproj_ns(jnp.zeros(15), jnp.zeros(3), P, R, X, uv, Rcb, tcb,
                   fx, fy, cx, cy),
        jax.jacfwd(_reproj_ns, argnums=0)(
            jnp.zeros(15), jnp.zeros(3), P, R, X, uv, Rcb, tcb,
            fx, fy, cx, cy),
        jax.jacfwd(_reproj_ns, argnums=1)(
            jnp.zeros(15), jnp.zeros(3), P, R, X, uv, Rcb, tcb,
            fx, fy, cx, cy),
    ), in_axes=(0, 0, 0, 0, None, None, None, None, None, None))


@functools.partial(jax.jit, static_argnames=("n_win", "n_points", "iters"))
def vio_window_ba(P, V, R, bg, ba, fixed,
                  pre_fields, bias_lin_g, bias_lin_a,
                  points, pt_valid, obs_k, obs_l, obs_uv, obs_w,
                  Rcb, tcb, intr, gw,
                  n_win: int, n_points: int, iters: int = 8,
                  link_w=None):
    """Joint NavState-window + landmark GN with Schur elimination.

    P/V/R/bg/ba: [W,...] window NavStates (chain order); fixed [W] bool.
    pre_fields: tuple of stacked PreintState fields for the W-1 chain links
      (dP, dV, dR, JPbg, JPba, JVbg, JVba, JRbg, cov, dt), each [W-1, ...].
    points [L,3]; obs_*: [O] reprojection table (window idx, point idx, uv,
    weight 0=padding). link_w: optional [W-1] chain-link mask (0 = padding).
    """
    fx, fy, cx, cy = intr
    W, L = n_win, n_points
    O = obs_k.shape[0]
    (pdP, pdV, pdR, pJPbg, pJPba, pJVbg, pJVba, pJRbg, pcov, pdt) = pre_fields
    free = (~fixed).astype(jnp.float32)
    delta2 = CHI2_MONO

    def imu_residuals(P, V, R, bg, ba):
        ii = jnp.arange(W - 1)
        jj = ii + 1
        r_imu, Ji, Jj = _imu_pair_rj(
            P[ii], V[ii], R[ii], bg[ii], ba[ii],
            P[jj], V[jj], R[jj], bg[jj], ba[jj],
            pdP, pdV, pdR, pJPbg, pJPba, pJVbg, pJVba, pJRbg, pcov, pdt,
            jnp.broadcast_to(bias_lin_g, (W - 1, 3)),
            jnp.broadcast_to(bias_lin_a, (W - 1, 3)),
            jnp.broadcast_to(gw, (W - 1, 3)))
        if link_w is not None:
            r_imu = r_imu * link_w[:, None]
            Ji = Ji * link_w[:, None, None]
            Jj = Jj * link_w[:, None, None]
        return r_imu, Ji, Jj

    def total_chi2(P, V, R, bg, ba, points):
        """Robustified objective for step acceptance (the visual BA gates
        the same way; a rejected VIO step must not write into the map)."""
        r_imu, _, _ = imu_residuals(P, V, R, bg, ba)
        r_uv = jax.vmap(
            lambda Pk, Rk, X, uv: _reproj_ns(
                jnp.zeros(15), jnp.zeros(3), Pk, Rk, X, uv, Rcb, tcb,
                fx, fy, cx, cy))(P[obs_k], R[obs_k], points[obs_l], obs_uv)
        c2 = jnp.sum(r_uv * r_uv, axis=1) * obs_w
        rob = jnp.where(c2 <= delta2, c2,
                        2.0 * jnp.sqrt(delta2 * jnp.maximum(c2, 1e-12))
                        - delta2)
        return jnp.sum(rob) + jnp.sum(r_imu * r_imu)

    def body(state, _):
        P, V, R, bg, ba, points, lam = state
        # --- IMU chain factors (W-1 pairs) ---
        ii = jnp.arange(W - 1)
        jj = ii + 1
        r_imu, Ji, Jj = imu_residuals(P, V, R, bg, ba)
        # --- reprojection factors ---
        r_uv, A, B = _reproj_ns_rj(P[obs_k], R[obs_k], points[obs_l], obs_uv,
                                   Rcb, tcb, fx, fy, cx, cy)
        c2 = jnp.sum(r_uv * r_uv, axis=1) * obs_w
        w = obs_w * _huber_weight(c2, delta2)

        # normal equations: pose system [W,15] + landmarks [L,3]
        Aw = A * w[:, None, None]
        Bw = B * w[:, None, None]
        U = jax.ops.segment_sum(jnp.einsum("nai,naj->nij", Aw, A), obs_k, W)
        Vl = jax.ops.segment_sum(jnp.einsum("nai,naj->nij", Bw, B), obs_l, L)
        Wb = jnp.einsum("nai,naj->nij", Aw, B)
        bp = -jax.ops.segment_sum(jnp.einsum("nai,na->ni", Aw, r_uv), obs_k, W)
        bl = -jax.ops.segment_sum(jnp.einsum("nai,na->ni", Bw, r_uv), obs_l, L)
        M = jax.ops.segment_sum(Wb, obs_l * W + obs_k, L * W).reshape(L, W, 15, 3)

        Vl = Vl + lam * jnp.eye(3)[None]
        Vinv = jnp.linalg.inv(Vl)
        T_ = jnp.einsum("lpik,lkm->lpim", M, Vinv)
        S = -jnp.einsum("lpim,lqjm->piqj", T_, M)
        diag = jnp.arange(W)
        S = S.at[diag, :, diag, :].add(U + lam * jnp.eye(15)[None])
        g = bp - jnp.einsum("lpim,lm->pi", T_, bl)

        # add the IMU chain blocks into the pose system
        Hii = jnp.einsum("eai,eaj->eij", Ji, Ji)
        Hjj = jnp.einsum("eai,eaj->eij", Jj, Jj)
        Hij = jnp.einsum("eai,eaj->eij", Ji, Jj)
        gi = -jnp.einsum("eai,ea->ei", Ji, r_imu)
        gj = -jnp.einsum("eai,ea->ei", Jj, r_imu)
        flat = jnp.zeros((W * W, 15, 15))
        flat = flat.at[ii * W + ii].add(Hii)
        flat = flat.at[jj * W + jj].add(Hjj)
        flat = flat.at[ii * W + jj].add(Hij)
        flat = flat.at[jj * W + ii].add(Hij.transpose(0, 2, 1))
        S = S + flat.reshape(W, W, 15, 15).transpose(0, 2, 1, 3)
        g = g.at[ii].add(gi).at[jj].add(gj)

        # gauge / fixed states
        fm = free[:, None]
        S = S * fm[:, :, None, None] * fm[None, None, :, :]
        S = S.at[diag, :, diag, :].add(
            (1.0 - free)[:, None, None] * jnp.eye(15)[None])
        g = g * fm

        dp = solve_preconditioned(S.reshape(W * 15, W * 15),
                                  g.reshape(W * 15)).reshape(W, 15) * fm
        rhs = bl - jnp.einsum("lpim,pi->lm", M, dp)
        dl = jnp.einsum("lij,lj->li", Vinv, rhs) * pt_valid[:, None]

        news = jax.vmap(lambda st, d: _inc(st, d), in_axes=((0, 0, 0, 0, 0),
                                                            0))(
            (P, V, R, bg, ba), dp)
        P2, V2, R2, bg2, ba2 = news
        pts2 = points + dl

        # chi2-gated accept/rollback + LM damping adaptation: a bad
        # iteration must not write into the map (the round-1 fixed-lam
        # version had no step control — VERDICT "what's weak")
        old = total_chi2(P, V, R, bg, ba, points)
        new = total_chi2(P2, V2, R2, bg2, ba2, pts2)
        acc = new < old

        def sel(a, b):
            return jnp.where(acc, a, b)

        state2 = (sel(P2, P), sel(V2, V),
                  jnp.where(acc, R2, R), sel(bg2, bg), sel(ba2, ba),
                  sel(pts2, points),
                  jnp.clip(jnp.where(acc, lam * 0.5, lam * 8.0), 1e-6, 1e2))
        return state2, jnp.where(acc, new, old)

    state = (P, V, R, bg, ba, points, jnp.asarray(1e-4, jnp.float32))
    state, chis = jax.lax.scan(body, state, None, length=iters)
    P, V, R, bg, ba, points, _ = state
    return VioBAResult(P=P, V=V, R=R, bg=bg, ba=ba, points=points,
                       total_chi2=chis[-1])
