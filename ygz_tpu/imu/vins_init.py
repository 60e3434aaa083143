"""Visual-inertial initialization (VI-ORB / reference TryInitVIO).

Re-implements the reference's three-step VINS initialization
(/root/reference/src/LocalMapping.cc:189-723 and
Optimizer::OptimizeInitialGyroBias src/Optimizer.cc:1414):

  Step 1 — gyro bias: Gauss-Newton on the rotation-preintegration residual
    log( (dR_meas exp(J_R_bg db))^T R_bw_i R_wb_{i+1} ) over keyframe pairs,
    with autodiff Jacobians (the reference hand-codes them in g2otypes).
  Step 2 — linear [scale, gravity] from keyframe triplets (velocity
    elimination; SVD least squares, LocalMapping.cc:266-319).
  Step 3 — refinement with accelerometer bias and the |g| = 9.81 constraint:
    gravity re-parameterized on the sphere, linear solve for
    [scale, dtheta_xy, b_a] (LocalMapping.cc:322-401).

All solves are tiny dense systems (host/device agnostic); the per-pair
preintegration states come from imu.preintegration.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry.lie import so3_exp, so3_log_safe, hat
from .preintegration import PreintState

GRAVITY_MAG = 9.810


class VinsInitResult(NamedTuple):
    ok: bool
    scale: float
    gravity_w: np.ndarray   # [3] in the (unscaled) vision world frame
    bg: np.ndarray          # [3]
    ba: np.ndarray          # [3]
    # quality diagnostics (init-acceptance gating, r4): the step-2 linear
    # scale and the step-3 system's normalized residual — a large s2/s3
    # disagreement or residual means the excitation was too weak for a
    # trustworthy scale (the reference instead waits 15 s of data,
    # src/IMU/configparam.cpp:15)
    scale_linear: float = 0.0
    res_norm: float = 0.0


def solve_gyro_bias(R_wb: Sequence[np.ndarray], preints: Sequence[PreintState],
                    iters: int = 5) -> np.ndarray:
    """Step 1: bg minimizing rotation-preint residuals over consecutive pairs.

    R_wb: [K] body->world rotations from vision (scale-free, exact rotation).
    preints: [K-1] preintegrated states between consecutive KFs (at bg=0).
    """
    R_wb = [jnp.asarray(R) for R in R_wb]

    def residuals(bg):
        res = []
        for i, pre in enumerate(preints):
            dR_corr = jnp.asarray(pre.dR) @ so3_exp(
                jnp.asarray(pre.J_R_bg) @ bg)
            rel = R_wb[i].T @ R_wb[i + 1]
            res.append(so3_log_safe(dR_corr.T @ rel))
        return jnp.concatenate(res)

    bg = jnp.zeros(3)
    for _ in range(iters):
        r = residuals(bg)
        J = jax.jacfwd(residuals)(bg)
        H = J.T @ J + 1e-9 * jnp.eye(3)
        bg = bg - jnp.linalg.solve(H, J.T @ r)
    return np.asarray(bg)


def _pair_terms(c, q, R_b, pre, i):
    """Terms of the motion equation for pair (i, i+1)."""
    dt = float(pre.dt)
    dP = np.asarray(pre.dP)
    dV = np.asarray(pre.dV)
    return dt, dP, dV


def solve_scale_gravity(c_w, q_w, R_wb, preints):
    """Step 2: linear LSQ for [s, g] from triplets.

    c_w: [K,3] camera centres from vision (unscaled); q_w: [K,3] = R_wc t_cb
    body-offset terms (so body position = s*c + q); R_wb: [K] rotations;
    preints: [K-1].
    Returns (s, g [3]).
    """
    K = len(c_w)
    A = []
    B = []
    for i in range(K - 2):
        dt12 = float(preints[i].dt)
        dt23 = float(preints[i + 1].dt)
        if dt12 <= 0 or dt23 <= 0:
            continue
        lam = dt23 / dt12
        c1, c2, c3 = c_w[i], c_w[i + 1], c_w[i + 2]
        q1, q2, q3 = q_w[i], q_w[i + 1], q_w[i + 2]
        R1 = R_wb[i]
        R2 = R_wb[i + 1]
        dP12 = np.asarray(preints[i].dP)
        dV12 = np.asarray(preints[i].dV)
        dP23 = np.asarray(preints[i + 1].dP)
        # s * [(c3-c2) - (c2-c1) lam] - g * (0.5 dt23 (dt12 + dt23)) = rhs
        col_s = (c3 - c2) - (c2 - c1) * lam
        col_g = -0.5 * dt23 * (dt12 + dt23) * np.eye(3)
        rhs = (-R1 @ dP12 * lam + R1 @ dV12 * dt23 + R2 @ dP23
               + (q2 - q1) * lam - (q3 - q2))
        A.append(np.concatenate([col_s[:, None], col_g], axis=1))
        B.append(rhs)
    A = np.concatenate(A)          # [3T, 4]
    B = np.concatenate(B)          # [3T]
    x, *_ = np.linalg.lstsq(A, B, rcond=None)
    return float(x[0]), x[1:4]


def refine_with_accel_bias(c_w, q_w, R_wb, preints, g0):
    """Step 3: re-solve [s, dtheta_xy, ba] with |g| fixed at 9.81.

    Gravity is parameterized g = R_g @ exp(hat([dthx, dthy, 0])) @ gI with
    gI = [0,0,-9.81] rotated into the initial estimate's direction.
    """
    gI = np.array([0.0, 0.0, -GRAVITY_MAG])
    gn = g0 / max(np.linalg.norm(g0), 1e-9)
    gIn = gI / np.linalg.norm(gI)
    v = np.cross(gIn, gn)
    s_ang = np.linalg.norm(v)
    c_ang = float(np.dot(gIn, gn))
    if s_ang < 1e-8:
        R_g = np.eye(3)
    else:
        axis = v / s_ang
        ang = np.arctan2(s_ang, c_ang)
        R_g = np.asarray(so3_exp(jnp.asarray(axis * ang, jnp.float32)))
    g_base = R_g @ gI  # ~= g0 direction with correct magnitude

    K = len(c_w)
    A = []
    B = []
    for i in range(K - 2):
        dt12 = float(preints[i].dt)
        dt23 = float(preints[i + 1].dt)
        if dt12 <= 0 or dt23 <= 0:
            continue
        lam = dt23 / dt12
        c1, c2, c3 = c_w[i], c_w[i + 1], c_w[i + 2]
        q1, q2, q3 = q_w[i], q_w[i + 1], q_w[i + 2]
        R1, R2 = R_wb[i], R_wb[i + 1]
        p1 = preints[i]
        p2 = preints[i + 1]
        col_s = (c3 - c2) - (c2 - c1) * lam
        kg = -0.5 * dt23 * (dt12 + dt23)
        # g = g_base + R_g d(gI)/dth dth  ->  columns for dth (x,y only)
        Dg = -R_g @ hat_np(gI)
        col_th = kg * Dg[:, :2]
        # accel-bias columns: dP/dV corrected by J_*_ba @ ba
        JP12 = np.asarray(p1.J_P_ba)
        JV12 = np.asarray(p1.J_V_ba)
        JP23 = np.asarray(p2.J_P_ba)
        col_ba = (-R1 @ JP12 * lam + R1 @ JV12 * dt23 + R2 @ JP23) * -1.0
        rhs = (-R1 @ np.asarray(p1.dP) * lam + R1 @ np.asarray(p1.dV) * dt23
               + R2 @ np.asarray(p2.dP)
               + (q2 - q1) * lam - (q3 - q2) - kg * g_base)
        A.append(np.concatenate([col_s[:, None], col_th, col_ba], axis=1))
        B.append(rhs)
    A = np.concatenate(A)
    B = np.concatenate(B)
    x, *_ = np.linalg.lstsq(A, B, rcond=None)
    s = float(x[0])
    dth = np.array([x[1], x[2], 0.0])
    ba = x[3:6]
    g = R_g @ np.asarray(so3_exp(jnp.asarray(dth, jnp.float32))) @ gI
    res = float(np.linalg.norm(A @ x - B)
                / max(np.linalg.norm(B), 1e-9))
    return s, g, ba, res


def hat_np(w):
    return np.array([[0.0, -w[2], w[1]], [w[2], 0.0, -w[0]],
                     [-w[1], w[0], 0.0]])


def vins_initialize(c_w, R_wc, preints_bg0, recompute_preint, Tbc,
                    min_scale: float = 1e-3) -> VinsInitResult:
    """Full VINS init.

    Args:
      c_w: [K,3] camera centres (vision scale); R_wc: [K] cam->world.
      preints_bg0: [K-1] preintegrations at zero gyro bias.
      recompute_preint: callable(bg) -> new [K-1] preints at bias bg
        (the reference recomputes after step 1, LocalMapping.cc:254-264).
      Tbc: [4,4] body->camera extrinsic (reference Camera.Tbc is T_b_c:
        cam pose in body frame).
    """
    Rbc = Tbc[:3, :3]
    tbc = Tbc[:3, 3]
    # body rotation: R_wb = R_wc @ R_cb = R_wc @ Rbc^T
    R_wb = [np.asarray(R) @ Rbc.T for R in R_wc]
    # body position offset: p_wb = p_wc + R_wc * t_cb, t_cb = -Rbc^T tbc
    t_cb = -Rbc.T @ tbc
    q_w = np.stack([np.asarray(R) @ t_cb for R in R_wc])

    bg = solve_gyro_bias(R_wb, preints_bg0)
    preints = recompute_preint(bg)
    s2, g2 = solve_scale_gravity(np.asarray(c_w), q_w, R_wb, preints)
    if not np.isfinite(s2) or s2 < min_scale:
        return VinsInitResult(False, 0.0, np.zeros(3), bg, np.zeros(3))
    s3, g3, ba, res = refine_with_accel_bias(np.asarray(c_w), q_w, R_wb,
                                             preints, g2)
    ok = np.isfinite(s3) and s3 > min_scale and np.all(np.isfinite(g3))
    return VinsInitResult(bool(ok), float(s3), g3.astype(np.float32),
                          bg.astype(np.float32), ba.astype(np.float32),
                          scale_linear=float(s2), res_norm=res)
