"""IMU preintegration (Forster-style) as one lax.scan over samples.

Replaces the reference's per-sample C++ loop
(IMUPreintegrator::update /root/reference/src/IMU/IMUPreintegrator.cpp:62-121)
with a batched scan: increments dP/dV/dR, the five bias Jacobians, and the
9x9 [P,V,Phi] covariance all propagate in one pass; whole sample windows are
processed as fixed-capacity masked arrays so the op compiles once.

Noise defaults follow the reference's EuRoC-calibrated values with its
empirical inflation (src/IMU/imudata.cpp:19-29).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.lie import hat, so3_exp, so3_right_jacobian

# reference noise model (imudata.cpp:19-29), inflation included
GYR_MEAS_COV = 1.7e-4 ** 2 / 0.005 * 100.0     # ~5.78e-4 rad^2/s^2 per axis
ACC_MEAS_COV = 2.0e-3 ** 2 / 0.005 * 100.0     # ~0.08 (m/s^2)^2 per axis
GYR_BIAS_RW2 = (2.0e-5) ** 2 * 10.0            # 4e-9
ACC_BIAS_RW2 = (5.0e-3) ** 2 * 10.0            # 2.5e-4


class PreintState(NamedTuple):
    dP: jnp.ndarray       # [3]
    dV: jnp.ndarray       # [3]
    dR: jnp.ndarray       # [3,3]
    J_P_bg: jnp.ndarray   # [3,3]
    J_P_ba: jnp.ndarray
    J_V_bg: jnp.ndarray
    J_V_ba: jnp.ndarray
    J_R_bg: jnp.ndarray
    cov: jnp.ndarray      # [9,9] order (P, V, Phi)
    dt: jnp.ndarray       # scalar total time

    @staticmethod
    def zero(dtype=jnp.float32):
        z3 = jnp.zeros((3, 3), dtype)
        return PreintState(dP=jnp.zeros(3, dtype), dV=jnp.zeros(3, dtype),
                           dR=jnp.eye(3, dtype=dtype),
                           J_P_bg=z3, J_P_ba=z3, J_V_bg=z3, J_V_ba=z3,
                           J_R_bg=z3, cov=jnp.zeros((9, 9), dtype),
                           dt=jnp.zeros((), dtype))


def _step(state: PreintState, sample):
    """One sample update; mirrors IMUPreintegrator.cpp:62-121 ordering
    (Jacobians and covariance use the OLD increments, then dP/dV/dR update)."""
    omega, acc, dt, valid = sample
    w = omega
    a = acc
    dt2 = dt * dt

    dR_old = state.dR
    phi = w * dt
    dR_inc = so3_exp(phi)
    Jr = so3_right_jacobian(phi)
    a_hat = hat(a)

    # covariance propagation, order (P, V, Phi)
    I3 = jnp.eye(3, dtype=dR_old.dtype)
    A = jnp.zeros((9, 9), dR_old.dtype)
    A = A.at[0:3, 0:3].set(I3).at[0:3, 3:6].set(I3 * dt)
    A = A.at[0:3, 6:9].set(-0.5 * dR_old @ a_hat * dt2)
    A = A.at[3:6, 3:6].set(I3).at[3:6, 6:9].set(-dR_old @ a_hat * dt)
    A = A.at[6:9, 6:9].set(dR_inc.T)
    Bg = jnp.zeros((9, 3), dR_old.dtype).at[6:9, :].set(Jr * dt)
    Ba = jnp.zeros((9, 3), dR_old.dtype)
    Ba = Ba.at[0:3, :].set(0.5 * dR_old * dt2).at[3:6, :].set(dR_old * dt)
    cov = (A @ state.cov @ A.T
           + Bg @ (GYR_MEAS_COV * I3) @ Bg.T
           + Ba @ (ACC_MEAS_COV * I3) @ Ba.T)

    # bias Jacobians (old quantities on the RHS)
    J_P_ba = state.J_P_ba + state.J_V_ba * dt - 0.5 * dR_old * dt2
    J_P_bg = (state.J_P_bg + state.J_V_bg * dt
              - 0.5 * dR_old @ a_hat @ state.J_R_bg * dt2)
    J_V_ba = state.J_V_ba - dR_old * dt
    J_V_bg = state.J_V_bg - dR_old @ a_hat @ state.J_R_bg * dt
    J_R_bg = dR_inc.T @ state.J_R_bg - Jr * dt

    # increments
    dP = state.dP + state.dV * dt + 0.5 * (dR_old @ a) * dt2
    dV = state.dV + (dR_old @ a) * dt
    dR = dR_old @ dR_inc

    new = PreintState(dP=dP, dV=dV, dR=dR, J_P_bg=J_P_bg, J_P_ba=J_P_ba,
                      J_V_bg=J_V_bg, J_V_ba=J_V_ba, J_R_bg=J_R_bg, cov=cov,
                      dt=state.dt + dt)
    # masked samples (padding) leave the state untouched
    out = jax.tree.map(lambda n, o: jnp.where(valid, n, o), new, state)
    return out, None


@jax.jit
def preintegrate(omega, acc, dts, valid, bg, ba):
    """Preintegrate a (padded) window of IMU samples.

    Args:
      omega, acc: [N,3] raw gyro (rad/s) / accelerometer (m/s^2) samples.
      dts: [N] per-sample integration intervals.
      valid: [N] bool padding mask.
      bg, ba: [3] biases subtracted from the raw measurements.
    Returns PreintState.
    """
    w = omega - bg[None, :]
    a = acc - ba[None, :]
    state, _ = jax.lax.scan(_step, PreintState.zero(omega.dtype),
                            (w, a, dts, valid))
    return state


def predict_navstate(ns, preint: PreintState, gravity_w):
    """Propagate a NavState through a preintegrated interval with first-order
    bias correction (the reference's Converter::updateNS + correction terms in
    g2otypes.cpp residuals)."""
    from .navstate import NavState

    dt = preint.dt
    dbg, dba = ns.dbg, ns.dba
    dP = (preint.dP + preint.J_P_bg @ dbg + preint.J_P_ba @ dba)
    dV = (preint.dV + preint.J_V_bg @ dbg + preint.J_V_ba @ dba)
    dR = preint.dR @ so3_exp(preint.J_R_bg @ dbg)

    P = ns.P + ns.V * dt + 0.5 * gravity_w * dt * dt + ns.R @ dP
    V = ns.V + gravity_w * dt + ns.R @ dV
    R = ns.R @ dR
    return NavState(P=P, V=V, R=R, bg=ns.bg, ba=ns.ba, dbg=dbg, dba=dba)
