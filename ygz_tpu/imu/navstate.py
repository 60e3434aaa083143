"""15-DoF navigation state {P, V, R, b_g, b_a (+ delta-biases)}.

Functional jax counterpart of the reference's NavState
(/root/reference/src/IMU/NavState.{h,cpp}): a NamedTuple of arrays with
manifold increment ops (IncSmall / IncSmallPVR / IncSmallBias semantics,
NavState.h:20-83). The reference keeps bias as (fixed b + delta db) so the
preintegration's bias Jacobians stay valid between relinearizations; we keep
the same split.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..geometry.lie import so3_exp

GRAVITY = 9.810  # reference: src/IMU/configparam.cpp:4


class NavState(NamedTuple):
    P: jnp.ndarray    # [3] position (world)
    V: jnp.ndarray    # [3] velocity (world)
    R: jnp.ndarray    # [3,3] body->world rotation
    bg: jnp.ndarray   # [3] gyro bias (linearization point)
    ba: jnp.ndarray   # [3] acc bias (linearization point)
    dbg: jnp.ndarray  # [3] gyro bias delta
    dba: jnp.ndarray  # [3] acc bias delta

    @staticmethod
    def identity():
        z = jnp.zeros(3, jnp.float32)
        return NavState(P=z, V=z, R=jnp.eye(3, dtype=jnp.float32),
                        bg=z, ba=z, dbg=z, dba=z)

    @property
    def bg_total(self):
        return self.bg + self.dbg

    @property
    def ba_total(self):
        return self.ba + self.dba


def inc_small_pvr(ns: NavState, d9):
    """Manifold increment of [dP, dV, dPhi] (NavState::IncSmallPVR).
    Rotation is RIGHT-multiplied: R <- R exp(dPhi)."""
    return ns._replace(P=ns.P + d9[0:3], V=ns.V + d9[3:6],
                       R=ns.R @ so3_exp(d9[6:9]))


def inc_small_bias(ns: NavState, d6):
    """Increment of [d(dbg), d(dba)] (NavState::IncSmallBias)."""
    return ns._replace(dbg=ns.dbg + d6[0:3], dba=ns.dba + d6[3:6])


def inc_small(ns: NavState, d15):
    return inc_small_bias(inc_small_pvr(ns, d15[0:9]), d15[9:15])
