"""Pallas TPU kernel for the FAST-10 corner score map.

The jnp formulation (ops/fast.py) materializes 16 shifted copies of the
image — ~17x the image's HBM traffic once XLA schedules the taps. This
kernel tiles the image over a 1-D row grid, DMAs each tile (with a 3-row
halo) into VMEM once, and computes all 16 Bresenham taps with in-register
row slices + lane rolls — one HBM read + one write per pixel.

Semantics match ops/fast.fast_score_map exactly (same arc strength + border
masking; parity-tested in interpreter mode and on hardware).

MEASURED (TPU v5e, 752x480): jnp ~0.64 ms vs pallas ~0.89 ms — XLA already
fuses the 16 shifted taps into a near-optimal pipeline, so the hand-written
kernel is NOT the default; it stays as the scaffold for kernels XLA cannot
fuse (the planned gather-heavy patch-alignment kernel).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import CIRCLE, ARC

TILE_H = 64
HALO = 3
PAD = 8  # aligned halo rows (>= HALO, multiple of the sublane tile)


def _fast_kernel(img_ref, out_ref, *, threshold, H, W):
    i = pl.program_id(0)
    th = out_ref.shape[0]

    # one ALIGNED block load per tile (Mosaic requires 8-aligned sublane
    # starts on ref loads); the +-3-row taps become static value slices
    block = img_ref[pl.ds(i * th, th + 2 * PAD), :]
    centre = block[PAD: PAD + th, :]

    # build bright/dark indicators for the 16 taps
    bright = []
    dark = []
    for dx, dy in CIRCLE:
        rows = block[PAD + dy: PAD + dy + th, :]
        shifted = pltpu.roll(rows, (-dx) % rows.shape[1], 1)
        diff = shifted - centre
        bright.append(diff - threshold)
        dark.append((-diff) - threshold)

    def arc_strength(x):
        m = [None] * 16
        for s in range(16):
            acc = x[s]
            for j in range(1, ARC):
                acc = jnp.minimum(acc, x[(s + j) % 16])
            m[s] = acc
        out = m[0]
        for s in range(1, 16):
            out = jnp.maximum(out, m[s])
        return out

    strength = jnp.maximum(arc_strength(bright), arc_strength(dark))
    score = jnp.where(strength > 0.0, strength + threshold, 0.0)

    # zero the 3-px frame (and the padded region)
    row0 = i * th
    ys = row0 + jax.lax.broadcasted_iota(jnp.int32, (th, score.shape[1]), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (th, score.shape[1]), 1)
    ok = (ys >= HALO) & (ys < H - HALO) & (xs >= HALO) & (xs < W - HALO)
    out_ref[:, :] = jnp.where(ok, score, 0.0)


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def fast_score_map_pallas(img, threshold: float = 20.0,
                          interpret: bool = False):
    """Drop-in replacement for ops.fast.fast_score_map on TPU."""
    H, W = img.shape
    Wp = -(-W // 128) * 128
    Hp = -(-H // TILE_H) * TILE_H
    padded = jnp.zeros((Hp + 2 * PAD, Wp), img.dtype)
    padded = padded.at[PAD: PAD + H, :W].set(img)

    grid = (Hp // TILE_H,)
    out = pl.pallas_call(
        functools.partial(_fast_kernel, threshold=float(threshold),
                          H=H, W=W),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), img.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE_H, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(padded)
    return out[:H, :W]
