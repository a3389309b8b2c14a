"""Shared particle<->grid transfer geometry and per-tap contributions.

Every pass in every reference variant starts from the same quantities per
particle: the base cell, the 3 quadratic B-spline weights per axis, and for
each of the 3^D taps the product weight, the tap's cell index and the
cell-center distance (p2g_1.glsl:44-70, MLSMPM2DFluid.cs:203-219).

Layout: lane-major [D, N]; per-tap quantities are computed on the fly inside
the tap loop (materializing [N, 27, D] intermediates is what OOM'd the first
design — TPU pads small minor dims to 128 lanes)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.params import SimConfig
from . import bspline


class TransferGeometry(NamedTuple):
    base: jax.Array  # [D, N] int32 base cell (floor(pos), clipped to grid)
    d: jax.Array  # [D, N] fractional offset frac(pos) - 0.5
    flat_base: jax.Array  # [N] int32 flattened base cell id


def geometry(pos: jax.Array, config: SimConfig) -> TransferGeometry:
    base_raw = bspline.base_cell(pos)
    # The reference never range-checks the scatter (SURVEY.md §2.1 quirks);
    # its safety is the position clamps. We clip defensively — with the
    # reference clamp bounds the clip is a no-op. Per-axis python-int bounds:
    # array-constant clip operands break shard_map+scan lowering (jax 0.9).
    base = jnp.stack(
        [
            jnp.clip(base_raw[a], 1, config.grid_res[a] - 2)
            for a in range(config.dim)
        ]
    )
    d = pos - base.astype(pos.dtype) - 0.5
    flat = base[0]
    for a in range(1, config.dim):
        flat = flat * config.grid_res[a] + base[a]
    return TransferGeometry(base=base, d=d, flat_base=flat)


def flat_tap_offsets(config: SimConfig) -> list[int]:
    """Constant flat-index offset of each tap on the row-major grid."""
    strides = [1] * config.dim
    for a in range(config.dim - 2, -1, -1):
        strides[a] = strides[a + 1] * config.grid_res[a + 1]
    return [
        sum((t[a] - 1) * strides[a] for a in range(config.dim))
        for t in bspline.taps(config.dim)
    ]


def p2g1_tap_contribs(state, d: jax.Array, tap: tuple[int, ...]):
    """Per-tap mass and APIC momentum contributions m*w, m*w*(v + C dist)
    (p2g_1.glsl:56-93, MPM-course eq. 172). Returns ([N], [D, N])."""
    w = bspline.tap_weight(d, tap)
    dist = bspline.tap_dist(d, tap)  # [D, N]
    mass_c = w * state.mass
    Cd = bspline.matvec(state.C, dist)
    mom_c = mass_c * (state.vel + Cd)
    return mass_c, mom_c


def p2g2_tap_contribs(eq16: jax.Array, d: jax.Array, tap: tuple[int, ...]):
    """Per-tap fused force momentum contribution w * (eq16 @ dist)
    (p2g_2.glsl:111-153). eq16: [D, D, N] -> [D, N]."""
    w = bspline.tap_weight(d, tap)
    dist = bspline.tap_dist(d, tap)
    return w * bspline.matvec(eq16, dist)
