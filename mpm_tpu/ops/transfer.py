"""Shared particle<->grid transfer geometry.

Every pass in every reference variant starts from the same quantities per
particle: the base cell, the 3 quadratic B-spline weights per axis, and for
each of the 3^D taps the product weight, the tap's cell index and the
cell-center distance (p2g_1.glsl:44-70, MLSMPM2DFluid.cs:203-219). This module
computes them once, vectorized over particles.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.params import SimConfig
from . import bspline


class TapGeometry(NamedTuple):
    base: jax.Array  # [N, D] int32 base cell (floor(pos))
    wt: jax.Array  # [N, T] product weight per tap, T = 3^D
    cells: jax.Array  # [N, T, D] int32 tap cell indices (clipped to grid)
    flat: jax.Array  # [N, T] int32 flattened tap cell indices
    dist: jax.Array  # [N, T, D] cell-center minus particle position


def p2g1_contribs(state, geom: "TapGeometry"):
    """Per-tap mass and APIC momentum contributions m*w, m*w*(v + C d)
    (p2g_1.glsl:56-93, MPM-course eq. 172). Returns ([N,T], [N,T,D])."""
    mass_c = geom.wt * state.mass[:, None]
    Cd = jnp.einsum("nij,ntj->nti", state.C, geom.dist)
    mom_c = mass_c[..., None] * (state.vel[:, None, :] + Cd)
    return mass_c, mom_c


def p2g2_contribs(eq16: jax.Array, geom: "TapGeometry"):
    """Per-tap fused force momentum contribution w * (eq16 @ dist)
    (p2g_2.glsl:111-153). eq16: [N,D,D] -> [N,T,D]."""
    return geom.wt[..., None] * jnp.einsum("nij,ntj->nti", eq16, geom.dist)


def tap_geometry(pos: jax.Array, config: SimConfig) -> TapGeometry:
    dim = config.dim
    base = bspline.base_cell(pos)
    w = bspline.weights_1d(bspline.cell_diff(pos))  # [N, 3, D]
    tap_arr = jnp.asarray(bspline.taps(dim), jnp.int32)  # [T, D]

    cells = base[:, None, :] + (tap_arr[None] - 1)  # [N, T, D]
    # The reference never range-checks the scatter (SURVEY.md §2.1 quirks);
    # its safety is the position clamps. We clip defensively — with the
    # reference clamp bounds (>= 1) the clip is a no-op.
    res = jnp.asarray(config.grid_res, jnp.int32)
    cells = jnp.clip(cells, 0, res - 1)
    dist = cells.astype(pos.dtype) - pos[:, None, :] + 0.5

    wt = w[:, tap_arr[:, 0], 0]
    for a in range(1, dim):
        wt = wt * w[:, tap_arr[:, a], a]

    strides = []
    s = 1
    for r in reversed(config.grid_res):
        strides.append(s)
        s *= r
    strides = jnp.asarray(list(reversed(strides)), jnp.int32)
    flat = jnp.sum(cells * strides, axis=-1)

    return TapGeometry(base=base, wt=wt, cells=cells, flat=flat, dist=dist)
