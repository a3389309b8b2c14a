"""Sorted fast path: sort by cell id + scatter-free per-tap segment sums.

This is the TPU-native replacement for the reference's atomic P2G scatter
(p2g_1.glsl:87-90): particles are sorted by flattened cell id once per
substep; on a row-major grid each of the 3^D taps then scatters to
`cid + const_offset`, so the particles contributing to any grid cell form a
*contiguous range* of the sorted arrays. Each P2G pass then becomes 3^D
deterministic segment sums, computed scatter-free via blocked cumsums
(see ops/segsum.py) — no atomics, no races, no serial scatter lowering, and
bit-stable accumulation order (stronger determinism than the reference's
atomic float path; SURVEY.md §2.5). G2P stays particle-major: its gathers
use `cid + const` indices which are monotone after the sort.

Particle order: the returned state is in sorted order; `state.ids` tracks
original emission indices (use `SimState.by_id()` for trajectory replay).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..core.params import FluidParams, SimConfig
from ..core.state import Grid, SimState, zero_grid
from . import bspline, fixed_point, stress, transfer
from .grid import update_grid
from .interact import Interaction
from .reference import g2p, gather_density, _encode_maybe
from .segsum import segment_bounds_for_offset, sorted_segment_sum


def sort_by_cell(state: SimState, config: SimConfig):
    """Sort particles by flat cell id; also return the segment-start table
    seg_start[c] = index of first particle in cell c (searchsorted — a dense
    vectorized binary search, no scatter)."""
    geom_pre = transfer.geometry(state.pos, config)
    order = jnp.argsort(geom_pre.flat_base)  # stable -> deterministic
    state = state.permute(order)
    cid_s = geom_pre.flat_base[order]
    seg_start = jnp.searchsorted(
        cid_s, jnp.arange(config.num_cells + 1, dtype=cid_s.dtype)
    ).astype(jnp.int32)
    return state, seg_start


def _segsum_block(config: SimConfig) -> int:
    # int32 fixed-point cumsums must bound |block * mult * contrib| < 2^31
    return 128 if config.fixed_point else 1024


def p2g_pass1(
    state: SimState,
    geom: transfer.TransferGeometry,
    seg_start: jax.Array,
    config: SimConfig,
) -> Grid:
    """P2G pass 1 (p2g_1.glsl): mass + APIC momentum, scatter-free."""
    tap_offs = transfer.flat_tap_offsets(config)
    block = _segsum_block(config)
    grid0 = zero_grid(config)
    nc = config.num_cells

    gmass, gmom = grid0.mass, grid0.mom
    for tap, off in zip(bspline.taps(config.dim), tap_offs):
        mass_c, mom_c = transfer.p2g1_tap_contribs(state, geom.d, tap)
        s, e = segment_bounds_for_offset(seg_start, off, nc)
        gmass = gmass + sorted_segment_sum(
            _encode_maybe(mass_c, config), s, e, block=block
        )
        gmom = gmom + sorted_segment_sum(
            _encode_maybe(mom_c, config), s, e, block=block
        )
    return Grid(mom=gmom, mass=gmass)


def p2g_pass2(
    state: SimState,
    geom: transfer.TransferGeometry,
    seg_start: jax.Array,
    grid: Grid,
    config: SimConfig,
    fp: FluidParams,
) -> Grid:
    """P2G pass 2 (p2g_2.glsl): density gather + EOS/viscosity force scatter.
    `grid.mass` must already hold the COMPLETE neighborhood mass (in the
    sharded path that means after the halo reduce + fill)."""
    tap_offs = transfer.flat_tap_offsets(config)
    block = _segsum_block(config)
    nc = config.num_cells

    density = gather_density(state, grid, geom, config)
    eq16 = stress.fused_force_term(
        density, state.mass, state.C, fp, config.legacy_strain
    )
    gmom = grid.mom
    for tap, off in zip(bspline.taps(config.dim), tap_offs):
        mom_c = transfer.p2g2_tap_contribs(eq16, geom.d, tap)
        s, e = segment_bounds_for_offset(seg_start, off, nc)
        gmom = gmom + sorted_segment_sum(
            _encode_maybe(mom_c, config), s, e, block=block
        )
    return Grid(mom=gmom, mass=grid.mass)


def p2g(
    state: SimState,
    geom: transfer.TransferGeometry,
    seg_start: jax.Array,
    config: SimConfig,
    fp: FluidParams,
) -> Grid:
    """Both P2G passes (p2g_1.glsl + p2g_2.glsl), scatter-free."""
    grid = p2g_pass1(state, geom, seg_start, config)
    return p2g_pass2(state, geom, seg_start, grid, config, fp)


def substep(
    state: SimState,
    config: SimConfig,
    fp: FluidParams,
    interactions: Sequence[Interaction] = (),
) -> SimState:
    """One substep of the normative algorithm on the sorted fast path."""
    state, seg_start = sort_by_cell(state, config)
    geom = transfer.geometry(state.pos, config)
    grid = p2g(state, geom, seg_start, config, fp)
    grid = update_grid(grid, config, fp)
    return g2p(state, grid, geom, config, fp, interactions)
