"""Sorted fast path: sort by cell id + per-tap sorted segment-sums.

This is the TPU-native replacement for the reference's atomic P2G scatter
(p2g_1.glsl:87-90): particles are sorted by flattened cell id once per
substep, after which the scatter target of tap t is `cid + const_t` (the taps
of a row-major grid are constant flat offsets), i.e. *still sorted*. Each P2G
pass then becomes 3^D deterministic segment-sums with
`indices_are_sorted=True` — no atomics, no races, bit-stable accumulation
order (stronger determinism than the reference's atomic float path;
SURVEY.md §2.5).

The sort also gives G2P/density gathers monotone indices (better TPU gather
locality) and is the basis for particle migration in the sharded path
(SURVEY.md §5 "Long-context": shard id is a prefix of the cell key).

Particle order: the state returned is in sorted order; `state.ids` tracks
original emission indices (use `SimState.by_id()` for trajectory replay).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..core.params import FluidParams, SimConfig
from ..core.state import Grid, SimState, zero_grid
from . import fixed_point, stress
from . import transfer
from .binning import cell_ids
from .grid import update_grid
from .interact import Interaction
from .reference import g2p, gather_density


def sort_by_cell(state: SimState, config: SimConfig) -> SimState:
    cid = cell_ids(state.pos, config)
    order = jnp.argsort(cid)  # stable -> deterministic
    return SimState(
        pos=state.pos[order],
        vel=state.vel[order],
        C=state.C[order],
        mass=state.mass[order],
        ids=state.ids[order],
    )


def _segment_scatter(
    target_flat: jax.Array,  # [num_cells(, D)]
    flat_idx: jax.Array,  # [N, T] sorted along N for each fixed tap t
    contrib: jax.Array,  # [N, T(, D)]
    config: SimConfig,
) -> jax.Array:
    """Accumulate per-tap contributions with sorted segment-sums."""
    num_cells = config.num_cells
    t_count = flat_idx.shape[1]
    out = target_flat
    for t in range(t_count):
        c = contrib[:, t]
        if config.fixed_point:
            c = fixed_point.encode(c, config.fixed_point_mult)
        out = out + jax.ops.segment_sum(
            c, flat_idx[:, t], num_segments=num_cells, indices_are_sorted=True
        )
    return out


def p2g(
    state: SimState,
    geom: transfer.TapGeometry,
    config: SimConfig,
    fp: FluidParams,
) -> Grid:
    """Both P2G passes (p2g_1.glsl + p2g_2.glsl) using sorted segment-sums."""
    grid0 = zero_grid(config)
    mass_c, mom_c = transfer.p2g1_contribs(state, geom)
    gmass = _segment_scatter(grid0.mass.reshape(-1), geom.flat, mass_c, config)
    gmom = _segment_scatter(
        grid0.mom.reshape(-1, config.dim), geom.flat, mom_c, config
    )
    grid = Grid(
        mom=gmom.reshape(grid0.mom.shape), mass=gmass.reshape(grid0.mass.shape)
    )

    density = gather_density(state, grid, geom, config)
    eq16 = stress.fused_force_term(
        density, state.mass, state.C, fp, config.legacy_strain
    )
    mom2_c = transfer.p2g2_contribs(eq16, geom)
    gmom = _segment_scatter(
        grid.mom.reshape(-1, config.dim), geom.flat, mom2_c, config
    )
    return Grid(mom=gmom.reshape(grid0.mom.shape), mass=grid.mass)


def substep(
    state: SimState,
    config: SimConfig,
    fp: FluidParams,
    interactions: Sequence[Interaction] = (),
) -> SimState:
    """One substep of the normative algorithm on the sorted fast path."""
    state = sort_by_cell(state, config)
    geom = transfer.tap_geometry(state.pos, config)
    grid = p2g(state, geom, config, fp)
    grid = update_grid(grid, config, fp)
    return g2p(state, grid, geom, config, fp, interactions)
