"""Sort-based particle binning — the TPU-native replacement for scatter atomics.

The reference resolves P2G write races with int32 `atomicAdd` (p2g_1.glsl:87-90)
or by serializing P2G (MLSMPM2DFluidMultithread.cs:218-329). TPUs have no
efficient scatter atomics; the idiomatic design (SURVEY.md §2.4, §7 stage 3)
turns the scatter into a *gather*: particles are sorted by cell id and packed
into a dense binned layout [*grid_res, K, ...] (K = bin_capacity), after which
every transfer pass is a sum over the 3^D shifted neighbor windows of that
dense array — pure, race-free, deterministic, and vectorizable on the VPU.

Overflow policy: a cell holding more than K particles drops the excess from
binning for that substep (they keep their state, deposit no mass, and are
counted in `overflow`). The EOS makes >3x compression dynamically unreachable
in the reference configurations, and `bin_capacity` is sized with ~3.5x
headroom; tests assert overflow == 0 on all reference scenes. The reference
has the same class of failure mode, harder: its fixed-point grid would
silently overflow int32 (SURVEY.md §2.1 quirks).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.params import SimConfig
from ..core.state import SimState
from . import bspline


class Binned(NamedTuple):
    """Particles packed by cell. `state` is the sorted linear view; `slot` maps
    each sorted particle to its flat position in the [num_cells * K] bin space
    (== num_cells * K for overflow particles)."""

    state: SimState  # sorted by cell id
    slot: jax.Array  # [N] int32
    valid: jax.Array  # [N] bool (False = overflow, not binned)
    pos: jax.Array  # [*res, K, D]
    vel: jax.Array  # [*res, K, D]
    C: jax.Array  # [*res, K, D, D]
    mass: jax.Array  # [*res, K]; 0 marks an empty slot
    overflow: jax.Array  # scalar int32


def cell_ids(pos: jax.Array, config: SimConfig) -> jax.Array:
    """Flat (row-major) cell id per particle."""
    base = bspline.base_cell(pos)
    res = jnp.asarray(config.grid_res, jnp.int32)
    base = jnp.clip(base, 0, res - 1)
    flat = base[:, 0]
    for a in range(1, config.dim):
        flat = flat * config.grid_res[a] + base[:, a]
    return flat


def _bin_field(field: jax.Array, slot: jax.Array, num_slots: int) -> jax.Array:
    """Pack a sorted per-particle field into flat bin space. Slots are unique
    by construction (cell id * K + rank); overflow slots point one past the
    end and are dropped."""
    trailing = field.shape[1:]
    out = jnp.zeros((num_slots, *trailing), field.dtype)
    return out.at[slot].set(field, mode="drop", unique_indices=True)


def bin_particles(state: SimState, config: SimConfig) -> Binned:
    n = state.num_particles
    k = config.bin_capacity
    num_slots = config.num_cells * k

    cid = cell_ids(state.pos, config)
    order = jnp.argsort(cid)  # stable -> deterministic accumulation order
    cid_s = cid[order]
    sorted_state = SimState(
        pos=state.pos[order],
        vel=state.vel[order],
        C=state.C[order],
        mass=state.mass[order],
        ids=state.ids[order],
    )

    # rank within cell: index minus index-of-first-particle-in-cell,
    # computed with a running max over segment starts (all dense ops).
    idx = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), cid_s[1:] != cid_s[:-1]])
    seg_start = jax.lax.cummax(jnp.where(first, idx, 0))
    rank = idx - seg_start

    valid = rank < k
    overflow = jnp.sum(~valid).astype(jnp.int32)
    slot = jnp.where(valid, cid_s * k + rank, num_slots)

    res = config.grid_res
    dim = config.dim
    return Binned(
        state=sorted_state,
        slot=slot,
        valid=valid,
        pos=_bin_field(sorted_state.pos, slot, num_slots).reshape(*res, k, dim),
        vel=_bin_field(sorted_state.vel, slot, num_slots).reshape(*res, k, dim),
        C=_bin_field(sorted_state.C, slot, num_slots).reshape(*res, k, dim, dim),
        mass=_bin_field(sorted_state.mass, slot, num_slots).reshape(*res, k),
        overflow=overflow,
    )


def unbin_field(
    binned_field: jax.Array, slot: jax.Array, grid_ndim: int
) -> jax.Array:
    """Gather a per-slot field back to sorted-linear particle order.

    binned_field: [*res, K, *trailing]; `grid_ndim` = len(res). Overflow slots
    (== num_slots) read a zero guard row appended at the end.
    """
    trailing = binned_field.shape[grid_ndim + 1 :]
    flat = binned_field.reshape(-1, *trailing)
    guard = jnp.zeros((1, *trailing), flat.dtype)
    flat = jnp.concatenate([flat, guard], axis=0)
    return flat[slot]
