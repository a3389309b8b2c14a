"""K-slot dense particle binning (reserved for windowed/Pallas kernels).

The production fast path (ops/binned.py) needs no capacity limit — it uses
sorted segment sums. This module packs particles into a fixed-capacity
[num_cells, K] slot layout, which Pallas kernels use to get static per-cell
working sets in VMEM. Built scatter-free: after the sort, slot occupancy is
derived with `searchsorted` and the pack is a pure gather.

Overflow policy: a cell holding more than K particles leaves the excess
unbinned (counted in `overflow`); `bin_capacity` is sized with ~3.5x headroom
over the reference's rest packing (SURVEY.md §2.1 row S5) and tests assert
overflow == 0 on all reference scenes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.params import SimConfig
from ..core.state import SimState
from . import transfer


class BinnedSlots(NamedTuple):
    """slot_particle[c, k] = index into the sorted particle arrays of the k-th
    particle of cell c, or N (guard) when the slot is empty."""

    slot_particle: jax.Array  # [num_cells, K] int32
    slot_valid: jax.Array  # [num_cells, K] bool
    count: jax.Array  # [num_cells] particles per cell
    overflow: jax.Array  # scalar int32


def bin_slots(seg_start: jax.Array, config: SimConfig, n: int) -> BinnedSlots:
    """Build the slot table from the sorted-path segment starts."""
    k = config.bin_capacity
    count = seg_start[1:] - seg_start[:-1]  # [num_cells]
    ks = jnp.arange(k, dtype=jnp.int32)
    idx = seg_start[:-1, None] + ks[None, :]
    valid = ks[None, :] < count[:, None]
    return BinnedSlots(
        slot_particle=jnp.where(valid, idx, n),
        slot_valid=valid,
        count=count,
        overflow=jnp.sum(jnp.maximum(count - k, 0)).astype(jnp.int32),
    )


def gather_slot_field(field: jax.Array, slots: BinnedSlots) -> jax.Array:
    """Pack a lane-major per-particle field [..., N] into [..., num_cells, K]
    (guard slots read 0)."""
    guard = jnp.zeros((*field.shape[:-1], 1), field.dtype)
    padded = jnp.concatenate([field, guard], axis=-1)
    return padded[..., slots.slot_particle]


def gather_slot_field_kc(field: jax.Array, slots: BinnedSlots) -> jax.Array:
    """Pack a lane-major per-particle field [..., N] directly into
    [..., K, num_cells] — the bucket-engine layout. NOT a transpose of
    gather_slot_field: gathering with [K, C] indices keeps the big axis
    minor, where a [..., C, K] intermediate pads K 8 -> 128 lanes under the
    TPU's T(8,128) tiling (16x memory: a 16M-particle from_simstate OOM'd
    on the padded [3,3,C,8] temp alone)."""
    guard = jnp.zeros((*field.shape[:-1], 1), field.dtype)
    padded = jnp.concatenate([field, guard], axis=-1)
    return padded[..., slots.slot_particle.T]
