"""Simulation state pytrees.

The reference keeps particle state as an 80-byte AoS struct
{pos, vel+mass, C} (mls-mpm/3d/fluid_multithread_gpu/MLSMPM3DFluidMultithreadGPU.cs:8-22,
compute_shaders/p2g_1.glsl:4-9) and grid state as 16-byte cells
{vel (3x int32 fixed-point), mass (int32)} (clear_grid.glsl:5-10).

TPU-native layout is structure-of-arrays: each field is a dense, statically
shaped array so XLA can tile it onto the VPU. The grid is a fresh value each
substep (the `clear_grid` kernel becomes "allocate zeros" / the segment-sum
identity), so only particle state is carried.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .params import SimConfig


class Grid(NamedTuple):
    """Dense background grid. `mom` holds momentum during P2G and velocity
    after the grid update (the reference reuses one buffer the same way,
    update_grid.glsl:44-56)."""

    mom: jax.Array  # [*res, D] float, or int32 in fixed-point mode
    mass: jax.Array  # [*res]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SimState:
    """Particle state (SoA). Arrays are ordered by the most recent spatial
    sort when produced by the binned fast path; `ids` carries the original
    emission index through sorts for trajectory-replay tests (the analogue of
    the reference's stable particle ordering)."""

    pos: jax.Array  # [N, D]
    vel: jax.Array  # [N, D]
    C: jax.Array  # [N, D, D] affine velocity field (APIC)
    mass: jax.Array  # [N]
    ids: jax.Array  # [N] int32

    @property
    def num_particles(self) -> int:
        return self.pos.shape[0]

    @property
    def dim(self) -> int:
        return self.pos.shape[1]

    def by_id(self) -> "SimState":
        """Return a copy re-ordered to original emission order."""
        order = jnp.argsort(self.ids)
        return SimState(
            pos=self.pos[order],
            vel=self.vel[order],
            C=self.C[order],
            mass=self.mass[order],
            ids=self.ids[order],
        )


def zero_grid(config: SimConfig) -> Grid:
    """The `clear_grid` pass (clear_grid.glsl:20-29), TPU-style: a fresh
    zeros value that XLA fuses into the first scatter/segment-sum."""
    if config.fixed_point:
        dtype = jnp.int32
    else:
        dtype = config.dtype
    return Grid(
        mom=jnp.zeros((*config.grid_res, config.dim), dtype),
        mass=jnp.zeros(config.grid_res, dtype),
    )


def make_state(pos, vel=None, C=None, mass=None, dtype=jnp.float32) -> SimState:
    pos = jnp.asarray(pos, dtype)
    n, d = pos.shape
    return SimState(
        pos=pos,
        vel=jnp.zeros((n, d), dtype) if vel is None else jnp.asarray(vel, dtype),
        C=jnp.zeros((n, d, d), dtype) if C is None else jnp.asarray(C, dtype),
        mass=jnp.ones((n,), dtype) if mass is None else jnp.asarray(mass, dtype),
        ids=jnp.arange(n, dtype=jnp.int32),
    )
