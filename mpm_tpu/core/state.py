"""Simulation state pytrees — lane-major (particle-index-last) layout.

The reference keeps particle state as an 80-byte AoS struct
{pos, vel+mass, C} (mls-mpm/3d/fluid_multithread_gpu/MLSMPM3DFluidMultithreadGPU.cs:8-22,
compute_shaders/p2g_1.glsl:4-9) and grid state as 16-byte cells
{vel (3x int32 fixed-point), mass (int32)} (clear_grid.glsl:5-10).

TPU-native layout is structure-of-arrays with the LARGE index minor: TPU
tiles the last two axes to (8, 128) lanes, so a [N, 3] array pads 3 -> 128
(42x memory blowup measured at N=1M). All particle fields therefore put the
particle index LAST: pos [D, N], vel [D, N], C [D, D, N], mass [N]. The grid
is stored flat [num_cells] / [D, num_cells] for the same reason (a [64,64,64]
view would pad the minor 64 -> 128 lanes) and is a fresh value each substep
(the `clear_grid` kernel becomes "allocate zeros" / the reduction identity).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .params import SimConfig


class Grid(NamedTuple):
    """Dense background grid, flattened row-major. `mom` holds momentum during
    P2G and velocity after the grid update (the reference reuses one buffer
    the same way, update_grid.glsl:44-56)."""

    mom: jax.Array  # [D, num_cells] float, or int32 in fixed-point mode
    mass: jax.Array  # [num_cells]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SimState:
    """Particle state (SoA, lane-major). Arrays are ordered by the most recent
    spatial sort when produced by the fast path; `ids` carries the original
    emission index through sorts for trajectory-replay tests."""

    pos: jax.Array  # [D, N]
    vel: jax.Array  # [D, N]
    C: jax.Array  # [D, D, N] affine velocity field (APIC)
    mass: jax.Array  # [N]
    ids: jax.Array  # [N] int32

    @property
    def num_particles(self) -> int:
        return self.pos.shape[-1]

    @property
    def dim(self) -> int:
        return self.pos.shape[0]

    def permute(self, order: jax.Array) -> "SimState":
        return SimState(
            pos=self.pos[:, order],
            vel=self.vel[:, order],
            C=self.C[:, :, order],
            mass=self.mass[order],
            ids=self.ids[order],
        )

    def by_id(self) -> "SimState":
        """Return a copy re-ordered to original emission order."""
        return self.permute(jnp.argsort(self.ids))

    def pos_rows(self) -> jax.Array:
        """Positions as [N, D] (host/analysis convenience)."""
        return self.pos.T


def zero_grid(config: SimConfig) -> Grid:
    """The `clear_grid` pass (clear_grid.glsl:20-29), TPU-style: a fresh
    zeros value that XLA fuses into the first reduction."""
    dtype = jnp.int32 if config.fixed_point else config.dtype
    return Grid(
        mom=jnp.zeros((config.dim, config.num_cells), dtype),
        mass=jnp.zeros((config.num_cells,), dtype),
    )


def make_state(pos_rows, vel=None, C=None, mass=None, dtype=jnp.float32) -> SimState:
    """Build a state from [N, D] row-major positions (emitter output)."""
    pos = jnp.asarray(pos_rows, dtype).T  # -> [D, N]
    d, n = pos.shape
    return SimState(
        pos=pos,
        vel=jnp.zeros((d, n), dtype) if vel is None else jnp.asarray(vel, dtype).T,
        C=jnp.zeros((d, d, n), dtype) if C is None else jnp.asarray(C, dtype),
        mass=jnp.ones((n,), dtype) if mass is None else jnp.asarray(mass, dtype),
        ids=jnp.arange(n, dtype=jnp.int32),
    )
