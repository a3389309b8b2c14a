"""Grid momentum -> velocity update with gravity and boundary conditions.

Reference: update_grid.glsl:36-74 / MLSMPM2DFluid.cs:309-332. Pure dense
elementwise ops over the flat grid — XLA fuses the whole pass; nothing to
hand-schedule (SURVEY.md §2.4). Axis indices are derived from the flat cell
id exactly like the reference kernel (`x = i / gs / gs; y = i / gs % gs;
z = i % gs`, update_grid.glsl:61-63).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.params import BC_FRICTION, BC_SLIP, BC_STICK, SimConfig, FluidParams
from ..core.state import Grid
from . import fixed_point


def axis_indices(config: SimConfig) -> list[jax.Array]:
    """Per-axis cell index arrays, each [num_cells], from the flat id."""
    i = jnp.arange(config.num_cells, dtype=jnp.int32)
    out = []
    stride = config.num_cells
    for a in range(config.dim):
        stride //= config.grid_res[a]
        out.append((i // stride) % config.grid_res[a])
    return out


def boundary_bands(config: SimConfig) -> list[jax.Array]:
    """Per-axis boolean boundary-band masks, each [num_cells]: index <
    bc_band_lo or index > res - 1 - bc_band_hi (reference
    `x < 2 || x > grid_size - 3`, update_grid.glsl:63-65)."""
    idxs = axis_indices(config)
    return [
        (idxs[a] < config.bc_band_lo)
        | (idxs[a] > config.dres[a] - 1 - config.bc_band_hi)
        for a in range(config.dim)
    ]


def update_grid(grid: Grid, config: SimConfig, fp: FluidParams) -> Grid:
    """momentum -> velocity, gravity, boundary conditions. After this pass
    `grid.mom` holds grid *velocities* (the reference reuses the same buffer,
    update_grid.glsl:44-56)."""
    if config.fixed_point:
        mass = fixed_point.decode(grid.mass, config.fixed_point_mult, config.dtype)
        mom = fixed_point.decode(grid.mom, config.fixed_point_mult, config.dtype)
    else:
        mass, mom = grid.mass, grid.mom

    has_mass = mass > 0
    safe_mass = jnp.where(has_mass, mass, 1.0)
    vel = mom / safe_mass + fp.dt * fp.gravity[:, None]  # [D, num_cells]

    bands = boundary_bands(config)
    if config.bc == BC_SLIP:
        # zero the normal component inside its axis band
        vel = jnp.stack(
            [jnp.where(bands[a], 0.0, vel[a]) for a in range(config.dim)]
        )
    elif config.bc == BC_STICK:
        any_band = bands[0]
        for a in range(1, config.dim):
            any_band = any_band | bands[a]
        vel = jnp.where(any_band, 0.0, vel)
    elif config.bc == BC_FRICTION:
        # Reference slip+friction (MLSMPM2DFluidMultithread.cs:364-368):
        # inside axis-a band, the normal component is zeroed and the
        # tangential components are scaled by `friction`. Bands on multiple
        # axes compose multiplicatively (applied sequentially per axis).
        for a in range(config.dim):
            scale = jnp.where(bands[a], config.friction, 1.0)
            rows = []
            for i in range(config.dim):
                rows.append(
                    jnp.where(bands[a], 0.0, vel[i]) if i == a else vel[i] * scale
                )
            vel = jnp.stack(rows)
    else:
        raise ValueError(f"unknown bc flavor: {config.bc}")

    vel = jnp.where(has_mass, vel, 0.0)

    if config.fixed_point:
        vel = fixed_point.encode(vel, config.fixed_point_mult)
    return Grid(mom=vel, mass=grid.mass)
