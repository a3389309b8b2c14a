"""Grid momentum -> velocity update with gravity and boundary conditions.

Reference: update_grid.glsl:36-74 / MLSMPM2DFluid.cs:309-332. Pure dense
elementwise ops over the grid — XLA fuses the whole pass into the surrounding
kernels; nothing to hand-schedule (SURVEY.md §2.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.params import BC_FRICTION, BC_SLIP, BC_STICK, SimConfig, FluidParams
from ..core.state import Grid
from . import fixed_point


def _boundary_masks(config: SimConfig, dtype) -> jax.Array:
    """Per-axis boundary band indicator, broadcastable to the grid.

    Returns `band` of shape [*res, D] where band[..., a] == 1 inside the
    boundary band of axis a: index < bc_band_lo or index > res - 1 - bc_band_hi
    (reference `x < 2 || x > grid_size - 3`, update_grid.glsl:63-65).
    """
    res = config.grid_res
    dim = config.dim
    bands = []
    for a in range(dim):
        idx = jnp.arange(res[a])
        in_band = (idx < config.bc_band_lo) | (idx > res[a] - 1 - config.bc_band_hi)
        shape = [1] * dim
        shape[a] = res[a]
        bands.append(in_band.reshape(shape).astype(dtype) * jnp.ones(res, dtype))
    return jnp.stack(bands, axis=-1)


def update_grid(grid: Grid, config: SimConfig, fp: FluidParams) -> Grid:
    """momentum -> velocity, gravity, boundary conditions.

    After this pass `grid.mom` holds grid *velocities* (the reference reuses
    the same buffer, update_grid.glsl:44-56).
    """
    if config.fixed_point:
        mass = fixed_point.decode(grid.mass, config.fixed_point_mult, config.dtype)
        mom = fixed_point.decode(grid.mom, config.fixed_point_mult, config.dtype)
    else:
        mass, mom = grid.mass, grid.mom

    has_mass = mass > 0
    safe_mass = jnp.where(has_mass, mass, 1.0)
    vel = mom / safe_mass[..., None] + fp.dt * fp.gravity

    band = _boundary_masks(config, vel.dtype)  # [*res, D]
    if config.bc == BC_SLIP:
        # zero the normal component inside its axis band
        vel = vel * (1.0 - band)
    elif config.bc == BC_STICK:
        any_band = jnp.max(band, axis=-1, keepdims=True)
        vel = vel * (1.0 - any_band)
    elif config.bc == BC_FRICTION:
        # Reference slip+friction (MLSMPM2DFluidMultithread.cs:364-368):
        # inside axis-a band, the normal component is zeroed and the
        # tangential components are scaled by `friction`. Bands on multiple
        # axes compose multiplicatively (the reference applies them
        # sequentially per axis).
        for a in range(config.dim):
            b = band[..., a : a + 1]  # [*res, 1]
            normal = jnp.zeros((config.dim,), vel.dtype).at[a].set(1.0)
            scale = jnp.where(
                b > 0,
                (1.0 - normal) * config.friction + normal * 0.0,
                jnp.ones((config.dim,), vel.dtype),
            )
            vel = vel * scale
    else:
        raise ValueError(f"unknown bc flavor: {config.bc}")

    vel = jnp.where(has_mass[..., None], vel, 0.0)

    if config.fixed_point:
        vel = fixed_point.encode(vel, config.fixed_point_mult)
    return Grid(mom=vel, mass=grid.mass)
