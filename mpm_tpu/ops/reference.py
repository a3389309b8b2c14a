"""Oracle simulation path: dense XLA scatter/gather, exact reference numerics.

This is the S1-equivalent "golden" implementation (SURVEY.md §4, §7 stage 1):
a direct, D-generic statement of the per-substep sequence

    ClearGrid -> P2G_1 -> P2G_2 -> UpdateGrid -> G2P

(MLSMPM2DFluid.cs:166-182, MLSMPM3DFluidMultithreadGPU.cs:505-544) using
`.at[].add` scatters for P2G and per-particle gathers for G2P. It is simple,
obviously correct, and serves as the correctness oracle for the binned fast
path and the Pallas kernels (the reference's own S1->S5 progression used the
same oracle pattern, SURVEY.md §4).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..core.params import FluidParams, SimConfig
from ..core.state import Grid, SimState, zero_grid
from . import fixed_point, stress
from . import transfer as transfer_contribs
from .grid import update_grid
from .interact import Interaction, apply_interactions
from .transfer import TapGeometry, tap_geometry


def _scatter_add(target: jax.Array, flat: jax.Array, contrib: jax.Array) -> jax.Array:
    """Scatter-add [N, T(, D)] contributions into the flattened grid."""
    n, t = flat.shape
    if contrib.ndim == 3:
        return target.reshape(-1, contrib.shape[-1]).at[flat.reshape(-1)].add(
            contrib.reshape(n * t, -1)
        ).reshape(target.shape)
    return (
        target.reshape(-1).at[flat.reshape(-1)].add(contrib.reshape(-1)).reshape(target.shape)
    )


def _encode_maybe(x, config: SimConfig):
    """Fixed-point mode encodes each tap contribution before accumulation,
    matching the reference's per-atomicAdd encode (p2g_1.glsl:87-90)."""
    if config.fixed_point:
        return fixed_point.encode(x, config.fixed_point_mult)
    return x


def p2g_1(state: SimState, grid: Grid, geom: TapGeometry, config: SimConfig) -> Grid:
    """Mass + APIC momentum scatter: m*w and m*w*(v + C d) per tap
    (p2g_1.glsl:56-93, MPM-course eq. 172)."""
    mass_c, mom_c = transfer_contribs.p2g1_contribs(state, geom)
    return Grid(
        mom=_scatter_add(grid.mom, geom.flat, _encode_maybe(mom_c, config)),
        mass=_scatter_add(grid.mass, geom.flat, _encode_maybe(mass_c, config)),
    )


def gather_density(state: SimState, grid: Grid, geom: TapGeometry, config: SimConfig):
    """Density estimate: sum of w * cell mass over the neighborhood
    (p2g_2.glsl:66-90)."""
    gmass = grid.mass.reshape(-1)[geom.flat]  # [N, T]
    if config.fixed_point:
        gmass = fixed_point.decode(gmass, config.fixed_point_mult, config.dtype)
    return jnp.sum(gmass * geom.wt, axis=-1)


def p2g_2(
    state: SimState,
    grid: Grid,
    geom: TapGeometry,
    config: SimConfig,
    fp: FluidParams,
) -> Grid:
    """EOS/viscosity force scatter (p2g_2.glsl:52-159)."""
    density = gather_density(state, grid, geom, config)
    eq16 = stress.fused_force_term(
        density, state.mass, state.C, fp, config.legacy_strain
    )  # [N, D, D]
    mom_c = transfer_contribs.p2g2_contribs(eq16, geom)
    return Grid(
        mom=_scatter_add(grid.mom, geom.flat, _encode_maybe(mom_c, config)),
        mass=grid.mass,
    )


def g2p(
    state: SimState,
    grid: Grid,
    geom: TapGeometry,
    config: SimConfig,
    fp: FluidParams,
    interactions: Sequence[Interaction] = (),
) -> SimState:
    """Velocity gather, APIC C rebuild, advection, clamps, interaction forces,
    predictive wall springs (g2p.glsl:52-152, MLSMPM2DFluid.cs:334-421)."""
    gvel = grid.mom.reshape(-1, config.dim)[geom.flat]  # [N, T, D]
    if config.fixed_point:
        gvel = fixed_point.decode(gvel, config.fixed_point_mult, config.dtype)

    wv = geom.wt[..., None] * gvel  # [N, T, D]
    vel = jnp.sum(wv, axis=1)
    # B = sum_t wv outer dist; C = 4 B (APIC, g2p.glsl:95-108)
    C = 4.0 * jnp.einsum("nti,ntj->nij", wv, geom.dist)

    pos = state.pos + vel * fp.dt

    res = jnp.asarray(config.grid_res, pos.dtype)
    pos = jnp.clip(pos, config.clamp_lo, res - config.clamp_hi_offset)

    vel = apply_interactions(pos, vel, interactions)

    # predictive wall spring: x_n = pos + vel (unscaled lookahead)
    x_n = pos + vel
    lo = config.wall_min
    hi = res - config.wall_max_offset
    vel = vel + config.wall_stiffness * (
        jnp.maximum(lo - x_n, 0.0) + jnp.minimum(hi - x_n, 0.0)
    )

    return SimState(pos=pos, vel=vel, C=C, mass=state.mass, ids=state.ids)


def substep(
    state: SimState,
    config: SimConfig,
    fp: FluidParams,
    interactions: Sequence[Interaction] = (),
) -> SimState:
    """One full substep of the normative algorithm."""
    geom = tap_geometry(state.pos, config)
    grid = zero_grid(config)
    grid = p2g_1(state, grid, geom, config)
    grid = p2g_2(state, grid, geom, config, fp)
    grid = update_grid(grid, config, fp)
    return g2p(state, grid, geom, config, fp, interactions)
