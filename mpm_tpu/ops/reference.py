"""Oracle simulation path: dense XLA scatter/gather, exact reference numerics.

This is the S1-equivalent "golden" implementation (SURVEY.md §4, §7 stage 1):
a direct, D-generic statement of the per-substep sequence

    ClearGrid -> P2G_1 -> P2G_2 -> UpdateGrid -> G2P

(MLSMPM2DFluid.cs:166-182, MLSMPM3DFluidMultithreadGPU.cs:505-544) using
`.at[].add` scatters for P2G and per-particle gathers for G2P. It is simple,
obviously correct, and serves as the correctness oracle for the sorted fast
path and the Pallas kernels (the reference's own S1->S5 progression used the
same oracle pattern, SURVEY.md §4). Scatters are slow on TPU — run the oracle
on CPU; the fast path is ops/binned.py.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.params import FluidParams, SimConfig
from ..core.state import Grid, SimState, zero_grid
from . import bspline, fixed_point, stress, transfer
from .grid import update_grid
from .interact import Interaction, apply_interactions


def _encode_maybe(x, config: SimConfig):
    """Fixed-point mode encodes each tap contribution before accumulation,
    matching the reference's per-atomicAdd encode (p2g_1.glsl:87-90)."""
    if config.fixed_point:
        return fixed_point.encode(x, config.fixed_point_mult)
    return x


def _decode_maybe(x, config: SimConfig):
    if config.fixed_point:
        return fixed_point.decode(x, config.fixed_point_mult, config.dtype)
    return x


def p2g_1(
    state: SimState, grid: Grid, geom: transfer.TransferGeometry, config: SimConfig
) -> Grid:
    """Mass + APIC momentum scatter per tap (p2g_1.glsl:56-93)."""
    gmass, gmom = grid.mass, grid.mom
    for tap, off in zip(bspline.taps(config.dim), transfer.flat_tap_offsets(config)):
        mass_c, mom_c = transfer.p2g1_tap_contribs(state, geom.d, tap)
        idx = geom.flat_base + off
        gmass = gmass.at[idx].add(_encode_maybe(mass_c, config))
        gmom = gmom.at[:, idx].add(_encode_maybe(mom_c, config))
    return Grid(mom=gmom, mass=gmass)


def gather_density(
    state: SimState, grid: Grid, geom: transfer.TransferGeometry, config: SimConfig
) -> jax.Array:
    """Density estimate: sum of w * cell mass over the neighborhood
    (p2g_2.glsl:66-90). Returns [N]."""
    density = jnp.zeros_like(state.mass)
    for tap, off in zip(bspline.taps(config.dim), transfer.flat_tap_offsets(config)):
        w = bspline.tap_weight(geom.d, tap)
        gm = _decode_maybe(grid.mass[geom.flat_base + off], config)
        density = density + gm * w
    return density


def p2g_2(
    state: SimState,
    grid: Grid,
    geom: transfer.TransferGeometry,
    config: SimConfig,
    fp: FluidParams,
) -> Grid:
    """EOS/viscosity force scatter (p2g_2.glsl:52-159)."""
    density = gather_density(state, grid, geom, config)
    eq16 = stress.fused_force_term(
        density, state.mass, state.C, fp, config.legacy_strain
    )  # [D, D, N]
    gmom = grid.mom
    for tap, off in zip(bspline.taps(config.dim), transfer.flat_tap_offsets(config)):
        mom_c = transfer.p2g2_tap_contribs(eq16, geom.d, tap)
        gmom = gmom.at[:, geom.flat_base + off].add(_encode_maybe(mom_c, config))
    return Grid(mom=gmom, mass=grid.mass)


def g2p_gather(
    grid: Grid, geom: transfer.TransferGeometry, config: SimConfig
):
    """Velocity gather + APIC B matrix (g2p.glsl:73-108). Returns
    (vel [D, N], C [D, D, N])."""
    dim = config.dim
    n = geom.d.shape[-1]
    vel = jnp.zeros((dim, n), geom.d.dtype)
    B = jnp.zeros((dim, dim, n), geom.d.dtype)
    for tap, off in zip(bspline.taps(dim), transfer.flat_tap_offsets(config)):
        w = bspline.tap_weight(geom.d, tap)
        dist = bspline.tap_dist(geom.d, tap)
        gv = _decode_maybe(grid.mom[:, geom.flat_base + off], config)
        wv = w * gv  # [D, N]
        vel = vel + wv
        B = B + wv[:, None, :] * dist[None, :, :]
    return vel, 4.0 * B  # C = 4B (APIC, g2p.glsl:108)


def g2p_tail(
    state: SimState,
    vel: jax.Array,
    C: jax.Array,
    config: SimConfig,
    fp: FluidParams,
    interactions: Sequence[Interaction] = (),
) -> SimState:
    """Advection, clamps, interaction forces, predictive wall springs
    (g2p.glsl:110-147, MLSMPM2DFluid.cs:375-416)."""
    pos = state.pos + vel * fp.dt

    # per-axis python-float bounds (see transfer.geometry note)
    pos = jnp.stack(
        [
            jnp.clip(
                pos[a],
                config.clamp_lo,
                config.dres[a] - config.clamp_hi_offset,
            )
            for a in range(config.dim)
        ]
    )
    res = np.asarray(config.dres, np.float32).reshape(-1, 1)

    vel = apply_interactions(pos, vel, interactions)

    # predictive wall spring: x_n = pos + vel (unscaled lookahead)
    x_n = pos + vel
    lo = config.wall_min
    hi = res - config.wall_max_offset
    vel = vel + config.wall_stiffness * (
        jnp.maximum(lo - x_n, 0.0) + jnp.minimum(hi - x_n, 0.0)
    )

    return SimState(pos=pos, vel=vel, C=C, mass=state.mass, ids=state.ids)


def g2p(
    state: SimState,
    grid: Grid,
    geom: transfer.TransferGeometry,
    config: SimConfig,
    fp: FluidParams,
    interactions: Sequence[Interaction] = (),
) -> SimState:
    vel, C = g2p_gather(grid, geom, config)
    return g2p_tail(state, vel, C, config, fp, interactions)


def substep(
    state: SimState,
    config: SimConfig,
    fp: FluidParams,
    interactions: Sequence[Interaction] = (),
) -> SimState:
    """One full substep of the normative algorithm."""
    geom = transfer.geometry(state.pos, config)
    grid = zero_grid(config)
    grid = p2g_1(state, grid, geom, config)
    grid = p2g_2(state, grid, geom, config, fp)
    grid = update_grid(grid, config, fp)
    return g2p(state, grid, geom, config, fp, interactions)
