"""Standard scenes — the S1-S5 variant configurations of the reference
(SURVEY.md §2.1), expressed as (SimConfig, FluidParams, SimState) triples.

Each scene cites the reference file whose constants it reproduces. Unlike the
reference — where each variant is a separate 400-700 line implementation —
all scenes here run through the same engine; the variant differences are pure
configuration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.params import BC_FRICTION, BC_SLIP, FluidParams, SimConfig
from ..core.state import SimState, make_state
from .emitters import _axis_points, box_lattice


class Scene(NamedTuple):
    name: str
    config: SimConfig
    fluid: FluidParams
    state: SimState


def dam_break_2d(grid_res: int = 64, box: float = 32.0, spacing: float = 1.0) -> Scene:
    """S1 — 2D serial fluid (mls-mpm/2d/fluid/MLSMPM2DFluid.cs:22-40,126-141):
    64^2 grid, 32^2 box at spacing 1.0 -> 1,024 particles, dt 0.2,
    5 substeps/frame, eos_stiffness 10, eos_power 7, slip BC, gravity +y 0.3,
    clamp [1, res-2], wall_min 2 / stiffness 0.5."""
    pos = box_lattice((grid_res, grid_res), (box, box), spacing)
    config = SimConfig(
        grid_res=(grid_res, grid_res),
        num_particles=pos.shape[0],
        substeps=5,
        bc=BC_SLIP,
        bc_band_lo=2,
        bc_band_hi=2,
        clamp_lo=1.0,
        clamp_hi_offset=2.0,
        wall_min=2.0,
        wall_max_offset=3.0,  # wall_max = res - 1 - wall_min (MLSMPM2DFluid.cs:412)
        wall_stiffness=0.5,
        legacy_strain=True,
        bin_capacity=8,
    )
    fluid = FluidParams.create(
        dim=2, dt=0.2, gravity=(0.0, 0.3), eos_stiffness=10.0, eos_power=7.0
    )
    return Scene("dam_break_2d", config, fluid, make_state(pos))


def fluid_2d_friction(grid_res: int = 64, box: float = 32.0, spacing: float = 1.0) -> Scene:
    """S2 — 2D multithreaded variant
    (mls-mpm/2d/fluid_multithread/MLSMPM2DFluidMultithread.cs:24-42,354-368):
    same scene as S1 but eos_power 4 and slip+friction walls (friction 0.5,
    high band `x > res-4`)."""
    base = dam_break_2d(grid_res, box, spacing)
    config = base.config.replace(bc=BC_FRICTION, friction=0.5, bc_band_hi=3)
    fluid = base.fluid.replace(eos_power=4.0)
    return Scene("fluid_2d_friction", config, fluid, base.state)


def fluid_3d_cpu(grid_res: int = 32, box: float = 16.0, spacing: float = 0.5) -> Scene:
    """S3 — 3D multithreaded CPU variant
    (mls-mpm/3d/fluid_multithread/MLSMPM3DFluidMultithread.cs:22-40,133-158):
    32^3 grid, 16^3 box at spacing 0.5 -> 32,768 particles, 5 substeps,
    eos_stiffness 10, eos_power 4, gravity -y, clamp [1, res-2],
    wall_min 3 / wall_max res-4 / stiffness 1."""
    pos = box_lattice((grid_res,) * 3, (box,) * 3, spacing)
    config = SimConfig(
        grid_res=(grid_res,) * 3,
        num_particles=pos.shape[0],
        substeps=5,
        clamp_lo=1.0,
        clamp_hi_offset=2.0,
        wall_min=3.0,
        wall_max_offset=4.0,  # wall_max = grid_res - 4 (MLSMPM3DFluidMultithread.cs:581)
        wall_stiffness=1.0,
        bin_capacity=16,
    )
    fluid = FluidParams.create(dim=3, eos_stiffness=10.0, eos_power=4.0)
    return Scene("fluid_3d_cpu", config, fluid, make_state(pos))


def fluid_3d_fixed_point(grid_res: int = 32, box: float = 16.0, spacing: float = 1.0) -> Scene:
    """S4 — 3D fixed-point atomics variant
    (mls-mpm/3d/fluid_multithread_fixed_point/MLSMPM3DFluidMultithreadNew.cs:26-64):
    32^3 grid, 16^3 box at spacing 1.0 -> 4,096 particles, int32 grid with
    multiplier 1e7, sphere-collider interaction."""
    pos = box_lattice((grid_res,) * 3, (box,) * 3, spacing)
    config = SimConfig(
        grid_res=(grid_res,) * 3,
        num_particles=pos.shape[0],
        substeps=5,
        clamp_lo=1.0,
        clamp_hi_offset=2.0,
        wall_min=3.0,
        wall_max_offset=4.0,
        wall_stiffness=1.0,
        fixed_point=True,
        bin_capacity=8,
    )
    fluid = FluidParams.create(dim=3, eos_stiffness=10.0, eos_power=4.0)
    return Scene("fluid_3d_fixed_point", config, fluid, make_state(pos))


def fluid_3d(
    grid_res: int = 64,
    box: float = 32.0,
    spacing: float = 0.6,
    center: tuple[float, float, float] | None = None,
) -> Scene:
    """S5 — the flagship 3D GPU variant
    (mls-mpm/3d/fluid_multithread_gpu/MLSMPM3DFluidMultithreadGPU.cs:43-98,654-671):
    64^3 grid, 32^3 box at spacing 0.6 -> 157,464 particles, 2 substeps/frame,
    eos_stiffness 1, eos_power 7, clamp [2, res-2], wall_min 3 / stiffness 1."""
    pos = box_lattice((grid_res,) * 3, (box,) * 3, spacing, center=center)
    config = SimConfig(
        grid_res=(grid_res,) * 3,
        num_particles=pos.shape[0],
        substeps=2,
        clamp_lo=2.0,
        clamp_hi_offset=2.0,
        wall_min=3.0,
        wall_max_offset=3.0,  # wall_max = grid_size - wall_min (g2p.glsl:133)
        wall_stiffness=1.0,
        bin_capacity=16,
    )
    fluid = FluidParams.create(dim=3, eos_stiffness=1.0, eos_power=7.0)
    return Scene("fluid_3d", config, fluid, make_state(pos))


def benchmark_scene(
    n_target: int, grid_res: tuple[int, int, int] | None = None, bin_capacity: int = 16
) -> Scene:
    """Scaled flagship scene for benchmarking: a full-interior-width pool at
    the reference's rest packing (spacing 0.6,
    MLSMPM3DFluidMultithreadGPU.cs:656-671) resting on the floor. The pool
    spans the whole interior span in x/z, so settling is purely vertical
    hydrostatic compression — the sustained sloshing-pool regime — with no
    dam-break surge (whose pile-up would compress cells past any fixed K and
    overflow buckets). bin_capacity 16 covers the worst case: lattice cell
    alignment packs up to 8 particles/cell at rest, and bottom-of-pool
    hydrostatic density under the weak EOS is ~1.75x rest at this depth."""
    spacing = 0.6
    if grid_res is None:
        side = round(n_target ** (1.0 / 3.0)) * spacing  # cube side, cells
        rx = -((int(side) + 12) // -16) * 16  # >= 6-cell margin, 16-aligned
    else:
        rx = grid_res[0]
    width = rx - 6.0  # interior span: clamp_lo=2, walls at 3
    # one spacing of slack stays unpopulated so per-layer lattice offsets
    # (below) never push points outside the walls
    per_axis = int(np.ceil((width - spacing) / spacing - 1e-9))
    layers = -(n_target // -(per_axis * per_axis))
    depth = layers * spacing
    # compressed pool depth under the hydrostatic profile (see below): the
    # grid only needs the settled pool + slosh headroom, not the rest-density
    # column height
    g = 0.3
    k_eos, gamma, rho0 = 1.0, 7.0, 4.0
    xi_l = (np.arange(layers) + 0.5) * spacing
    s_l = (1.0 + g * rho0 * (depth - xi_l) / k_eos) ** (1.0 / gamma)
    depth_c = float(np.sum(spacing / s_l))
    if grid_res is None:
        # NOTE (measured): sweeping the kernel grid along the gravity axis
        # (grid (48, 80, 80), gravity on axis 0) was tried and is ~8x SLOWER
        # (272 ms vs 35 ms/substep) despite skipping air planes — wider
        # planes with stratified high-occupancy columns pessimize the fused
        # kernel. Keep gravity on y with the sweep across it; 8-aligned so
        # plane sizes stay 128-divisible.
        ry = -(int(depth_c + 11) // -8) * 8  # floor 3 + ~8 cells slosh headroom
        grid_res = (rx, ry, rx)
    config = SimConfig(
        grid_res=grid_res,
        num_particles=per_axis * per_axis * layers,
        substeps=2,
        clamp_lo=2.0,
        clamp_hi_offset=2.0,
        wall_min=3.0,
        wall_max_offset=3.0,
        wall_stiffness=1.0,
        bin_capacity=bin_capacity,
    )
    fluid = FluidParams.create(dim=3, eos_stiffness=1.0, eos_power=7.0)

    # hydrostatic vertical profile: an uncompressed column dropped on the
    # floor rings with a compression shock whose transient density exceeds
    # any fixed bucket capacity. Instead pre-compress the lattice to the
    # EOS equilibrium — p(xi) = g*rho0*(D - xi) exactly (xi = rest height,
    # since rho dy = rho0 dxi), so the local compression is
    # s(xi) = (1 + g*rho0*(D - xi)/k)^(1/gamma) — and let it settle with
    # small ripples only.
    dy = spacing / s_l
    y = (3.0 + np.concatenate([[0.0], np.cumsum(dy)])[:-1] + 0.5 * dy).astype(
        np.float32
    )
    # de-phase each layer's horizontal lattice (golden-ratio offsets): an
    # aligned lattice stacks up to 4 points/cell/axis at bottom compression,
    # i.e. 16/cell — exactly bin_capacity, so any ripple overflows. Offsetting
    # layers spreads cells to ~rho*1 (<= ~12/cell at the bottom).
    ax0 = 3.0 + (width - (per_axis - 1) * spacing) / 2.0 + spacing * np.arange(
        per_axis, dtype=np.float32
    )
    slack = (width - (per_axis - 1) * spacing - 1e-3) / 2.0
    parts = []
    for i in range(layers):
        ox = (i * 0.381966) % 1.0 * min(spacing, 2 * slack) - min(spacing / 2, slack)
        oz = (i * 0.618034) % 1.0 * min(spacing, 2 * slack) - min(spacing / 2, slack)
        gx, gz = np.meshgrid(ax0 + ox, ax0 + oz, indexing="ij")
        gy = np.full_like(gx, y[i])
        parts.append(np.stack([gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)], -1))
    pos = np.concatenate(parts, axis=0)
    assert pos.shape[0] == config.num_particles
    return Scene(f"bench_{n_target}", config, fluid, make_state(pos.astype(np.float32)))


SCENES = {
    "dam_break_2d": dam_break_2d,
    "fluid_2d_friction": fluid_2d_friction,
    "fluid_3d_cpu": fluid_3d_cpu,
    "fluid_3d_fixed_point": fluid_3d_fixed_point,
    "fluid_3d": fluid_3d,
}


def get_scene(name: str, **kw) -> Scene:
    return SCENES[name](**kw)
