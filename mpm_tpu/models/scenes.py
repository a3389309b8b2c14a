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
    n_target: int,
    grid_res: tuple[int, int, int] | None = None,
    bin_capacity: int = 8,
) -> Scene:
    """Benchmark pool with UNIFORM per-cell packing: every fluid cell holds
    its hydrostatic-equilibrium particle count on a per-cell sub-lattice.

    Why not the reference's global lattice (spacing 0.6,
    MLSMPM3DFluidMultithreadGPU.cs:656-671): a global lattice's max
    cell occupancy runs ~2.6x its mean (alignment stacking), which forces
    bin_capacity 16 for a mean of ~5 — and every empty slot costs full DMA
    and VPU work in the bucket engine. Packing an integral number of
    particles per CELL (rotating low-discrepancy sub-positions, tiny
    deterministic jitter) makes max == mean, so K=8 suffices with ~2.2x
    fewer slots per particle. A stiffer, more water-like EOS
    (eos_stiffness 12 vs the reference's 1.0) keeps bottom-of-pool
    hydrostatic compression under 1.36x so compressed cells stay <= 8; the
    per-row counts follow the exact hydrostatic profile
    m(xi) = m0 * (1 + g*rho0*(H - xi)/k)^(1/gamma), so the pool starts at
    EOS equilibrium and settles with small ripples only. Occasional
    ripple-driven 9th-particle moves are deferred by overflow rejection
    (ops/bucketed.reject_overflow) — zero particle loss by construction."""
    m0 = 6  # rest particles/cell (= rest_density with unit mass)
    g, k_eos, gamma = 0.3, 12.0, 7.0
    rho0 = float(m0)
    if grid_res is None:
        # square footprint. Plane-shape sensitivity re-measured round 3 at
        # 1M (same cell count): (64,56,64) 6.82 ms/substep, z-wide
        # (32,56,128) 9.08, x-long (128,56,32) 10.94 — the square footprint
        # IS the optimum (wider planes stress VMEM rings; more planes pay
        # per-plane latency). A thin-x footprint "win" ((16,56,256) 4.80 ms)
        # was invalid: the 10-column pool doesn't fit the domain height and
        # loses particles.
        side = round((n_target / m0) ** (1.0 / 3.0))
        rx = rz = -((side + 6) // -16) * 16
    else:
        rx, rz = grid_res[0], grid_res[2]
    wx = rx - 6  # fluid columns occupy cells [3, r-3) per horizontal axis
    wz = rz - 6
    ncols = wx * wz
    height_rest = n_target / (m0 * ncols)  # rest-units column height H

    # per-cell-row counts on the exact hydrostatic profile, built bottom-up:
    # row r holds m_r = round(m0 * s(xi_r)), s(xi) = (1+g*rho0*(H-xi)/k)^(1/g)
    rows = []
    placed = 0
    xi = 0.0
    while placed < n_target:
        s = (1.0 + g * rho0 * max(height_rest - xi, 0.0) / k_eos) ** (1.0 / gamma)
        m_r = int(np.clip(round(m0 * s), 1, 8))
        take = min(m_r * ncols, n_target - placed)
        rows.append((m_r, take))
        placed += take
        xi += m_r / m0  # rest-height covered by this compressed row
    n_rows = len(rows)

    if grid_res is None:
        # NOTE (measured, lattice-era): sweeping the kernel grid along the
        # gravity axis was ~8x slower despite skipping air planes; keep
        # gravity on y with the x sweep across it. 8-aligned ry keeps plane
        # sizes 128-divisible.
        ry = -((n_rows + 11) // -8) * 8  # floor 3 + ~8 cells slosh headroom
        grid_res = (rx, ry, rz)
    else:
        # a pool taller than the domain crushes against the ceiling and
        # overflows buckets (observed: (16, 56, 256) at 1M lost 12,500
        # particles) — fail loudly instead
        assert n_rows + 6 <= grid_res[1], (
            f"benchmark pool needs ~{n_rows + 6} y-cells "
            f"(footprint {wx}x{wz}), grid_res[1]={grid_res[1]} is too short"
        )
    config = SimConfig(
        grid_res=grid_res,
        num_particles=n_target,
        substeps=2,
        clamp_lo=2.0,
        clamp_hi_offset=2.0,
        wall_min=3.0,
        wall_max_offset=3.0,
        wall_stiffness=1.0,
        bin_capacity=bin_capacity,
        # bf16 vel/C storage: round 3 measured it perf-NEUTRAL because the
        # kernels still carried f32 select rows; round 4's PACKED migration
        # (fused.py: vel+C as 6 bf16-pair int32 rows through the selects,
        # 17 -> 11 field rows) makes it a measured -15% (7.2 -> 6.1
        # ms/substep at 1M, wy=48). Positions stay f32; rounding happens
        # once per substep at the same point as the XLA engine's
        # round-at-store (bit-compatible, tests/test_fused.py) — the
        # TPU-native analogue of the reference quantizing its grid to
        # int32 1e-7 steps (MLSMPM3DFluidMultithreadGPU.cs:98).
        storage_dtype="bfloat16",
        eos_power_static=7.0,
    )
    # dt 0.05: the stiffer EOS raises the sound speed ~sqrt(k*gamma/rho0)
    # ~3.7 cells/time; dt*c must stay well under a cell (the bench metric is
    # particle-SUBSTEPS/s, so dt does not affect the score, only stability)
    fluid = FluidParams.create(
        dim=3, dt=0.05, rest_density=rho0, eos_stiffness=k_eos, eos_power=gamma
    )

    # placement: per cell, m_r points of a 2x2x2 sub-lattice (corners at
    # ±0.25), dropping 8-m_r corners in a per-cell rotating pattern, plus a
    # small deterministic jitter to de-phase ringing modes
    corners = np.stack(np.meshgrid(*([[0.25, 0.75]] * 3), indexing="ij"), -1)
    corners = corners.reshape(8, 3)
    cxs = 3.0 + np.arange(wx, dtype=np.float32)
    czs = 3.0 + np.arange(wz, dtype=np.float32)
    gx, gz = np.meshgrid(cxs, czs, indexing="ij")
    gx, gz = gx.reshape(-1), gz.reshape(-1)  # [ncols] cell corners
    rng = np.random.default_rng(12345)
    parts = []
    for r, (m_r, take) in enumerate(rows):
        nfull = take // m_r
        rot = (np.arange(ncols) * 3 + r * 5) % 8
        base = np.stack([gx, np.full_like(gx, 3.0 + r), gz], -1)  # [ncols, 3]
        sub = corners[(rot[:, None] + np.arange(m_r)[None, :]) % 8]  # [ncols, m_r, 3]
        pts = base[:, None, :] + sub  # [ncols, m_r, 3]
        pts = pts[:nfull].reshape(-1, 3)
        rem = take - nfull * m_r
        if rem:
            pts = np.concatenate([pts, (base[nfull] + sub[nfull])[:rem]])
        parts.append(pts)
    pos = np.concatenate(parts, axis=0).astype(np.float32)
    pos += rng.uniform(-0.04, 0.04, pos.shape).astype(np.float32)
    assert pos.shape[0] == config.num_particles
    return Scene(f"bench_{n_target}", config, fluid, make_state(pos))


SCENES = {
    "dam_break_2d": dam_break_2d,
    "fluid_2d_friction": fluid_2d_friction,
    "fluid_3d_cpu": fluid_3d_cpu,
    "fluid_3d_fixed_point": fluid_3d_fixed_point,
    "fluid_3d": fluid_3d,
}


def get_scene(name: str, **kw) -> Scene:
    return SCENES[name](**kw)


def benchmark_scene_2d(n_target: int = 100_000, grid_res: int = 256) -> Scene:
    """Config-2 ladder scene: 2D pool with friction walls at the BASELINE.md
    scale (100k particles, 256^2), uniform per-cell packing on the exact
    hydrostatic profile (same construction as the 3D benchmark scene; 2D
    gravity is +y screen-down so the pool rests at high y)."""
    m0 = 2
    g, k_eos, gamma = 0.3, 30.0, 4.0  # stiff: bottom compression 1.5x ->
    # max 3/cell, one slot of K=4 headroom (the whole 2D working set must
    # fit VMEM, so K is the lever; see kernels2d.supported2d)
    rho0 = float(m0)
    wcols = grid_res - 6  # x cells [3, res-3)
    height_rest = n_target / (m0 * wcols)

    rows = []
    placed = 0
    xi = 0.0
    while placed < n_target:
        s = (1.0 + g * rho0 * max(height_rest - xi, 0.0) / k_eos) ** (1.0 / gamma)
        m_r = int(np.clip(round(m0 * s), 1, 4))
        take = min(m_r * wcols, n_target - placed)
        rows.append((m_r, take))
        placed += take
        xi += m_r / m0

    config = SimConfig(
        grid_res=(grid_res, grid_res),
        num_particles=n_target,
        substeps=5,
        bc=BC_FRICTION,
        friction=0.5,
        bc_band_lo=2,
        bc_band_hi=3,
        clamp_lo=1.0,
        clamp_hi_offset=2.0,
        wall_min=2.0,
        wall_max_offset=3.0,
        wall_stiffness=0.5,
        legacy_strain=True,
        bin_capacity=4,
        eos_power_static=gamma,
    )
    fluid = FluidParams.create(
        dim=2, dt=0.05, gravity=(0.0, g), rest_density=rho0,
        eos_stiffness=k_eos, eos_power=gamma,
    )
    # sub-lattice per cell: m of 4 half-grid positions, rotating pattern
    corners = np.asarray(
        [[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]], np.float32
    )
    gx = 3.0 + np.arange(wcols, dtype=np.float32)
    rng = np.random.default_rng(777)
    parts = []
    y_floor = grid_res - 4  # pool builds upward (decreasing y) from here
    for r, (m_r, take) in enumerate(rows):
        nfull = take // m_r
        rot = (np.arange(wcols) * 3 + r * 5) % 4
        base = np.stack([gx, np.full_like(gx, y_floor - 1 - r)], -1)
        sub = corners[(rot[:, None] + np.arange(m_r)[None, :]) % 4]
        pts = (base[:, None, :] + sub)[:nfull].reshape(-1, 2)
        rem = take - nfull * m_r
        if rem:
            pts = np.concatenate([pts, (base[nfull] + sub[nfull])[:rem]])
        parts.append(pts)
    pos = np.concatenate(parts, axis=0).astype(np.float32)
    pos += rng.uniform(-0.04, 0.04, pos.shape).astype(np.float32)
    assert pos.shape[0] == n_target
    return Scene(f"bench2d_{n_target}", config, fluid, make_state(pos))


SCENES["bench2d"] = benchmark_scene_2d


def _bench3d(n_target: int = 1_000_000, **kw) -> Scene:
    return benchmark_scene(n_target, **kw)


SCENES["bench3d"] = _bench3d


def benchmark_dam_break(n_target: int = 1_000_000) -> Scene:
    """Dynamic churn benchmark: a tall dam column filling the left ~60% of x
    collapses across the domain — measured MID-COLLAPSE, when migration
    selects run hot on most planes (VERDICT r2: the settled-pool bench lets
    the zy-static/zero-mover gates fire; this scene measures the engine,
    not the gates). The reference's own visual scenario is exactly this kind
    of splashing fluid (main_3d scene, 32^3 box dropped into a 64^3 domain).

    Packing: same integral per-cell sub-lattice as benchmark_scene but at a
    uniform m0 = 5/cell (no hydrostatic profile — the column is NOT in
    equilibrium; that is the point). K = 8 leaves 3 slots/cell headroom for
    compression at the impact front; a stiff EOS (k=30) caps hydrostatic
    bottom compression of the settled end state at ~1.3x (6.5/cell < 8) so
    the scene never saturates bin capacity (zero loss; transient rejections
    surface in `deferred`)."""
    m0 = 5
    rx, rz = 64, 64
    wx = 37  # dam occupies x cells [3, 40): ~60% of the span
    wz = rz - 6
    ncols = wx * wz
    n_rows = -(-n_target // (m0 * ncols))  # ~93 rows for 1M
    ry = -((n_rows + 3 + 8) // -8) * 8  # floor 3 + splash headroom, 8-aligned
    config = SimConfig(
        grid_res=(rx, ry, rz),
        num_particles=n_target,
        substeps=2,
        clamp_lo=2.0,
        clamp_hi_offset=2.0,
        wall_min=3.0,
        wall_max_offset=3.0,
        wall_stiffness=1.0,
        bin_capacity=8,
        storage_dtype="bfloat16",  # packed-migration path (benchmark_scene)
        eos_power_static=7.0,
    )
    fluid = FluidParams.create(
        dim=3, dt=0.03, rest_density=float(m0), eos_stiffness=30.0,
        eos_power=7.0,
    )
    corners = np.stack(np.meshgrid(*([[0.25, 0.75]] * 3), indexing="ij"), -1)
    corners = corners.reshape(8, 3)
    cxs = 3.0 + np.arange(wx, dtype=np.float32)
    czs = 3.0 + np.arange(wz, dtype=np.float32)
    gx, gz = np.meshgrid(cxs, czs, indexing="ij")
    gx, gz = gx.reshape(-1), gz.reshape(-1)
    rng = np.random.default_rng(4242)
    parts = []
    placed = 0
    for r in range(n_rows):
        take = min(m0 * ncols, n_target - placed)
        nfull = take // m0
        rot = (np.arange(ncols) * 3 + r * 5) % 8
        base = np.stack([gx, np.full_like(gx, 3.0 + r), gz], -1)
        sub = corners[(rot[:, None] + np.arange(m0)[None, :]) % 8]
        pts = (base[:, None, :] + sub)[:nfull].reshape(-1, 3)
        rem = take - nfull * m0
        if rem:
            pts = np.concatenate([pts, (base[nfull] + sub[nfull])[:rem]])
        parts.append(pts)
        placed += take
        if placed >= n_target:
            break
    pos = np.concatenate(parts, axis=0).astype(np.float32)
    pos += rng.uniform(-0.04, 0.04, pos.shape).astype(np.float32)
    assert pos.shape[0] == n_target
    return Scene(f"dam_{n_target}", config, fluid, make_state(pos))


SCENES["bench3d_dam"] = benchmark_dam_break
SCENES["bench3d"] = benchmark_scene
SCENES["bench2d"] = benchmark_scene_2d
