"""Pallas TPU kernels for the bucket-state engine (3D).

Why kernels: the XLA windowed formulation (ops/bucketed.py) cannot express
cross-tap data reuse — profiled on a v5e, G2P spends 116 ms/substep
round-tripping its [3,3,K,C] APIC accumulator through HBM for each of the 27
taps, and P2G re-reads the full bucket state per tap. Here each kernel runs a
grid over (x-planes, K-slot blocks); the dense grid accumulator IS the
(VMEM-pinned, halo-padded) output block, per-plane bucket state is streamed
exactly once by the Pallas pipeline, and all 27 taps reuse it from VMEM.

Tap addressing: a tap (tx,ty,tz) decomposes into a plane offset dx = tx-1
(a dynamic but row-aligned leading index into the [X, pc+2H] accumulator —
Mosaic rejects unaligned dynamic vector offsets) and a STATIC intra-plane
offset oyz = (ty-1)*Z + (tz-1), applied as a static column slice into the
halo padding. Spill columns are structurally zero: the geometry clip keeps
every axis' edge planes/rows free of particles (ops/bucketed.py invariant).

Kernels (one substep = A -> B -> XLA combine + update_grid -> D -> XLA tail
-> migrate):
  A: P2G pass 1 (mass + APIC momentum)            p2g_1.glsl:56-93
  B: density gather + EOS/viscosity force         p2g_2.glsl:52-159
  D: G2P velocity gather + APIC C reconstruction  g2p.glsl:73-108

Migration runs in Pallas too (migrate_kernels.py, kernel E).

These per-pass kernels are now the FALLBACK path (perf-attribution knobs and
configs outside the fused kernels' envelope): production 3D substeps run the
fused kernels (p2g_fused.py kernel P + fused.py kernel F), 2D runs the
whole-grid kernel (kernels2d.py). Grid-size bound for this path: the
VMEM-resident grid accumulator gates at num_cells * 16 B <= 48 MB
(pallas_supported below, ~144^3); larger grids run through the sharded path
(parallel/domain.py) whose per-shard slabs obey the per-kernel bounds.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.params import FluidParams, SimConfig
from ...core.state import Grid
from .. import bspline
from ..bucketed import BucketState, migrate
from ..grid import update_grid
from ..interact import Interaction, apply_interactions

_TAPS3 = tuple(bspline.taps(3))


def _tap_parts(config: SimConfig):
    """Per tap: (dx plane offset, oyz static intra-plane flat offset)."""
    z = config.grid_res[2]
    return [((t[0] - 1), (t[1] - 1) * z + (t[2] - 1)) for t in _TAPS3]


def _halo(config: SimConfig) -> int:
    """Intra-plane halo columns: max |dy*Z + dz| = Z + 1."""
    return config.grid_res[2] + 1


def _plane_geometry(pos_blk, i, z, dtype):
    """d = pos - cell - 0.5 for the plane's buckets. pos_blk [3, kb, pc].
    `i` is the GLOBAL x-plane coordinate (an int or float scalar tracer —
    sharded callers pass x0 + t as a float)."""
    intra = jax.lax.broadcasted_iota(jnp.int32, pos_blk.shape[1:], 1)  # [kb, pc]
    cy = (intra // z).astype(dtype)
    cz = (intra % z).astype(dtype)
    cx = jnp.zeros_like(cy) + jnp.asarray(i).astype(dtype)
    return jnp.stack(
        [pos_blk[0] - cx - 0.5, pos_blk[1] - cy - 0.5, pos_blk[2] - cz - 0.5]
    )


def _tap_w_dist(d, tap):
    # per-axis scalar arithmetic only: Pallas kernels cannot capture array
    # constants, so dist is built from python floats instead of
    # bspline.tap_dist's numpy offset vector
    w = bspline.tap_weight(d, tap)
    dist = jnp.stack([float(tap[a] - 1) - d[a] for a in range(3)])
    return w, dist


def _weight_tables(d):
    """Shared per-axis weight/offset tables for a 27-tap loop: 9 axis
    weights + 9 wy*wz products once, so each tap costs ONE multiply
    (wx[tx] * wyz[ty][tz]) instead of re-evaluating three quadratics —
    explicit CSE the compiler is not trusted to find. Returns
    (wx[3], wyz[3][3], dists[axis][tap])."""
    wx = [bspline.axis_weight(i, d[0]) for i in range(3)]
    wy = [bspline.axis_weight(i, d[1]) for i in range(3)]
    wz = [bspline.axis_weight(i, d[2]) for i in range(3)]
    # product order (wx*wy)*wz matches bspline.tap_weight exactly, so the
    # XLA engines and these kernels round identically
    wxy = [[wx[i] * wy[j] for j in range(3)] for i in range(3)]
    dists = [[float(i - 1) - d[a] for i in range(3)] for a in range(3)]
    return wxy, wz, dists


# ------------------------------------------------------------- kernel A: P2G1


def _p2g1_kernel(
    pos_ref, vel_ref, C_ref, mass_ref, gmass_ref, gmom_ref, *, config: SimConfig
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nx = pl.num_programs(0)
    z = config.grid_res[2]
    pc = config.grid_res[1] * z
    h = _halo(config)
    dtype = pos_ref.dtype

    @pl.when((i == 0) & (j == 0))
    def _():
        gmass_ref[:] = jnp.zeros_like(gmass_ref)
        gmom_ref[:] = jnp.zeros_like(gmom_ref)

    mass = mass_ref[:]

    @pl.when(jnp.max(mass) > 0)  # skip tap work for empty (plane, K-block)s
    def _occupied():
        pos = pos_ref[:]
        vel = vel_ref[:]
        C = C_ref[:]
        occ = mass > 0
        d = _plane_geometry(pos, i, z, dtype)

        for tap, (dx, oyz) in zip(_TAPS3, _tap_parts(config)):
            w, dist = _tap_w_dist(d, tap)
            w = jnp.where(occ, w, 0.0)
            mass_c = w * mass  # [kb, pc]
            Cd = bspline.matvec(C, dist)
            mom_c = mass_c * (vel + Cd)  # [3, kb, pc]
            m_p = jnp.sum(mass_c, axis=0)  # [pc]
            mom_p = jnp.sum(mom_c, axis=1)  # [3, pc]
            p = i + dx
            lo = h + oyz  # static column offset into the halo padding

            @pl.when((p >= 0) & (p < nx))
            def _(p=p, m_p=m_p, mom_p=mom_p, lo=lo):
                gmass_ref[p, lo : lo + pc] += m_p
                gmom_ref[p, :, lo : lo + pc] += mom_p


# ------------------------------------------------ kernel B: density + P2G2


def _p2g2_kernel(
    pos_ref, C_ref, mass_ref, gmass_in_ref, scal_ref, gmom_ref,
    *, config: SimConfig, legacy_strain: bool
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nx = pl.num_programs(0)
    z = config.grid_res[2]
    pc = config.grid_res[1] * z
    h = _halo(config)
    dtype = pos_ref.dtype

    dt = scal_ref[0]
    rest_density = scal_ref[1]
    viscosity = scal_ref[2]
    stiffness = scal_ref[3]
    power = scal_ref[4]
    floor = scal_ref[5]

    @pl.when((i == 0) & (j == 0))
    def _():
        gmom_ref[:] = jnp.zeros_like(gmom_ref)

    mass = mass_ref[:]

    @pl.when(jnp.max(mass) > 0)  # skip tap work for empty (plane, K-block)s
    def _occupied():
        pos = pos_ref[:]
        C = C_ref[:]
        occ = mass > 0
        d = _plane_geometry(pos, i, z, dtype)

        # density gather (p2g_2.glsl:66-90); gmass_in is pre-padded [nx, pc+2h]
        density = jnp.zeros_like(mass)
        for tap, (dx, oyz) in zip(_TAPS3, _tap_parts(config)):
            w, _ = _tap_w_dist(d, tap)
            p = jnp.clip(i + dx, 0, nx - 1)
            lo = h + oyz
            plane = gmass_in_ref[p, lo : lo + pc]  # [pc] at bucket + oyz
            ok = ((i + dx) >= 0) & ((i + dx) < nx)
            gm = jnp.where(ok, plane, 0.0)
            density = density + w * gm[None, :]

        safe_density = jnp.where(occ, density, 1.0)
        volume = jnp.where(occ, mass / safe_density, 0.0)
        ratio = safe_density / rest_density
        pressure = jnp.maximum(floor, stiffness * (ratio**power - 1.0))
        coef = -4.0 * dt * volume
        a_p = coef * (-pressure)
        b_mu = coef * viscosity

        for tap, (dx, oyz) in zip(_TAPS3, _tap_parts(config)):
            w, dist = _tap_w_dist(d, tap)
            w = jnp.where(occ, w, 0.0)
            if legacy_strain:
                # 2D serial variant strain (MLSMPM2DFluid.cs:276-281)
                Ct = jnp.swapaxes(C, 0, 1)
                S = C + Ct
                S = S - jnp.stack(
                    [
                        jnp.stack(
                            [Ct[a, b] * (1.0 if a == b else 0.0) for b in range(3)]
                        )
                        for a in range(3)
                    ]
                )
                Sd = bspline.matvec(S, dist)
            else:
                Sd = bspline.matvec(C, dist) + bspline.matvec_t(C, dist)
            mom_c = w * (a_p * dist + b_mu * Sd)  # [3, kb, pc]
            mom_p = jnp.sum(mom_c, axis=1)  # [3, pc]
            p = i + dx
            lo = h + oyz

            @pl.when((p >= 0) & (p < nx))
            def _(p=p, mom_p=mom_p, lo=lo):
                gmom_ref[p, :, lo : lo + pc] += mom_p


# --------------------------------------------------------- kernel D: G2P


def _g2p_kernel(pos_ref, mass_ref, gvel_ref, vel_ref, C_ref, *, config: SimConfig):
    i = pl.program_id(0)
    nx = config.grid_res[0]
    z = config.grid_res[2]
    pc = config.grid_res[1] * z
    h = _halo(config)
    dtype = pos_ref.dtype

    pos = pos_ref[:]
    mass = mass_ref[:]
    occ = mass > 0
    d = _plane_geometry(pos, i, z, dtype)

    kb = pos.shape[1]
    vel = jnp.zeros((3, kb, pc), dtype)
    B = jnp.zeros((3, 3, kb, pc), dtype)
    for tap, (dx, oyz) in zip(_TAPS3, _tap_parts(config)):
        w, dist = _tap_w_dist(d, tap)
        p = jnp.clip(i + dx, 0, nx - 1)
        lo = h + oyz
        plane = gvel_ref[p, :, lo : lo + pc]  # [3, pc] at bucket + oyz
        ok = ((i + dx) >= 0) & ((i + dx) < nx)
        gv = jnp.where(ok, plane, 0.0)
        wv = w[None] * gv[:, None, :]  # [3, kb, pc]
        vel = vel + wv
        B = B + wv[:, None] * dist[None]

    occ3 = occ[None]
    vel_ref[:] = jnp.where(occ3, vel, 0.0)
    C_ref[:] = jnp.where(occ3[None], 4.0 * B, 0.0)


# --------------------------------------------------------------- dispatch


def pallas_supported(config: SimConfig) -> bool:
    """Mosaic block constraints: plane cells 128-divisible, K blockable into
    8-slot chunks (or whole), float 3D only, grid accumulator fits VMEM."""
    if config.dim != 3 or config.fixed_point:
        return False
    if config.storage_dtype != "float32":
        # the split kernels predate bf16 vel/C storage; the fused path
        # (fused.py + p2g_fused.py) handles it, the XLA engine is the
        # fallback otherwise
        return False
    pc = config.grid_res[1] * config.grid_res[2]
    # K is blockable when divisible into 8-slot chunks, or used whole
    # (full-array block dims are exempt from the 8-divisibility rule)
    return pc % 128 == 0 and config.num_cells * 16 <= 48 * 2**20


def _k_split(k: int) -> int:
    """K-slot blocking factor; blocks must be 8-divisible or the whole K."""
    if k % 8 == 0 and k > 8:
        return k // 8
    return 1


def _plane_k_spec(lead, kb, pc, k_axis):
    """Block = (one x-plane, one K-slot block) of a [..., K, C] array."""

    def index(i, j):
        idx = [0] * (len(lead) + 2)
        idx[k_axis] = j
        idx[-1] = i
        return tuple(idx)

    return pl.BlockSpec((*lead, kb, pc), index, memory_space=pltpu.VMEM)


def _fixed_spec2(shape, memory_space=pltpu.VMEM):
    ndim = len(shape)
    return pl.BlockSpec(shape, lambda i, j: (0,) * ndim, memory_space=memory_space)


@functools.partial(jax.jit, static_argnames=("config", "skip_p2g2", "interpret"))
def p2g_pallas(
    state: BucketState, config: SimConfig, fp: FluidParams,
    skip_p2g2: bool = False, interpret: bool = False
) -> Grid:
    dim, k, c = state.pos.shape
    nx = config.grid_res[0]
    pc = c // nx
    h = _halo(config)
    dtype = state.pos.dtype
    ks = _k_split(k)
    kb = k // ks

    gmass_p, gmom_p = pl.pallas_call(
        functools.partial(_p2g1_kernel, config=config),
        grid=(nx, ks),
        in_specs=[
            _plane_k_spec((3,), kb, pc, 1),
            _plane_k_spec((3,), kb, pc, 1),
            _plane_k_spec((3, 3), kb, pc, 2),
            _plane_k_spec((), kb, pc, 0),
        ],
        out_specs=(
            _fixed_spec2((nx, pc + 2 * h)),
            _fixed_spec2((nx, 3, pc + 2 * h)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nx, pc + 2 * h), dtype),
            jax.ShapeDtypeStruct((nx, 3, pc + 2 * h), dtype),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(state.pos, state.vel, state.C, state.mass)

    if skip_p2g2:  # perf attribution: mass/APIC momentum only, no EOS force
        gmass = gmass_p[:, h : h + pc].reshape(c)
        gmom = jnp.swapaxes(gmom_p[:, :, h : h + pc], 0, 1).reshape(3, c)
        return Grid(mom=gmom, mass=gmass)

    scals = jnp.stack(
        [
            jnp.asarray(fp.dt, dtype),
            jnp.asarray(fp.rest_density, dtype),
            jnp.asarray(fp.dynamic_viscosity, dtype),
            jnp.asarray(fp.eos_stiffness, dtype),
            jnp.asarray(fp.eos_power, dtype),
            jnp.asarray(fp.pressure_floor, dtype),
        ]
    )
    (gmom2_p,) = pl.pallas_call(
        functools.partial(
            _p2g2_kernel, config=config, legacy_strain=config.legacy_strain
        ),
        grid=(nx, ks),
        in_specs=[
            _plane_k_spec((3,), kb, pc, 1),
            _plane_k_spec((3, 3), kb, pc, 2),
            _plane_k_spec((), kb, pc, 0),
            _fixed_spec2((nx, pc + 2 * h)),
            _fixed_spec2((6,), pltpu.SMEM),
        ],
        out_specs=(_fixed_spec2((nx, 3, pc + 2 * h)),),
        out_shape=(jax.ShapeDtypeStruct((nx, 3, pc + 2 * h), dtype),),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(state.pos, state.C, state.mass, gmass_p, scals)

    gmass = gmass_p[:, h : h + pc].reshape(c)
    gmom = jnp.swapaxes(
        gmom_p[:, :, h : h + pc] + gmom2_p[:, :, h : h + pc], 0, 1
    ).reshape(3, c)
    return Grid(mom=gmom, mass=gmass)


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def g2p_pallas(
    state: BucketState, grid: Grid, config: SimConfig, interpret: bool = False
):
    dim, k, c = state.pos.shape
    nx = config.grid_res[0]
    pc = c // nx
    h = _halo(config)
    dtype = state.pos.dtype
    ks = _k_split(k)
    kb = k // ks

    gvel = jnp.swapaxes(grid.mom.reshape(3, nx, pc), 0, 1)  # [nx, 3, pc]
    gvel = jnp.pad(gvel, ((0, 0), (0, 0), (h, h)))
    vel, C = pl.pallas_call(
        functools.partial(_g2p_kernel, config=config),
        grid=(nx, ks),
        in_specs=[
            _plane_k_spec((3,), kb, pc, 1),
            _plane_k_spec((), kb, pc, 0),
            _fixed_spec2((nx, 3, pc + 2 * h)),
        ],
        out_specs=(
            _plane_k_spec((3,), kb, pc, 1),
            _plane_k_spec((3, 3), kb, pc, 2),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, k, c), dtype),
            jax.ShapeDtypeStruct((3, 3, k, c), dtype),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(state.pos, state.mass, gvel)
    return vel, C


def substep(
    state: BucketState,
    config: SimConfig,
    fp: FluidParams,
    interactions: Sequence[Interaction] = (),
    interpret: bool = False,
) -> BucketState:
    """Full bucket substep with Pallas transfer kernels (3D, float mode).

    Falls back to the XLA bucketed path for 2D or fixed-point configs."""
    if not pallas_supported(config):
        from .. import bucketed as _b

        return _b.substep(state, config, fp, interactions)

    from ..bucketed import cell_coords

    grid = p2g_pallas(state, config, fp, interpret=interpret)
    grid = update_grid(grid, config, fp)
    vel, C = g2p_pallas(state, grid, config, interpret=interpret)

    # tail: advection, clamps, interactions, wall springs (XLA elementwise;
    # identical to ops/bucketed.g2p_bucketed's tail)
    from ..bucketed import CFL_EPS

    occ = state.mass > 0
    pos = state.pos + vel * fp.dt
    res = np.asarray(config.dres, np.float32).reshape(-1, 1, 1)
    pos = jnp.clip(pos, config.clamp_lo, res - config.clamp_hi_offset)
    vel = apply_interactions(pos, vel, interactions)
    x_n = pos + vel
    vel = vel + config.wall_stiffness * (
        jnp.maximum(config.wall_min - x_n, 0.0)
        + jnp.minimum((res - config.wall_max_offset) - x_n, 0.0)
    )
    center = cell_coords(config, pos.dtype) + 0.5
    cell = center[:, None, :] - 0.5
    pos_cfl = jnp.clip(pos, cell - 1.0, cell + 2.0 - CFL_EPS)
    moved = occ & jnp.any(pos_cfl != pos, axis=0)
    pos = pos_cfl
    pos = jnp.where(occ, pos, center[:, None, :])
    vel = jnp.where(occ, vel, 0.0)
    C = jnp.where(occ, C, 0.0)
    state = BucketState(
        pos=pos,
        vel=vel,
        C=C,
        mass=state.mass,
        ids=state.ids,
        lost=state.lost,
        cfl_clamped=state.cfl_clamped + jnp.sum(moved.astype(jnp.int32)),
        deferred=state.deferred,
        ceiling=state.ceiling,
    )
    from .migrate_kernels import migrate_pallas

    return migrate_pallas(state, config, interpret=interpret)
