"""Fused 2D substep kernel: the ENTIRE 2D grid in VMEM, one sweep.

A 256^2 grid's full bucket state is ~21 MB at K=8 — it fits VMEM whole, so
the 2D production path needs no plane pipeline at all: ONE kernel invocation
runs P2G pass 1 + density/EOS pass 2 + grid update + G2P + advection tail +
both axis-split migration phases (with overflow rejection) against
VMEM-resident arrays. This replaces the XLA bucketed fallback the 2D scenes
previously ran (~15 ms/substep at 100k/256^2 — VERDICT r1 weak #8).

Numerics are identical to ops/bucketed.substep for dim == 2 (same tap order,
same (wx*wy) weight products, same candidate order and rejection formulas) —
slot-for-slot equality is tested in tests/test_kernels2d.py.

Reference parity: the 2D serial variant's full substep
(MLSMPM2DFluid.cs:166-421) incl. the legacy strain form and mouse repulsion.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.params import BC_FRICTION, BC_SLIP, BC_STICK, FluidParams, SimConfig
from ..bucketed import CFL_EPS as _CFL_EPS
from ..bucketed import BucketState
from ..stress import pow_static
from .. import bspline
from .fused import _gated_select, _running_rank
from .migrate_kernels import _INT_SENTINEL, _rank_and_masks, _shift_cols

_TAPS2 = tuple(bspline.taps(2))


def _halo2(config: SimConfig) -> int:
    """Padding: the axis-0 rejection shift reaches 2*res1; 128-aligned."""
    return ((2 * config.grid_res[1] + 127) // 128) * 128


def _coords2(config: SimConfig, k: int, pc: int, dtype):
    res1 = config.grid_res[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (k, pc), 1)
    return (idx // res1).astype(dtype), (idx % res1).astype(dtype)


def _sim2d_kernel(
    pos_ref, vel_ref, C_ref, mass_ref, scal_ref,
    pos_o, vel_o, C_o, clamp_ref,
    gmass, gmom,
    *, config: SimConfig, n_inter: int,
):
    """P2G x2 + grid update + G2P + advection tail (everything except
    migration), whole 2D grid VMEM-resident."""
    res0, res1 = config.grid_res
    pc = res0 * res1
    k = mass_ref.shape[1]
    hm = _halo2(config)
    dtype = jnp.float32

    dt = scal_ref[0]
    rest_density = scal_ref[1]
    viscosity = scal_ref[2]
    stiffness = scal_ref[3]
    power = scal_ref[4]
    floor = scal_ref[5]

    clamp_ref[0, 0] = 0
    gmass[:] = jnp.zeros_like(gmass)
    gmom[:] = jnp.zeros_like(gmom)

    pos = pos_ref[0]  # [2, K, pc]
    velp = vel_ref[0].astype(dtype)
    C4 = C_ref[0].astype(dtype)  # [4, K, pc] row-major 2x2
    mass = mass_ref[0]
    cx, cy = _coords2(config, k, pc, dtype)
    d = jnp.stack([pos[0] - cx - 0.5, pos[1] - cy - 0.5])

    wx = [bspline.axis_weight(i, d[0]) for i in range(2 + 1)]
    wy = [bspline.axis_weight(i, d[1]) for i in range(3)]
    dists = [[float(i - 1) - d[a] for i in range(3)] for a in range(2)]

    def tap_off(tap):
        return (tap[0] - 1) * res1 + (tap[1] - 1)

    # ---- P2G pass 1 (MLSMPM2DFluid.cs:199-258) ----
    for tap in _TAPS2:
        w = wx[tap[0]] * wy[tap[1]]
        dist = [dists[a][tap[a]] for a in range(2)]
        mass_c = w * mass
        Cd = [C4[2 * i] * dist[0] + C4[2 * i + 1] * dist[1] for i in range(2)]
        lo = hm + tap_off(tap)
        gmass[0, lo : lo + pc] += jnp.sum(mass_c, axis=0)
        for i in range(2):
            gmom[i, lo : lo + pc] += jnp.sum(mass_c * (velp[i] + Cd[i]), axis=0)

    # ---- density gather + EOS + P2G pass 2 (MLSMPM2DFluid.cs:260-300) ----
    occ = mass > 0
    density = jnp.zeros_like(mass)
    for tap in _TAPS2:
        w = wx[tap[0]] * wy[tap[1]]
        lo = hm + tap_off(tap)
        density = density + w * gmass[0, lo : lo + pc][None, :]
    safe_density = jnp.where(occ, density, 1.0)
    volume = jnp.where(occ, mass / safe_density, 0.0)
    ratio = safe_density / rest_density
    if config.eos_power_static:
        rp = pow_static(ratio, config.eos_power_static)
    else:
        rp = ratio**power
    pressure = jnp.maximum(floor, stiffness * (rp - 1.0))
    coef = -4.0 * dt * volume
    a_p = coef * (-pressure)
    b_mu = coef * viscosity

    for tap in _TAPS2:
        w = wx[tap[0]] * wy[tap[1]]
        dist = [dists[a][tap[a]] for a in range(2)]
        mv = [C4[2 * i] * dist[0] + C4[2 * i + 1] * dist[1] for i in range(2)]
        mvt = [C4[i] * dist[0] + C4[2 + i] * dist[1] for i in range(2)]
        Sd = [mv[i] + mvt[i] for i in range(2)]
        if config.legacy_strain:
            diag = [C4[0], C4[3]]
            Sd = [Sd[i] - diag[i] * dist[i] for i in range(2)]
        lo = hm + tap_off(tap)
        for i in range(2):
            gmom[i, lo : lo + pc] += jnp.sum(
                w * (a_p * dist[i] + b_mu * Sd[i]), axis=0
            )

    # ---- grid update (MLSMPM2DFluid.cs:309-332) ----
    gm_c = gmass[0, hm : hm + pc]  # [pc]
    has = gm_c > 0
    safe = jnp.where(has, gm_c, 1.0)
    idx1 = jax.lax.broadcasted_iota(jnp.int32, (1, pc), 1)
    gx_i = idx1 // res1
    gy_i = idx1 % res1
    lo_b, hi_b = config.bc_band_lo, config.bc_band_hi
    bands = [
        (gx_i < lo_b) | (gx_i > config.dres[0] - 1 - hi_b),
        (gy_i < lo_b) | (gy_i > config.dres[1] - 1 - hi_b),
    ]
    gvel_rows = []
    for i in range(2):
        v = (gmom[i, hm : hm + pc] / safe + dt * scal_ref[6 + i])[None, :]
        if config.bc == BC_SLIP:
            v = jnp.where(bands[i], 0.0, v)
        elif config.bc == BC_STICK:
            v = jnp.where(bands[0] | bands[1], 0.0, v)
        elif config.bc == BC_FRICTION:
            for a in range(2):
                if a == i:
                    v = jnp.where(bands[a], 0.0, v)
                else:
                    v = v * jnp.where(bands[a], config.friction, 1.0)
        else:
            raise ValueError(f"unknown bc flavor: {config.bc}")
        v = jnp.where(has[None, :], v, 0.0)
        gvel_rows.append(v)
        gmom[i, hm : hm + pc] = v[0]

    # ---- G2P + tail (MLSMPM2DFluid.cs:335-421) ----
    vel = [jnp.zeros((k, pc), dtype) for _ in range(2)]
    B = [jnp.zeros((k, pc), dtype) for _ in range(4)]
    for tap in _TAPS2:
        w = wx[tap[0]] * wy[tap[1]]
        dist = [dists[a][tap[a]] for a in range(2)]
        lo = hm + tap_off(tap)
        for i in range(2):
            gv = gmom[i, lo : lo + pc][None, :]
            wv = w * gv
            vel[i] = vel[i] + wv
            for j in range(2):
                B[2 * i + j] = B[2 * i + j] + wv * dist[j]
    vel = [jnp.where(occ, v, 0.0) for v in vel]
    C4n = [jnp.where(occ, 4.0 * b, 0.0) for b in B]

    resf = [float(r) for r in config.dres]
    p_new = [
        jnp.clip(pos[a] + vel[a] * dt, config.clamp_lo,
                 resf[a] - config.clamp_hi_offset)
        for a in range(2)
    ]
    for j in range(n_inter):
        base = 8 + 6 * j
        icx, icy = scal_ref[base], scal_ref[base + 1]
        radius = scal_ref[base + 2]
        strength = scal_ref[base + 3]
        inv_falloff = scal_ref[base + 4]
        active = scal_ref[base + 5]
        dvx, dvy = p_new[0] - icx, p_new[1] - icy
        r2 = dvx * dvx + dvy * dvy
        inside = (r2 < radius * radius) & (active > 0)
        norm = jnp.sqrt(r2)
        safe_n = jnp.where(norm > 0, norm, 1.0)
        falloff = 1.0 + inv_falloff * (radius / safe_n - 1.0)
        fx = dvx / safe_n * (strength * falloff)
        fy = dvy / safe_n * (strength * falloff)
        okf = inside & (norm > 0) & jnp.isfinite(fx) & jnp.isfinite(fy)
        vel[0] = vel[0] + jnp.where(okf, fx, 0.0)
        vel[1] = vel[1] + jnp.where(okf, fy, 0.0)
    for a in range(2):
        x_n = p_new[a] + vel[a]
        vel[a] = vel[a] + config.wall_stiffness * (
            jnp.maximum(config.wall_min - x_n, 0.0)
            + jnp.minimum((resf[a] - config.wall_max_offset) - x_n, 0.0)
        )

    cell = [cx, cy]
    moved = jnp.zeros((k, pc), jnp.bool_)
    for a in range(2):
        clamped = jnp.clip(p_new[a], cell[a] - 1.0, cell[a] + 2.0 - _CFL_EPS)
        moved = moved | (clamped != p_new[a])
        p_new[a] = clamped
    clamp_ref[0, 0] += jnp.sum((occ & moved).astype(jnp.int32))
    center = [cx + 0.5, cy + 0.5]
    p_new = [jnp.where(occ, p_new[a], center[a]) for a in range(2)]
    vel = [jnp.where(occ, v, 0.0) for v in vel]
    C4n = [jnp.where(occ, c, 0.0) for c in C4n]

    for a in range(2):
        pos_o[0, a] = p_new[a]
        vel_o[0, a] = vel[a]
    for i in range(4):
        C_o[0, i] = C4n[i]


def _migrate2d_kernel(
    pos_ref, vel_ref, C_ref, mass_ref, ids_ref,
    pos_o, vel_o, C_o, mass_o, ids_o, lost_ref, defer_ref,
    tA_pos, tA_vel, tA_C, tA_mass, tA_ids,
    tB_pos, tB_vel, tB_C, tB_mass, tB_ids,
    *, config: SimConfig,
):
    """Both axis-split migration phases with overflow rejection
    (ops/bucketed.reject_overflow semantics), whole grid VMEM-resident."""
    res0, res1 = config.grid_res
    pc = res0 * res1
    k = mass_ref.shape[1]
    hm = _halo2(config)
    dtype = jnp.float32

    lost_ref[0, 0] = 0
    defer_ref[0, 0] = 0
    for ref in (tA_pos, tA_vel, tA_C, tA_mass, tA_ids,
                tB_pos, tB_vel, tB_C, tB_mass, tB_ids):
        ref[:] = jnp.zeros_like(ref)

    cx, cy = _coords2(config, k, pc, dtype)
    tA_pos[0, :, hm : hm + pc] = pos_ref[0, 0]
    tA_pos[1, :, hm : hm + pc] = pos_ref[0, 1]
    tA_vel[0, :, hm : hm + pc] = vel_ref[0, 0]
    tA_vel[1, :, hm : hm + pc] = vel_ref[0, 1]
    for i in range(4):
        tA_C[i, :, hm : hm + pc] = C_ref[0, i]
    tA_mass[:, hm : hm + pc] = mass_ref[0]
    tA_ids[:, hm : hm + pc] = ids_ref[0]

    def axis_phase(src_refs, axis, stride, coord, write_out, bulk_out,
                   zero_all):
        pos_all = src_refs["pos"][:]
        mass_all = src_refs["mass"][:]
        occ_all = mass_all > 0
        pad_coord_i = jax.lax.broadcasted_iota(
            jnp.int32, mass_all.shape, 1
        ) - hm
        if axis == 0:
            coord_all = (pad_coord_i // res1).astype(dtype)
            # halo columns sit "before" cell 0: their quotient must not
            # collide with real cells; occ is false there so delta is 0
        else:
            coord_all = jnp.where(
                pad_coord_i < 0, -1, pad_coord_i % res1
            ).astype(dtype)
        delta_all = jnp.where(
            occ_all,
            jnp.clip(jnp.floor(pos_all[axis]) - coord_all, -1.0, 1.0),
            0.0,
        )

        # rejection (conservative-capacity; see bucketed.reject_overflow)
        occ0 = jnp.sum(occ_all.astype(jnp.int32), axis=0)
        movr = occ_all & (delta_all == 1.0)
        movl = occ_all & (delta_all == -1.0)
        rank_r, nmovr = _running_rank(movr)
        rank_l, _ = _running_rank(movl)
        c = _shift_cols
        pr_r = c(occ0, stride, hm)[None] + c(rank_r, 0, hm)
        pr_l = (
            c(occ0, -stride, hm)[None]
            + c(nmovr, -2 * stride, hm)[None]
            + c(rank_l, 0, hm)
        )
        rej = (c(movr, 0, hm) & (pr_r >= k)) | (c(movl, 0, hm) & (pr_l >= k))
        pos_c = c(pos_all[axis], 0, hm)
        coord_c = c(coord_all, 0, hm)
        clamped = jnp.clip(pos_c, coord_c, coord_c + 1.0 - _CFL_EPS)
        src_refs["pos"][axis, :, hm : hm + pc] = jnp.where(
            rej, clamped, pos_c
        )
        defer_ref[0, 0] += jnp.sum(rej.astype(jnp.int32))

        pos_all = src_refs["pos"][:]
        delta_all = jnp.where(
            occ_all,
            jnp.clip(jnp.floor(pos_all[axis]) - coord_all, -1.0, 1.0),
            0.0,
        )

        def cands(x):
            return (c(x, 0, hm), c(x, -stride, hm), c(x, stride, hm))

        fields = [
            ("pos", cands(pos_all), False),
            ("vel", cands(src_refs["vel"][:]), False),
            ("C", cands(src_refs["C"][:]), False),
            ("mass", cands(mass_all), False),
            ("ids", cands(src_refs["ids"][:]), True),
        ]
        occ_c, occ_l, occ_r = (
            c(occ_all, o, hm) for o in (0, -stride, stride)
        )
        d_c, d_l, d_r = (c(delta_all, o, hm) for o in (0, -stride, stride))
        _, ranks, total = _rank_and_masks(d_c, d_l, d_r, occ_c, occ_l, occ_r)

        any_mover = jnp.any(delta_all != 0.0)

        @pl.when(jnp.logical_not(any_mover))
        def _copy():
            for name, cands_v, _ in fields:
                bulk_out(name, cands_v[0])

        @pl.when(any_mover)
        def _select():
            lost = _gated_select(k, ranks, total, fields, write_out, zero_all)
            lost_ref[0, 0] += lost

    refsA = {"pos": tA_pos, "vel": tA_vel, "C": tA_C, "mass": tA_mass,
             "ids": tA_ids}

    def write_B(name, kk, v):
        ref = {"pos": tB_pos, "vel": tB_vel, "C": tB_C, "mass": tB_mass,
               "ids": tB_ids}[name]
        if name in ("mass", "ids"):
            ref[kk, hm : hm + pc] = v
        else:
            ref[:, kk, hm : hm + pc] = v

    def bulk_B(name, v):
        ref = {"pos": tB_pos, "vel": tB_vel, "C": tB_C, "mass": tB_mass,
               "ids": tB_ids}[name]
        if name in ("mass", "ids"):
            ref[:, hm : hm + pc] = v
        else:
            ref[:, :, hm : hm + pc] = v

    axis_phase(refsA, 1, 1, cy, write_B, bulk_B, zero_all=False)

    refsB = {"pos": tB_pos, "vel": tB_vel, "C": tB_C, "mass": tB_mass,
             "ids": tB_ids}

    def write_out(name, kk, v):
        ref = {"pos": pos_o, "vel": vel_o, "C": C_o, "mass": mass_o,
               "ids": ids_o}[name]
        if name in ("mass", "ids"):
            ref[0, kk, :] = v.astype(ref.dtype)
        else:
            ref[0, :, kk, :] = v.astype(ref.dtype)

    def bulk_out(name, v):
        ref = {"pos": pos_o, "vel": vel_o, "C": C_o, "mass": mass_o,
               "ids": ids_o}[name]
        occ_b = refsB["mass"][:, hm : hm + pc] > 0
        if name == "mass":
            ref[0] = v
        elif name == "ids":
            ref[0] = jnp.where(occ_b, v, _INT_SENTINEL)
        else:
            ref[0] = jnp.where(occ_b[None], v, 0.0).astype(ref.dtype)

    axis_phase(refsB, 0, res1, cx, write_out, bulk_out, zero_all=True)


def supported2d(config: SimConfig, k: int | None = None) -> bool:
    if config.dim != 2 or config.fixed_point:
        return False
    if config.num_cells % 128 != 0:
        return False
    k = k if k is not None else config.bin_capacity
    if not (k <= 8 or k % 8 == 0):
        return False
    pcp = config.num_cells + 2 * _halo2(config)
    state_bytes = 10 * k * config.num_cells * 4
    temps = 2 * 10 * k * pcp * 4
    # the migrate kernel (state in + out + two padded temps + select
    # intermediates) is the VMEM high-water mark; ~2x slack for the
    # compiler's live values
    return 2 * state_bytes + temps <= 55 * 2**20


@functools.partial(jax.jit, static_argnames=("config", "n_inter", "interpret"))
def _substep2d(state: BucketState, scals, config: SimConfig, n_inter: int,
               interpret: bool = False) -> BucketState:
    dim, k, c = state.pos.shape
    hm = _halo2(config)
    dtype = state.pos.dtype

    whole = lambda shape: pl.BlockSpec(
        (1, *shape), lambda: (0,) * (len(shape) + 1), memory_space=pltpu.VMEM
    )
    smem_counter = pl.BlockSpec((1, 1), lambda: (0, 0),
                                memory_space=pltpu.SMEM)

    # ---- kernel 1: P2G x2 + grid update + G2P + tail ----
    pos1, vel1, C1, clamped = pl.pallas_call(
        functools.partial(_sim2d_kernel, config=config, n_inter=n_inter),
        grid=(),
        in_specs=[
            whole((2, k, c)),
            whole((2, k, c)),
            whole((4, k, c)),
            whole((k, c)),
            pl.BlockSpec((8 + 6 * max(n_inter, 1),), lambda: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            whole((2, k, c)),
            whole((2, k, c)),
            whole((4, k, c)),
            smem_counter,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 2, k, c), jnp.float32),
            jax.ShapeDtypeStruct((1, 2, k, c), jnp.float32),
            jax.ShapeDtypeStruct((1, 4, k, c), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, c + 2 * hm), jnp.float32),
            pltpu.VMEM((2, c + 2 * hm), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
    )(
        state.pos[None], state.vel[None], state.C.reshape(4, k, c)[None],
        state.mass[None], scals,
    )

    # ---- kernel 2: both migration phases + overflow rejection ----
    outs = pl.pallas_call(
        functools.partial(_migrate2d_kernel, config=config),
        grid=(),
        in_specs=[
            whole((2, k, c)),
            whole((2, k, c)),
            whole((4, k, c)),
            whole((k, c)),
            whole((k, c)),
        ],
        out_specs=(
            whole((2, k, c)),
            whole((2, k, c)),
            whole((4, k, c)),
            whole((k, c)),
            whole((k, c)),
            smem_counter,
            smem_counter,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 2, k, c), dtype),
            jax.ShapeDtypeStruct((1, 2, k, c), state.vel.dtype),
            jax.ShapeDtypeStruct((1, 4, k, c), state.C.dtype),
            jax.ShapeDtypeStruct((1, k, c), dtype),
            jax.ShapeDtypeStruct((1, k, c), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, k, c + 2 * hm), jnp.float32),
            pltpu.VMEM((2, k, c + 2 * hm), jnp.float32),
            pltpu.VMEM((4, k, c + 2 * hm), jnp.float32),
            pltpu.VMEM((k, c + 2 * hm), jnp.float32),
            pltpu.VMEM((k, c + 2 * hm), jnp.int32),
            pltpu.VMEM((2, k, c + 2 * hm), jnp.float32),
            pltpu.VMEM((2, k, c + 2 * hm), jnp.float32),
            pltpu.VMEM((4, k, c + 2 * hm), jnp.float32),
            pltpu.VMEM((k, c + 2 * hm), jnp.float32),
            pltpu.VMEM((k, c + 2 * hm), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
    )(pos1, vel1, C1, state.mass[None], state.ids[None])
    pos, vel, C4, mass, ids, lost, deferred = outs
    return BucketState(
        pos=pos[0],
        vel=vel[0],
        C=C4[0].reshape(2, 2, k, c),
        mass=mass[0],
        ids=ids[0],
        lost=state.lost + lost[0, 0],
        cfl_clamped=state.cfl_clamped + clamped[0, 0],
        deferred=state.deferred + deferred[0, 0],
        ceiling=state.ceiling,
    )


def substep2d(
    state: BucketState,
    config: SimConfig,
    fp: FluidParams,
    interactions: Sequence = (),
    interpret: bool = False,
) -> BucketState:
    dtype = jnp.float32
    vals = [
        jnp.asarray(fp.dt, dtype),
        jnp.asarray(fp.rest_density, dtype),
        jnp.asarray(fp.dynamic_viscosity, dtype),
        jnp.asarray(fp.eos_stiffness, dtype),
        jnp.asarray(fp.eos_power, dtype),
        jnp.asarray(fp.pressure_floor, dtype),
        jnp.asarray(fp.gravity[0], dtype),
        jnp.asarray(fp.gravity[1], dtype),
    ]
    for it in interactions:
        vals += [
            jnp.asarray(it.center[0], dtype),
            jnp.asarray(it.center[1], dtype),
            jnp.asarray(it.radius, dtype),
            jnp.asarray(it.strength, dtype),
            jnp.asarray(it.inv_falloff, dtype),
            jnp.asarray(it.active, dtype),
        ]
    if not interactions:
        vals += [jnp.zeros((), dtype)] * 6
    return _substep2d(
        state, jnp.stack(vals), config, len(interactions), interpret=interpret
    )
