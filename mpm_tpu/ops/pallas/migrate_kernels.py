"""Pallas migration kernels (kernel E) — axis-split bucket repacking.

The XLA migration (ops/bucketed.migrate) re-reads its [.., 3K, C] candidate
arrays once per output slot (K times) per axis: ~39 GB of HBM traffic and
~75 ms/substep at the flagship scale. Here each axis phase runs as Pallas
sweeps where the candidate plane lives in VMEM and all K output slots reuse
it.

Axis phases (identical semantics to ops/bucketed._migrate_axis — candidate
order [stay, from-left(+1), from-right(-1)], slot-ordered, rank by masked
cumsum):

- y / z phases are INTRA-plane: candidates are static halo-column shifts of
  the center plane only — single-view inputs, state streamed once.
- the x phase couples neighbor planes: three plane views (i-1, i, i+1); the
  C matrix is migrated by a second, row-blocked call to respect VMEM.

`lost` (bucket-overflow drops) is accumulated into a scalar SMEM output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.params import SimConfig
from ..bucketed import BucketState

_INT_SENTINEL = -1  # python int: kernels cannot capture device constants


def _delta_axis(pos_a, coord_a, occ):
    """Desired move along one axis, clamped to one cell (CFL; clamped moves
    are counted as part of normal migration next substep)."""
    delta = jnp.floor(pos_a) - coord_a
    return jnp.where(occ, jnp.clip(delta, -1.0, 1.0), 0.0)


def _rank_and_masks(delta_c, delta_l, delta_r, occ_c, occ_l, occ_r):
    """Candidate ranks in the canonical order [stay, from-left, from-right],
    kept as THREE separate [K, pc] blocks — Mosaic cannot concatenate vectors
    whose lane layouts carry different shift offsets, and jnp.cumsum is not
    lowerable, so the prefix sum is an unrolled running sum across blocks."""
    masks = (
        occ_c & (delta_c == 0.0),
        occ_l & (delta_l == 1.0),
        occ_r & (delta_r == -1.0),
    )
    ranks = []
    acc = jnp.zeros(delta_c.shape[-1:], jnp.int32)
    for m in masks:
        mi = m.astype(jnp.int32)
        rows = []
        for j in range(mi.shape[0]):
            acc = acc + mi[j]
            rows.append(acc)
        r = jnp.stack(rows) - 1
        ranks.append(jnp.where(m, r, -1))
    return masks, ranks, acc


def _select_f_into(oref, cand_blocks, rank_blocks, k, slot_writer):
    """oref[.., kk, :] = candidate with rank == kk, written per slot to keep
    Mosaic's stack small (a stacked [K, ...] result keeps all K unrolled
    select chains live at once and blows scoped VMEM). The select is
    where-based, NOT mask-multiply: candidates can include uninitialized
    halo/scratch lanes whose garbage bits may be NaN, and NaN * 0 = NaN."""
    for kk in range(k):
        acc = None
        for cand, rank in zip(cand_blocks, rank_blocks):
            s = jnp.sum(jnp.where(rank == kk, cand, 0), axis=-2)
            acc = s if acc is None else acc + s
        slot_writer(oref, kk, acc)


def _select_i_into(oref, cand_blocks, rank_blocks, k, fill, slot_writer):
    for kk in range(k):
        acc = None
        hit = None
        for cand, rank in zip(cand_blocks, rank_blocks):
            m = rank == kk
            s = jnp.sum(jnp.where(m, cand, 0), axis=-2)
            a = jnp.any(m, axis=-2)
            acc = s if acc is None else acc + s
            hit = a if hit is None else hit | a
        slot_writer(oref, kk, jnp.where(hit, acc, fill))


def _w_lead(oref, kk, v):
    """writer for [..., K, pc] refs with leading dims."""
    oref[..., kk, :] = v


def _w_flat(oref, kk, v):
    """writer for [K, pc] refs."""
    oref[kk, :] = v


def _shift_cols(x, off, h):
    """Static halo-column shift of a pre-padded [..., pc + 2h] block:
    result[..., j] = x[..., h + j + off] for j in [0, pc)."""
    pc = x.shape[-1] - 2 * h
    lo = h + off
    return x[..., lo : lo + pc]


# ------------------------------------------------------- intra-plane kernel


def _intra_core_kernel(
    pos_ref, vel_ref, mass_ref, ids_ref,
    opos_ref, ovel_ref, omass_ref, oids_ref, lost_ref,
    *, config: SimConfig, axis: int
):
    """One y- or z-axis migration phase for {pos, vel, mass, ids}; all
    candidates are static column shifts of the center plane (pre-padded)."""
    i = pl.program_id(0)
    z = config.grid_res[2]
    stride = z if axis == 1 else 1
    # pads are rounded to 64/side so padded blocks stay 128-divisible
    h = ((stride + 63) // 64) * 64
    dtype = pos_ref.dtype

    @pl.when(i == 0)
    def _():
        lost_ref[0, 0] = 0

    pos = pos_ref[:]  # [3, K, pc + 2h]
    vel = vel_ref[:]
    mass = mass_ref[:]
    ids = ids_ref[:]

    occ_all, delta_all = _intra_occ_delta(pos, mass, axis, z, h, dtype)

    k = mass.shape[0]
    c_c = _shift_cols
    occ_c, occ_l, occ_r = (c_c(occ_all, o, h) for o in (0, -stride, stride))
    d_c, d_l, d_r = (c_c(delta_all, o, h) for o in (0, -stride, stride))
    _, ranks, total = _rank_and_masks(d_c, d_l, d_r, occ_c, occ_l, occ_r)

    def cands(x):
        return (c_c(x, 0, h), c_c(x, -stride, h), c_c(x, stride, h))

    _select_f_into(opos_ref, cands(pos), ranks, k, _w_lead)
    _select_f_into(ovel_ref, cands(vel), ranks, k, _w_lead)
    _select_f_into(omass_ref, cands(mass), ranks, k, _w_flat)
    _select_i_into(oids_ref, cands(ids), ranks, k, _INT_SENTINEL, _w_flat)
    lost_ref[0, 0] += jnp.sum(jnp.maximum(total - k, 0))


def _intra_occ_delta(pos, mass, axis, z, h, dtype):
    occ_all = mass > 0
    intra = jax.lax.broadcasted_iota(jnp.int32, mass.shape, 1) - h
    if axis == 1:
        coord = intra // z
    else:
        coord = jnp.where(intra < 0, -1, intra % z)
    delta_all = _delta_axis(pos[axis], coord.astype(dtype), occ_all)
    return occ_all, delta_all


def _intra_c_kernel(
    C_ref, pos_ref, mass_ref, oC_ref, *, config: SimConfig, axis: int
):
    """y/z-axis migration of the C rows (row-blocked grid dim j)."""
    z = config.grid_res[2]
    stride = z if axis == 1 else 1
    h = ((stride + 63) // 64) * 64
    dtype = pos_ref.dtype

    pos = pos_ref[:]
    mass = mass_ref[:]
    C = C_ref[:]
    occ_all, delta_all = _intra_occ_delta(pos, mass, axis, z, h, dtype)

    k = mass.shape[0]
    c_c = _shift_cols
    occ_c, occ_l, occ_r = (c_c(occ_all, o, h) for o in (0, -stride, stride))
    d_c, d_l, d_r = (c_c(delta_all, o, h) for o in (0, -stride, stride))
    _, ranks, total = _rank_and_masks(d_c, d_l, d_r, occ_c, occ_l, occ_r)
    _select_f_into(
        oC_ref, (c_c(C, 0, h), c_c(C, -stride, h), c_c(C, stride, h)), ranks, k, _w_lead
    )


# ---------------------------------------------------------- x-plane kernel


def _x_kernel(
    pos_ref, vel_ref, mass_ref, ids_ref,
    pos_l_ref, pos_r_ref, mass_l_ref, mass_r_ref,
    vel_l_ref, vel_r_ref, ids_l_ref, ids_r_ref,
    opos_ref, ovel_ref, omass_ref, oids_ref, lost_ref,
    *, config: SimConfig
):
    """x-axis migration of {pos, vel, mass, ids} (C handled by _x_c_kernel)."""
    i = pl.program_id(0)
    nx = pl.num_programs(0)
    dtype = pos_ref.dtype

    @pl.when(i == 0)
    def _():
        lost_ref[0, 0] = 0

    def occ_delta(pos_blk, mass_blk, plane):
        occ = mass_blk > 0
        x_valid = (plane >= 0) & (plane < nx)
        occ = occ & x_valid
        delta = _delta_axis(pos_blk[0], plane.astype(dtype), occ)
        return occ, delta

    occ_c, d_c = occ_delta(pos_ref[:], mass_ref[:], i)
    occ_l, d_l = occ_delta(pos_l_ref[:], mass_l_ref[:], i - 1)
    occ_r, d_r = occ_delta(pos_r_ref[:], mass_r_ref[:], i + 1)
    _, ranks, total = _rank_and_masks(d_c, d_l, d_r, occ_c, occ_l, occ_r)

    k = mass_ref.shape[0]

    _select_f_into(opos_ref, (pos_ref[:], pos_l_ref[:], pos_r_ref[:]), ranks, k, _w_lead)
    _select_f_into(ovel_ref, (vel_ref[:], vel_l_ref[:], vel_r_ref[:]), ranks, k, _w_lead)
    _select_f_into(omass_ref, (mass_ref[:], mass_l_ref[:], mass_r_ref[:]), ranks, k, _w_flat)
    _select_i_into(
        oids_ref, (ids_ref[:], ids_l_ref[:], ids_r_ref[:]), ranks, k, _INT_SENTINEL, _w_flat
    )
    lost_ref[0, 0] += jnp.sum(jnp.maximum(total - k, 0))


def _x_c_kernel(
    C_ref, C_l_ref, C_r_ref,
    pos_ref, pos_l_ref, pos_r_ref, mass_ref, mass_l_ref, mass_r_ref,
    oC_ref,
    *, config: SimConfig
):
    """x-axis migration of the C rows (row-blocked grid dim j); the rank is
    recomputed from (pos_x, mass) — cheap relative to streaming C."""
    i = pl.program_id(0)
    nx = pl.num_programs(0)
    dtype = pos_ref.dtype

    def occ_delta(pos_blk, mass_blk, plane):
        occ = mass_blk > 0
        x_valid = (plane >= 0) & (plane < nx)
        occ = occ & x_valid
        delta = _delta_axis(pos_blk[0], plane.astype(dtype), occ)
        return occ, delta

    occ_c, d_c = occ_delta(pos_ref[:], mass_ref[:], i)
    occ_l, d_l = occ_delta(pos_l_ref[:], mass_l_ref[:], i - 1)
    occ_r, d_r = occ_delta(pos_r_ref[:], mass_r_ref[:], i + 1)
    _, ranks, total = _rank_and_masks(d_c, d_l, d_r, occ_c, occ_l, occ_r)

    k = mass_ref.shape[0]
    _select_f_into(oC_ref, (C_ref[:], C_l_ref[:], C_r_ref[:]), ranks, k, _w_lead)


# --------------------------------------------------------------- dispatch


def _plane_view(lead, k, pc, dx, nx):
    """Block = x-plane (i + dx, clamped) of a [..., K, C] array."""
    ndim = len(lead) + 2

    def index(i, *_):
        idx = [0] * ndim
        idx[-1] = jnp.clip(i + dx, 0, nx - 1)
        return tuple(idx)

    return pl.BlockSpec((*lead, k, pc), index, memory_space=pltpu.VMEM)


def _padded_plane_view(lead, k, pc, h):
    ndim = len(lead) + 2

    def index(i):
        idx = [0] * ndim
        idx[-1] = i
        return tuple(idx)

    return pl.BlockSpec((*lead, k, pc + 2 * h), index, memory_space=pltpu.VMEM)


def _lost_spec(n_grid_dims=1):
    if n_grid_dims == 1:
        return pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    return pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)


@functools.partial(jax.jit, static_argnames=("config", "axis", "interpret"))
def migrate_intra_pallas(
    state: BucketState, config: SimConfig, axis: int, interpret: bool = False
) -> BucketState:
    dim, k, c = state.pos.shape
    nx = config.grid_res[0]
    pc = c // nx
    z = config.grid_res[2]
    stride = z if axis == 1 else 1
    h = stride
    dtype = state.pos.dtype

    # pad columns once in XLA (cheap, fused into the DMA reads); the pad is
    # rounded to 64/side so padded blocks stay 128-divisible
    h = ((h + 63) // 64) * 64

    def pad(x):
        xp = x.reshape(*x.shape[:-1], nx, pc)
        xp = jnp.pad(xp, [(0, 0)] * (x.ndim - 1) + [(0, 0), (h, h)])
        return xp.reshape(*x.shape[:-1], nx * (pc + 2 * h))

    pos_p = pad(state.pos)
    vel_p = pad(state.vel)
    C_p = pad(state.C)
    mass_p = pad(state.mass)
    ids_p = pad(state.ids)
    pcp = pc + 2 * h

    pos, vel, mass, ids, lost = pl.pallas_call(
        functools.partial(_intra_core_kernel, config=config, axis=axis),
        grid=(nx,),
        in_specs=[
            _padded_plane_view((3,), k, pc, h),
            _padded_plane_view((3,), k, pc, h),
            _padded_plane_view((), k, pc, h),
            _padded_plane_view((), k, pc, h),
        ],
        out_specs=(
            _plane_view((3,), k, pc, 0, nx),
            _plane_view((3,), k, pc, 0, nx),
            _plane_view((), k, pc, 0, nx),
            _plane_view((), k, pc, 0, nx),
            _lost_spec(),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, k, c), dtype),
            jax.ShapeDtypeStruct((3, k, c), dtype),
            jax.ShapeDtypeStruct((k, c), dtype),
            jax.ShapeDtypeStruct((k, c), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(pos_p, vel_p, mass_p, ids_p)

    # C rows, row-blocked over the second grid dim
    Cflat_p = C_p.reshape(9, k, nx * pcp)
    rows = 3

    def _c_view_p(lead_rows):
        def index(i, j):
            return (j, 0, i)

        return pl.BlockSpec((lead_rows, k, pcp), index, memory_space=pltpu.VMEM)

    def _pv(lead):
        ndim = len(lead) + 2

        def index(i, j):
            idx = [0] * ndim
            idx[-1] = i
            return tuple(idx)

        return pl.BlockSpec((*lead, k, pcp), index, memory_space=pltpu.VMEM)

    def _ov(lead_rows):
        def index(i, j):
            return (j, 0, i)

        return pl.BlockSpec((lead_rows, k, pc), index, memory_space=pltpu.VMEM)

    (C_new,) = pl.pallas_call(
        functools.partial(_intra_c_kernel, config=config, axis=axis),
        grid=(nx, 9 // rows),
        in_specs=[_c_view_p(rows), _pv((3,)), _pv(())],
        out_specs=(_ov(rows),),
        out_shape=(jax.ShapeDtypeStruct((9, k, c), dtype),),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(Cflat_p, pos_p, mass_p)

    return BucketState(
        pos=pos,
        vel=vel,
        C=C_new.reshape(3, 3, k, c),
        mass=mass,
        ids=ids,
        lost=state.lost + lost[0, 0],
        cfl_clamped=state.cfl_clamped,
        deferred=state.deferred,
        ceiling=state.ceiling,
    )


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def migrate_x_pallas(
    state: BucketState, config: SimConfig, interpret: bool = False
) -> BucketState:
    dim, k, c = state.pos.shape
    nx = config.grid_res[0]
    pc = c // nx
    dtype = state.pos.dtype

    core = pl.pallas_call(
        functools.partial(_x_kernel, config=config),
        grid=(nx,),
        in_specs=[
            _plane_view((3,), k, pc, 0, nx),
            _plane_view((3,), k, pc, 0, nx),
            _plane_view((), k, pc, 0, nx),
            _plane_view((), k, pc, 0, nx),
            _plane_view((3,), k, pc, -1, nx),
            _plane_view((3,), k, pc, 1, nx),
            _plane_view((), k, pc, -1, nx),
            _plane_view((), k, pc, 1, nx),
            _plane_view((3,), k, pc, -1, nx),
            _plane_view((3,), k, pc, 1, nx),
            _plane_view((), k, pc, -1, nx),
            _plane_view((), k, pc, 1, nx),
        ],
        out_specs=(
            _plane_view((3,), k, pc, 0, nx),
            _plane_view((3,), k, pc, 0, nx),
            _plane_view((), k, pc, 0, nx),
            _plane_view((), k, pc, 0, nx),
            _lost_spec(),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, k, c), dtype),
            jax.ShapeDtypeStruct((3, k, c), dtype),
            jax.ShapeDtypeStruct((k, c), dtype),
            jax.ShapeDtypeStruct((k, c), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(
        state.pos, state.vel, state.mass, state.ids,
        state.pos, state.pos, state.mass, state.mass,
        state.vel, state.vel, state.ids, state.ids,
    )
    pos, vel, mass, ids, lost = core

    # C rows, row-blocked over the second grid dim (VMEM: C plane views are
    # 3x the core fields)
    Cflat = state.C.reshape(9, k, c)
    rows = 3

    def _c_view(dx):
        def index(i, j):
            return (j, 0, jnp.clip(i + dx, 0, nx - 1))

        return pl.BlockSpec((rows, k, pc), index, memory_space=pltpu.VMEM)

    def _p_view(lead, dx):
        ndim = len(lead) + 2

        def index(i, j):
            idx = [0] * ndim
            idx[-1] = jnp.clip(i + dx, 0, nx - 1)
            return tuple(idx)

        return pl.BlockSpec((*lead, k, pc), index, memory_space=pltpu.VMEM)

    (C_new,) = pl.pallas_call(
        functools.partial(_x_c_kernel, config=config),
        grid=(nx, 9 // rows),
        in_specs=[
            _c_view(0),
            _c_view(-1),
            _c_view(1),
            _p_view((3,), 0),
            _p_view((3,), -1),
            _p_view((3,), 1),
            _p_view((), 0),
            _p_view((), -1),
            _p_view((), 1),
        ],
        out_specs=(_c_view(0),),
        out_shape=(jax.ShapeDtypeStruct((9, k, c), dtype),),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(
        Cflat, Cflat, Cflat,
        state.pos, state.pos, state.pos,
        state.mass, state.mass, state.mass,
    )

    return BucketState(
        pos=pos,
        vel=vel,
        C=C_new.reshape(3, 3, k, c),
        mass=mass,
        ids=ids,
        lost=state.lost + lost[0, 0],
        cfl_clamped=state.cfl_clamped,
        deferred=state.deferred,
        ceiling=state.ceiling,
    )


def migrate_pallas(
    state: BucketState, config: SimConfig, interpret: bool = False
) -> BucketState:
    """Full migration: z, y intra-plane phases then the x cross-plane phase
    (matches ops/bucketed.migrate's axis order reversed — order is arbitrary
    as long as each phase fixes one axis; we run z, y, x so the cross-plane
    phase sees y/z-settled buckets).

    Overflow rejection runs as an XLA prepass before each phase (the fused
    kernel does it in-kernel; here the extra HBM round trip is acceptable —
    this path serves configs whose plane working set exceeds the fused
    kernel's VMEM envelope)."""
    from ..bucketed import reject_overflow

    state = reject_overflow(state, config, 2)
    state = migrate_intra_pallas(state, config, 2, interpret=interpret)
    state = reject_overflow(state, config, 1)
    state = migrate_intra_pallas(state, config, 1, interpret=interpret)
    state = reject_overflow(state, config, 0)
    return migrate_x_pallas(state, config, interpret=interpret)
