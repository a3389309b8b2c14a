"""Fused G2P + advection tail + 3-axis migration (kernel F).

Round-1 profiling showed the substep is HBM-traffic-bound: the split pipeline
(kernel D + XLA tail + 3 axis-split migration passes, migrate_kernels.py)
streams the full particle state {pos, vel, C, mass, ids} through HBM once for
G2P and three more times read+write for migration (plus two XLA pad copies)
— ~1.8 KB per slot per substep. This kernel collapses all of it into ONE
sweep over x-planes: the state is read once (pos/mass/ids — vel and C are
rebuilt by G2P) and written once.

Pipeline (grid = nx+1 sequential steps; plane t computed at step t, plane
t-1 emitted at step t — a one-plane-lag software pipeline):

  step t, compute phase (t < nx):
    1. G2P for plane t: gather grid velocity from three single-plane views
       (t-1, t, t+1 — each tap's plane offset is STATIC view selection),
       rebuild APIC C (g2p.glsl:73-108).
    2. tail: advect, global clamp, interactions, wall springs
       (g2p.glsl:112-140), CFL bucket clamp (pos forced into the bucket's
       ±1-cell range so B-spline weights stay in support; events counted).
    3. z-axis then y-axis migration phases entirely in VMEM (same candidate
       order & rank select as migrate_kernels.py — bit-identical results);
       the zy-settled plane lands in a 3-slot VMEM ring buffer.
  step t, output phase (t >= 1):
    4. x-axis migration for plane j = t-1 from ring slots j-1, j, j+1;
       the result is the ONLY HBM write of the whole G2P+migrate pipeline.

Reference parity: the fused semantics equal bucketed.substep's
g2p_bucketed tail + migrate (tested in tests/test_fused.py); the reference's
corresponding passes are g2p.glsl:52-152 (gather/advect/interact/walls) with
migration replacing its free particle order (atomics let particles live
anywhere; here the bucket invariant floor(pos) == cell is restored each
substep).
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
from .. import bspline
from ..bucketed import CFL_EPS as _CFL_EPS
from ..bucketed import BucketState
from .bucket_kernels import _halo, _plane_geometry
from .migrate_kernels import (
    _INT_SENTINEL,
    _delta_axis,
    _intra_occ_delta,
    _rank_and_masks,
    _shift_cols,
)

import os

# Perf-attribution knobs (fresh-process experiments via scripts/quickbench.py;
# production = all defaults). Read at trace time.
_GATE = os.environ.get("MPM_FUSED_GATE", "1") != "0"
_NOMIG = os.environ.get("MPM_FUSED_NOMIG", "0") == "1"   # physics-breaking
_NOG2P = os.environ.get("MPM_FUSED_NOG2P", "0") == "1"   # physics-breaking
_NOP2G1 = os.environ.get("MPM_FUSED_NOP2G1", "0") == "1"  # physics-breaking
_NOP2G2 = os.environ.get("MPM_FUSED_NOP2G2", "0") == "1"  # physics-breaking
_NO_KP = os.environ.get("MPM_NO_KP", "0") == "1"  # use split A/B + XLA glue
# Sub-plane select gating: the O(K_out x 3K x 17-row) migration selects run
# per CHUNK-column span, skipping mover-free spans (0 disables). Must divide
# every plane's cell count; spans that don't divide fall back to full-plane.
_CHUNK = int(os.environ.get("MPM_SELECT_CHUNK", "512"))
# "no splat from this cell" depth sentinel — MUST equal
# render/extract_kernel.CELL_BG (asserted by tests/test_render.py)
_CELL_BG = 1.0e9
# Attribution: force the live (staging + select) paths even with no movers —
# isolates the migration machinery's cost from the physics churn
_FORCE_LIVE = os.environ.get("MPM_FORCE_LIVE", "0") == "1"
# Attribution: run the live paths' staging but replace every select with a
# bulk copy (physics-breaking unless mover-free) — staging-only cost
_NOSEL = os.environ.get("MPM_FUSED_NOSEL", "0") == "1"


def _mig_halo(z: int) -> int:
    """Intra-plane migration halo: the overflow-rejection shift reaches two
    y strides (= 2z, the from-left count of the destination's neighbor),
    rounded to 64/side so padded widths stay 128-divisible."""
    return ((2 * z + 63) // 64) * 64


def _running_rank(m):
    """Rank of each True row within its column (slot order) and the column
    totals, via an unrolled running sum (jnp.cumsum is not lowerable).
    m: [K, W] bool -> (rank [K, W] int32 with -1 for False, count [W])."""
    acc = jnp.zeros(m.shape[-1:], jnp.int32)
    rows = []
    for j in range(m.shape[0]):
        acc = acc + m[j].astype(jnp.int32)
        rows.append(acc)
    r = jnp.stack(rows) - 1
    return jnp.where(m, r, -1), acc


def _reject_intra(refs, occ_all, delta_all, axis: int, z: int, hm: int,
                  k: int, pc: int, dtype, ceil_row: int | None = None):
    """Overflow rejection for one intra-plane phase, in place: a mover whose
    destination bucket cannot take it (conservative test: the destination's
    PRE-phase occupancy plus the mover's index among the destination's
    incoming candidates reaches K) is clamped back into its source cell —
    the next _intra_occ_delta re-derives delta == 0 for it, so it competes
    as a stayer. Since stayers + rejected-own <= pre-phase occupancy <= K
    and each accepted incoming lands at a final rank below its test value,
    no bucket exceeds K and nothing is dropped (the reference also clamps
    instead of deleting, g2p.glsl:115-119). Returns the rejection count.

    Mutates refs["pos"][axis] center columns (halo columns hold no
    particles, so fixing the center is complete)."""
    stride = z if axis == 1 else 1
    occ0 = jnp.sum(occ_all.astype(jnp.int32), axis=0)  # [pcp]
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

    intra = jax.lax.broadcasted_iota(jnp.int32, (k, pc), 1)
    coord = (intra // z if axis == 1 else intra % z).astype(dtype)
    n_ceil = jnp.zeros((), jnp.int32)
    if ceil_row is not None:
        # air-window ceiling band (ops/window.py): up-movers whose source
        # row is ceil_row-1 (dest in the window's top 3 planes) are rejected
        # like a full destination; counted separately — 0 certifies window
        # non-interference. Mirrors ops/bucketed.reject_overflow exactly.
        assert axis == 1
        rej_ceil = (c(movr, 0, hm) & (coord >= float(ceil_row - 1))
                    & jnp.logical_not(rej))
        rej = rej | rej_ceil
        n_ceil = jnp.sum(rej_ceil.astype(jnp.int32))
    pos_c = c(refs["pos"][:][axis], 0, hm)
    clamped = jnp.clip(pos_c, coord, coord + 1.0 - _CFL_EPS)
    refs["pos"][axis, :, hm : hm + pc] = jnp.where(rej, clamped, pos_c)
    return jnp.sum(rej.astype(jnp.int32)), n_ceil


# ---------------------------------------------------------- packed migration
#
# With bf16 vel/C storage, the 12 vel+C field rows ride the migration
# selects and staging as SIX int32 rows of bf16 PAIRS — the field-row count
# of the O(K_out x 3K x rows) select machinery drops 17 -> 11. Measured
# basis (scripts/vpu_roofline.py, round 4): 16-bit rows cost exactly what
# f32 rows cost (select_bf16 == select), so dtype narrowing buys nothing —
# but row-count reduction does, sub-linearly (select11 = -19% time for
# -35% rows). Value-exactness: migration only PERMUTES values, so
# pack-after-tail == round-at-HBM-write (the unpacked bf16 path's
# semantics) — the XLA bucketed engine rounds at the same point.
#
# bf16 bit patterns are the TOP 16 bits of their f32 widening, so the
# pack/unpack is pure int32/f32 bit arithmetic — no 16-bit vector types
# for Mosaic to lower.


def _pack_bf16_pair(a, b):
    """[.., pc] f32 x2 -> int32 rows: bf16(a) in the high 16, bf16(b) low."""
    pa = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16).astype(jnp.float32), jnp.int32)
    pb = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16).astype(jnp.float32), jnp.int32)
    # pa's low 16 bits are zero (bf16-rounded f32), so OR composes exactly
    return pa | jax.lax.shift_right_logical(pb, 16)


def _unpack_bf16_pair(p):
    a = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(p, jnp.int32(-65536)), jnp.float32)  # 0xFFFF0000
    b = jax.lax.bitcast_convert_type(
        jax.lax.shift_left(p, jnp.int32(16)), jnp.float32)
    return a, b


def _pack_vc(vel, C9):
    """[3, ..] + [9, ..] f32 -> [6, ..] int32 bf16-pair rows."""
    rows = [vel[i] for i in range(3)] + [C9[i] for i in range(9)]
    return jnp.stack(
        [_pack_bf16_pair(rows[2 * i], rows[2 * i + 1]) for i in range(6)])


def _unpack_vc(vc):
    """[6, ..] int32 -> ([3, ..] f32, [9, ..] f32) (bf16 values widened)."""
    rows = []
    for i in range(6):
        a, b = _unpack_bf16_pair(vc[i])
        rows += [a, b]
    return jnp.stack(rows[:3]), jnp.stack(rows[3:])


# ------------------------------------------------------------------ kernel F


def _gated_select(k, ranks, total, fields, write, zero_all: bool):
    """Rank-select gated on the block-wide max occupancy: output slots
    kk >= max(total) can hold no candidate anywhere in the block, so their
    select work (the O(K_out x 3K) hot loop of migration) is replaced by a
    zero-write. In a settled pool this skips roughly half of K; in sparse /
    free-fall planes nearly all of it.

    fields: list of (name, cand_blocks, is_int). When zero_all is False only
    the mass rows are zeroed in the gated-off branch (enough for downstream
    occupancy masking of scratch buffers); True zeroes every field (HBM
    outputs must be fully defined — the XLA engine writes zeros there too).
    Returns the overflow count."""

    def trim(ci, kk, cand, rank):
        # stay candidates (class 0, first in canonical order) have
        # rank[j] <= j, so slot kk can only be filled by stay rows j >= kk —
        # a static triangular trim of the inner reduction
        if ci == 0 and kk > 0:
            return cand[..., kk:, :], rank[kk:, :]
        return cand, rank

    def select_slot(kk):
        for name, cands, is_int in fields:
            if is_int:
                acc = None
                hit = None
                for ci, (cand, rank) in enumerate(zip(cands, ranks)):
                    cand, rank = trim(ci, kk, cand, rank)
                    m = rank == kk
                    s = jnp.sum(jnp.where(m, cand, 0), axis=-2)
                    a = jnp.any(m, axis=-2)
                    acc = s if acc is None else acc + s
                    hit = a if hit is None else hit | a
                write(name, kk, jnp.where(hit, acc, _INT_SENTINEL))
            else:
                acc = None
                for ci, (cand, rank) in enumerate(zip(cands, ranks)):
                    cand, rank = trim(ci, kk, cand, rank)
                    s = jnp.sum(jnp.where(rank == kk, cand, 0), axis=-2)
                    acc = s if acc is None else acc + s
                write(name, kk, acc)

    if not _GATE:  # ungated variant for perf attribution
        for kk in range(k):
            select_slot(kk)
        return jnp.sum(jnp.maximum(total - k, 0))
    tmax = jnp.max(total)
    for kk in range(k):
        @pl.when(kk < tmax)
        def _(kk=kk):
            select_slot(kk)

        @pl.when(kk >= tmax)
        def _(kk=kk):
            for name, cands, is_int in fields:
                if not zero_all and name != "mass":
                    continue
                shape = cands[0].shape[:-2] + cands[0].shape[-1:]
                if is_int:
                    write(name, kk, jnp.full(shape, _INT_SENTINEL, cands[0].dtype))
                else:
                    write(name, kk, jnp.zeros(shape, cands[0].dtype))
    return jnp.sum(jnp.maximum(total - k, 0))


def _intra_phase(refs, dst_write, axis: int, z: int, hm: int, k: int, dtype,
                 add_lost, add_defer, zero_all: bool = False, bulk_write=None,
                 chunk: int = 0, ceil_row: int | None = None, add_ceil=None):
    """One intra-plane (z or y) migration phase on VMEM-resident scratch.

    refs: dict of full-width padded VMEM refs {pos [3,K,pcp], vel,
    C [9,K,pcp], mass [K,pcp], ids}. dst_write(name, kk, v, lo, cw) writes
    output slot kk, center columns [lo, lo+cw); bulk_write(name, v, lo, cw)
    copies all slots of that span. add_lost(n)/add_defer(n) accumulate
    counters (called inside the select branch). Candidate order and rank
    select are identical to migrate_kernels._intra_core_kernel, with
    overflow rejection applied first (see _reject_intra) so nothing is ever
    dropped.

    Two mover-sparsity fast paths (both exact — identity holds wherever no
    particle crosses a cell boundary along this axis, because buckets stay
    prefix-compact between migrations so rank[j] == j for every stayer):
    1. plane-level: no mover anywhere in the padded plane -> bulk copy;
    2. chunk-level (`chunk` > 0 and divides pc): the O(K_out x 3K x 17-row)
       select runs only on `chunk`-column spans that contain a mover within
       `stride` columns (a mover's source and destination are <= stride
       apart, so a span with no mover in its stride-extended window is the
       identity); mover-free spans bulk-copy. In a settled pool movers
       cluster in the surface y-band = a contiguous column range of each
       plane, so most spans skip (measured via scripts/mover_stats.py)."""
    stride = z if axis == 1 else 1
    pc = refs["mass"].shape[-1] - 2 * hm
    names = tuple(refs)  # field schema: ("pos","vel","C","mass","ids") or
    # the packed ("pos","vc","mass","ids") — the "vc" int32 rows take the
    # float select formula (zero-fill; exactly one candidate matches)
    mass0 = refs["mass"][:]
    occ_all0, delta_all0 = _intra_occ_delta(
        refs["pos"][:], mass0, axis, z, hm, dtype
    )

    def select_span(src, occ_all, delta_all, c0, cw):
        def sh(x, off):
            return x[..., hm + c0 + off : hm + c0 + off + cw]

        fields = [
            (name, (sh(src[name], 0), sh(src[name], -stride),
                    sh(src[name], stride)), name == "ids")
            for name in names
        ]
        occ_c, occ_l, occ_r = (sh(occ_all, o) for o in (0, -stride, stride))
        d_c, d_l, d_r = (sh(delta_all, o) for o in (0, -stride, stride))
        _, ranks, total = _rank_and_masks(d_c, d_l, d_r, occ_c, occ_l, occ_r)

        def write(name, kk, v):
            dst_write(name, kk, v, c0, cw)

        if _NOSEL:  # attribution: staging cost only
            for name, cands, _ in fields:
                for kk in range(k):
                    write(name, kk, cands[0][..., kk, :])
            return
        add_lost(_gated_select(k, ranks, total, fields, write, zero_all))

    def rejected_src():
        n_rej, n_ceil = _reject_intra(refs, occ_all0, delta_all0, axis, z,
                                      hm, k, pc, dtype, ceil_row=ceil_row)
        add_defer(n_rej)
        if ceil_row is not None:
            add_ceil(n_ceil)
        src = {name: refs[name][:] for name in names}
        occ_all, delta_all = _intra_occ_delta(
            src["pos"], src["mass"], axis, z, hm, dtype
        )
        return src, occ_all, delta_all

    def run_select_full():
        src, occ_all, delta_all = rejected_src()
        select_span(src, occ_all, delta_all, 0, pc)

    if bulk_write is None or not _GATE:
        run_select_full()
        return

    any_mover = jnp.any(delta_all0 != 0.0)

    @pl.when(jnp.logical_not(any_mover))
    def _copy_through():
        for name in names:
            bulk_write(name, _shift_cols(refs[name][:], 0, hm), 0, pc)

    @pl.when(any_mover)
    def _live():
        if not (chunk and pc % chunk == 0 and pc // chunk > 1):
            run_select_full()
            return
        src, occ_all, delta_all = rejected_src()
        # per-column mover flag (rejection may have zeroed some movers)
        mov_col = jnp.max(
            jnp.where(delta_all != 0.0, 1.0, 0.0), axis=0
        )  # [pcp]
        for c0 in range(0, pc, chunk):
            lo = hm + c0 - stride
            hi = hm + c0 + chunk + stride
            span_any = (jnp.max(mov_col[lo:hi]) > 0.0) | _FORCE_LIVE

            @pl.when(span_any)
            def _(c0=c0):
                select_span(src, occ_all, delta_all, c0, chunk)

            @pl.when(jnp.logical_not(span_any))
            def _(c0=c0):
                for name in names:
                    bulk_write(
                        name,
                        src[name][..., hm + c0 : hm + c0 + chunk],
                        c0, chunk,
                    )


def _fused_kernel(
    # inputs
    pos_ref, mass_ref, ids_ref, gv_m_ref, gv_c_ref, gv_p_ref, scal_ref,
    # outputs
    pos_o, vel_o, C_o, mass_o, ids_o, lost_ref, clamp_ref, defer_ref,
    ceil_ref,
    # optional splat output (emit_splats), then scratch
    *refs,
    config: SimConfig, n_inter: int, shard: bool,
    fixed_mult: float | None = None,
    emit_splats: bool = False,
):
    if emit_splats:
        splat_o, *refs = refs
    else:
        splat_o = None
    packed = config.storage_dtype == "bfloat16"
    if packed:
        # vel+C ride the temps/ring/selects as 6 bf16-pair int32 rows
        # (see "packed migration" above); tA_vel/tA_C etc. do not exist
        (tA_pos, tA_vc, tA_mass, tA_ids,
         tB_pos, tB_vc, tB_mass, tB_ids,
         r_pos, r_vc, r_mass, r_ids, scr_nmovr) = refs
        temps_A = {"pos": tA_pos, "vc": tA_vc, "mass": tA_mass,
                   "ids": tA_ids}
        temps_B = {"pos": tB_pos, "vc": tB_vc, "mass": tB_mass,
                   "ids": tB_ids}
        ring = {"pos": r_pos, "vc": r_vc, "mass": r_mass, "ids": r_ids}
    else:
        (tA_pos, tA_vel, tA_C, tA_mass, tA_ids,
         tB_pos, tB_vel, tB_C, tB_mass, tB_ids,
         r_pos, r_vel, r_C, r_mass, r_ids, scr_nmovr) = refs
        temps_A = {"pos": tA_pos, "vel": tA_vel, "C": tA_C, "mass": tA_mass,
                   "ids": tA_ids}
        temps_B = {"pos": tB_pos, "vel": tB_vel, "C": tB_C, "mass": tB_mass,
                   "ids": tB_ids}
        ring = {"pos": r_pos, "vel": r_vel, "C": r_C, "mass": r_mass,
                "ids": r_ids}
    t = pl.program_id(0)
    L = pl.num_programs(0) - 1  # local planes swept (== nx when unsharded)
    nx = config.grid_res[0]     # GLOBAL plane count (bounds checks)
    z = config.grid_res[2]
    pc = config.grid_res[1] * z
    h = _halo(config)          # grid-velocity view padding (z + 1)
    hm = _mig_halo(z)          # migration temp padding
    k = mass_ref.shape[0]
    dtype = pos_ref.dtype
    res = [float(r) for r in config.dres]  # physics bounds: TRUE domain
    # air-window ceiling: first banned destination row along y (ops/window.py)
    ceil_row = (config.grid_res[1] - 3
                if (config.domain_res is not None
                    and config.grid_res[1] < config.domain_res[1]) else None)
    x0 = scal_ref[1 + 7 * max(n_inter, 1)]  # global coord of local plane 0
    # sharded: counter events on redundantly-computed halo planes belong to
    # the neighbor that owns them — count interior planes only
    c_lo, c_hi = (2, L - 3) if shard else (0, L - 1)

    @pl.when(t == 0)
    def _init():
        lost_ref[0, 0] = 0
        clamp_ref[0, 0] = 0
        defer_ref[0, 0] = 0
        ceil_ref[0, 0] = 0
        # halo columns of the migration temps and the "plane -1" ring slot
        # are consumed (occupancy-masked) before ever being written — zero
        # them so uninitialized VMEM can't leak garbage into the selects
        for ref in (*temps_A.values(), *temps_B.values()):
            ref[:] = jnp.zeros_like(ref)
        for ref in ring.values():
            ref[2] = jnp.zeros_like(ref[2])
        scr_nmovr[:] = jnp.zeros_like(scr_nmovr)

    occ_any = jnp.max(mass_ref[:]) > 0

    @pl.when((t < L) & jnp.logical_not(occ_any))
    def _skip_empty_plane():
        # empty plane: its ring slot only needs dead occupancy; the stale
        # pos/vel/C rows are never selected (rank stays -1 for mass == 0)
        rt = jax.lax.rem(t, 3)
        r_mass[rt] = jnp.zeros_like(r_mass[rt])
        scr_nmovr[jax.lax.rem(t, 4)] = jnp.zeros_like(scr_nmovr[0])

    @pl.when((t < L) & occ_any)
    def _compute():
        # ---- 1. G2P for plane t (g2p.glsl:52-108) ----
        pos = pos_ref[:]
        mass = mass_ref[:]
        occ = mass > 0
        gf = x0 + t.astype(dtype)  # global plane coordinate
        d = _plane_geometry(pos, gf, z, dtype)

        # Separable-moment G2P: factor the 27-tap gather over axes
        # (vel = Σ wx wy wz gv;  B_ab = Σ w gv_a dist_b) — contract z first
        # into two moments (S0 = Σ wz gv, S1 = Σ wz distz gv), then y into
        # three, then x. ~2.3x fewer VPU ops than the naive per-tap loop
        # (g2p.glsl:73-108 computes the same sums tap-by-tap).
        views = {-1: gv_m_ref, 0: gv_c_ref, 1: gv_p_ref}
        z_axis_w = [bspline.axis_weight(i, d[2]) for i in range(3)]
        y_axis_w = [bspline.axis_weight(i, d[1]) for i in range(3)]
        x_axis_w = [bspline.axis_weight(i, d[0]) for i in range(3)]
        dists = [[float(i - 1) - d[a] for i in range(3)] for a in range(3)]
        vel = jnp.zeros((3, k, pc), dtype)
        B = jnp.zeros((9, k, pc), dtype)
        if not _NOG2P:
            T = {}  # per dx: [T0(3), T1y(3), T1z(3)]
            for tx in range(3):
                dx = tx - 1
                ok = (gf + dx >= 0) & (gf + dx <= float(nx - 1))
                T0 = [jnp.zeros((k, pc), dtype) for _ in range(3)]
                T1y = [jnp.zeros((k, pc), dtype) for _ in range(3)]
                T1z = [jnp.zeros((k, pc), dtype) for _ in range(3)]
                for ty in range(3):
                    wy = y_axis_w[ty]
                    wyd = wy * dists[1][ty]
                    S0 = [jnp.zeros((k, pc), dtype) for _ in range(3)]
                    S1 = [jnp.zeros((k, pc), dtype) for _ in range(3)]
                    for tz in range(3):
                        wz = z_axis_w[tz]
                        wzd = wz * dists[2][tz]
                        lo = h + (ty - 1) * z + (tz - 1)
                        plane = views[dx][0, :, lo : lo + pc]  # [3, pc]
                        if fixed_mult is None:
                            gv = jnp.where(ok, plane, 0.0)
                        else:  # int32 fixed-point grid velocity: decode
                            # (ops/fixed_point.decode; g2p.glsl reads the
                            # same int grid the update pass re-encoded)
                            gv = jnp.where(ok, plane, 0).astype(
                                dtype
                            ) / np.float32(fixed_mult)
                        for a in range(3):
                            gva = gv[a][None, :]
                            S0[a] = S0[a] + wz * gva
                            S1[a] = S1[a] + wzd * gva
                    for a in range(3):
                        T0[a] = T0[a] + wy * S0[a]
                        T1y[a] = T1y[a] + wyd * S0[a]
                        T1z[a] = T1z[a] + wy * S1[a]
                T[tx] = (T0, T1y, T1z)
            vel_rows = []
            B_rows = [None] * 9
            for a in range(3):
                v = None
                bx = None
                by = None
                bz = None
                for tx in range(3):
                    wx = x_axis_w[tx]
                    wxd = wx * dists[0][tx]
                    T0, T1y, T1z = T[tx]
                    v = wx * T0[a] if v is None else v + wx * T0[a]
                    bx = wxd * T0[a] if bx is None else bx + wxd * T0[a]
                    by = wx * T1y[a] if by is None else by + wx * T1y[a]
                    bz = wx * T1z[a] if bz is None else bz + wx * T1z[a]
                vel_rows.append(v)
                B_rows[3 * a + 0] = bx
                B_rows[3 * a + 1] = by
                B_rows[3 * a + 2] = bz
            vel = jnp.stack(vel_rows)
            B = jnp.stack(B_rows)
        occ3 = occ[None]
        vel = jnp.where(occ3, vel, 0.0)
        Cmat = jnp.where(occ3, 4.0 * B, 0.0)

        # ---- 2. tail (identical to ops/bucketed.g2p_bucketed's tail) ----
        dt = scal_ref[0]
        pos = pos + vel * dt
        pos = jnp.stack([
            jnp.clip(pos[a], config.clamp_lo, res[a] - config.clamp_hi_offset)
            for a in range(3)
        ])
        for j in range(n_inter):
            base = 1 + 7 * j
            cx, cy, cz = scal_ref[base], scal_ref[base + 1], scal_ref[base + 2]
            radius = scal_ref[base + 3]
            strength = scal_ref[base + 4]
            inv_falloff = scal_ref[base + 5]
            active = scal_ref[base + 6]
            dvec = jnp.stack([pos[0] - cx, pos[1] - cy, pos[2] - cz])
            r2 = dvec[0] * dvec[0] + dvec[1] * dvec[1] + dvec[2] * dvec[2]
            inside = (r2 < radius * radius) & (active > 0)
            norm = jnp.sqrt(r2)
            safe_norm = jnp.where(norm > 0, norm, 1.0)
            dirn = dvec / safe_norm
            falloff = 1.0 + inv_falloff * (radius / safe_norm - 1.0)
            force = dirn * (strength * falloff)
            okf = inside & (norm > 0) & jnp.all(jnp.isfinite(force), axis=0)
            vel = vel + jnp.where(okf, force, 0.0)
        x_n = pos + vel
        vel = vel + jnp.stack([
            config.wall_stiffness * (
                jnp.maximum(config.wall_min - x_n[a], 0.0)
                + jnp.minimum((res[a] - config.wall_max_offset) - x_n[a], 0.0)
            )
            for a in range(3)
        ])

        # CFL bucket clamp: keep floor(pos) within one cell of the bucket so
        # next-substep B-spline weights stay in support and migration's ±1
        # move suffices (ADVICE r1: unclamped pos broke the invariant)
        intra = jax.lax.broadcasted_iota(jnp.int32, (k, pc), 1)
        cy_f = (intra // z).astype(dtype)
        cz_f = (intra % z).astype(dtype)
        cx_f = jnp.zeros_like(cy_f) + gf
        cell = jnp.stack([cx_f, cy_f, cz_f])
        pos_cfl = jnp.clip(pos, cell - 1.0, cell + 2.0 - _CFL_EPS)
        moved = occ & jnp.any(pos_cfl != pos, axis=0)
        in_interior = (t >= c_lo) & (t <= c_hi)
        clamp_ref[0, 0] += jnp.where(
            in_interior, jnp.sum(moved.astype(jnp.int32)), 0
        )
        pos = pos_cfl

        center = cell + 0.5
        pos = jnp.where(occ3, pos, center)
        vel = jnp.where(occ3, vel, 0.0)
        Cmat = jnp.where(occ3, Cmat, 0.0)

        # ---- 3. zy migration in VMEM ----
        # the plane's staged fields: packed mode rounds vel/C to bf16 HERE
        # (migration only permutes values, so pack-after-tail equals the
        # unpacked path's round-at-HBM-write exactly)
        if packed:
            staged = {"pos": pos, "vc": _pack_vc(vel, Cmat),
                      "mass": mass, "ids": ids_ref[:]}
        else:
            staged = {"pos": pos, "vel": vel, "C": Cmat,
                      "mass": mass, "ids": ids_ref[:]}

        if _NOMIG:  # perf attribution: skip migration, ring passthrough
            rt0 = jax.lax.rem(t, 3)
            for name, v in staged.items():
                ring[name][rt0] = v
            return

        rt = jax.lax.rem(t, 3)
        # zy-static fast path: when no particle crosses a z or y cell
        # boundary in this plane, both intra-plane phases are the identity —
        # the zy-settled state IS the tail output; skip the temp staging and
        # both selects and write the ring directly (in a settled pool most
        # planes take this path most substeps)
        zy_mov = occ & (
            (jnp.floor(pos[2]) != cz_f) | (jnp.floor(pos[1]) != cy_f)
        )
        zy_any = jnp.any(zy_mov) | jnp.logical_not(_GATE) | _FORCE_LIVE

        @pl.when(jnp.logical_not(zy_any))
        def _zy_static():
            for name, v in staged.items():
                ring[name][rt] = v

        @pl.when(zy_any)
        def _zy_full():
            for name, v in staged.items():
                if name in ("mass", "ids"):
                    temps_A[name][:, hm : hm + pc] = v
                else:
                    temps_A[name][:, :, hm : hm + pc] = v

            def write_B(name, kk, v, lo, cw):
                ref = temps_B[name]
                if name in ("mass", "ids"):
                    ref[kk, hm + lo : hm + lo + cw] = v
                else:
                    ref[:, kk, hm + lo : hm + lo + cw] = v

            def bulk_B(name, v, lo, cw):
                ref = temps_B[name]
                if name in ("mass", "ids"):
                    ref[:, hm + lo : hm + lo + cw] = v
                else:
                    ref[:, :, hm + lo : hm + lo + cw] = v

            def add_lost(v):
                lost_ref[0, 0] += jnp.where(in_interior, v, 0)

            def add_defer(v):
                defer_ref[0, 0] += jnp.where(in_interior, v, 0)

            def add_ceil(v):
                ceil_ref[0, 0] += jnp.where(in_interior, v, 0)

            _intra_phase(temps_A, write_B, 2, z, hm, k, dtype, add_lost,
                         add_defer, bulk_write=bulk_B, chunk=_CHUNK)

            def write_ring(name, kk, v, lo, cw):
                ref = ring[name]
                if name in ("mass", "ids"):
                    ref[rt, kk, lo : lo + cw] = v
                else:
                    ref[rt, :, kk, lo : lo + cw] = v

            def bulk_ring(name, v, lo, cw):
                ref = ring[name]
                if name in ("mass", "ids"):
                    ref[rt, :, lo : lo + cw] = v
                else:
                    ref[rt, :, :, lo : lo + cw] = v

            _intra_phase(temps_B, write_ring, 1, z, hm, k, dtype, add_lost,
                         add_defer, bulk_write=bulk_ring, chunk=_CHUNK,
                         ceil_row=ceil_row, add_ceil=add_ceil)

        # x-mover census of the zy-settled plane, for overflow rejection in
        # the output phase (a left-mover's acceptance at plane j-1 needs the
        # from-left count of plane j-2 — outside the 3-slot state ring, so
        # right-mover counts are kept in this cheap 4-deep [pc] ring)
        occ_t = r_mass[rt] > 0
        dx_t = _delta_axis(r_pos[rt][0], jnp.zeros((), dtype) + gf, occ_t)
        scr_nmovr[jax.lax.rem(t, 4)] = jnp.sum(
            (dx_t == 1.0).astype(jnp.int32), axis=0
        )

    @pl.when(t >= 1)
    def _output():
        # ---- 4. x migration for plane j = t-1 from the ring ----
        j = t - 1

        def write_velC(v3, v9, lo=0, cw=None):
            cw = pc if cw is None else cw
            vel_o[:, :, lo : lo + cw] = v3.astype(vel_o.dtype)
            C_o[:, :, lo : lo + cw] = v9.astype(C_o.dtype)

        if _NOMIG:  # perf attribution: copy plane j through unmigrated
            rcc = jax.lax.rem(t + 2, 3)
            pos_o[:] = r_pos[rcc]
            if packed:
                write_velC(*_unpack_vc(r_vc[rcc]))
            else:
                write_velC(r_vel[rcc], r_C[rcc])
            mass_o[:] = r_mass[rcc]
            ids_o[:] = r_ids[rcc]
            return
        rl = jax.lax.rem(t + 1, 3)  # (t-2) % 3: plane j-1
        rc = jax.lax.rem(t + 2, 3)  # (t-1) % 3: plane j
        rr = jax.lax.rem(t, 3)      # plane j+1
        gj = x0 + j.astype(dtype)   # global plane coordinate of plane j
        out_interior = (j >= c_lo) & (j <= c_hi)

        def occ_delta(pos_blk, mass_blk, gplane):
            occ = mass_blk > 0
            x_valid = (gplane >= 0) & (gplane <= float(nx - 1))
            occ = occ & x_valid
            delta = _delta_axis(pos_blk[0], gplane, occ)
            return occ, delta

        pos_c, pos_l, pos_r = r_pos[rc], r_pos[rl], r_pos[rr]
        occ_c, d_c = occ_delta(pos_c, r_mass[rc], gj)
        occ_l, d_l = occ_delta(pos_l, r_mass[rl], gj - 1.0)
        occ_r, d_r = occ_delta(pos_r, r_mass[rr], gj + 1.0)

        def write_out(name, kk, v, lo, cw):
            if name == "vc":  # unpack at the HBM write (outputs stay the
                # plain [3]/[9]-row bf16 layout; kernel P is untouched)
                v3, v9 = _unpack_vc(v)
                vel_o[:, kk, lo : lo + cw] = v3.astype(vel_o.dtype)
                C_o[:, kk, lo : lo + cw] = v9.astype(C_o.dtype)
                return
            ref = {"pos": pos_o, "vel": vel_o, "C": C_o,
                   "mass": mass_o, "ids": ids_o}[name]
            if name in ("mass", "ids"):
                ref[kk, lo : lo + cw] = v.astype(ref.dtype)
            else:
                ref[:, kk, lo : lo + cw] = v.astype(ref.dtype)  # bf16 ok

        if packed:
            vc_fields = [("vc", (r_vc[rc], r_vc[rl], r_vc[rr]), False)]
        else:
            vc_fields = [
                ("vel", (r_vel[rc], r_vel[rl], r_vel[rr]), False),
                ("C", (r_C[rc], r_C[rl], r_C[rr]), False),
            ]
        fields = [
            ("pos", (pos_c, pos_l, pos_r), False),
            *vc_fields,
            ("mass", (r_mass[rc], r_mass[rl], r_mass[rr]), False),
            ("ids", (r_ids[rc], r_ids[rl], r_ids[rr]), True),
        ]

        def passthrough(pos_vals, c0, cw):
            """Plane j passes through unchanged on a span (occ-masked; dead
            slots hold stale zy-select scratch and must write the select
            path's zeros/sentinel)."""
            s_ = lambda x: x[..., c0 : c0 + cw]
            occk = s_(occ_c)[None]
            pos_o[:, :, c0 : c0 + cw] = jnp.where(occk, s_(pos_vals), 0.0)
            if packed:
                write_velC(*_unpack_vc(jnp.where(occk, s_(r_vc[rc]), 0)),
                           lo=c0, cw=cw)
            else:
                write_velC(jnp.where(occk, s_(r_vel[rc]), 0.0),
                           jnp.where(occk, s_(r_C[rc]), 0.0), lo=c0, cw=cw)
            mass_o[:, c0 : c0 + cw] = s_(r_mass[rc])
            ids_o[:, c0 : c0 + cw] = jnp.where(
                s_(occ_c), s_(r_ids[rc]), _INT_SENTINEL)

        # zero-mover fast path: no particle crosses an x boundary in the
        # three ring planes -> plane j passes through unchanged (see
        # _intra_phase for why identity is exact)
        any_mover = (
            jnp.any(d_c != 0.0) | jnp.any(d_l != 0.0) | jnp.any(d_r != 0.0)
        ) | jnp.logical_not(_GATE) | _FORCE_LIVE

        @pl.when(jnp.logical_not(any_mover))
        def _copy_through():
            passthrough(pos_c, 0, pc)

        @pl.when(any_mover)
        def _full_select():
            # ---- overflow rejection along x (mass conservation) ----
            # Same conservative test as _reject_intra, on ring planes: a
            # mover is rejected iff occ0(dest) + its index among dest's
            # incoming candidates reaches K. Each side of the exchange
            # evaluates the identical formula from the identical ring
            # state, so source and destination always agree.
            occ0_c = jnp.sum(occ_c.astype(jnp.int32), axis=0)  # plane j
            occ0_l = jnp.sum(occ_l.astype(jnp.int32), axis=0)  # plane j-1
            occ0_r = jnp.sum(occ_r.astype(jnp.int32), axis=0)  # plane j+1
            movr_c = occ_c & (d_c == 1.0)
            movl_c = occ_c & (d_c == -1.0)
            rank_r_c, _ = _running_rank(movr_c)
            rank_l_c, _ = _running_rank(movl_c)
            nmovr_jm2 = scr_nmovr[jax.lax.rem(t + 1, 4)]  # (t-3)%4: plane j-2
            nmovr_jm1 = scr_nmovr[jax.lax.rem(t + 2, 4)]  # (t-2)%4: plane j-1
            rej_own = (movr_c & (occ0_r[None] + rank_r_c >= k)) | (
                movl_c & (occ0_l[None] + nmovr_jm2[None] + rank_l_c >= k)
            )
            d_c2 = jnp.where(rej_own, 0.0, d_c)
            # rejected movers stay in plane j with pos clamped inside it
            pos_c_x = jnp.where(
                rej_own,
                jnp.clip(pos_c[0], gj, gj + 1.0 - _CFL_EPS),
                pos_c[0],
            )
            pos_c2 = jnp.stack([pos_c_x, pos_c[1], pos_c[2]])
            defer_ref[0, 0] += jnp.where(
                out_interior, jnp.sum(rej_own.astype(jnp.int32)), 0
            )

            # incoming candidates rejected by THIS plane (their stay is
            # handled by their own plane's output step, same formula)
            movr_l = occ_l & (d_l == 1.0)
            rank_r_l, _ = _running_rank(movr_l)
            d_l2 = jnp.where(
                movr_l & (occ0_c[None] + rank_r_l >= k), 0.0, d_l
            )
            movl_r = occ_r & (d_r == -1.0)
            rank_l_r, _ = _running_rank(movl_r)
            d_r2 = jnp.where(
                movl_r & (occ0_c[None] + nmovr_jm1[None] + rank_l_r >= k),
                0.0,
                d_r,
            )

            fields2 = [("pos", (pos_c2, pos_l, pos_r), False)] + fields[1:]
            _, ranks, total = _rank_and_masks(
                d_c2, d_l2, d_r2, occ_c, occ_l, occ_r
            )
            if _NOSEL:  # attribution: skip the x select, copy plane through
                passthrough(pos_c2, 0, pc)
                return
            if not (_GATE and _CHUNK and pc % _CHUNK == 0 and pc > _CHUNK):
                lost_x = _gated_select(
                    k, ranks, total, fields2,
                    lambda name, kk, v: write_out(name, kk, v, 0, pc),
                    zero_all=True,
                )
                lost_ref[0, 0] += jnp.where(out_interior, lost_x, 0)
                return

            # chunk-level gating: x migration never changes the intra-plane
            # column, so a span with no x-mover in ANY of the three ring
            # planes passes plane j's span through unchanged (masked like
            # the plane-level copy-through above)
            mov_col = jnp.max(
                jnp.where(
                    (d_c2 != 0.0) | (d_l2 != 0.0) | (d_r2 != 0.0), 1.0, 0.0
                ),
                axis=0,
            )
            for c0 in range(0, pc, _CHUNK):
                span_any = (jnp.max(mov_col[c0 : c0 + _CHUNK]) > 0.0) | _FORCE_LIVE

                @pl.when(span_any)
                def _(c0=c0):
                    sl = lambda x: x[..., c0 : c0 + _CHUNK]
                    f_ch = [
                        (name, tuple(sl(c) for c in cands), is_int)
                        for name, cands, is_int in fields2
                    ]
                    r_ch = [sl(r) for r in ranks]

                    def w(name, kk, v):
                        write_out(name, kk, v, c0, _CHUNK)

                    lost_x = _gated_select(
                        k, r_ch, sl(total), f_ch, w, zero_all=True
                    )
                    lost_ref[0, 0] += jnp.where(out_interior, lost_x, 0)

                @pl.when(jnp.logical_not(span_any))
                def _(c0=c0):
                    passthrough(pos_c2, c0, _CHUNK)

    if emit_splats:
        # ---- 5. per-cell splat extraction for plane j, IN-KERNEL ----
        # The reference's g2p writes its render texture inside the same
        # compute pass (g2p.glsl:149-150); emitting here saves the
        # render-time re-read of the whole state (~1.9 ms/frame at 1M,
        # scripts/render_attrib.py). Identical math and slot order to
        # render/extract_kernel._extract_kernel: (pixel x, pixel y, linear
        # depth, |vel|) of the plane's nearest live particle per cell,
        # depth == _CELL_BG marks empty cells.
        @pl.when(t >= 1)
        def _emit_splats():
            rb = 2 + 7 * max(n_inter, 1)  # render scals base (after x0)
            p = pos_o[:].astype(jnp.float32)
            v = vel_o[:].astype(jnp.float32)
            occ = mass_o[:] > 0
            vp = [
                scal_ref[rb + 4 * i] * p[0]
                + scal_ref[rb + 4 * i + 1] * p[1]
                + scal_ref[rb + 4 * i + 2] * p[2]
                + scal_ref[rb + 4 * i + 3]
                for i in range(3)
            ]
            depth = -vp[2]
            safe = jnp.where(depth > 1e-6, depth, 1e-6)
            px = scal_ref[rb + 13] + scal_ref[rb + 12] * vp[0] / safe
            py = scal_ref[rb + 14] - scal_ref[rb + 12] * vp[1] / safe
            vmag = jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])
            valid = occ & (depth > scal_ref[rb + 15])
            dmask = jnp.where(valid, depth, _CELL_BG)
            dmin = jnp.min(dmask, axis=0)
            sel = [jnp.zeros((pc,), jnp.float32) for _ in range(3)]
            found = jnp.zeros((pc,), jnp.bool_)
            for kk in range(k):
                m = valid[kk] & (dmask[kk] == dmin) & jnp.logical_not(found)
                sel[0] = jnp.where(m, px[kk], sel[0])
                sel[1] = jnp.where(m, py[kk], sel[1])
                sel[2] = jnp.where(m, vmag[kk], sel[2])
                found = found | m
            splat_o[0, :] = sel[0]
            splat_o[1, :] = sel[1]
            splat_o[2, :] = jnp.where(found, dmin, _CELL_BG)
            splat_o[3, :] = sel[2]
            # row 4: the cell's live on-screen particle COUNT — the
            # thickness pass deposits count * 2r per cell (column mass at
            # cell granularity), so the SSFR thickness splat rides this
            # kernel instead of a 1M-element XLA scatter-add
            # (render/splat.thickness_deposit; VERDICT r4 next #4)
            splat_o[4, :] = jnp.sum(valid.astype(jnp.float32), axis=0)


# ----------------------------------------------------------------- dispatch


def _vmem_bytes(config: SimConfig, k: int) -> int:
    z = config.grid_res[2]
    pc = config.grid_res[1] * z
    pcp_m = pc + 2 * _mig_halo(z)
    pcp_g = pc + 2 * _halo(config)
    # packed migration (bf16 storage): vel+C ride temps/ring as 6 int32
    # rows instead of 12 f32 rows — the select row count AND the VMEM
    # working set shrink (17 -> 11 rows)
    rows = 11 if config.storage_dtype == "bfloat16" else 17
    temps = 2 * rows * k * pcp_m * 4
    ring = 3 * rows * k * pc * 4
    blocks = 2 * (5 + 17) * k * pc * 4  # double-buffered in+out plane blocks
    gvel = 2 * 3 * 3 * pcp_g * 4
    return temps + ring + blocks + gvel


def fused_supported(config: SimConfig, k: int | None = None) -> bool:
    """3D configs whose plane working set fits VMEM (fixed-point included:
    the int32 grid swaps dtype, not bytes)."""
    if config.dim != 3:
        return False
    pc = config.grid_res[1] * config.grid_res[2]
    if pc % 128 != 0:
        return False
    k = k if k is not None else config.bin_capacity
    return _vmem_bytes(config, k) <= 110 * 2**20


@functools.partial(
    jax.jit,
    static_argnames=("config", "n_inter", "shard", "interpret", "emit_splats"),
)
def _g2p_migrate_fused(
    state: BucketState,
    gvel_pad: jax.Array,
    scals: jax.Array,
    config: SimConfig,
    n_inter: int,
    shard: bool = False,
    interpret: bool = False,
    emit_splats: bool = False,
):
    """Sharded mode: `state` is a shard's padded slab (L = loc_x + 4 planes),
    `gvel_pad` carries one extra plane per side ([L+2, 3, pcp]), and `scals`
    ends with x0 (the global plane coordinate of local plane 0). Outputs all
    L planes; the caller keeps the loc_x interior ones."""
    dim, k, c = state.pos.shape
    z = config.grid_res[2]
    pc = config.grid_res[1] * z
    L = c // pc  # local planes (== grid nx when unsharded)
    h = _halo(config)
    hm = _mig_halo(z)
    dtype = state.pos.dtype
    go = 1 if shard else 0  # gvel halo-plane offset

    def in_plane(lead):
        ndim = len(lead) + 2

        def index(t):
            idx = [0] * ndim
            idx[-1] = jnp.clip(t, 0, L - 1)
            return tuple(idx)

        return pl.BlockSpec((*lead, k, pc), index, memory_space=pltpu.VMEM)

    def gv_view(dx):
        return pl.BlockSpec(
            (1, 3, pc + 2 * h),
            lambda t, dx=dx: (jnp.clip(t + dx + go, 0, L - 1 + 2 * go), 0, 0),
            memory_space=pltpu.VMEM,
        )

    def out_plane(lead):
        ndim = len(lead) + 2

        def index(t):
            idx = [0] * ndim
            idx[-1] = jnp.maximum(t - 1, 0)
            return tuple(idx)

        return pl.BlockSpec((*lead, k, pc), index, memory_space=pltpu.VMEM)

    smem_counter = pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM)

    n_scal = scals.shape[0]
    out_specs = [
        out_plane((3,)),
        out_plane((3,)),
        out_plane((9,)),
        out_plane(()),
        out_plane(()),
        smem_counter,
        smem_counter,
        smem_counter,
        smem_counter,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((3, k, c), dtype),
        jax.ShapeDtypeStruct((3, k, c), state.vel.dtype),
        jax.ShapeDtypeStruct((9, k, c), state.C.dtype),
        jax.ShapeDtypeStruct((k, c), dtype),
        jax.ShapeDtypeStruct((k, c), jnp.int32),
        jax.ShapeDtypeStruct((1, 1), jnp.int32),
        jax.ShapeDtypeStruct((1, 1), jnp.int32),
        jax.ShapeDtypeStruct((1, 1), jnp.int32),
        jax.ShapeDtypeStruct((1, 1), jnp.int32),
    ]
    if emit_splats:
        out_specs.append(pl.BlockSpec(
            (5, pc), lambda t: (0, jnp.maximum(t - 1, 0)),
            memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((5, c), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(
            _fused_kernel, config=config, n_inter=n_inter, shard=shard,
            fixed_mult=config.fixed_point_mult if config.fixed_point else None,
            emit_splats=emit_splats,
        ),
        grid=(L + 1,),
        in_specs=[
            in_plane((3,)),
            in_plane(()),
            in_plane(()),
            gv_view(-1),
            gv_view(0),
            gv_view(1),
            pl.BlockSpec((n_scal,), lambda t: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=(
            [  # packed: vel+C as 6 bf16-pair int32 rows (17 -> 11 rows)
                pltpu.VMEM((3, k, pc + 2 * hm), dtype),
                pltpu.VMEM((6, k, pc + 2 * hm), jnp.int32),
                pltpu.VMEM((k, pc + 2 * hm), dtype),
                pltpu.VMEM((k, pc + 2 * hm), jnp.int32),
                pltpu.VMEM((3, k, pc + 2 * hm), dtype),
                pltpu.VMEM((6, k, pc + 2 * hm), jnp.int32),
                pltpu.VMEM((k, pc + 2 * hm), dtype),
                pltpu.VMEM((k, pc + 2 * hm), jnp.int32),
                pltpu.VMEM((3, 3, k, pc), dtype),
                pltpu.VMEM((3, 6, k, pc), jnp.int32),
                pltpu.VMEM((3, k, pc), dtype),
                pltpu.VMEM((3, k, pc), jnp.int32),
                pltpu.VMEM((4, pc), jnp.int32),
            ]
            if config.storage_dtype == "bfloat16"
            else [
                pltpu.VMEM((3, k, pc + 2 * hm), dtype),
                pltpu.VMEM((3, k, pc + 2 * hm), dtype),
                pltpu.VMEM((9, k, pc + 2 * hm), dtype),
                pltpu.VMEM((k, pc + 2 * hm), dtype),
                pltpu.VMEM((k, pc + 2 * hm), jnp.int32),
                pltpu.VMEM((3, k, pc + 2 * hm), dtype),
                pltpu.VMEM((3, k, pc + 2 * hm), dtype),
                pltpu.VMEM((9, k, pc + 2 * hm), dtype),
                pltpu.VMEM((k, pc + 2 * hm), dtype),
                pltpu.VMEM((k, pc + 2 * hm), jnp.int32),
                pltpu.VMEM((3, 3, k, pc), dtype),
                pltpu.VMEM((3, 3, k, pc), dtype),
                pltpu.VMEM((3, 9, k, pc), dtype),
                pltpu.VMEM((3, k, pc), dtype),
                pltpu.VMEM((3, k, pc), jnp.int32),
                pltpu.VMEM((4, pc), jnp.int32),
            ]
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
    )(state.pos, state.mass, state.ids, gvel_pad, gvel_pad, gvel_pad, scals)
    pos, vel, C9, mass, ids, lost, clamped, deferred, ceil = outs[:9]
    splats = outs[9] if emit_splats else None

    out_state = BucketState(
        pos=pos,
        vel=vel,
        C=C9.reshape(3, 3, k, c),
        mass=mass,
        ids=ids,
        lost=state.lost + lost[0, 0],
        cfl_clamped=state.cfl_clamped + clamped[0, 0],
        deferred=state.deferred + deferred[0, 0],
        ceiling=state.ceiling + ceil[0, 0],
    )
    return (out_state, splats) if emit_splats else out_state


def _pack_scals(fp: FluidParams, interactions: Sequence, dtype, x0=None) -> jax.Array:
    vals = [jnp.asarray(fp.dt, dtype)]
    for it in interactions:
        vals += [
            jnp.asarray(it.center[0], dtype),
            jnp.asarray(it.center[1], dtype),
            jnp.asarray(it.center[2], dtype),
            jnp.asarray(it.radius, dtype),
            jnp.asarray(it.strength, dtype),
            jnp.asarray(it.inv_falloff, dtype),
            jnp.asarray(it.active, dtype),
        ]
    if not interactions:  # pad so the SMEM block shape is never length-1
        vals += [jnp.zeros((), dtype)] * 7
    # global plane coordinate of the local array's plane 0 (sharded slabs)
    vals.append(jnp.asarray(0.0 if x0 is None else x0, dtype))
    return jnp.stack(vals)


def substep_fused(
    state: BucketState,
    config: SimConfig,
    fp: FluidParams,
    interactions: Sequence = (),
    interpret: bool = False,
) -> BucketState:
    """Full substep: P2G kernels (A/B) + XLA grid update + fused kernel F."""
    if config.dim == 2:
        from . import kernels2d

        if kernels2d.supported2d(config, state.pos.shape[1]):
            return kernels2d.substep2d(
                state, config, fp, interactions, interpret=interpret
            )
    from .p2g_fused import p2g_update_pallas, p2g_update_supported

    if not fused_supported(config, state.pos.shape[1]) or (
        # fixed-point needs kernel P (the split A/B kernels + XLA glue are
        # float-only); out-of-envelope fixed configs run the XLA engine
        config.fixed_point and not p2g_update_supported(config)
    ):
        if config.domain_res is not None:
            # the per-pass fallback kernels do NOT enforce the air-window
            # ceiling band — a windowed config routed there could migrate
            # movers into (and off the top of) the window, losing particles
            # silently. Fail loudly instead: windowed runs must stay on the
            # fused path or use mode="bucketed" (whose reject_overflow does
            # enforce the band).
            raise ValueError(
                "windowed config (domain_res set) is outside the fused "
                "kernel envelope; the per-pass fallback does not enforce "
                "the ceiling band. Use mode='bucketed', a larger window "
                "quantum, or a non-windowed config."
            )
        from .bucket_kernels import substep as substep_planes

        return substep_planes(state, config, fp, interactions, interpret=interpret)

    gvel = _gvel_for(state, config, fp, interpret)
    scals = _pack_scals(fp, interactions, state.pos.dtype)
    return _g2p_migrate_fused(
        state, gvel, scals, config, len(interactions), interpret=interpret
    )


def _gvel_for(state, config, fp, interpret):
    """P2G + grid update -> halo-padded grid velocity (kernel P, or the
    split A/B kernels + XLA glue under the attribution knobs)."""
    from .p2g_fused import p2g_update_pallas, p2g_update_supported

    nx = config.grid_res[0]
    pc = config.num_cells // nx
    h = _halo(config)

    if _NOP2G1:  # perf attribution: zero grid, skip P2G entirely
        return jnp.zeros(
            (nx, 3, pc + 2 * h),
            jnp.int32 if config.fixed_point else state.pos.dtype,
        )
    if p2g_update_supported(config) and (
        config.fixed_point or not (_NO_KP or _NOP2G2)
    ):  # fixed-point always takes kernel P: the split path is float-only
        # kernel P: P2G pass 1 + pass 2 + grid update in one sweep; emits
        # the halo-padded grid-velocity array directly (no XLA glue)
        return p2g_update_pallas(state, fp, config, interpret=interpret)
    from .bucket_kernels import p2g_pallas
    from ..grid import update_grid

    grid = p2g_pallas(state, config, fp, skip_p2g2=_NOP2G2,
                      interpret=interpret)
    grid = update_grid(grid, config, fp)
    gvel = jnp.swapaxes(grid.mom.reshape(3, nx, pc), 0, 1)  # [nx, 3, pc]
    return jnp.pad(gvel, ((0, 0), (0, 0), (h, h)))


def render_scals_for(view, cam) -> jax.Array:
    """[16] f32 render scalars for the in-kernel splat emission: world->view
    rows (3x4) + (focal_px, w/2, h/2, near) — the same layout
    render/extract_kernel.extract_cell_splats packs."""
    view = jnp.asarray(view).astype(jnp.float32)
    return jnp.concatenate([
        view[:3, :4].reshape(-1),
        jnp.asarray([cam.focal_px, cam.width / 2.0, cam.height / 2.0,
                     cam.near], jnp.float32),
    ])


def substep_fused_emit(
    state: BucketState,
    config: SimConfig,
    fp: FluidParams,
    interactions: Sequence,
    render_scals: jax.Array,
    interpret: bool = False,
):
    """substep_fused + in-kernel per-cell splat emission (the reference's
    g2p render-texture write, g2p.glsl:149-150): returns (state, splats
    [5, C] — px, py, depth, |vel|, live count) with splats identical to
    render/extract_kernel.extract_cell_splats(state_after). Only valid for
    configs on the fused path (fused_supported and not 2D); frame loops
    fall back to the post-hoc extract kernel otherwise."""
    assert config.dim == 3 and fused_supported(config, state.pos.shape[1])
    gvel = _gvel_for(state, config, fp, interpret)
    scals = jnp.concatenate([
        _pack_scals(fp, interactions, state.pos.dtype),
        render_scals.astype(state.pos.dtype),
    ])
    return _g2p_migrate_fused(
        state, gvel, scals, config, len(interactions), interpret=interpret,
        emit_splats=True,
    )
