#!/usr/bin/env python
"""VPU roofline microbenchmarks for the substep ceiling argument
(ARCHITECTURE.md "Roofline"). Measures, with the SAME plane-sweep kernel
shape as the production kernels (64-step grid, [K, pc] blocks, VMEM
accumulators):

  1. fma     — sustained fused elementwise rate on [K, pc] data (the tap
               compute's resource): R chained multiply-adds per plane.
  2. rmw     — unaligned accumulator row read-modify-writes
               (gmass[p, lo:lo+pc] += row), 27 rows/plane at the kernel P
               offsets, vs
  3. rmw_al  — the same count of 128-aligned row RMWs (offset 0),
               isolating the lane-shift penalty.
  4. select  — the migration select inner pattern: per output slot,
               sum over 3K candidate rows of where(rank == kk, cand, 0)
               for F field rows.

Each prints achieved elem-ops/s (counting one op per output element per
arithmetic primitive). Fresh process per variant recommended:
  python scripts/vpu_roofline.py {fma|rmw|rmw_al|select}
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

K, Z, NY, NX = 8, 64, 56, 64  # the 1M bench config's shapes
PC = NY * Z
H = Z + 1
W = PC + 2 * H


def _fma_kernel(x_ref, o_ref, acc, *, reps):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        acc[:] = x_ref[:]

    a = acc[:]
    for i in range(reps):
        a = a * np.float32(1.0000001) + np.float32(1e-7)
    acc[:] = a

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = acc[:]


def _rmw_kernel(x_ref, o_ref, gm, *, reps, aligned, support=3):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        gm[:] = jnp.zeros_like(gm)

    row = x_ref[0]  # [pc]
    # kernel P's support^2 intra-plane offsets x `reps` repeats. support=3
    # is the production 27-tap B-spline; support=4 models the AMORTIZED
    # MIGRATION proposal (VERDICT r4 weak #1: buckets allowed to go ±1 cell
    # stale between every-2nd-substep migrations -> the tap window relative
    # to the bucket grows to 4^3 = 16 intra-plane rows x 4 target planes);
    # support=5 is the strict ±1-slack window ([floor-1, floor+1] taps from
    # buckets that may themselves be off by ±1 -> 5 offsets per axis).
    half = (support - 1) // 2
    offs = tuple(range(-half, support - half))
    base = max(H, 2 * Z + 2)
    los = [base + dy * Z + dz for dy in offs for dz in offs]
    for r in range(reps):
        for i, lo in enumerate(los):
            off = 0 if aligned else lo
            p = (t + (i % support) - half)
            p = jnp.clip(p, 0, NX - 1)
            gm[p, off : off + PC] += row

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = gm[:, base : base + PC]


def _rmw_weighted_kernel(x_ref, o_ref, gm, *, reps, support):
    """The COMPUTE-INCLUSIVE tap row: per row, a masked-weight evaluation on
    the full [K, PC] block (2 FMAs — the per-axis weight-table product of
    both the production wY*wZ scatter and the amortized-migration masked
    formulation), a K-reduce, then the row RMW. This prices the amortized
    proposal honestly: the pure-RMW probe (rmw/rmw4/rmw5) shows marginal
    ROWS are nearly free (latency-bound), so the real marginal cost of a
    wider tap window is this per-row compute."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        gm[:] = jnp.zeros_like(gm)

    xs = x_ref[:]  # [K, PC]
    half = (support - 1) // 2
    offs = tuple(range(-half, support - half))
    base = max(H, 2 * Z + 2)
    los = [base + dy * Z + dz for dy in offs for dz in offs]
    for r in range(reps):
        for i, lo in enumerate(los):
            w = xs * np.float32(0.25 + 0.001 * i) + np.float32(1e-4 * (r + 1))
            w = w * xs
            s = jnp.sum(w, axis=0)  # [PC]
            p = jnp.clip(t + (i % support) - half, 0, NX - 1)
            gm[p, lo : lo + PC] += s

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = gm[:, base : base + PC]


def _rmw_split_kernel(x_ref, o_ref, gm, *, reps, ways):
    """The 27-row RMW pattern spread across `ways` independent accumulator
    copies (round-robin), breaking the store->load RAW chains; combined
    once at the end. Tests the hypothesis that the scatter cost is VMEM
    RMW serialization, not shift arithmetic."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        gm[:] = jnp.zeros_like(gm)

    row = x_ref[0]
    los = [H + dy * Z + dz for dy in (-1, 0, 1) for dz in (-1, 0, 1)]
    for r in range(reps):
        for i, lo in enumerate(los):
            p = jnp.clip(t + (i % 3) - 1, 0, NX - 1)
            gm[i % ways, p, lo : lo + PC] += row

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        acc = gm[0, :, H : H + PC]
        for w_ in range(1, gm.shape[0]):
            acc = acc + gm[w_, :, H : H + PC]
        o_ref[:] = acc


def _rmw2d_kernel(x_ref, o_ref, gm, *, reps, ways):
    """Same 27-rows/plane RMW traffic, but each row stored 2D [8, PC//8]
    (column-major packing of the flat plane) — tests whether Mosaic's 1D
    row layout (one sublane of eight used) is the 8x-below-peak culprit."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        gm[:] = jnp.zeros_like(gm)

    row = x_ref[:]  # [8, PC] -> take [8, PC//8] slice as the 2D row
    row2 = row[:, : PC // 8]
    for r in range(reps):
        for i in range(9):
            p = jnp.clip(t + (i % 3) - 1, 0, NX - 1)
            gm[i % ways, p, :, : PC // 8] += row2

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        acc = gm[0]
        for w_ in range(1, gm.shape[0]):
            acc = acc + gm[w_]
        o_ref[:] = acc


def _rmw_comb_kernel(x_ref, o_ref, gm, *, reps):
    """The value-combine scatter: per target plane, the 9 intra-plane tap
    rows are padded to W, value-rolled to their offsets, and summed in
    registers — ONE full-row VMEM RMW per plane-target instead of nine.
    Tests the roll+combine rate vs the per-tap RMW pattern (_rmw_kernel)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        gm[:] = jnp.zeros_like(gm)

    row = x_ref[0:1, :]  # [1, pc] — stand-in for one K-reduced tap row
    los = [H + dy * Z + dz for dy in (-1, 0, 1) for dz in (-1, 0, 1)]
    for r in range(reps):
        for dx in (-1, 0, 1):
            comb = None
            for i, lo in enumerate(los):
                v = jnp.pad(row * np.float32(1.0 + i), ((0, 0), (0, W - PC)))
                v = pltpu.roll(v, shift=lo, axis=1)
                comb = v if comb is None else comb + v
            p = jnp.clip(t + dx, 0, NX - 1)
            gm[pl.ds(p, 1), :] += comb

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = gm[:, H : H + PC]


def _rmw_comb8_kernel(x_ref, o_ref, gm, *, reps):
    """8-plane-batched value-combine: tap rows for 8 planes at once
    ([8, W], full sublane density), 9 lane-rolls + sum per dx, then ONE
    [8, W] sublane-offset RMW per dx — 27 single-plane RMWs replaced by
    3 batched ones (1/9 the accumulator bytes, 8x denser rolls)."""
    t = pl.program_id(0)  # one step per 8-plane batch

    @pl.when(t == 0)
    def _():
        gm[:] = jnp.zeros_like(gm)

    row8 = jnp.pad(x_ref[:, :], ((0, 0), (0, W - PC)))  # [8, W] tap rows
    los = [H + dy * Z + dz for dy in (-1, 0, 1) for dz in (-1, 0, 1)]
    for r in range(reps):
        for dx in (-1, 0, 1):
            comb = None
            for i, lo in enumerate(los):
                v = pltpu.roll(row8 * np.float32(1.0 + i), shift=lo, axis=1)
                comb = v if comb is None else comb + v
            # 8-aligned batched RMW (production would add two halo rows
            # per batch for the dx spill — minor). dx kept for op-count.
            gm[pl.ds(t * 8, 8), :] += comb * np.float32(1.0 + dx * 0.1)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = gm[:, H : H + PC]


def _select_kernel(x_ref, o_ref, sc, *, fields, kslots, cand_dtype=None):
    """Per plane: the _gated_select inner pattern — 3 candidate classes x K
    rows, `fields` field rows, `kslots` output slots. `cand_dtype` carries
    the field rows in a narrower type (bf16: does the platform's per-byte
    VPU service rate apply to 16-bit rows?)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        sc[:] = x_ref[:]

    cand = sc[:]  # [K, pc] stand-in for one candidate class
    rank = (cand * 8.0).astype(jnp.int32)  # fake ranks, data-dependent
    if cand_dtype is not None:
        cand16 = cand.astype(cand_dtype)
    out = None
    for kk in range(kslots):
        for f in range(fields):
            acc = None
            for ci in range(3):  # 3 candidate classes
                if cand_dtype is not None:
                    s = jnp.sum(
                        jnp.where(rank == kk,
                                  cand16 + jnp.asarray(f, cand_dtype),
                                  jnp.asarray(0.0, cand_dtype)),
                        axis=0)
                    s = s.astype(jnp.float32)
                else:
                    s = jnp.sum(
                        jnp.where(rank == kk, cand + np.float32(f), 0.0),
                        axis=0)
                acc = s if acc is None else acc + s
            out = acc if out is None else out + acc
    sc[0] = out  # keep it live

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = sc[:]


def run(which: str):
    x = jnp.asarray(np.random.default_rng(0).uniform(0.2, 0.8, (K, PC)),
                    jnp.float32)
    if which == "fma":
        reps = 64
        f = pl.pallas_call(
            functools.partial(_fma_kernel, reps=reps),
            grid=(NX,),
            in_specs=[pl.BlockSpec((K, PC), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((K, PC), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, PC), jnp.float32),
            scratch_shapes=[pltpu.VMEM((K, PC), jnp.float32)],
        )
        ops = 2 * reps * K * PC * NX  # mul+add per element
    elif which in ("rmw", "rmw_al", "rmw4", "rmw5"):
        reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
        support = {"rmw4": 4, "rmw5": 5}.get(which, 3)
        base = max(H, 2 * Z + 2)
        wid = base + 2 * Z + 2 + PC + 2  # widest offset + row length
        f = pl.pallas_call(
            functools.partial(_rmw_kernel, reps=reps,
                              aligned=which == "rmw_al", support=support),
            grid=(NX,),
            in_specs=[pl.BlockSpec((K, PC), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((NX, PC), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NX, PC), jnp.float32),
            scratch_shapes=[pltpu.VMEM((NX, wid), jnp.float32)],
        )
        ops = support * support * reps * PC * NX  # one add/element/row
    elif which.startswith("rmww"):
        reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
        support = int(which[len("rmww"):] or 3)
        base = max(H, 2 * Z + 2)
        wid = base + 2 * Z + 2 + PC + 2
        f = pl.pallas_call(
            functools.partial(_rmw_weighted_kernel, reps=reps,
                              support=support),
            grid=(NX,),
            in_specs=[pl.BlockSpec((K, PC), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((NX, PC), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NX, PC), jnp.float32),
            scratch_shapes=[pltpu.VMEM((NX, wid), jnp.float32)],
        )
        # 3 FMA-ish ops on [K, PC] + K-reduce + row add, per row
        ops = support * support * reps * (4 * K + 1) * PC * NX
    elif which.startswith("rmw_split"):
        ways = int(which[len("rmw_split"):] or 3)
        reps = 3
        f = pl.pallas_call(
            functools.partial(_rmw_split_kernel, reps=reps, ways=ways),
            grid=(NX,),
            in_specs=[pl.BlockSpec((K, PC), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((NX, PC), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NX, PC), jnp.float32),
            scratch_shapes=[pltpu.VMEM((ways, NX, W), jnp.float32)],
        )
        ops = 9 * reps * PC * NX
    elif which.startswith("rmw2d"):
        ways = int(which[len("rmw2d"):] or 9)
        reps = 3
        f = pl.pallas_call(
            functools.partial(_rmw2d_kernel, reps=reps, ways=ways),
            grid=(NX,),
            in_specs=[pl.BlockSpec((K, PC), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((NX, 8, PC // 8), lambda t: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NX, 8, PC // 8), jnp.float32),
            scratch_shapes=[pltpu.VMEM((ways, NX, 8, PC // 8), jnp.float32)],
        )
        ops = 9 * reps * PC * NX
    elif which == "rmw_comb":
        reps = 3
        f = pl.pallas_call(
            functools.partial(_rmw_comb_kernel, reps=reps),
            grid=(NX,),
            in_specs=[pl.BlockSpec((K, PC), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((NX, PC), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NX, PC), jnp.float32),
            scratch_shapes=[pltpu.VMEM((NX, W), jnp.float32)],
        )
        ops = 9 * reps * PC * NX  # same logical tap-row traffic as `rmw`
    elif which == "rmw_comb8":
        reps = 3
        f = pl.pallas_call(
            functools.partial(_rmw_comb8_kernel, reps=reps),
            grid=(NX // 8,),  # 8 planes per step — same total tap-row count
            in_specs=[pl.BlockSpec((K, PC), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((NX, PC), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NX, PC), jnp.float32),
            scratch_shapes=[pltpu.VMEM((NX, W), jnp.float32)],
        )
        # 9 tap rows x 8 planes x reps per step, NX/8 steps — identical
        # logical traffic to `rmw`
        ops = 9 * reps * PC * NX
    elif which.startswith("select"):
        # select     : 17 f32 field rows (the production pattern)
        # select11   : 11 f32 rows (pos3+mass+ids + vel/C packed in 6)
        # select_bf16: 17 bf16 rows (does per-byte rate apply to 16-bit?)
        fields, kslots = 17, 8
        cand_dtype = None
        if which == "select11":
            fields = 11
        elif which == "select_bf16":
            cand_dtype = jnp.bfloat16
        f = pl.pallas_call(
            functools.partial(_select_kernel, fields=fields, kslots=kslots,
                              cand_dtype=cand_dtype),
            grid=(NX,),
            in_specs=[pl.BlockSpec((K, PC), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((K, PC), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, PC), jnp.float32),
            scratch_shapes=[pltpu.VMEM((K, PC), jnp.float32)],
        )
        # per slot/field/class: where+sum over K rows (~2 ops/row element)
        ops = kslots * fields * 3 * 2 * K * PC * NX
    else:
        raise SystemExit(f"unknown variant {which}")

    g = jax.jit(f)
    out = g(x)
    np.asarray(out).ravel()[:1]
    best = None
    iters = 50
    for _ in range(3):
        t0 = time.perf_counter()
        o = x[: out.shape[0]] if out.shape != x.shape else x
        for _ in range(iters):
            out = g(x)
        np.asarray(out).ravel()[:1]
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    print(f"{which}: {best * 1e3:.3f} ms/sweep  "
          f"{ops / best / 1e9:.1f} G elem-ops/s  "
          f"({ops / 1e6:.1f} M ops/sweep)")


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "fma")
