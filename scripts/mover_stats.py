#!/usr/bin/env python
"""Mover-density statistics at the bench config: after settling, how many
particles cross a cell boundary per substep, per axis, and how many x-planes
are mover-free (the zero-mover copy-through gate in ops/pallas/fused.py fires
per plane per axis). Run fresh-process on the real chip.

Usage: python scripts/mover_stats.py [n_particles] [settle_substeps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

from mpm_tpu import make_step
from mpm_tpu.models.scenes import benchmark_scene
from mpm_tpu.ops import bucketed
from mpm_tpu.ops.bucketed import cell_coords
from mpm_tpu.utils.timing import fence


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    settle = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    scene = benchmark_scene(n_target)
    config, fluid = scene.config, scene.fluid
    nx = config.grid_res[0]
    state = jax.jit(lambda s: bucketed.from_simstate(s, config))(
        jax.device_put(scene.state))
    step = make_step(config, mode="pallas", substeps=10)
    for _ in range(settle // 10):
        state = step(state, fluid, ())
    fence(state.pos)

    one = make_step(config, mode="pallas", substeps=1, donate=False)

    @jax.jit
    def stats(s0, s1):
        """Movers between consecutive substeps: floor(pos) changed per axis.
        (Post-migration states, so compare bucket cells via ids? cheap proxy:
        pre-substep pos vs its own cell is always 0 — instead measure desired
        moves: floor(pos_after_advection) != cell. Approximate with the
        pre-migration delta: compare s1 bucket cell occupancy vs s0.)"""
        cc = cell_coords(config, s0.pos.dtype)  # [3, C]
        out = []
        for a in range(3):
            # particles whose NEXT advection will cross: |pos - center| close
            # to the face, moving. Direct measure: movers this substep =
            # particles whose floor(pos) after tail differs from bucket cell.
            # s1 is post-migration so its pos floors to its cell; instead
            # count arrivals: slots in s1 whose id was in a different cell of
            # s0. Simpler: per-plane count of cells whose occupancy changed.
            occ0 = jnp.sum((s0.mass > 0).astype(jnp.int32), axis=0)  # [C]
            occ1 = jnp.sum((s1.mass > 0).astype(jnp.int32), axis=0)
            changed = (occ0 != occ1).reshape(nx, -1)
            out.append(jnp.sum(changed, axis=1))
        return jnp.stack(out)

    # exact per-axis mover counts need the pre-migration state; approximate
    # via advection preview: vel*dt crossing the cell face
    @jax.jit
    def movers_preview(s):
        cc = cell_coords(config, s.pos.dtype)
        occ = s.mass > 0
        nxt = s.pos + s.vel * fluid.dt
        res = np.asarray(config.grid_res, np.float32).reshape(-1, 1, 1)
        nxt = jnp.clip(nxt, config.clamp_lo, res - config.clamp_hi_offset)
        counts = []
        plane_any = []
        for a in range(3):
            delta = jnp.floor(nxt[a]) - cc[a][None, :]
            mov = occ & (delta != 0)
            counts.append(jnp.sum(mov.astype(jnp.int32)))
            per_plane = jnp.sum(
                mov.reshape(mov.shape[0], nx, -1).astype(jnp.int32), axis=(0, 2)
            )
            plane_any.append(jnp.sum((per_plane > 0).astype(jnp.int32)))
        occ_plane = jnp.max(
            jnp.sum(occ.astype(jnp.int32), axis=0).reshape(nx, -1), axis=1
        )
        return jnp.stack(counts), jnp.stack(plane_any), occ_plane

    # chunk stats: movers per CH-column chunk of each plane — decides whether
    # sub-plane select gating can skip most chunks (movers clustered at the
    # surface y-band => contiguous chunks) or not (spread through the bulk)
    CH = 512

    @jax.jit
    def chunk_stats(s):
        cc = cell_coords(config, s.pos.dtype)
        occ = s.mass > 0
        nxt = s.pos + s.vel * fluid.dt
        res = np.asarray(config.grid_res, np.float32).reshape(-1, 1, 1)
        nxt = jnp.clip(nxt, config.clamp_lo, res - config.clamp_hi_offset)
        mov_any = jnp.zeros_like(occ)
        for a in range(3):
            delta = jnp.floor(nxt[a]) - cc[a][None, :]
            mov_any = mov_any | (occ & (delta != 0))
        per_col = jnp.sum(mov_any.astype(jnp.int32), axis=0)  # [C]
        per_chunk = per_col.reshape(-1, CH).sum(axis=1)  # [nx*pc/CH]
        return (
            jnp.sum((per_chunk > 0).astype(jnp.int32)),
            per_chunk.shape[0],
            jnp.sum(per_col > 0),
        )

    for it in range(3):
        state = one(state, fluid, ())
        c, pa, occp = movers_preview(state)
        c, pa, occp = np.asarray(c), np.asarray(pa), np.asarray(occp)
        print(f"substep +{it}: movers z/y/x-ish {c.tolist()}  "
              f"planes-with-movers {pa.tolist()}/{nx}")
        live_ch, n_ch, mov_cols = (int(x) for x in chunk_stats(state))
        print(f"  chunks({CH} cols) with movers: {live_ch}/{n_ch}; "
              f"columns with movers: {mov_cols}")
        if it == 0:
            print(f"  per-plane max occupancy: {occp.tolist()}")


if __name__ == "__main__":
    main()
