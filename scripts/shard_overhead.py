#!/usr/bin/env python
"""Sharded-step overhead on the real chip: the production Pallas kernels
inside shard_map on a 1-device mesh vs the plain unsharded step, same scene.

The sharded path costs extra halo work even at n=1: 2 state-halo planes per
side are exchanged and REDUNDANTLY computed (G2P + zy migration), the P2G
pipeline splits into two kernels at the mass-exchange point, and the grid
accumulator grows a plane per side. This script puts a number on that
overhead so the config-5 "sharded" claim has perf content (VERDICT r2 #7b).
Expected ICI traffic per substep per shard boundary is printed from the
array shapes (ARCHITECTURE.md records the formula).

Usage: python scripts/shard_overhead.py [n_particles]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

from mpm_tpu import make_step
from mpm_tpu.models.scenes import benchmark_scene
from mpm_tpu.ops import bucketed
from mpm_tpu.parallel import domain


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    scene = benchmark_scene(n_target)
    config, fluid = scene.config, scene.fluid
    n = scene.state.num_particles
    k = config.bin_capacity
    nx, ny, nz = config.grid_res
    pc = ny * nz
    print(f"# {n} particles, grid {config.grid_res}, K={k}, "
          f"device {jax.devices()[0]}")

    # expected ICI bytes per substep per shard boundary (both directions):
    # state halo: 2 planes x 17 rows x K x pc x 4 B each way
    # grid halos: 3 exchanges x 2 planes x {1, 3, 3} rows x (pc + 2h) x 4 B
    state_halo = 2 * 17 * k * pc * 4 * 2
    from mpm_tpu.ops.pallas.bucket_kernels import _halo

    pcp = pc + 2 * _halo(config)
    grid_halo = 2 * (1 + 3 + 3) * pcp * 4 * 2
    print(f"# expected ICI bytes/substep/boundary: state {state_halo/1e6:.1f} MB"
          f" + grid {grid_halo/1e6:.2f} MB = {(state_halo+grid_halo)/1e6:.1f} MB")

    state0 = jax.jit(lambda s: bucketed.from_simstate(s, config))(
        jax.device_put(scene.state))

    def bench(step, state, label, settle=5, iters=10):
        t0 = time.perf_counter()
        for _ in range(settle):
            state = step(state, fluid, ())
        np.asarray(state.lost)
        print(f"# {label} compile+settle: {time.perf_counter() - t0:.1f}s")
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                state = step(state, fluid, ())
            np.asarray(state.lost)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        ms = best / iters * 1e3 / 10  # steps are 10-substep chunks
        print(f"{label}: {ms:.2f} ms/substep  lost={int(np.asarray(state.lost))}")
        return ms

    plain = make_step(config, mode="pallas", substeps=10)
    ms_plain = bench(plain, state0, "unsharded")

    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
    sstep = domain.make_sharded_bucket_step(config, mesh, substeps=10)
    state0 = jax.jit(lambda s: bucketed.from_simstate(s, config))(
        jax.device_put(scene.state))
    ms_shard = bench(sstep, domain.shard_bucket_state(state0, mesh),
                     "sharded n=1")

    print(f"RESULT sharded overhead: {ms_shard - ms_plain:+.2f} ms/substep "
          f"({(ms_shard / ms_plain - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
