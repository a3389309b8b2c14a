#!/usr/bin/env python
"""Per-phase substep profile at the bench config (real chip).

Attributes substep wall-clock to the individual Pallas kernels / XLA stages
(the headless analogue of the reference's per-phase prints,
MLSMPM3DFluidMultithread.cs:185-219). Run in a FRESH process — long-lived
processes with many live buffers degrade effective HBM bandwidth on the
tunneled platform.

Usage: python scripts/profile_substep.py [n_particles] [settle_substeps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

from mpm_tpu import make_step
from mpm_tpu.models.scenes import benchmark_scene
from mpm_tpu.ops import bucketed
from mpm_tpu.ops.pallas import bucket_kernels as bk
from mpm_tpu.ops.pallas import migrate_kernels as mk
from mpm_tpu.ops.grid import update_grid
from mpm_tpu.utils.timing import PhaseTimer, fence


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    settle = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    scene = benchmark_scene(n_target)
    config, fluid = scene.config, scene.fluid
    n = scene.state.num_particles
    k = config.bin_capacity
    slots = k * config.num_cells
    print(f"# {n} particles, grid {config.grid_res}, K={k} -> {slots} slots, "
          f"device {jax.devices()[0]}")

    state = jax.jit(lambda s: bucketed.from_simstate(s, config))(
        jax.device_put(scene.state)
    )
    step = make_step(config, mode="pallas", substeps=1)

    t0 = time.perf_counter()
    for _ in range(settle):
        state = step(state, fluid, ())
    fence(state.pos)
    print(f"# settle {settle} substeps: {time.perf_counter() - t0:.1f}s, "
          f"lost={int(np.asarray(state.lost))}")

    iters = 20
    pt = PhaseTimer()

    # FULL substep first (already compiled by the settle loop)
    for _ in range(iters):
        state = pt.measure("FULL substep", step, state, fluid, ())
    full_ms = pt.totals["FULL substep"] / iters * 1e3
    print(f"# full substep: {full_ms:.1f} ms  "
          f"-> {n / (full_ms / 1e3) / 1e6:.1f} M particle-steps/s, "
          f"{full_ms * 1e6 / slots:.2f} ns/slot", flush=True)

    # phase closures (jitted pieces of ops/pallas/bucket_kernels.substep);
    # each compiles lazily so partial output survives an external timeout
    phases = [
        ("p2g (A+B)", jax.jit(lambda s: bk.p2g_pallas(s, config, fluid)), "s"),
        ("g2p (D)", None, None),  # placeholder, built below
        ("migrate z", jax.jit(lambda s: mk.migrate_intra_pallas(s, config, 2)), "s"),
        ("migrate y", jax.jit(lambda s: mk.migrate_intra_pallas(s, config, 1)), "s"),
        ("migrate x", jax.jit(lambda s: mk.migrate_x_pallas(s, config)), "s"),
    ]
    upd = jax.jit(lambda g: update_grid(g, config, fluid))
    g2p = jax.jit(lambda s, g: bk.g2p_pallas(s, g, config))
    for name, fn, _ in phases:
        t0 = time.perf_counter()
        if name == "g2p (D)":
            grid = upd(phases[0][1](state))
            fence(g2p(state, grid))
            print(f"# compile {name}: {time.perf_counter() - t0:.0f}s", flush=True)
            for _ in range(iters):
                pt.measure(name, g2p, state, grid)
        else:
            fence(fn(state))
            print(f"# compile {name}: {time.perf_counter() - t0:.0f}s", flush=True)
            for _ in range(iters):
                pt.measure(name, fn, state)
        print(pt.report().splitlines()[-1], flush=True)
    tot_ms = sum(pt.totals[k] for k in pt.totals if k != "FULL substep") / iters * 1e3
    print(f"# phase sum {tot_ms:.1f} ms vs full substep {full_ms:.1f} ms")


if __name__ == "__main__":
    main()
