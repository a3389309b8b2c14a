#!/usr/bin/env python
"""GuardedStep overhead at the official 1M bench config: bare chunked loop
vs the guarded loop (async checks + periodic snapshots). Fresh process,
fenced like quickbench. Usage:
  python scripts/guard_overhead.py [snapshot_every] [check_every]
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
from mpm_tpu.utils.guard import GuardedStep


def window(stepper, state, fluid, chunks):
    t0 = time.perf_counter()
    for _ in range(chunks):
        state = stepper(state, fluid, ())
    np.asarray(state.lost)
    return state, time.perf_counter() - t0


def main():
    snap = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    chk = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    scene = benchmark_scene(1_000_000)
    config, fluid = scene.config, scene.fluid
    chunk = 10
    step = make_step(config, mode="pallas", substeps=chunk)
    state = jax.jit(lambda s: bucketed.from_simstate(s, config))(
        jax.device_put(scene.state))
    state, dt = window(step, state, fluid, 15)  # compile + settle
    print(f"# compile+settle: {dt:.1f}s")

    # INTERLEAVED bare/guarded windows (round 5): the platform's
    # throughput drifts over a process lifetime (tunnel health, CLAUDE.md
    # ±15-20% run-to-run band) — measuring bare*3 then guarded*3 charges
    # the drift entirely to the guarded number (one pre-fix session read
    # 6.2/6.7/9.4% across three fresh processes on a drifting evening).
    # Alternating windows cancels drift to first order.
    g = GuardedStep(step, check_every=chk, snapshot_every=snap)
    state, _ = window(g, state, fluid, 4)  # compile the guard's dispatches
    best_bare = best_g = None
    for _ in range(4):
        state, dt = window(step, state, fluid, 10)
        best_bare = dt if best_bare is None else min(best_bare, dt)
        state, dt = window(g, state, fluid, 10)
        best_g = dt if best_g is None else min(best_g, dt)
    assert g.flush() and g.failures == 0
    print(f"# bare: {best_bare * 10:.2f} ms/substep")
    print(f"# guarded(snapshot_every={snap}, check_every={chk}): "
          f"{best_g * 10:.2f} ms/substep")
    print(f"RESULT overhead {100 * (best_g / best_bare - 1):.1f}%")


if __name__ == "__main__":
    main()
