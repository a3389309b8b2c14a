#!/usr/bin/env python
"""Headline benchmark: particle-steps/sec at 1M 3D particles on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 1e9 (the BASELINE.md north-star target:
>= 1e9 particle-steps/sec on one v5e at 1M particles).

Timing uses a device->host fence (see mpm_tpu/utils/timing.py) — never trust
block_until_ready alone on tunneled platforms.
"""

import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

from mpm_tpu import make_step
from mpm_tpu.models.scenes import benchmark_scene


def main():
    n_target = 1_000_000
    scene = benchmark_scene(n_target)
    n = scene.state.num_particles
    print(f"# bench scene: {n} particles, grid {scene.config.grid_res}, "
          f"device {jax.devices()[0]}", file=sys.stderr)

    from mpm_tpu.ops import bucketed

    mode = "bucketed" if jax.default_backend() == "cpu" else "pallas"
    print(f"# step mode: {mode}", file=sys.stderr)
    # chunked stepping: 10 substeps scan per jit call — per-call Python/tunnel
    # dispatch overhead is real on this platform, and the product runs frames
    # (multi-substep scans), not single substeps
    chunk = 10
    step = make_step(scene.config, mode=mode, substeps=chunk)
    state = jax.jit(lambda s: bucketed.from_simstate(s, scene.config))(
        jax.device_put(scene.state)
    )

    # warmup: compile + settle the pool into its steady sloshing state so the
    # measurement reflects sustained throughput, not the one-off settling
    # transient (the full-width pool settles by vertical compression only)
    t0 = time.perf_counter()
    for _ in range(150 // chunk):
        state = step(state, scene.fluid, ())
    np.asarray(state.pos[:1])
    lost_warm = int(np.asarray(state.lost)) if hasattr(state, "lost") else 0
    print(f"# warmup/compile+settle: {time.perf_counter() - t0:.1f}s, "
          f"settling overflow loss: {lost_warm}", file=sys.stderr)

    # best of 3 windows: the tunneled platform's effective bandwidth swings
    # ±20% run to run (ARCHITECTURE.md "Platform gotchas"); min-time-of-k is
    # the standard way to report sustained throughput under external noise
    iters = 100
    best_dt = None
    for w in range(3):
        t0 = time.perf_counter()
        for _ in range(iters // chunk):
            state = step(state, scene.fluid, ())
        np.asarray(state.lost)  # fence: computed by the sweep's last step
        dt = time.perf_counter() - t0
        print(f"# window {w}: {iters} substeps in {dt:.3f}s", file=sys.stderr)
        best_dt = dt if best_dt is None else min(best_dt, dt)
    host = np.asarray(state.pos)
    dt = best_dt

    assert np.all(np.isfinite(host)), "simulation produced non-finite positions"
    lost = int(np.asarray(state.lost))
    print(f"# lost during measurement windows: {lost - lost_warm} "
          f"(total incl. settling: {lost})", file=sys.stderr)
    value = iters * n / dt
    print(json.dumps({
        "metric": "particle_steps_per_sec_1M_3d",
        "value": value,
        "unit": "particle-steps/s",
        "vs_baseline": value / 1e9,
        "particles_lost": lost,
    }))


if __name__ == "__main__":
    main()
