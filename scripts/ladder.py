#!/usr/bin/env python
"""Config-ladder measurement at the BASELINE.md grids — VERBATIM grids, air
included (VERDICT r2: the round-2 rows cut the y-axis to the pool height,
which flatters a cost-∝-cells engine; these rows do not).

Usage:
  python scripts/ladder.py 3        # 250k on TRUE 64^3
  python scripts/ladder.py 4        # 4M on TRUE 128^3
  python scripts/ladder.py 5        # 16M on TRUE 256^3
  python scripts/ladder.py 3a       # 250k on TRUE 64^3, auto air-window
  python scripts/ladder.py 4a       # 4M on TRUE 128^3, auto air-window
  python scripts/ladder.py 5a       # 16M on TRUE 256^3, auto air-window
  python scripts/ladder.py 3w       # 250k, active-window grid (64, 24, 64)
  python scripts/ladder.py 4w       # 4M, active-window (128, 56, 128)
  python scripts/ladder.py 5w       # 16M, active-window (256, 48, 256)
  python scripts/ladder.py dam      # dynamic 1M dam-break, measured
                                    # mid-collapse (churn benchmark)
  python scripts/ladder.py dama     # the dam break with the auto air-window

The "a" rows run the SAME physics as the plain rows — true domain, walls,
clamps — through ops/window.py's air-window engine (arrays cover only the
occupied y-range + margin; bit-identical trajectories, tests/test_window.py);
their ms/substep INCLUDES the per-chunk occupancy poll and any resizes.
The legacy "w" rows hard-shrink the grid (kept for comparison; documented,
never reported as the BASELINE grid). Fresh process per run.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

from mpm_tpu import make_step
from mpm_tpu.models.scenes import benchmark_dam_break, benchmark_scene
from mpm_tpu.ops import bucketed

CONFIGS = {
    "3": (250_000, (64, 64, 64)),
    "4": (4_000_000, (128, 128, 128)),
    "5": (16_000_000, (256, 256, 256)),
    "3w": (250_000, (64, 24, 64)),
    "4w": (4_000_000, (128, 56, 128)),
    "5w": (16_000_000, (256, 48, 256)),
}


def run_scene(scene, settle_chunks, windows=3, iters=100, chunk=10):
    config, fluid = scene.config, scene.fluid
    n = scene.state.num_particles
    k = config.bin_capacity
    slots = k * config.num_cells
    from mpm_tpu.ops.pallas.fused import fused_supported
    from mpm_tpu.ops.pallas.bucket_kernels import pallas_supported

    engine = ("fused-pallas" if fused_supported(config)
              else "per-pass-pallas" if pallas_supported(config)
              else "xla-bucketed")
    print(f"# {n} particles, grid {config.grid_res}, K={k} -> {slots} slots "
          f"({slots / n:.2f}/particle), engine {engine}, "
          f"device {jax.devices()[0]}")
    state = jax.jit(lambda s: bucketed.from_simstate(s, config))(
        jax.device_put(scene.state))
    # free the particle-major SimState copy before stepping: at 16M it holds
    # ~1 GB of HBM that the donation double-buffer then can't use (the 5w
    # ladder row ran out of memory during settle with it retained)
    scene = scene._replace(state=None) if hasattr(scene, "_replace") else scene
    import gc; gc.collect()
    step = make_step(config, mode="pallas", substeps=chunk)
    t0 = time.perf_counter()
    for _ in range(settle_chunks):
        state = step(state, fluid, ())
    np.asarray(state.lost)
    print(f"# compile+advance {settle_chunks * chunk} substeps: "
          f"{time.perf_counter() - t0:.1f}s lost={int(np.asarray(state.lost))} "
          f"deferred={int(np.asarray(state.deferred))}")
    best = None
    for w in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters // chunk):
            state = step(state, fluid, ())
        np.asarray(state.lost)
        dt = time.perf_counter() - t0
        print(f"# window {w}: {iters} substeps in {dt:.3f}s")
        best = dt if best is None else min(best, dt)
    lost = int(np.asarray(state.lost))
    deferred = int(np.asarray(state.deferred))
    ms = best / iters * 1e3
    print(f"RESULT {ms:.2f} ms/substep  {n * iters / best / 1e6:.1f} M ps/s  "
          f"lost={lost} deferred={deferred}  "
          f"({ms * 1e6 / slots:.2f} ns/slot)")
    assert np.all(np.isfinite(np.asarray(state.pos)))


def run_scene_windowed(scene, settle_chunks, windows=3, iters=100, chunk=10):
    """The auto air-window engine on the TRUE grid: same physics, arrays
    sized to the occupied y-range. Reported time includes the per-chunk
    occupancy poll and any window resizes inside the measurement."""
    from mpm_tpu.ops.window import YWindow

    config, fluid = scene.config, scene.fluid
    n = scene.state.num_particles
    k = config.bin_capacity
    win = YWindow(config, mode="pallas", substeps=chunk)
    state = win.init(scene.state)
    scene = scene._replace(state=None) if hasattr(scene, "_replace") else scene
    import gc; gc.collect()
    slots0 = k * win.config.num_cells
    print(f"# {n} particles, TRUE grid {config.grid_res}, auto window "
          f"wy={win.wy} -> {slots0} slots ({slots0 / n:.2f}/particle), "
          f"device {jax.devices()[0]}")
    t0 = time.perf_counter()
    for _ in range(settle_chunks):
        state = win.step(state, fluid, ())
    print(f"# compile+advance {settle_chunks * chunk} substeps: "
          f"{time.perf_counter() - t0:.1f}s lost={int(np.asarray(state.lost))} "
          f"wy={win.wy} resizes={win.resizes}")
    best = None
    for w in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters // chunk):
            state = win.step(state, fluid, ())
        np.asarray(state.lost)  # fence (polls are non-blocking by design)
        dt = time.perf_counter() - t0
        print(f"# window {w}: {iters} substeps in {dt:.3f}s wy={win.wy}")
        best = dt if best is None else min(best, dt)
    lost = int(np.asarray(state.lost))
    ceil = int(np.asarray(state.ceiling))
    slots = k * win.config.num_cells
    ms = best / iters * 1e3
    print(f"RESULT {ms:.2f} ms/substep  {n * iters / best / 1e6:.1f} M ps/s  "
          f"lost={lost} wy={win.wy} resizes={win.resizes} "
          f"ceiling-hits={ceil} "
          f"({ms * 1e6 / slots:.2f} ns/slot at the final window)")
    assert np.all(np.isfinite(np.asarray(state.pos)))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "3"
    if which == "dam":
        # mid-collapse window: the front crosses the domain in ~250 substeps
        # at dt 0.03; measuring substeps 60..160 catches peak migration churn
        run_scene(benchmark_dam_break(1_000_000), settle_chunks=6)
        return
    if which == "dama":
        run_scene_windowed(benchmark_dam_break(1_000_000), settle_chunks=6)
        return
    if which.endswith("a"):
        n, grid = CONFIGS[which[:-1]]
        run_scene_windowed(benchmark_scene(n, grid_res=grid), settle_chunks=15)
        return
    n, grid = CONFIGS[which]
    run_scene(benchmark_scene(n, grid_res=grid), settle_chunks=15)


if __name__ == "__main__":
    main()
