#!/usr/bin/env python
"""Frame-loop host/device overlap study at the bench scale (real chip).

Measures the official with-render frame loop (2 substeps + SSFR render +
u8 frame export, 1M particles, 640x360) under four host-side strategies:

  1. bench-r2 style: 2 encode workers, transfer started lazily by the
     worker's np.asarray                      -> measured 36.1 ms/frame
  2. + copy_to_host_async on the main thread  -> 32.8 ms/frame
  3. + 4 workers, queue depth 4               -> 23.5 ms/frame
  4. + 6 workers, depth 6                     -> 23.3 ms/frame (saturated)

Conclusion (round 3): a lazily-started device->host transfer serializes
behind the next frame's dispatch on the tunneled platform; starting the
DMA eagerly with `img.copy_to_host_async()` immediately after the render
call, plus enough encode workers that PNG encodes (~15 ms each, zlib
releases the GIL) never starve frame pickup, recovers the overlap. This is
the fix that took the official `bench.py` with-render line from 50.8M to
90.6M particle-steps/s. The no-transfer floor is ~21 ms/frame (2x7 ms
substeps + ~6 ms render); the remaining ~2 ms is tunnel contention.

Reference analogue: the host<->device async render-thread separation of
screen_space_fluid_rendering.gd:91,117 (SURVEY.md section 2.5).

Usage: python scripts/frame_overlap.py  (runs each variant, best of 2)
"""

import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

from mpm_tpu import make_step
from mpm_tpu.models.scenes import benchmark_scene
from mpm_tpu.ops import bucketed
from mpm_tpu.render import Camera, RenderConfig, default_view, write_png
from mpm_tpu.render.pipeline import frame_to_u8, render_frame_buckets


def main():
    scene = benchmark_scene(1_000_000)
    state = jax.jit(lambda s: bucketed.from_simstate(s, scene.config))(
        jax.device_put(scene.state))
    step10 = make_step(scene.config, mode="pallas", substeps=10)
    for _ in range(15):
        state = step10(state, scene.fluid, ())
    np.asarray(state.lost)

    fstep = make_step(scene.config, mode="pallas", substeps=2)
    rc = RenderConfig(camera=Camera(width=640, height=360))
    view = default_view(scene.config.grid_res)
    renderer = jax.jit(
        lambda s, v: frame_to_u8(render_frame_buckets(s, v, rc=rc)))
    state = fstep(state, scene.fluid, ())
    img = renderer(state, view)
    np.asarray(img[:1, :1, 0])
    outdir = tempfile.mkdtemp(prefix="overlap_")

    n = 40

    def loop(name, workers, async_copy, depth):
        nonlocal state
        pool = ThreadPoolExecutor(max_workers=workers)
        pending = []
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            for i in range(n):
                state = fstep(state, scene.fluid, ())
                img = renderer(state, view)
                if async_copy:
                    img.copy_to_host_async()
                pending.append(pool.submit(
                    lambda im=img, i=i: write_png(
                        f"{outdir}/f_{i:03d}.png", np.asarray(im))))
                while len(pending) > depth:
                    pending.pop(0).result()
            for f in pending:
                f.result()
            pending.clear()
            np.asarray(img[:1, :1, 0])
            dt = (time.perf_counter() - t0) / n * 1e3
            best = dt if best is None else min(best, dt)
        print(f"{name:44s} {best:7.2f} ms/frame "
              f"-> {2 * 1e6 / best * 1e3 / 1e6:.1f}M ps/s with render")
        pool.shutdown()

    loop("2 workers, lazy transfer (round-2 bench)", 2, False, 2)
    loop("+ copy_to_host_async", 2, True, 2)
    loop("+ 4 workers, depth 4 (shipping loop)", 4, True, 4)
    loop("+ 6 workers, depth 6", 6, True, 6)


if __name__ == "__main__":
    main()
