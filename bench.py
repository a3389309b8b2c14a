#!/usr/bin/env python
"""Headline benchmark: particle-steps/sec at 1M 3D particles on one chip.

Prints TWO JSON lines (the north star reads ">= 1e9 particle-steps/sec ...
at 1M 3D particles WITH SSFR frame export", BASELINE.md):

  1. particle_steps_per_sec_1M_3d            — simulation only
  2. particle_steps_per_sec_1M_3d_with_render — sustained pipeline
     throughput with an SSFR frame rendered AND PNG-encoded every
     `substeps` substeps (the product's frame loop; encode overlaps device
     compute on a worker thread, as in `python -m mpm_tpu render`)

The with-render line is printed LAST — it is the official headline; the
sim-only line is kept for round-over-round comparability. vs_baseline is
value / 1e9.

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

    # ---- official headline: sim + SSFR frame export, sustained ----
    # frame loop identical to `python -m mpm_tpu render bench3d`: per frame,
    # `substeps` substeps then a full SSFR frame (Pallas cell extraction +
    # z-buffer splat + blur + shade) and a PNG encode on a worker thread
    # overlapping the next frame's device compute
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    import functools

    from mpm_tpu.render import RenderConfig, Camera, default_view, write_png
    from mpm_tpu.render.pipeline import frame_to_u8, render_frame_buckets

    substeps = scene.config.substeps  # 2, the reference flagship's rate
    rc = RenderConfig(camera=Camera(width=640, height=360))
    view = default_view(scene.config.grid_res)
    # The ray-traced background depends only on (camera, view) — compute it
    # ONCE for the static-camera loop. In-context attribution
    # (scripts/render_attrib.py) measured the fused per-frame recomputation
    # at ~1.7 ms of the 7.2 ms render. Frames leave the device as u8
    # (frame_to_u8): the tunnel moves ~35 MB/s, so the f32 frame transfer
    # would dominate the loop.
    from mpm_tpu.render.pipeline import (
        background_for_view,
        make_full_frame_step,
    )

    bg = background_for_view(rc, view)
    # ONE jit per frame: the step's kernel F EMITS the per-cell splats (the
    # reference's g2p writes its render texture in-kernel, g2p.glsl:149-150)
    # and the SSFR chain + u8 tonemap run in the same computation — the
    # renderer never re-reads the particle state and the host pays a single
    # dispatch per frame (a separate jit call costs ~7 ms through the
    # tunnel, ARCHITECTURE.md "Platform gotchas")
    frame = make_full_frame_step(
        scene.config, rc, substeps,
        interpret=jax.default_backend() == "cpu")
    outdir = tempfile.mkdtemp(prefix="bench_frames_")
    # 4 workers / queue depth 4: PNG encodes (~15 ms, GIL-released zlib) must
    # not starve frame pickup; 2 workers measured 33 ms/frame vs 24 with 4
    pool = ThreadPoolExecutor(max_workers=4)

    t0 = time.perf_counter()
    state, img = frame(state, scene.fluid, (), view, bg)  # warm/compile
    np.asarray(img[:1, :1, 0])
    print(f"# render compile: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    frames = 40
    best_dt = None
    for w in range(5):  # tunnel frame-DMA contention swings run to run;
        # best-of-5 windows samples the distribution more fairly
        pending = []
        prev = None
        t0 = time.perf_counter()
        for i in range(frames):
            state, img = frame(state, scene.fluid, (), view, bg)
            # kick off the device->host DMA immediately so the tunnel
            # transfer overlaps the next frame's dispatch (the worker's
            # np.asarray then just picks up a finished copy) — measured
            # 36 -> 24 ms/frame vs transferring lazily on the worker
            img.copy_to_host_async()
            if prev is not None:
                # encode on the worker: the main loop never blocks on PNG
                pending.append(pool.submit(
                    lambda img=prev, i=i: write_png(
                        f"{outdir}/f_{i:03d}.png", np.asarray(img))
                ))
                if len(pending) > 4:
                    pending.pop(0).result()
            prev = img
        for f in pending:
            f.result()
        pending.clear()
        np.asarray(prev[:1, :1, 0])  # fence the last frame's device chain
        write_png(f"{outdir}/f_last.png", np.asarray(prev))
        dt = time.perf_counter() - t0
        print(f"# render window {w}: {frames} frames ({frames * substeps} "
              f"substeps) in {dt:.3f}s", file=sys.stderr)
        best_dt = dt if best_dt is None else min(best_dt, dt)
    pool.shutdown()
    # device-only frame cost (fenced, no host transfer/PNG): separates the
    # engine's capability from the axon tunnel's ~35 MB/s frame-DMA
    # contention (a 640x360 u8 frame is ~20 ms of tunnel transfer,
    # overlapped at best) — the reference's CPU vs GPU frame-time split
    t0 = time.perf_counter()
    for _ in range(30):
        state, img = frame(state, scene.fluid, (), view, bg)
    np.asarray(img[:1, :1, 0])  # fence: block_until_ready can return while
    # compute still streams on the tunneled platform (measurement rules)
    dev_ms = (time.perf_counter() - t0) / 30 * 1e3
    print(f"# device-only frame: {dev_ms:.1f} ms "
          f"({substeps * n / dev_ms / 1e3:.1f}M ps/s device-bound)",
          file=sys.stderr)
    lost2 = int(np.asarray(state.lost))
    value_r = frames * substeps * n / best_dt
    print(f"# with-render: {value_r / 1e6:.1f}M ps/s at 640x360, "
          f"{best_dt / frames * 1e3:.1f} ms/frame, lost={lost2 - lost}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "particle_steps_per_sec_1M_3d_with_render",
        "value": value_r,
        "unit": "particle-steps/s",
        "vs_baseline": value_r / 1e9,
        "sim_only_value": value,
        "device_only_frame_ms": dev_ms,
        "render_resolution": "640x360",
        "particles_lost": lost2,
    }))


if __name__ == "__main__":
    main()
