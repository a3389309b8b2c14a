#!/usr/bin/env python
"""Headline benchmark: particle-steps/sec at 1M 3D particles on one chip.

Prints FOUR JSON lines (the north star reads ">= 1e9 particle-steps/sec ...
at 1M 3D particles WITH SSFR frame export", BASELINE.md):

  1. particle_steps_per_sec_1M_3d_dynamic — a 1M dam-break measured
     MID-COLLAPSE (the engine under full migration churn, zero loss
     asserted; the settled-pool lines below let the zero-mover gates fire,
     this one does not)
  2. particle_steps_per_sec_1M_3d            — simulation only, settled pool
  3. particle_steps_per_sec_1M_3d_render_1080p — device-bound full frame at
     1920x1080 (particle-quality watertight recipe, the reference's own
     resolution, project.godot:25-27); sustained-with-export is a field
     (the axon tunnel moves ~35 MB/s, so 1080p export is tunnel-bound —
     the device number is the interactive-rate analogue of the reference's
     GPU frame time)
  4. particle_steps_per_sec_1M_3d_with_render — sustained pipeline
     throughput at 640x360 with an SSFR frame rendered AND PNG-encoded
     every `substeps` substeps. Printed LAST — the official headline.

Each phase runs in a FRESH SUBPROCESS (the project's measurement rule:
long-lived processes with many live buffers degrade effective bandwidth
several-fold — a single-process version measured the 640x360 phase 2x
slower after the 1080p phase had run). The persistent compilation cache
keeps the per-phase compile cost to seconds after the first round.

The pool lines run the production AIR-WINDOW engine (ops/window.py, the
same path `python -m mpm_tpu run --window auto` takes) at headroom=4 over
the settled pool: arrays cover the occupied y-range + the in-kernel ceiling
band, and `interference == 0` is ASSERTED — the certificate that the
windowed trajectory is bit-equal to the full-grid trajectory
(tests/test_window.py proves the implication).

Timing uses a device->host fence (see mpm_tpu/utils/timing.py) — never
trust block_until_ready alone on tunneled platforms.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def _jax():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    return jax


def _window_stats(times):
    """Variance fields for a list of per-window wall times: round-over-round
    regressions must be machine-attributable (tunnel noise vs engine) —
    the official value stays best-of-k (min time), these report the spread.
    spread_pct = (max - min) / median * 100."""
    ts = sorted(times)
    med = ts[len(ts) // 2] if len(ts) % 2 else 0.5 * (
        ts[len(ts) // 2 - 1] + ts[len(ts) // 2])
    return {
        "window_secs": [round(t, 4) for t in times],
        "median_secs": round(med, 4),
        "spread_pct": round((ts[-1] - ts[0]) / med * 100.0, 1),
    }


# --------------------------------------------------------------- phases


def phase_dynamic(n_target=1_000_000):
    """1M dam-break, measured mid-collapse (ladder 'dam' protocol)."""
    jax = _jax()
    from mpm_tpu import make_step
    from mpm_tpu.models.scenes import benchmark_dam_break
    from mpm_tpu.ops import bucketed

    scene = benchmark_dam_break(n_target)
    n = scene.state.num_particles
    config, fluid = scene.config, scene.fluid
    mode = "bucketed" if jax.default_backend() == "cpu" else "pallas"
    chunk = 10
    step = make_step(config, mode=mode, substeps=chunk)
    state = jax.jit(lambda s: bucketed.from_simstate(s, config))(
        jax.device_put(scene.state))
    del scene
    t0 = time.perf_counter()
    for _ in range(6):  # advance to substep 60: the front is mid-collapse
        state = step(state, fluid, ())
    np.asarray(state.lost)
    print(f"# dam-break: {n} particles, grid {config.grid_res}; "
          f"compile+advance 60 substeps: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    iters = 100
    times = []
    for w in range(3):  # substeps 60-360 cover the collapse front
        t0 = time.perf_counter()
        for _ in range(iters // chunk):
            state = step(state, fluid, ())
        np.asarray(state.lost)
        dt = time.perf_counter() - t0
        print(f"# dam window {w}: {iters} substeps in {dt:.3f}s",
              file=sys.stderr)
        times.append(dt)
    best = min(times)
    lost = int(np.asarray(state.lost))
    deferred = int(np.asarray(state.deferred))
    assert lost == 0, f"dam-break lost {lost} particles"
    assert np.all(np.isfinite(np.asarray(state.pos)))
    value = iters * n / best
    stats = _window_stats(times)
    print(f"# dam-break mid-collapse: {value / 1e6:.1f}M ps/s, lost=0, "
          f"deferred={deferred} (transients absorbed, zero loss)",
          file=sys.stderr)
    return [{
        "metric": "particle_steps_per_sec_1M_3d_dynamic",
        "value": value,
        "unit": "particle-steps/s",
        "vs_baseline": value / 1e9,
        "median_value": iters * n / stats["median_secs"],
        **stats,
        "particles_lost": 0,
        "moves_deferred": deferred,
    }]


def _settled_pool(n_target, chunk=10):
    """Settle the benchmark pool on the production air-window engine;
    returns (scene, win, state, lost_after_settle)."""
    jax = _jax()
    from mpm_tpu.models.scenes import benchmark_scene
    from mpm_tpu.ops.window import YWindow

    scene = benchmark_scene(n_target)
    n = scene.state.num_particles
    backend_cpu = jax.default_backend() == "cpu"
    mode = "bucketed" if backend_cpu else "pallas"
    print(f"# bench scene: {n} particles, TRUE grid {scene.config.grid_res}, "
          f"device {jax.devices()[0]}; step mode: {mode} "
          f"(air-window, headroom=4)", file=sys.stderr)
    win = YWindow(scene.config, mode=mode, substeps=chunk, headroom=4,
                  interpret=backend_cpu)
    state = win.init(scene.state)
    print(f"# window: wy={win.wy} of ny={scene.config.grid_res[1]} "
          f"({win.config.num_cells * scene.config.bin_capacity / n:.2f} "
          f"slots/particle)", file=sys.stderr)
    # warmup: compile + settle the pool into its steady sloshing state so
    # the measurement reflects sustained throughput, not the settling
    # transient (the full-width pool settles by vertical compression only)
    t0 = time.perf_counter()
    for _ in range(150 // chunk):
        state = win.step(state, scene.fluid, ())
    np.asarray(state.pos[:1])
    lost = int(np.asarray(state.lost))
    print(f"# warmup/compile+settle: {time.perf_counter() - t0:.1f}s, "
          f"settling overflow loss: {lost}", file=sys.stderr)
    return scene, win, state, lost


def _crop_rc(scene, rc):
    """Static fluid crop for the bench's fixed camera (value-preserving —
    bit-exact frames, tests/test_crop.py): the image-space SSFR passes
    (dilation, blur, shade + refraction gather) run on the domain's
    projected rectangle only; the 64^3 bench domain covers ~43% of the
    1080p frame (ARCHITECTURE.md "Render roofline")."""
    from mpm_tpu.render import default_view
    from mpm_tpu.render.pipeline import domain_crop

    view = np.asarray(default_view(scene.config.grid_res))
    rc = domain_crop(rc, scene.config, view)
    if rc.crop:
        y0, x0, ch, cw = rc.crop
        frac = ch * cw / (rc.camera.width * rc.camera.height)
        print(f"# fluid crop: {cw}x{ch}+{x0}+{y0} "
              f"({frac:.0%} of {rc.camera.width}x{rc.camera.height})",
              file=sys.stderr)
    return rc


def _render_loop(scene, win, state, rc, frames, windows, label,
                 substeps=None):
    """Sustained frame loop (device compute + tunnel DMA + PNG export
    overlapped) and a fenced device-only frame diagnostic. The window is
    FROZEN (the pool is settled and certified); the in-kernel ceiling band
    keeps counting — callers assert zero afterwards."""
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    jax = _jax()
    from mpm_tpu.render import default_view, write_png
    from mpm_tpu.render.pipeline import (
        background_for_view,
        make_full_frame_step,
    )

    n = scene.config.num_particles
    substeps = substeps or scene.config.substeps
    view = default_view(scene.config.grid_res)
    bg = background_for_view(rc, view)
    frame = make_full_frame_step(win.config, rc, substeps,
                                 interpret=jax.default_backend() == "cpu")
    outdir = tempfile.mkdtemp(prefix=f"bench_frames_{label}_")
    # 4 workers / queue depth 4: PNG encodes (~15 ms, GIL-released zlib)
    # must not starve frame pickup; 2 workers measured 33 ms/frame vs 24
    pool = ThreadPoolExecutor(max_workers=4)
    t0 = time.perf_counter()
    state, img = frame(state, scene.fluid, (), view, bg)  # warm/compile
    np.asarray(img[:1, :1, 0])
    print(f"# {label} render compile: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    times = []
    for w in range(windows):
        pending = []
        prev = None
        t0 = time.perf_counter()
        for i in range(frames):
            state, img = frame(state, scene.fluid, (), view, bg)
            # kick off the device->host DMA immediately so the tunnel
            # transfer overlaps the next frame's dispatch
            img.copy_to_host_async()
            if prev is not None:
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
        print(f"# {label} render window {w}: {frames} frames "
              f"({frames * substeps} substeps) in {dt:.3f}s",
              file=sys.stderr)
        times.append(dt)
    best = min(times)
    pool.shutdown()
    # device-only frame cost (fenced by pulling one element — never
    # block_until_ready on this platform; no host transfer/PNG in the
    # window): separates the engine's capability from the axon tunnel's
    # ~35 MB/s frame-DMA — the reference's CPU vs GPU frame-time split
    reps = 30 if rc.camera.width < 1000 else 10
    dev_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            state, img = frame(state, scene.fluid, (), view, bg)
        np.asarray(img[:1, :1, 0])
        dev_times.append((time.perf_counter() - t0) / reps * 1e3)
    dev_ms = min(dev_times)
    print(f"# {label} device-only frame: {dev_ms:.1f} ms "
          f"({substeps * n / dev_ms / 1e3:.1f}M ps/s device-bound; "
          f"3 windows: {[round(t, 2) for t in dev_times]})",
          file=sys.stderr)
    return state, times, dev_times


def phase_pool(n_target=1_000_000):
    """Sim-only + the official 640x360 with-render headline."""
    chunk = 10
    scene, win, state, lost_warm = _settled_pool(n_target, chunk)
    n = scene.config.num_particles
    # best of 3 windows: the tunneled platform's effective bandwidth swings
    # ±20% run to run (ARCHITECTURE.md "Platform gotchas"); min-time-of-k
    # is the standard way to report sustained throughput under noise
    iters = 100
    sim_times = []
    for w in range(3):
        t0 = time.perf_counter()
        for _ in range(iters // chunk):
            state = win.step(state, scene.fluid, ())
        np.asarray(state.lost)  # fence: computed by the sweep's last step
        dt = time.perf_counter() - t0
        print(f"# window {w}: {iters} substeps in {dt:.3f}s (wy={win.wy})",
              file=sys.stderr)
        sim_times.append(dt)
    best_dt = min(sim_times)
    assert np.all(np.isfinite(np.asarray(state.pos)))
    lost = int(np.asarray(state.lost))
    ceiling = int(np.asarray(state.ceiling))
    assert ceiling == 0 and win.interference == 0, (
        f"air-window interference ({ceiling} ceiling hits) — the windowed "
        "run is not certified bit-equal this round")
    print(f"# lost during measurement windows: {lost - lost_warm} "
          f"(total incl. settling: {lost}); window certificate: "
          f"interference=0 (bit-equal to the full grid)", file=sys.stderr)
    value = iters * n / best_dt
    sim_stats = _window_stats(sim_times)
    sim_line = {
        "metric": "particle_steps_per_sec_1M_3d",
        "value": value,
        "unit": "particle-steps/s",
        "vs_baseline": value / 1e9,
        "median_value": iters * n / sim_stats["median_secs"],
        **sim_stats,
        "particles_lost": lost,
        "window_wy": win.wy,
        "window_interference": 0,
        # the measured single-chip ceiling model (ARCHITECTURE.md "The
        # single-chip ceiling, stated plainly"): slots/particle floor
        # (~1.4) x the platform's per-live-slot VPU service rate
        # (~2.2-3.4 ns, flat across scenes/shapes); 1e9 ps/s needs
        # ~4-5 chips at the measured +12.5% sharding overhead
        "single_chip_ceiling_ps_model": [2.5e8, 3.2e8],
        "ns_per_live_slot": best_dt / iters / (
            win.config.num_cells * scene.config.bin_capacity) * 1e9,
    }

    # the official headline: sustained 640x360 with PNG export, the frame
    # loop identical to `python -m mpm_tpu render`: per frame, `substeps`
    # substeps with in-kernel splat emission + SSFR + u8 tonemap in ONE jit
    from mpm_tpu.render import Camera, RenderConfig

    rc = _crop_rc(scene, RenderConfig(camera=Camera(width=640, height=360)))
    frames = 40
    substeps = scene.config.substeps  # 2, the reference flagship's rate
    state, loop_times, dev_times = _render_loop(scene, win, state, rc,
                                                frames, 5, "640x360")
    best, dev_ms = min(loop_times), min(dev_times)
    lost2 = int(np.asarray(state.lost))
    assert int(np.asarray(state.ceiling)) == 0
    value_r = frames * substeps * n / best
    loop_stats = _window_stats(loop_times)
    print(f"# with-render: {value_r / 1e6:.1f}M ps/s at 640x360, "
          f"{best / frames * 1e3:.1f} ms/frame, lost={lost2 - lost}",
          file=sys.stderr)
    return [sim_line, {
        "metric": "particle_steps_per_sec_1M_3d_with_render",
        "value": value_r,
        "unit": "particle-steps/s",
        "vs_baseline": value_r / 1e9,
        "median_value": frames * substeps * n / loop_stats["median_secs"],
        **loop_stats,
        "sim_only_value": value,
        # the device-vs-loop pair: loop regressions with a flat device
        # number are tunnel DMA contention, not the engine
        "device_only_frame_ms": dev_ms,
        "device_frame_ms_windows": [round(t, 2) for t in dev_times],
        "render_resolution": "640x360",
        "fluid_crop": list(rc.crop) if rc.crop else None,
        "particles_lost": lost2,
        "window_interference": 0,
    }]


def _fit_surface_bands(state, grid_res, reach=2, margin=2):
    """Fit the surface-band keep set (render/splat.extract_band_slot_splats)
    to the settled pool: floor/walls are pinned by the reference's position
    clamps (g2p.glsl:115-119) so bottom/side bands are the static reach+3
    planes; the free surface moves, so the top band is searched upward until
    the certificate counter (every live cell within `reach` cells of air is
    kept) reads 0, then padded by `margin` planes for the measurement
    windows' sloshing. Diagnostic pass — run OUTSIDE timed windows. Returns
    None (render unbanded) if no band fits."""
    jax = _jax()
    from mpm_tpu.render.splat import surface_band_min_top

    bf = bs = reach + 3
    ny = grid_res[1]
    bt = margin + int(np.asarray(jax.jit(
        lambda s: surface_band_min_top(s, grid_res, bf, bs, reach))(state)))
    if bt + bf >= ny:
        print("# surface bands: no fit (surface spans the grid) — "
              "rendering unbanded", file=sys.stderr)
        return None
    bands = (bt, bf, bs)
    kept = 1.0 - (ny - bt - bf) * (grid_res[0] - 2 * bs) * (
        grid_res[2] - 2 * bs) / (grid_res[0] * ny * grid_res[2])
    print(f"# surface bands (top,bottom,side)={bands}: keep set = "
          f"{kept:.0%} of grid slots, certificate asserted post-run",
          file=sys.stderr)
    return bands


def phase_1080p(n_target=1_000_000):
    """The reference's own resolution: 1920x1080, particle-quality
    watertight recipe (ARCHITECTURE.md "1080p recipes"); value = the
    device-bound rate (the tunnel's 1080p frame DMA is a harness artifact —
    the reference displays locally).

    Round-5 recipe (scripts/render_roofline.py recipe study): R=8 dilation
    (R=6 uncovers 1.35% of fluid pixels — not watertight) + refraction
    downsample 4 (37.7 dB PSNR vs the exact dependent gather, bounded and
    recorded in the JSON line; the exact-refraction frame is measured and
    reported alongside) + surface-band slot extraction (only the grid
    shell's slots feed the z-buffer; certificate asserted post-run, frame
    delta vs the unbanded chain measured and recorded, unbanded frame
    reported alongside)."""
    import dataclasses as dc

    from mpm_tpu.render import Camera, RenderConfig, SSFRParams

    scene, win, state, _ = _settled_pool(n_target)
    n = scene.config.num_particles
    substeps = scene.config.substeps
    bands = _fit_surface_bands(state, win.config.grid_res)
    rc = _crop_rc(scene, RenderConfig(
        camera=Camera(width=1920, height=1080),
        quality="particle", max_radius_px=8,
        ssfr=SSFRParams(refraction_downsample=4),
        surface_bands=bands))
    frames = 10
    state, loop_times, dev_times = _render_loop(scene, win, state, rc,
                                                frames, 2, "1080p")
    best, dev_ms = min(loop_times), min(dev_times)
    assert int(np.asarray(state.ceiling)) == 0
    uncovered = band_delta = None
    dev_unb = [None]
    if bands is not None:
        jax = _jax()
        from mpm_tpu.render import surface_band_uncovered

        # post-run certificate: the margined bands still cover every
        # near-air cell after the measurement windows' sloshing
        uncovered = int(np.asarray(jax.jit(lambda s: surface_band_uncovered(
            s, win.config.grid_res, bands))(state)))
        assert uncovered == 0, (
            f"surface-band certificate fired post-run ({uncovered} "
            "near-air cells outside the bands) — the banded frames are "
            "not certified this run")
        # unbanded variant (every slot feeds the z-buffer), device-only +
        # a same-state frame delta: keeps the banded number honest
        rc_unb = dc.replace(rc, surface_bands=None)
        state, _, dev_unb = _render_loop(scene, win, state, rc_unb, 2, 1,
                                         "1080p-unbanded")
        band_delta = _frame_delta(scene, win, state, rc, rc_unb)
        print(f"# banded vs unbanded frame max|delta|: {band_delta} LSB",
              file=sys.stderr)
    # the exact-refraction variant (reference-exact dependent gather),
    # device-only: keeps the approximation honest in the artifact
    rc_exact = _crop_rc(scene, RenderConfig(
        camera=rc.camera, quality="particle", max_radius_px=8))
    state, _, dev_exact = _render_loop(scene, win, state, rc_exact, 2, 1,
                                       "1080p-exact")
    value_dev = substeps * n / (dev_ms / 1e3)
    dev_med = sorted(dev_times)[len(dev_times) // 2]
    return [{
        "metric": "particle_steps_per_sec_1M_3d_render_1080p",
        "value": value_dev,
        "unit": "particle-steps/s",
        "vs_baseline": value_dev / 1e9,
        "median_value": substeps * n / (dev_med / 1e3),
        "device_only_frame_ms": dev_ms,
        "device_frame_ms_windows": [round(t, 2) for t in dev_times],
        "spread_pct": round(
            (max(dev_times) - min(dev_times)) / dev_med * 100.0, 1),
        "sustained_with_export": frames * substeps * n / best,
        "render_resolution": "1920x1080",
        "render_quality": "particle(r=8, watertight, refraction ds=4, "
                          "surface bands)",
        "fluid_crop": list(rc.crop) if rc.crop else None,
        "surface_bands": list(bands) if bands else None,
        "band_certificate_uncovered": uncovered,
        "band_frame_max_abs_delta": band_delta,
        "unbanded_frame_ms": min(dev_unb) if bands else None,
        "refraction_psnr_db_vs_exact": 37.7,  # scripts/render_roofline.py
        "exact_refraction_frame_ms": min(dev_exact),
    }]


def _frame_delta(scene, win, state, rc_a, rc_b):
    """max |u8 delta| between the two recipes' frames rendered from the SAME
    state (donation off; compiles hit the persistent cache — both fns were
    just measured). Untimed diagnostic."""
    jax = _jax()
    import jax.numpy as jnp

    from mpm_tpu.render import default_view
    from mpm_tpu.render.pipeline import (
        background_for_view,
        make_full_frame_step,
    )

    view = default_view(scene.config.grid_res)
    interp = jax.default_backend() == "cpu"
    substeps = scene.config.substeps
    bg_a = background_for_view(rc_a, view)
    bg_b = background_for_view(rc_b, view)
    _, img_a = make_full_frame_step(win.config, rc_a, substeps, donate=False,
                                    interpret=interp)(
        state, scene.fluid, (), view, bg_a)
    _, img_b = make_full_frame_step(win.config, rc_b, substeps, donate=False,
                                    interpret=interp)(
        state, scene.fluid, (), view, bg_b)
    d = jnp.max(jnp.abs(img_a.astype(jnp.int32) - img_b.astype(jnp.int32)))
    return int(np.asarray(d))


PHASES = {"dynamic": phase_dynamic, "pool": phase_pool, "1080p": phase_1080p}


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--phase":
        for line in PHASES[sys.argv[2]]():
            print(json.dumps(line))
        return

    # parent: one fresh subprocess per phase (measurement rule), JSON lines
    # re-emitted in the official order with the headline LAST. A non-pool
    # phase failure degrades gracefully (its lines are skipped) — losing
    # the 1080p or dynamic line must not zero out the whole artifact.
    lines = {}
    failed = []
    for phase in ("pool", "1080p", "dynamic"):
        t0 = time.perf_counter()
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", phase],
            capture_output=True, text=True)
        sys.stderr.write(r.stderr)
        if r.returncode != 0:
            sys.stderr.write(r.stdout)
            if phase == "pool":
                raise SystemExit(f"bench phase {phase} failed ({r.returncode})")
            failed.append(phase)
            print(f"# phase {phase} FAILED ({r.returncode}) — continuing",
                  file=sys.stderr)
            continue
        for ln in r.stdout.splitlines():
            ln = ln.strip()
            if ln.startswith("{"):
                d = json.loads(ln)
                lines[d["metric"]] = d
        print(f"# phase {phase}: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
    for metric in ("particle_steps_per_sec_1M_3d_dynamic",
                   "particle_steps_per_sec_1M_3d",
                   "particle_steps_per_sec_1M_3d_render_1080p",
                   "particle_steps_per_sec_1M_3d_with_render"):
        if metric in lines:
            print(json.dumps(lines[metric]))
    if failed:
        # exit 0: the emitted lines are the artifact — a missing metric IS
        # the failure signal, and a nonzero rc could discard the good lines
        print(f"# bench degraded: phase(s) {failed} failed", file=sys.stderr)


if __name__ == "__main__":
    main()
