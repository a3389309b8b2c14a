"""Command-line entry — the headless analogue of the reference's scenes + UI
(SURVEY.md §2.3: main_3d/main_2d scenes, runtime settings panel, debug
overlay).

    python -m mpm_tpu run fluid_3d --frames 60
    python -m mpm_tpu render fluid_3d --frames 60 --out /tmp/frames
    python -m mpm_tpu info
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _common(p):
    p.add_argument("scene", choices=None, nargs="?", default="fluid_3d")
    p.add_argument("--frames", type=int, default=30)
    p.add_argument(
        "--mode",
        default="auto",
        choices=["auto", "reference", "binned", "bucketed", "pallas"],
        help="auto = pallas on TPU, bucketed on CPU",
    )
    p.add_argument("--substeps", type=int, default=None)
    p.add_argument(
        "--window",
        default="off",
        choices=["off", "auto"],
        help="auto = air-window engine (ops/window.py): arrays track the "
        "occupied y-range of the true domain; identical physics, air cells "
        "stop costing DMA/VPU work (3D bucketed/pallas modes only)",
    )
    p.add_argument(
        "--shards",
        type=int,
        default=0,
        metavar="N",
        help="SPMD over the first N local devices: x-slab domain "
        "decomposition with halo exchange over the mesh "
        "(parallel/domain.py; BASELINE config 5). Render uses the "
        "distributed composite (per-shard splat z-buffers, pmin depth "
        "merge — parallel/render.py). 3D bucket/pallas modes; grid x "
        "must divide into >= 2-plane slabs",
    )
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--checkpoint-dir", default="/tmp/mpm_ckpt")
    p.add_argument(
        "--guard",
        action="store_true",
        help="failure detection for long runs (utils/guard.GuardedStep): "
        "async on-device finiteness checks + verified-snapshot rollback "
        "with dt backoff; the reference has no failure handling at all "
        "(SURVEY.md §5)",
    )
    p.add_argument("--guard-snapshot-every", type=int, default=32,
                   metavar="N", help="frames between rollback snapshots")
    p.add_argument("--guard-check-every", type=int, default=8,
                   metavar="N", help="frames between async finiteness checks")
    p.add_argument("--resume", default=None, help="checkpoint .npz to resume from")
    p.add_argument(
        "--interact",
        action="append",
        default=[],
        metavar="sphere=x,y,z,r[,strength]",
        help="radial force emitter (repeatable) — the headless analogue of "
        "the reference's mouse-driven sphere collider "
        "(MLSMPM3DFluidMultithreadGPU.cs:618-642, g2p.glsl:122-129)",
    )
    p.add_argument(
        "--fluid",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="override a runtime-tunable fluid parameter (dt, gravity, "
        "rest_density, dynamic_viscosity, eos_stiffness, eos_power, "
        "pressure_floor) — traced push-constant analogue, no recompile "
        "(MLSMPM3DFluidMultithreadGPU.cs:444-503); repeatable",
    )
    p.add_argument(
        "--flip-gravity-at",
        type=int,
        default=0,
        metavar="FRAME",
        help="invert gravity at this frame — demonstrates mid-run parameter "
        "mutation without recompilation (the reference's settings panel, "
        "main_ui.tscn:60-77)",
    )
    p.add_argument(
        "--metrics",
        default=None,
        metavar="PATH",
        help="append JSONL metrics (per-frame ms, counters, steps/s) here",
    )
    p.add_argument(
        "--orbit-sphere",
        action="store_true",
        help="scripted demo: a repulsion sphere orbiting the domain center, "
        "moved every frame (traced push-constant analogue; no recompiles)",
    )


def _apply_fluid_overrides(args, fluid):
    """CLI overrides + per-frame mutation of traced FluidParams (the
    reference's UpdatePushConstants path). Returns (fluid0, fluid_fn)."""
    import numpy as np

    for spec in args.fluid:
        key, _, val = spec.partition("=")
        if not hasattr(fluid, key):
            raise SystemExit(f"unknown fluid parameter {key!r}")
        cur = getattr(fluid, key)
        arr = np.asarray([float(v) for v in val.split(",")], np.float32)
        fluid = fluid.replace(**{key: arr.reshape(np.asarray(cur).shape)})

    flip = args.flip_gravity_at

    def fluid_fn(frame):
        if flip and frame >= flip:
            return fluid.replace(gravity=-fluid.gravity)
        return fluid

    return fluid, fluid_fn


def _parse_interactions(args, config):
    """Build the per-frame interactions tuple + an update function for
    scripted motion. Returns (interactions0, update_fn(frame) -> tuple)."""
    import numpy as np

    from .ops.interact import Interaction

    static = []
    for spec in args.interact:
        kind, _, rest = spec.partition("=")
        vals = [float(v) for v in rest.split(",") if v]
        if kind != "sphere" or len(vals) < config.dim + 1:
            raise SystemExit(
                f"bad --interact {spec!r}: expected sphere=x,y,z,r[,strength]"
            )
        center, radius = vals[: config.dim], vals[config.dim]
        strength = vals[config.dim + 1] if len(vals) > config.dim + 1 else 1.0
        static.append(Interaction.sphere(center, radius=radius, strength=strength))

    if not args.orbit_sphere:
        inter = tuple(static)
        return inter, lambda frame: inter

    res = np.asarray(config.grid_res, np.float32)
    cx = res / 2.0
    orbit_r = float(res[0]) / 4.0
    radius = max(4.0, float(res[0]) / 8.0)

    def update(frame):
        ang = 2.0 * np.pi * frame / 120.0
        center = cx.copy()
        center[0] += orbit_r * np.cos(ang)
        center[-1] += orbit_r * np.sin(ang)
        if config.dim == 3:
            center[1] = res[1] / 5.0  # sweep through the pool depth
        orb = Interaction.sphere(center[: config.dim], radius=radius, strength=1.0)
        return tuple(static) + (orb,)

    return update(0), update


def _setup_jax():
    import re

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
    # honor XLA_FLAGS=--xla_force_host_platform_device_count=N on CPU: some
    # environments (this one) silently ignore the flag itself — the config
    # knob below is what actually works, and it must be set before first
    # device use (tests/conftest.py documents the same trap)
    m = re.search(r"xla_force_host_platform_device_count=(\d+)",
                  os.environ.get("XLA_FLAGS", ""))
    if m and os.environ.get("JAX_PLATFORMS", "") == "cpu":
        try:
            # BOTH, in this order — with only the env var (or only
            # num_cpu_devices) the count silently stays 1
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", int(m.group(1)))
        except RuntimeError:
            pass  # backend already initialized — leave device count alone
    return jax


def _build(args):
    import jax

    from . import get_scene, make_step
    from .ops import bucketed

    scene = get_scene(args.scene)
    mode = args.mode
    if mode == "auto":
        # the production path: fused Pallas kernels on TPU, the XLA bucket
        # engine elsewhere (pallas falls back internally for unsupported
        # configs — 2D / fixed-point)
        mode = "pallas" if jax.default_backend() not in ("cpu",) else "bucketed"
    windowed = (
        getattr(args, "window", "off") == "auto"
        and scene.config.dim == 3
        and mode in ("bucketed", "pallas")
    )
    mesh = None
    shards = getattr(args, "shards", 0)
    if shards:
        # SPMD x-slab decomposition (parallel/domain.py) over the first N
        # local devices — the CLI surface for BASELINE config 5. The shard
        # kernels are the fused Pallas pair; on CPU they run in interpret
        # mode (same path the 8-virtual-device test mesh exercises).
        import numpy as np
        from jax.sharding import Mesh

        devs = jax.devices()
        if shards > len(devs):
            raise SystemExit(
                f"--shards {shards}: only {len(devs)} device(s) visible "
                "(set XLA_FLAGS=--xla_force_host_platform_device_count=N "
                "with JAX_PLATFORMS=cpu to emulate a mesh)")
        if scene.config.dim != 3 or mode not in ("bucketed", "pallas"):
            raise SystemExit("--shards requires a 3D scene on the "
                             "bucket/pallas path")
        nx = scene.config.grid_res[0]
        if nx % shards or nx // shards < 2:
            raise SystemExit(
                f"--shards {shards} must divide grid x={nx} into slabs of "
                ">= 2 planes")
        mesh = Mesh(np.asarray(devs[:shards]), ("x",))
        print(f"mesh: {shards} x-slab shard(s) over "
              f"{devs[0].platform} devices")
    interp = jax.default_backend() == "cpu"
    if windowed:
        # air-window engine (ops/window.py): same physics at the true
        # domain, arrays sized to the occupied y-range. win.step has the
        # step signature; resizes recompile the renderer per window height
        # (cached after first use). With a mesh, the window drives the
        # SHARDED production kernels (x-slabs) while tracking y.
        from .ops.window import YWindow

        win = YWindow(scene.config, mode=mode,
                      substeps=args.substeps or scene.config.substeps,
                      mesh=mesh, interpret=interp and mesh is not None)
        state = win.init(scene.state)
        step = win.step
        print(f"air-window engine: wy={win.wy} of ny={scene.config.grid_res[1]}")
    elif mesh is not None:
        from .parallel.domain import make_sharded_bucket_step, shard_bucket_state

        win = None
        step = make_sharded_bucket_step(
            scene.config, mesh,
            substeps=args.substeps or scene.config.substeps,
            interpret=interp)
        state = jax.jit(lambda s: bucketed.from_simstate(s, scene.config))(
            scene.state)
        state = shard_bucket_state(state, mesh)
    else:
        win = None
        step = make_step(scene.config, mode=mode, substeps=args.substeps)
        if mode in ("bucketed", "pallas"):
            state = jax.jit(lambda s: bucketed.from_simstate(s, scene.config))(scene.state)
        else:
            state = jax.device_put(scene.state)
    if args.resume:
        from .utils import checkpoint

        state, fluid, ck_config, _ = checkpoint.load(args.resume)
        # a checkpoint written during a --window auto run stores WINDOW-sized
        # bucket arrays with domain_res = the true grid (ADVICE r3: saving
        # the true config let such a checkpoint pass validation and fail at
        # step time with an opaque shape error). The true domain of the
        # checkpoint is domain_res when windowed, grid_res otherwise.
        ck_windowed = bool(ck_config and ck_config.get("domain_res"))
        if ck_config is not None:
            ck_grid = tuple(ck_config.get("domain_res")
                            or ck_config.get("grid_res",
                                             scene.config.grid_res))
            if ck_grid != tuple(scene.config.grid_res):
                raise SystemExit(
                    f"checkpoint domain {ck_grid} != scene grid "
                    f"{scene.config.grid_res}; pass the matching scene"
                )
        if (windowed or ck_windowed) and isinstance(state, bucketed.BucketState):
            # window sizes are run-local: un-window to a linear SimState
            # (config-free), then re-bucket at this run's shapes below
            state = bucketed.to_simstate(state, scene.config.num_particles)
        if windowed:
            state = win.init(state)
        # validate the checkpoint against the selected mode/scene (ADVICE r1:
        # a binned-mode SimState resumed under bucketed mode fails at step
        # time with an opaque tracer error — fail early and converciblely)
        want_bucket = mode in ("bucketed", "pallas")
        is_bucket = windowed or isinstance(state, bucketed.BucketState)
        if want_bucket and not is_bucket:
            state = jax.jit(
                lambda s: bucketed.from_simstate(s, scene.config)
            )(state)
            print("converted linear checkpoint state to buckets")
        elif is_bucket and not want_bucket:
            state = bucketed.to_simstate(state, scene.config.num_particles)
            print("converted bucket checkpoint state to linear")
        if mesh is not None and not windowed:
            from .parallel.domain import shard_bucket_state

            state = shard_bucket_state(state, mesh)
        scene = scene._replace(fluid=fluid)
        print(f"resumed from {args.resume}")
    return scene, step, state, mode, win, mesh


def cmd_run(args):
    import numpy as np

    _setup_jax()
    from .utils.timing import FrameStats, fence

    scene, step, state, mode, win, mesh = _build(args)
    n = scene.state.num_particles
    substeps = args.substeps or scene.config.substeps
    inter0, inter_fn = _parse_interactions(args, scene.config)
    fluid0, fluid_fn = _apply_fluid_overrides(args, scene.fluid)
    scene = scene._replace(fluid=fluid0)
    print(f"scene={scene.name} N={n} grid={scene.config.grid_res} mode={mode}"
          + (f" interactions={len(inter0)}" if inter0 else ""))

    from .utils.metrics import MetricsLogger

    metrics = MetricsLogger(path=args.metrics)
    stats = FrameStats()
    if args.guard:
        # production failure-detection policy (measured overhead in the
        # GuardedStep docstring; defaults pinned by scripts/guard_overhead)
        from .utils.guard import GuardedStep

        step = GuardedStep(step, snapshot_every=args.guard_snapshot_every,
                           check_every=args.guard_check_every)
    t0 = time.perf_counter()
    state = step(state, scene.fluid, inter0)
    fence(state)
    compile_s = time.perf_counter() - t0
    print(f"compile+first frame: {compile_s:.1f}s")
    metrics.log("compile", seconds=round(compile_s, 3), scene=scene.name,
                mode=mode, n=n)

    for i in range(args.frames):
        state = step(state, fluid_fn(i), inter_fn(i))
        fence(state)  # honest frame pacing (see utils/timing.py)
        if args.metrics:
            s_ = stats.stats
            metrics.log("frame", i=i, last_ms=round(s_["last_ms"], 3),
                        avg_ms=round(s_["avg_ms"], 3))
        if args.checkpoint_every and (i + 1) % args.checkpoint_every == 0:
            from .utils import checkpoint

            os.makedirs(args.checkpoint_dir, exist_ok=True)
            path = os.path.join(args.checkpoint_dir, f"frame_{i+1:05d}.npz")
            # windowed runs save the CURRENT windowed config (domain_res =
            # the true grid) so resume can detect + re-window the state
            checkpoint.save(path, state, scene.fluid,
                            win.config if win else scene.config)
            print(f"checkpointed {path}")
        stats.tick()
    fence(state)
    if args.guard:
        ok = step.flush()
        if step.failures or not ok:
            print(f"guard: {step.failures} rollback(s), "
                  f"{step.frames_lost} frame(s) lost, "
                  f"dt scale {step.current_dt_scale:g}")
            if not ok:
                state = step.last_good()
        metrics.log("guard", failures=step.failures,
                    frames_lost=step.frames_lost,
                    dt_scale=step.current_dt_scale)
    s = stats.stats
    pps = n * substeps * s["fps"]
    print(
        f"frames={args.frames} avg={s['avg_ms']:.2f}ms min={s['min_ms']:.2f} "
        f"max={s['max_ms']:.2f} fps={s['fps']:.1f} -> {pps/1e6:.1f}M particle-steps/s"
    )
    if mode in ("bucketed", "pallas"):
        lost = int(np.asarray(state.lost))
        deferred = int(np.asarray(state.deferred))
        cfl = int(np.asarray(state.cfl_clamped))
        ceil = int(np.asarray(getattr(state, "ceiling", 0)))
        print(f"lost: {lost} deferred: {deferred} cfl-clamped: {cfl}"
              + (f" window-ceiling: {ceil}" if ceil else ""))
        metrics.log("counters", lost=lost, deferred=deferred, cfl_clamped=cfl,
                    ceiling=ceil)
    metrics.log("summary", frames=args.frames, fps=round(s["fps"], 2),
                particle_steps_per_sec=round(pps, 1))
    metrics.close()


def _render_2d_loop(args, scene, step, state, mode):
    """2D frame export — the main_2d analogue (MLSMPMP2DFluid.tscn:34-46):
    particles rasterized over a cell-grid background by render2d.render_2d."""
    import functools as _ft

    import jax
    import jax.numpy as jnp
    import numpy as np

    from .ops import bucketed
    from .render import write_png
    from .render.render2d import render_2d
    from .utils.timing import FrameStats

    res2 = tuple(int(r) for r in scene.config.grid_res)
    bucket = mode in ("bucketed", "pallas")

    from .render.pipeline import frame_to_u8

    @jax.jit
    def frame_img(state):
        if bucket:
            pos = state.pos.reshape(state.pos.shape[0], -1)
            vel = state.vel.reshape(state.vel.shape[0], -1).astype(jnp.float32)
            live = state.mass.reshape(-1) > 0
        else:
            pos = state.pos  # SimState is lane-major [D, N]
            vel = state.vel.astype(jnp.float32)
            live = None
        vmag = jnp.sqrt(jnp.sum(vel * vel, axis=0))
        # u8 on device: 1/4 the host-link bytes (see frame_to_u8)
        return frame_to_u8(render_2d(pos, vmag, res2, live=live))

    os.makedirs(args.out, exist_ok=True)
    inter0, inter_fn = _parse_interactions(args, scene.config)
    fluid_fn = _apply_fluid_overrides(args, scene.fluid)[1]
    stats = FrameStats()
    t0 = time.perf_counter()
    for i in range(args.frames):
        state = step(state, fluid_fn(i), inter_fn(i))
        img = frame_img(state)
        host = np.asarray(img)
        if args.hud:
            from .render.hud import burn_in_hud

            host = burn_in_hud(host, stats, extra=f"N={scene.state.num_particles}")
        write_png(os.path.join(args.out, f"frame_{i:05d}.png"), host)
        stats.tick()
        if i == 0:
            print(f"first frame (compile): {time.perf_counter() - t0:.1f}s")
    s = stats.stats
    print(
        f"{args.frames} 2D frames -> {args.out} "
        f"(avg {s['avg_ms']:.0f} ms/frame excl. compile, incl. PNG IO)"
    )


def cmd_render(args):
    import numpy as np

    jax = _setup_jax()
    import jax.numpy as jnp

    from .ops import bucketed
    from .render import (
        Camera,
        RenderConfig,
        SSFRParams,
        default_view,
        make_bucket_renderer,
        make_renderer,
        write_png,
    )

    scene, step, state, mode, win, mesh = _build(args)
    fluid0, fluid_fn = _apply_fluid_overrides(args, scene.fluid)
    scene = scene._replace(fluid=fluid0)
    if scene.config.dim == 2:
        return _render_2d_loop(args, scene, step, state, mode)
    cam = Camera(width=args.width, height=args.height)
    rc = RenderConfig(
        camera=cam,
        mode=args.render_mode,
        ssfr=SSFRParams(particle_sphere_radius=args.sphere_radius,
                        thickness_pass=args.thickness_pass,
                        thickness_scale=args.thickness_scale),
        sphere_render_ratio=args.sphere_render_ratio,
        quality=args.render_quality,
        max_radius_px=args.max_radius_px,
    )
    view = jnp.asarray(default_view(scene.config.grid_res))

    fly_src = None
    fly_pointer = None
    camera_moves = args.orbit_camera
    if getattr(args, "fly_script", None) or getattr(args, "fly", False):
        # interactive / scripted flight (the reference's fly camera,
        # main_camera.gd:92-132); poses are traced inputs — no recompiles
        from .render.flycam import (
            FlyCamera,
            ScriptKeys,
            SpherePointer,
            TerminalKeys,
        )

        fly_src = (ScriptKeys(args.fly_script) if args.fly_script
                   else TerminalKeys())
        c = [r / 2.0 for r in scene.config.grid_res]
        fly_cam = FlyCamera((c[0] + 55.0, c[1] + 28.0, c[2] + 55.0),
                            (c[0], c[1] - 8.0, c[2]),
                            speed=args.fly_speed,
                            look_rate=args.fly_look_rate)
        # SPACE/'p' steers the interaction sphere along the crosshair ray
        # (the reference's LMB collider; 3D scenes only)
        if scene.config.dim == 3:
            fly_pointer = SpherePointer(
                scene.config, plane_y=args.fly_plane_y,
                radius=args.fly_sphere_radius,
                strength=args.fly_sphere_strength)
        camera_moves = True
        _fly_prev = [time.perf_counter()]

        def view_fn(frame):
            now = time.perf_counter()
            # scripted flights use a fixed 60 Hz delta for replayability;
            # interactive ones the real frame delta like the reference
            dt = 1.0 / 60.0 if args.fly_script else min(
                now - _fly_prev[0], 0.25)
            _fly_prev[0] = now
            keys = fly_src.poll()
            fly_cam.apply_keys(keys, dt)
            if fly_pointer is not None:
                fly_pointer.update(fly_cam, keys)
            return jnp.asarray(fly_cam.view())
    elif args.orbit_camera:
        import numpy as _np

        from .render.camera import look_at

        c = [r / 2.0 for r in scene.config.grid_res]

        def view_fn(frame):
            ang = 2.0 * _np.pi * frame / max(args.frames, 1)
            eye = (c[0] + 75.0 * _np.cos(ang), c[1] + 28.0,
                   c[2] + 75.0 * _np.sin(ang))
            return jnp.asarray(look_at(eye, (c[0], c[1] - 8.0, c[2])))
    else:
        def view_fn(frame):
            return view
    if args.crop == "auto" and not camera_moves:
        # static fluid crop: image-space SSFR passes run on the domain's
        # projected rectangle only — value-preserving (tests/test_crop.py),
        # so it silently no-ops for moving cameras / non-DEFAULT modes
        from .render import domain_crop

        rc = domain_crop(rc, scene.config, default_view(scene.config.grid_res))
        if rc.crop:
            y0, x0, ch, cw = rc.crop
            print(f"fluid crop: {cw}x{ch}+{x0}+{y0} "
                  f"({cw * ch / (cam.width * cam.height):.0%} of frame)")
    os.makedirs(args.out, exist_ok=True)

    cubemap = None
    if args.cubemap:
        from .render.background import load_cubemap

        cubemap = load_cubemap(args.cubemap)
    bucket_path = (
        mode in ("bucketed", "pallas")
        and scene.config.dim == 3
        and args.sphere_render_ratio >= 1.0
    )
    if mesh is not None and not bucket_path:
        raise SystemExit("--shards render requires the bucket render path "
                         "(--sphere-render-ratio 1.0)")
    if rc.mode == "legacy_quad" and not bucket_path:
        raise SystemExit(
            "--render-mode legacy_quad reads the bucket-state texture "
            "contract: requires a 3D bucketed/pallas scene and "
            "--sphere-render-ratio 1.0")
    if bucket_path:
        # Pallas cell-extraction render path (render/extract_kernel.py):
        # per-cell nearest-particle reduction in VMEM before the z-buffer
        import functools as _ft

        from .render import render_frame_buckets
        from .render.pipeline import background_for_view

        from .render.pipeline import frame_to_u8

        # the ray-traced background depends only on (camera, view): cache it
        # for a static camera at every size (measured 223 -> 149 ms/frame
        # at 1080p; ~1.7 of 7.2 ms at 640x360, scripts/render_attrib.py —
        # the earlier "wash at small frames" result was an isolated-jit
        # measurement artifact). A moving camera recomputes it per frame.
        _bg = None if camera_moves else background_for_view(rc, view)
        # frames leave the device as uint8 — the gamma-2.2 tonemap runs on
        # device and the host link moves 1/4 the bytes (render/pipeline.py
        # frame_to_u8: the f32 transfer was ~180 ms/frame of the loop)
        _np_count = scene.state.num_particles
        renderer_b = jax.jit(lambda s, v: frame_to_u8(render_frame_buckets(
            s, v, rc=rc, cubemap_faces=cubemap, bg=_bg,
            interpret=jax.default_backend() == "cpu",
            num_particles=_np_count,
        )))
        # single-jit frame: substeps + in-kernel splat emission (the
        # reference's g2p render-texture write, g2p.glsl:149-150) + SSFR +
        # u8 tonemap in one dispatch — used whenever the production fused
        # path applies (not windowed: resizes would recompile per height)
        from .ops.pallas.fused import fused_supported
        from .render.pipeline import make_full_frame_step

        full_frame = None
        if mesh is not None:
            # distributed render composite (parallel/render.py): sharded
            # substeps + per-shard splat emission + pmin depth merge + SSFR
            # — per-frame cross-device traffic is the [H, W] buffer, never
            # the particle state (BASELINE config 5's render clause)
            if getattr(args, "window", "off") == "auto":
                raise SystemExit(
                    "--shards render supports --window off only (the "
                    "windowed+sharded engine is available via `run`)")
            if args.render_quality != "cell" or rc.mode in ("none",
                                                            "legacy_quad"):
                raise SystemExit(
                    "--shards render uses the distributed cell-splat "
                    "composite: requires --render-quality cell and a "
                    "drawing --render-mode")
            from .parallel.render import make_sharded_frame_step

            full_frame = make_sharded_frame_step(
                scene.config, mesh, rc,
                substeps=args.substeps or scene.config.substeps,
                cubemap_faces=cubemap,
                interpret=jax.default_backend() == "cpu")
        elif (mode == "pallas"
                and getattr(args, "window", "off") != "auto"
                and args.render_quality == "cell"
                and rc.mode not in ("none", "legacy_quad")
                and fused_supported(scene.config)):
            full_frame = make_full_frame_step(
                scene.config, rc, args.substeps or scene.config.substeps,
                cubemap_faces=cubemap,
                interpret=jax.default_backend() == "cpu")
    else:
        import functools as _ft

        from .render import render_frame
        from .render.pipeline import frame_to_u8

        full_frame = None
        renderer = jax.jit(lambda p, vm, v: frame_to_u8(
            render_frame(p, vm, v, rc=rc, cubemap_faces=cubemap)))

        @jax.jit
        def extract(state):
            if mode in ("bucketed", "pallas"):
                pos = state.pos.reshape(state.pos.shape[0], -1)
                vel = state.vel.reshape(state.vel.shape[0], -1)
                live = state.mass.reshape(-1) > 0
                # dead slots sit parked at cell centers — push them behind
                # the far plane via offscreen mask
                pos = jnp.where(live, pos, -1e6)
                return pos, jnp.linalg.norm(vel.astype(jnp.float32), axis=0)
            return state.pos, jnp.linalg.norm(state.vel, axis=0)

    from concurrent.futures import ThreadPoolExecutor

    from .utils.timing import FrameStats

    stats = FrameStats()
    inter0, inter_fn = _parse_interactions(args, scene.config)
    if fly_pointer is not None:
        # append the steerable sphere to every frame's interactions tuple
        # (ALWAYS present so the tuple structure — and thus the jit
        # signature — never changes; `active` gates the force, traced)
        _base_inter_fn = inter_fn

        def inter_fn(frame):
            return _base_inter_fn(frame) + (fly_pointer.interaction(),)

        inter0 = inter_fn(0)
    t0 = time.perf_counter()
    # PNG encode+write runs on worker threads, overlapped with the next
    # frames' device compute (the reference's render thread separation,
    # SURVEY.md §2.5 host<->device async). 4 workers: at 1080p one encode
    # (~0.9 s native zlib) outlasts several device frames, and zlib releases
    # the GIL, so encodes genuinely parallelize.
    pool = ThreadPoolExecutor(max_workers=4)
    pending = []

    def flush(img, idx):
        # the ENTIRE host side of a frame — device->host u8 transfer, HUD
        # burn-in, PNG encode+write — runs on a worker thread, so the main
        # loop never blocks on the tunnel (the reference's render-thread
        # separation, SURVEY.md §2.5 host<->device async)
        def _host_side(img=img, idx=idx):
            host = np.asarray(img)
            if args.hud:
                from .render.hud import burn_in_hud

                host = burn_in_hud(
                    host, stats, extra=f"N={scene.state.num_particles}"
                )
            write_png(os.path.join(args.out, f"frame_{idx:05d}.png"), host)

        pending.append(pool.submit(_host_side))
        if len(pending) > 4:
            pending.pop(0).result()

    from .utils.metrics import MetricsLogger

    metrics = MetricsLogger(path=args.metrics)
    prev = None
    for i in range(args.frames):
        if fly_src is not None and fly_src.quit:
            print(f"fly camera: quit at frame {i}")
            break
        td0 = time.perf_counter()
        v = view_fn(i)
        if full_frame is not None:
            state, img = full_frame(state, fluid_fn(i), inter_fn(i), v,
                                    _bg)
        elif bucket_path:
            state = step(state, fluid_fn(i), inter_fn(i))
            img = renderer_b(state, v)
        else:
            state = step(state, fluid_fn(i), inter_fn(i))
            pos, vmag = extract(state)
            img = renderer(pos, vmag, v)
        # start the device->host DMA for this frame NOW: the tunnel transfer
        # then overlaps the next frame's dispatch instead of serializing
        # behind it when the worker thread finally calls np.asarray
        # (measured 36 -> 24 ms/frame at 1M/640x360)
        img.copy_to_host_async()
        # host work (prev-frame transfer + HUD + PNG submit/backpressure)
        # overlaps this frame's device compute; fencing on one pixel of the
        # new frame afterwards gives the device time for step+render — the
        # reference's CPU/GPU frame-time split (debug_menu.gd:132,383,403)
        th0 = time.perf_counter()
        if prev is not None:
            flush(*prev)
        host_s = time.perf_counter() - th0
        np.asarray(img[:1, :1, 0])
        if i > 0:  # frame 0's device time is dominated by compilation
            stats.split(time.perf_counter() - td0, host_s)
        prev = (img, i)
        stats.tick()
        if i == 0:
            print(f"first frame (compile): {time.perf_counter() - t0:.1f}s")
            metrics.log("compile", seconds=round(time.perf_counter() - t0, 3),
                        scene=scene.name, mode=mode,
                        n=scene.state.num_particles)
        elif args.metrics:
            s_ = stats.stats
            metrics.log("frame", i=i, last_ms=round(s_["last_ms"], 3),
                        dev_ms=round(s_["dev_ms"], 3),
                        host_ms=round(s_["host_ms"], 3))
        if args.checkpoint_every and (i + 1) % args.checkpoint_every == 0:
            from .utils import checkpoint

            os.makedirs(args.checkpoint_dir, exist_ok=True)
            ck = os.path.join(args.checkpoint_dir, f"frame_{i+1:05d}.npz")
            checkpoint.save(ck, state, scene.fluid,
                            win.config if win else scene.config)
            print(f"checkpointed {ck}")
    if fly_src is not None:
        fly_src.close()  # restore the terminal before printing the summary
    if prev is not None:
        flush(*prev)
    for f in pending:
        f.result()
    pool.shutdown()
    s = stats.stats
    print(
        f"{args.frames} frames -> {args.out} "
        f"(avg {s['avg_ms']:.0f} ms/frame excl. compile, "
        f"min {s['min_ms']:.0f} max {s['max_ms']:.0f}, incl. PNG IO; "
        f"dev {s['dev_ms']:.1f} ms | host {s['host_ms']:.1f} ms)"
    )
    if mode in ("bucketed", "pallas"):
        lost = int(np.asarray(state.lost))
        ceil = int(np.asarray(getattr(state, "ceiling", 0)))
        metrics.log("counters", lost=lost,
                    deferred=int(np.asarray(state.deferred)),
                    cfl_clamped=int(np.asarray(state.cfl_clamped)),
                    ceiling=ceil)
        if lost or ceil:
            print(f"lost: {lost} window-ceiling: {ceil}")
    metrics.log("summary", frames=args.frames,
                avg_ms=round(s["avg_ms"], 2), dev_ms=round(s["dev_ms"], 2),
                host_ms=round(s["host_ms"], 2))
    metrics.close()


def cmd_info(args):
    jax = _setup_jax()
    import jax.numpy as jnp

    print(f"jax {jax.__version__}")
    print(f"backend: {jax.default_backend()}")
    for d in jax.devices():
        print(f"  device: {d} ({d.platform})")
    x = jnp.ones((4, 4))
    print(f"compute ok: {float(x.sum())}")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="mpm_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="run a simulation headless")
    _common(p_run)
    p_run.set_defaults(fn=cmd_run)

    p_r = sub.add_parser("render", help="run + render PNG frames")
    _common(p_r)
    p_r.add_argument("--out", default="/tmp/mpm_frames")
    p_r.add_argument("--width", type=int, default=960)
    p_r.add_argument("--height", type=int, default=540)
    p_r.add_argument(
        "--render-mode",
        default="default",
        choices=["default", "velocity_spheres", "lit_spheres", "depth_debug",
                 "none", "legacy_quad"],
    )
    p_r.add_argument("--sphere-radius", type=float, default=1.0)
    p_r.add_argument(
        "--max-radius-px",
        type=int,
        default=6,
        help="splat disc radius cap in pixels. 6 suits ~360p; at 1080p "
        "cells project ~11 px apart, so either raise this to ~18 (O(R^2) "
        "dilation cost) or prefer --render-quality particle with 8 "
        "(watertight at 1M; see ARCHITECTURE.md 'Renderer')",
    )
    p_r.add_argument(
        "--render-quality",
        default="cell",
        choices=["cell", "particle"],
        help="bucket-path splat granularity: 'cell' = nearest particle per "
        "grid cell (fast), 'particle' = z-buffer every live particle (the "
        "reference's per-instance raster fidelity, "
        "multi_mesh/billboard_sphere.gdshader)",
    )
    p_r.add_argument("--sphere-render-ratio", type=float, default=1.0)
    p_r.add_argument(
        "--thickness-pass",
        action="store_true",
        help="real SSFR thickness pass: additive per-pixel material "
        "thickness feeds Beer's law + the refraction offset (the pass the "
        "reference skipped, screen_space_fluid_rendering.gd:429 — default "
        "keeps its constant-thickness uniform, exact parity)",
    )
    p_r.add_argument("--thickness-scale", type=float, default=0.35)
    p_r.add_argument(
        "--cubemap",
        default=None,
        metavar="DIR",
        help="6-face PNG cubemap directory for SSFR reflections (the "
        "reference's assets/cubemap; *-1..6.png or px/nx/py/ny/pz/nz.png)",
    )
    p_r.add_argument(
        "--orbit-camera",
        action="store_true",
        help="scripted camera orbit around the domain center (camera poses "
        "are traced per-frame inputs, no recompiles)",
    )
    p_r.add_argument(
        "--fly",
        action="store_true",
        help="interactive fly camera over the live render loop (the "
        "reference's right-mouse+WASD flight, main_camera.gd:92-132): "
        "w/a/s/d move, q/e down/up, arrows or i/j/k/l look, +/- speed, "
        "SPACE pushes the fluid with the steerable collider sphere at the "
        "crosshair (the reference's LMB mouse-ray interaction), Esc quits; "
        "reads raw stdin, needs a terminal",
    )
    p_r.add_argument(
        "--fly-script",
        default=None,
        metavar="SPEC",
        help="deterministic fly-camera key schedule, e.g. 'w:30,wl:10' = "
        "30 frames holding w then 10 holding w+l ('.' = coast); replayable "
        "flights without a terminal (render/flycam.py)",
    )
    p_r.add_argument("--fly-speed", type=float, default=40.0,
                     help="fly speed, world units/s (reference SPEED=200 in "
                     "its ~4x larger world, main_camera.gd:94)")
    p_r.add_argument("--fly-look-rate", type=float, default=2.5,
                     help="look rate, degrees per frame a look key is held")
    p_r.add_argument(
        "--fly-plane-y", type=float, default=None,
        help="steerable collider: hold SPACE (script token 'p') while "
        "flying to place the interaction sphere where the crosshair ray "
        "meets the horizontal plane y=PLANE_Y and push the fluid — the "
        "reference's LMB mouse-ray-onto-plane collider "
        "(MLSMPM3DFluidMultithreadGPU.cs:618-642, g2p.glsl:122-129). "
        "Default: domain height / 5")
    p_r.add_argument("--fly-sphere-radius", type=float, default=None,
                     help="steerable collider radius (default max(4, nx/8); "
                     "reference SphereShape3D radius 15)")
    p_r.add_argument("--fly-sphere-strength", type=float, default=1.0,
                     help="steerable collider radial push strength "
                     "(reference: unit push, g2p.glsl:126-128)")
    p_r.add_argument(
        "--crop",
        default="auto",
        choices=["auto", "off"],
        help="static fluid crop for fixed cameras: the SSFR image passes "
        "(dilation, blur, shade, refraction) run on the simulation "
        "domain's projected rectangle only — bit-exact frames "
        "(render.pipeline.domain_crop); auto no-ops for moving cameras",
    )
    p_r.add_argument(
        "--hud",
        action="store_true",
        help="burn the FPS/frametime overlay into the frames (the "
        "reference's F3 debug menu, addons/debug_menu)",
    )
    p_r.set_defaults(fn=cmd_render)

    p_i = sub.add_parser("info", help="device/backend info")
    p_i.set_defaults(fn=cmd_info)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
