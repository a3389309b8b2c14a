#!/usr/bin/env python
"""In-context render-pass attribution at the bench config (real chip).

scripts/render_profile.py times each pass as an isolated jit call, which on
the tunneled platform adds per-call dispatch (~6.5 ms) and defeats XLA's
cross-pass fusion — its absolute numbers disagree with the frame loop by
3-4x. This script instead times VARIANT RENDERERS (each a single jit, like
the production loop), warm state, fences only at window boundaries; the
difference between variants attributes the pass.

Usage: python scripts/render_attrib.py [n_particles] [W] [H]
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
from mpm_tpu.render import Camera, RenderConfig, SSFRParams, default_view
from mpm_tpu.render.pipeline import frame_to_u8, render_frame_buckets
from mpm_tpu.render.background import render_background
from mpm_tpu.render.extract_kernel import extract_cell_splats
from mpm_tpu.render.splat import splat_cells


def _fence(out):
    # tiny-slice fence: block_until_ready can return while compute still
    # streams on the tunneled platform (utils/timing.py; observed returning
    # 0.03 ms for a 1080p frame), and np.asarray of a full frame drags MBs
    # through the ~35 MB/s tunnel — pull ONE element of one leaf instead
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(slice(0, 1),) * leaf.ndim])


def timed(name, fn, *args, iters=20):
    out = fn(*args)  # compile
    _fence(out)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _fence(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        best = dt if best is None else min(best, dt)
    print(f"  {name:34s} {best:8.2f} ms")
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 360
    scene = benchmark_scene(n)
    config, fluid = scene.config, scene.fluid
    state = jax.jit(lambda s: bucketed.from_simstate(s, config))(
        jax.device_put(scene.state))
    step = make_step(config, mode="pallas", substeps=10)
    for _ in range(15):
        state = step(state, fluid, ())
    np.asarray(state.lost)

    cam = Camera(width=w, height=h)
    rc = RenderConfig(camera=cam, ssfr=SSFRParams())
    view = jnp.asarray(default_view(config.grid_res)).astype(jnp.float32)
    print(f"# {n} particles, {w}x{h}, device {jax.devices()[0]}")

    # full production renderer (what bench.py runs)
    full = jax.jit(lambda s, v: frame_to_u8(render_frame_buckets(s, v, rc=rc)))
    t_full = timed("FULL (extract+splat+blur+shade+u8)", full, state, view)

    # variants: drop passes from the back
    rc_dd = RenderConfig(camera=cam, ssfr=SSFRParams(), mode="depth_debug")
    no_shade = jax.jit(
        lambda s, v: frame_to_u8(render_frame_buckets(s, v, rc=rc_dd)))
    t_noshade = timed("extract+splat+blur (depth_debug)", no_shade, state, view)

    def to_bufs(s, v):
        cells = extract_cell_splats(s, v, cam)
        return splat_cells(cells, cam,
                           sphere_radius=rc.ssfr.particle_sphere_radius,
                           max_radius_px=rc.max_radius_px)

    splat_only = jax.jit(lambda s, v: to_bufs(s, v).depth)
    t_splat = timed("extract+splat (depth buffer out)", splat_only, state, view)

    nodil = jax.jit(lambda s, v: frame_to_u8(render_frame_buckets(
        s, v, rc=RenderConfig(camera=cam, ssfr=SSFRParams(), max_radius_px=0))))
    t_nodil = timed("FULL but max_radius_px=0", nodil, state, view)

    extract_only = jax.jit(lambda s, v: extract_cell_splats(s, v, cam))
    t_ex = timed("extract kernel only", extract_only, state, view)

    bg_only = jax.jit(lambda v: render_background(cam, v, rc.background))
    t_bg = timed("background ray trace only", bg_only, view)

    # particle-quality variant for reference
    rc_p = RenderConfig(camera=cam, ssfr=SSFRParams(), quality="particle")
    full_p = jax.jit(
        lambda s, v: frame_to_u8(render_frame_buckets(s, v, rc=rc_p)))
    t_fp = timed("FULL quality=particle", full_p, state, view)

    print("# attribution (differences):")
    print(f"  shade+composite           ~{t_full - t_noshade:6.2f} ms")
    print(f"  bilateral blur            ~{t_noshade - t_splat - t_bg:6.2f} ms"
          " (minus bg, approx)")
    print(f"  sphere dilation           ~{t_full - t_nodil:6.2f} ms")
    print(f"  z-buffer scatter          ~{t_splat - t_ex:6.2f} ms")
    print(f"  extract stream            ~{t_ex:6.2f} ms")
    print(f"  particle-quality premium  ~{t_fp - t_full:6.2f} ms")


if __name__ == "__main__":
    main()
