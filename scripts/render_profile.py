#!/usr/bin/env python
"""Per-stage render-pipeline profile at the bench scale (fresh process, real
chip): splat deposit, sphere dilation, blur, shade, composite, host
transfer, PNG encode.

DEPRECATED for absolute numbers: each stage here is a separate jit call,
which adds ~6.5 ms of tunnel dispatch per call and defeats cross-pass
fusion — measured 3-4x higher than the real frame loop. Use
scripts/render_attrib.py (variant renderers, single jit each, tiny-slice
fences) for attribution; this script is kept for stage-relative shape
checks only.

Usage: python scripts/render_profile.py [n_particles] [W] [H]
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
from mpm_tpu.render import Camera, RenderConfig, SSFRParams, default_view, make_renderer
from mpm_tpu.render import splat as _splat
from mpm_tpu.render import ssfr as _ssfr
from mpm_tpu.render.pipeline import render_frame
from mpm_tpu.utils.timing import fence


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    fence(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out[0] if isinstance(out, tuple) else out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"  {name:28s} {ms:8.1f} ms")
    return out


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 360
    scene = benchmark_scene(n_target)
    config, fluid = scene.config, scene.fluid
    state = jax.jit(lambda s: bucketed.from_simstate(s, config))(
        jax.device_put(scene.state))
    step = make_step(config, mode="pallas", substeps=10)
    for _ in range(5):
        state = step(state, fluid, ())
    fence(state.pos)
    print(f"# {state.pos.shape[1] * state.pos.shape[2]} slots, {w}x{h}")

    cam = Camera(width=w, height=h)
    rc = RenderConfig(camera=cam, ssfr=SSFRParams())
    view = jnp.asarray(default_view(config.grid_res))

    @jax.jit
    def extract(state):
        pos = state.pos.reshape(3, -1)
        vel = state.vel.reshape(3, -1)
        live = state.mass.reshape(-1) > 0
        pos = jnp.where(live, pos, -1e6)
        vmag = jnp.sqrt(jnp.sum(vel.astype(jnp.float32) ** 2, axis=0))
        return pos, vmag

    pos, vmag = timeit("extract", extract, state)

    from mpm_tpu.render.camera import view_to_screen, world_to_view

    @jax.jit
    def proj_stage(pos, vmag):
        vp = world_to_view(pos, view)
        px, py, depth = view_to_screen(vp, cam)
        keep = depth > cam.near
        return px, py, depth, vmag, keep

    px, py, depth, vm, keep = timeit("project", proj_stage, pos, vmag)

    @jax.jit
    def deposit_stage(px, py, depth, vm, keep):
        return _splat._point_deposit(px, py, depth, vm, cam, keep)

    bufs = timeit("point deposit (sort)", deposit_stage, px, py, depth, vm, keep)

    @jax.jit
    def dilate_stage(bufs):
        return _splat._dilate_spheres(bufs, cam, rc.ssfr.particle_sphere_radius,
                                      rc.max_radius_px)

    bufs2 = timeit("sphere dilation", dilate_stage, bufs)

    @jax.jit
    def blur_stage(d):
        return _ssfr.blur_depth(d, rc.ssfr, cam)

    blurred = timeit("bilateral blur", blur_stage, bufs2.depth)

    full = jax.jit(lambda p, v: render_frame(p, v, view, rc))
    img = timeit("FULL render_frame", full, pos, vmag)

    # ---- production bucket path (extract kernel + cell z-buffer) ----
    from mpm_tpu.render.extract_kernel import extract_cell_splats
    from mpm_tpu.render.pipeline import render_frame_buckets
    from mpm_tpu.render.background import render_background
    from mpm_tpu.render import splat as _sp

    print("# bucket path:")
    cells = timeit(
        "cell extract (pallas)",
        jax.jit(lambda s: extract_cell_splats(s, view, cam)), state,
    )
    bufs_b = timeit(
        "splat_cells (z-buffer)",
        jax.jit(lambda c: _sp.splat_cells(
            c, cam, sphere_radius=rc.ssfr.particle_sphere_radius,
            max_radius_px=rc.max_radius_px)),
        cells,
    )
    timeit("bilateral blur", blur_stage, bufs_b.depth)
    timeit(
        "background (ray trace)",
        jax.jit(lambda v: render_background(cam, v, rc.background)), view,
    )
    bgc, bgd = render_background(cam, view, rc.background)
    from mpm_tpu.render.background import make_cubemap_sampler

    sampler = make_cubemap_sampler(None)
    timeit(
        "shade",
        jax.jit(lambda d, c, zd: _ssfr.shade(
            d, c, zd, sampler, view[:3, :3], rc.ssfr, cam)[0]),
        blur_stage(bufs_b.depth), bgc, bgd,
    )
    timeit(
        "FULL render_frame_buckets",
        jax.jit(lambda s, v: render_frame_buckets(s, v, rc)), state, view,
    )
    from mpm_tpu.render.pipeline import background_for_view

    bg = background_for_view(rc, view)
    timeit(
        "FULL buckets (cached bg)",
        jax.jit(lambda s, v: render_frame_buckets(s, v, rc, bg=bg)),
        state, view,
    )

    t0 = time.perf_counter()
    for _ in range(5):
        host = np.asarray(img)
    print(f"  {'host transfer':28s} {(time.perf_counter()-t0)/5*1e3:8.1f} ms")

    from mpm_tpu.render.image import write_png
    t0 = time.perf_counter()
    write_png("/tmp/rp.png", host)
    print(f"  {'png encode+write':28s} {(time.perf_counter()-t0)*1e3:8.1f} ms")



if __name__ == "__main__":
    main()
