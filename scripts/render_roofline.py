#!/usr/bin/env python
"""Render-chain roofline at the official 1080p recipe (VERDICT r4 next #1).

The sim side earned its numbers with vpu_roofline/mover_stats; this gives
the render chain the same treatment: per-pass floors via VARIANT RENDERERS
(each one jit, like the production loop — isolated-jit per-pass timings
over-report 3-4x on this platform, scripts/render_attrib.py header), plus
isolated probes of the two suspected floors:

  - the dependent refracted-background gather
    (fluid_render_fixed_depth.glsl:142-144 -> render/ssfr.shade): formats
    compared: 2-D [H,W,3] f32 gather (production), flat 1-D f32 x3, flat
    1-D packed-int32 (one gather, 3x fewer lookups, 10-bit channels)
  - the sphere-impostor dilation's O(R^2) shifted-window mins
    (render/splat._dilate_spheres)

Usage: python scripts/render_roofline.py [n] [W] [H] [quality]
Defaults: 1M, 1920x1080, particle (the official bench recipe).
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
from mpm_tpu.render.background import render_background
from mpm_tpu.render.pipeline import frame_to_u8, render_frame_buckets


def _fence(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(slice(0, 1),) * leaf.ndim])


def timed(name, fn, *args, iters=10):
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
    print(f"  {name:42s} {best:8.2f} ms", flush=True)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    quality = sys.argv[4] if len(sys.argv) > 4 else "particle"
    rpx = 8 if quality == "particle" else 6

    scene = benchmark_scene(n)
    config, fluid = scene.config, scene.fluid
    state = jax.jit(lambda s: bucketed.from_simstate(s, config))(
        jax.device_put(scene.state))
    step = make_step(config, mode="pallas", substeps=10)
    for _ in range(15):
        state = step(state, fluid, ())
    np.asarray(state.lost)

    cam = Camera(width=w, height=h)
    view = jnp.asarray(default_view(config.grid_res)).astype(jnp.float32)
    print(f"# {n} particles, {w}x{h}, quality={quality}, r={rpx}, "
          f"device {jax.devices()[0]}", flush=True)

    def rc(**kw):
        ssfr = SSFRParams(**{k: v for k, v in kw.items()
                             if k in SSFRParams.__dataclass_fields__})
        other = {k: v for k, v in kw.items()
                 if k not in SSFRParams.__dataclass_fields__}
        return RenderConfig(camera=cam, ssfr=ssfr, quality=quality,
                            max_radius_px=rpx, **other)

    def renderer(rcfg):
        # cached static background like the production loop
        bg = jax.jit(lambda v: render_background(cam, v, rcfg.background))(view)
        bg = (np.asarray(bg[0]), np.asarray(bg[1]))
        bg = (jnp.asarray(bg[0]), jnp.asarray(bg[1]))
        return jax.jit(lambda s, v: frame_to_u8(
            render_frame_buckets(s, v, rc=rcfg, bg=bg)))

    # ---- variant ladder (drop passes from the back) ----
    t_full = timed("FULL (extract+zbuf+dilate+blur+shade)",
                   renderer(rc()), state, view)
    t_noshade = timed("depth_debug (minus shade+composite)",
                      renderer(rc(mode="depth_debug")), state, view)
    t_noblur = timed("depth_debug, blur off (minus blur)",
                     renderer(rc(mode="depth_debug",
                                 depth_blur_enabled=False)), state, view)
    t_nodil = timed("depth_debug, blur off, R=0 (minus dilate)",
                    renderer(RenderConfig(
                        camera=cam, quality=quality, max_radius_px=0,
                        ssfr=SSFRParams(depth_blur_enabled=False,
                                        debug_draw_depth=True))),
                    state, view)
    t_ds4 = timed("FULL, refraction_downsample=4",
                  renderer(rc(refraction_downsample=4)), state, view)
    t_thick = timed("FULL + thickness_pass",
                    renderer(rc(thickness_pass=True)), state, view)

    # ---- isolated gather probes (the refraction fetch's floor) ----
    rng = np.random.default_rng(0)
    sy = jnp.asarray(rng.integers(0, h, (h, w)), jnp.int32)
    sx = jnp.asarray(rng.integers(0, w, (h, w)), jnp.int32)
    # smooth, bounded offsets like the real refraction (locality matters
    # to a gather's cache behavior — random is the worst case)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    off = (np.sin(xs / 37.0) * np.cos(ys / 23.0) * 0.1)
    sy_s = jnp.asarray(np.clip(ys + off * h, 0, h - 1), jnp.int32)
    sx_s = jnp.asarray(np.clip(xs + off * w, 0, w - 1), jnp.int32)
    bgc = jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32)
    bgp = (jnp.clip(bgc * 1023.0, 0, 1023).astype(jnp.int32) @
           jnp.asarray([1 << 20, 1 << 10, 1], jnp.int32))  # [H, W] packed

    def g2d(c, y, x):
        return c[y, x]

    def gflat(c, y, x):
        return c.reshape(-1, 3)[y * w + x]

    def gpack(p, y, x):
        v = p.reshape(-1)[y * w + x]
        return jnp.stack([(v >> 20) & 1023, (v >> 10) & 1023, v & 1023],
                         axis=-1).astype(jnp.float32) * (1.0 / 1023.0)

    timed("gather 2D [H,W,3] f32 (production), rand",
          jax.jit(g2d), bgc, sy, sx)
    timed("gather 2D [H,W,3] f32, smooth offsets",
          jax.jit(g2d), bgc, sy_s, sx_s)
    timed("gather flat 1D f32 x3, smooth",
          jax.jit(gflat), bgc, sy_s, sx_s)
    timed("gather flat 1D packed int32, smooth",
          jax.jit(gpack), bgp, sy_s, sx_s)

    print("# attribution (differences):")
    print(f"  shade+composite      ~{t_full - t_noshade:6.2f} ms")
    print(f"  bilateral blur       ~{t_noshade - t_noblur:6.2f} ms")
    print(f"  sphere dilation      ~{t_noblur - t_nodil:6.2f} ms")
    print(f"  zbuffer+extract      ~{t_nodil:6.2f} ms (abs)")
    print(f"  refraction (vs ds4)  ~{t_full - t_ds4:6.2f} ms")
    print(f"  thickness pass       ~{t_thick - t_full:6.2f} ms")

    if "recipes" in sys.argv:
        recipes(state, view, cam, quality)


def recipes(state, view, cam, quality):
    """The 1080p recipe study (VERDICT r4 next #1): dilation radius x
    refraction downsample, each with a MACHINE-CHECKED error bound vs the
    exact recipe — coverage loss (pixels the smaller disc radius leaves
    uncovered) and final-frame PSNR (after the u8 tonemap, i.e. exactly
    what a viewer sees)."""
    from mpm_tpu.render.splat import BG_DEPTH

    h, w = cam.height, cam.width

    def rcfg(rpx, ds):
        return RenderConfig(
            camera=cam, quality=quality, max_radius_px=rpx,
            ssfr=SSFRParams(refraction_downsample=ds))

    bg0 = jax.jit(lambda v: render_background(
        cam, v, RenderConfig(camera=cam).background))(view)
    bg = (jnp.asarray(np.asarray(bg0[0])), jnp.asarray(np.asarray(bg0[1])))

    frames = {}
    times = {}
    for rpx in (8, 6):
        for ds in (1, 4):
            f = jax.jit(lambda s, v, _r=rpx, _d=ds: frame_to_u8(
                render_frame_buckets(s, v, rc=rcfg(_r, _d), bg=bg)))
            times[(rpx, ds)] = timed(f"frame R={rpx} ds={ds}", f, state, view)
            frames[(rpx, ds)] = np.asarray(f(state, view)).astype(np.float32)

    # coverage: does R=6 leave holes the R=8 discs covered?
    def depth_of(rpx):
        f = jax.jit(lambda s, v: render_frame_buckets(
            s, v, rc=RenderConfig(
                camera=cam, quality=quality, max_radius_px=rpx,
                ssfr=SSFRParams(debug_draw_depth=True,
                                depth_blur_enabled=False)), bg=bg))
        # depth_debug greyscale: BG pixels render 1.0 (depth > FAR_GUARD)
        return np.asarray(f(state, view))[..., 0]

    d8, d6 = depth_of(8), depth_of(6)
    holes = int(((d6 >= 1.0) & (d8 < 1.0)).sum())
    print(f"# coverage: R=6 uncovers {holes} px of R=8's "
          f"{int((d8 < 1.0).sum())} fluid px "
          f"({100.0 * holes / max(1, int((d8 < 1.0).sum())):.3f}%)")

    ref = frames[(8, 1)]
    for k, img in frames.items():
        if k == (8, 1):
            continue
        mse = float(np.mean((img - ref) ** 2))
        psnr = 10.0 * np.log10(255.0 ** 2 / max(mse, 1e-9))
        print(f"# recipe R={k[0]} ds={k[1]}: {times[k]:.2f} ms, "
              f"PSNR vs exact {psnr:.1f} dB, "
              f"max|delta| {np.abs(img - ref).max():.0f}/255")


if __name__ == "__main__":
    main()
