"""Render pipeline orchestrator — the headless analogue of the reference's
CompositorEffect chain (SURVEY.md §3.3):

    fluid depth camera (splat)      -> SplatBuffers
    FluidTexturePass (RID publish)  -> plain function returns
    ScreenSpaceFluidRendering       -> render_frame(...)

Render modes mirror screen_space_fluid_rendering.gd:5-7: DEFAULT (full SSFR),
VELOCITY_SPHERES (depth-tested velocity-colored spheres), plus the
debug_draw_depth toggle and a NONE mode (main_ui visualisation selector,
SURVEY.md §2.3 A4).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .background import BackgroundScene, make_cubemap_sampler, render_background
from .camera import Camera, look_at
from .splat import splat_particles
from .ssfr import (
    SSFRParams,
    blur_depth,
    depth_debug_image,
    lit_spheres_shade,
    shade,
    velocity_spheres_composite,
)

RENDER_DEFAULT = "default"
RENDER_VELOCITY_SPHERES = "velocity_spheres"
RENDER_LIT_SPHERES = "lit_spheres"
RENDER_DEPTH_DEBUG = "depth_debug"
RENDER_NONE = "none"
# the rebuilt dormant R12/R13 chain (render/legacy.py): GPUParticles-style
# packed-depth impostor splat -> 16.16 unpack -> legacy non-adaptive blur
RENDER_LEGACY_QUAD = "legacy_quad"


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render configuration (hashable, jit-static)."""

    camera: Camera = Camera()
    ssfr: SSFRParams = SSFRParams()
    mode: str = RENDER_DEFAULT
    max_radius_px: int = 6
    sphere_render_ratio: float = 1.0
    background: BackgroundScene = BackgroundScene()
    # Bucket-path splat granularity: "cell" reduces each grid cell to its
    # nearest live particle before the z-buffer (the fast path; within-cell
    # occlusion approximated), "particle" z-buffers EVERY live slot — the
    # full-fidelity analogue of the reference's per-instance billboard
    # raster (multi_mesh/billboard_sphere.gdshader:13-88 resolves occlusion
    # per pixel across all instances). ~K x more scatter work.
    quality: str = "cell"
    # Static fluid crop (y0, x0, ch, cw) — camera.crop_for_aabb over the
    # simulation domain: the image-space SSFR passes (dilation O(R^2),
    # blur, shade + refraction gather) run on the crop only, and the shaded
    # crop composites back over the full background. Value-preserving by
    # construction (the domain bound + margin covers every fluid pixel);
    # the bench camera's 64^3 domain projects to 43% of the 1080p frame.
    # Static cameras only (the rect depends on the view); None = full frame.
    # Applied on the DEFAULT-mode bucket path (the production chain);
    # debug/velocity/lit modes ignore it.
    crop: tuple[int, int, int, int] | None = None
    # Surface-band slot extraction for quality="particle" (top, bottom,
    # side) cell-plane thicknesses, or None = every slot: only slots in
    # the grid SHELL feed the z-buffer — interior slots can never win the
    # depth min for band-shaped fluid (pools), and the keep set is pure
    # static slices (splat.extract_band_slot_splats; certificate counter
    # splat.surface_band_uncovered must read 0 for the run). ~2.5-3x fewer
    # scatter rows at the 1M bench shape.
    surface_bands: tuple[int, int, int] | None = None


def render_frame(
    pos: jax.Array,  # [N, 3]
    vel_mag: jax.Array,  # [N]
    view: jax.Array,  # [4, 4] world->view
    rc: RenderConfig,
    cubemap_faces: jax.Array | None = None,
) -> jax.Array:
    """Particles -> final [H, W, 3] frame, entirely on device."""
    cam = rc.camera
    bg_color, bg_depth = render_background(cam, view, rc.background)
    if rc.mode == RENDER_NONE:
        return bg_color

    bufs = splat_particles(
        pos,
        vel_mag,
        view,
        cam,
        sphere_radius=rc.ssfr.particle_sphere_radius,
        max_radius_px=rc.max_radius_px,
        sphere_render_ratio=rc.sphere_render_ratio,
        with_normals=rc.mode == RENDER_LIT_SPHERES,
    )

    if rc.mode == RENDER_LIT_SPHERES:
        # lit billboard-sphere debug view (billboard_sphere.gdshader)
        return lit_spheres_shade(
            bufs, bg_color, bg_depth, view[:3, :3], rc.ssfr, cam
        )

    if rc.mode == RENDER_VELOCITY_SPHERES:
        # velocity as red channel like the depth-map shader's albedo
        # (depth_map.gdshader:87: ALBEDO = vec3(velocity / 10, 0, 0))
        fluid_color = jnp.stack(
            [bufs.velocity / 10.0, jnp.zeros_like(bufs.velocity), jnp.zeros_like(bufs.velocity)],
            axis=-1,
        )
        return velocity_spheres_composite(bg_color, bg_depth, bufs.depth, fluid_color)

    depth = blur_depth(bufs.depth, rc.ssfr, cam)

    if rc.mode == RENDER_DEPTH_DEBUG or rc.ssfr.debug_draw_depth:
        return depth_debug_image(depth, rc.ssfr)

    sampler = make_cubemap_sampler(cubemap_faces)
    color, _live = shade(
        depth, bg_color, bg_depth, sampler, view[:3, :3], rc.ssfr, cam
    )
    return color


def make_renderer(rc: RenderConfig) -> Callable:
    """Jitted renderer: (pos, vel_mag, view) -> frame."""
    return jax.jit(partial(render_frame, rc=rc))


def render_frame_buckets(
    state,  # BucketState
    view: jax.Array,
    rc: RenderConfig,
    cubemap_faces: jax.Array | None = None,
    interpret: bool = False,
    bg: tuple[jax.Array, jax.Array] | None = None,
    num_particles: int | None = None,  # texture sizing for legacy_quad mode
    grid_res: tuple[int, ...] | None = None,  # cell-axis factorization of
    # the bucket arrays — required when rc.surface_bands is set (the band
    # slices need [nx, ny, nz]; pass config.grid_res)
) -> jax.Array:
    """Bucket-state fast path: the Pallas extraction kernel reduces each
    CELL to its nearest live particle before the z-buffer sort (K times
    smaller; see render/extract_kernel.py), replacing the XLA extract +
    per-slot argsort path. Same SSFR chain from the splat buffers on.

    `bg`: optional precomputed (bg_color, bg_depth) — the ray-traced
    background depends only on (camera, view), so frame loops with a static
    camera compute it ONCE (scripts/render_profile.py measured the per-frame
    background at ~20% of the frame) via `background_for_view`."""
    from .extract_kernel import extract_cell_splats
    from .splat import extract_slot_splats, splat_cells

    cam = rc.camera
    bg_color, bg_depth = (
        bg if bg is not None else render_background(cam, view, rc.background)
    )
    if rc.mode == RENDER_NONE:
        return bg_color

    if rc.mode == RENDER_LEGACY_QUAD:
        # the rebuilt dormant R12/R13 path, end-to-end (render/legacy.py):
        # id-ordered position texture -> packed-NDC-depth impostor splat ->
        # 16.16 unpack -> legacy non-adaptive bilateral blur -> /100 view
        from .legacy import legacy_quad_frame

        if num_particles is None:
            raise ValueError(
                "legacy_quad mode needs num_particles (the texture contract "
                "is sized floor(sqrt(n))+1, MLSMPM3DFluidMultithreadGPU."
                "cs:196-197)")
        return legacy_quad_frame(
            state, num_particles, view, cam, bg_color,
            sphere_radius=rc.ssfr.particle_sphere_radius,
            max_radius_px=rc.max_radius_px)

    tcells = None
    if rc.quality == "particle":
        if rc.surface_bands is not None:
            from .splat import extract_band_slot_splats

            if grid_res is None:
                raise ValueError(
                    "rc.surface_bands needs grid_res (the band slices "
                    "factor the cell axis as [nx, ny, nz]; pass "
                    "config.grid_res)")
            cells = extract_band_slot_splats(state, view, cam, grid_res,
                                             rc.surface_bands)
        else:
            cells = extract_slot_splats(state, view, cam)
        if rc.ssfr.thickness_pass and rc.mode == RENDER_DEFAULT:
            # the thickness deposit is ADDITIVE and blurred, so it rides
            # count-weighted CELL-granularity splats (K× fewer scatter
            # rows; exact per-particle material either way) — the per-SLOT
            # scatter measured +13.4 ms/frame at 1080p
            # (scripts/render_roofline.py, round 5)
            tcells = extract_cell_splats(state, view, cam,
                                         interpret=interpret)
    else:
        cells = extract_cell_splats(state, view, cam, interpret=interpret)
    return render_frame_cells(cells, view, rc, cubemap_faces=cubemap_faces,
                              bg=(bg_color, bg_depth),
                              thickness_cells=tcells)


def _needs_velocity(rc: RenderConfig) -> bool:
    # the DEFAULT/depth chains are depth-only: skip the velocity-key
    # scatter-min and the velocity dilation tracking (~1 ms at 640x360)
    return rc.mode in (RENDER_VELOCITY_SPHERES, RENDER_LIT_SPHERES)


def _active_crop(rc: RenderConfig):
    """The fluid crop applies to the production DEFAULT chain only — the
    debug/velocity/lit modes composite full-frame buffers directly."""
    if rc.mode != RENDER_DEFAULT or rc.ssfr.debug_draw_depth:
        return None
    return rc.crop


def _frame_from_bufs(bufs, view, rc: RenderConfig, bg_color, bg_depth,
                     cubemap_faces=None, thickness_deposits=None,
                     crop=None) -> jax.Array:
    """The mode chain from SplatBuffers on (shared by the cell, zbuffer,
    and distributed-composite entry points). `thickness_deposits`: raw
    additive thickness buffer (splat.thickness_deposit) when the thickness
    pass is on; None shades with the reference's constant uniform. `crop`:
    the static fluid crop the buffers were built with (_active_crop(rc)) —
    blur/shade run crop-sized and the shaded crop composites back over the
    full background."""
    from .ssfr import thickness_map

    cam = rc.camera
    if rc.mode == RENDER_LIT_SPHERES:
        return lit_spheres_shade(
            bufs, bg_color, bg_depth, view[:3, :3], rc.ssfr, cam
        )

    if rc.mode == RENDER_VELOCITY_SPHERES:
        fluid_color = jnp.stack(
            [bufs.velocity / 10.0, jnp.zeros_like(bufs.velocity),
             jnp.zeros_like(bufs.velocity)],
            axis=-1,
        )
        return velocity_spheres_composite(
            bg_color, bg_depth, bufs.depth, fluid_color
        )

    depth = blur_depth(bufs.depth, rc.ssfr, cam)
    if rc.mode == RENDER_DEPTH_DEBUG or rc.ssfr.debug_draw_depth:
        return depth_debug_image(depth, rc.ssfr)
    sampler = make_cubemap_sampler(cubemap_faces)
    tmap = (thickness_map(thickness_deposits, rc.ssfr)
            if thickness_deposits is not None else None)
    color, _live = shade(
        depth, bg_color, bg_depth, sampler, view[:3, :3], rc.ssfr, cam,
        thickness=tmap, crop=crop,
    )
    if crop is not None:
        # outside the crop the DEFAULT chain is background by construction
        # (no fluid there — camera.crop_for_aabb is conservative)
        color = jax.lax.dynamic_update_slice(
            bg_color, color, (crop[0], crop[1], 0))
    return color


def render_frame_cells(
    cells: jax.Array,  # [5, M] (px, py, depth, |vel|, count) splat points
    view: jax.Array,
    rc: RenderConfig,
    cubemap_faces: jax.Array | None = None,
    bg: tuple[jax.Array, jax.Array] | None = None,
    thickness_cells: jax.Array | None = None,  # cheaper cell-granularity
    # splats for the additive thickness deposit (defaults to `cells`)
) -> jax.Array:
    """The SSFR chain from extracted splat points on: used by
    render_frame_buckets and by frame loops that receive the splats straight
    from the simulation step (ops/pallas/fused.substep_fused_emit — the
    reference's in-g2p render-texture write, g2p.glsl:149-150)."""
    from .splat import splat_cells

    cam = rc.camera
    bg_color, bg_depth = (
        bg if bg is not None else render_background(cam, view, rc.background)
    )
    crop = _active_crop(rc)
    bufs = splat_cells(
        cells,
        cam,
        sphere_radius=rc.ssfr.particle_sphere_radius,
        max_radius_px=rc.max_radius_px,
        with_normals=rc.mode == RENDER_LIT_SPHERES,
        with_velocity=_needs_velocity(rc),
        crop=crop,
    )
    tdep = None
    if rc.ssfr.thickness_pass and rc.mode == RENDER_DEFAULT:
        from .splat import thickness_deposit

        tdep = thickness_deposit(
            cells if thickness_cells is None else thickness_cells,
            cam, sphere_radius=rc.ssfr.particle_sphere_radius, crop=crop)
    return _frame_from_bufs(bufs, view, rc, bg_color, bg_depth,
                            cubemap_faces=cubemap_faces,
                            thickness_deposits=tdep, crop=crop)


def render_frame_from_zbuffer(
    d: jax.Array,  # [H, W] raw z-buffer depth (pre-dilation)
    key,  # [H, W] int32 velocity key or None
    view: jax.Array,
    rc: RenderConfig,
    cubemap_faces: jax.Array | None = None,
    bg: tuple[jax.Array, jax.Array] | None = None,
    thickness_deposits: jax.Array | None = None,  # [H, W] raw additive
    # thickness buffer (psum-composited across the mesh on the distributed
    # path); None = constant-thickness shading
) -> jax.Array:
    """The SSFR chain from a (possibly mesh-composited) raw z-buffer on —
    the distributed render path (parallel/render.py) pmin-composites the
    per-shard z-buffers and finishes the frame here. When rc.crop is
    active, `d`/`key`/`thickness_deposits` must already be crop-sized (the
    producer passed the same _active_crop(rc) to zbuffer_cells)."""
    from .splat import buffers_from_zbuffer

    cam = rc.camera
    bg_color, bg_depth = (
        bg if bg is not None else render_background(cam, view, rc.background)
    )
    if rc.mode == RENDER_NONE:
        return bg_color
    bufs = buffers_from_zbuffer(
        d, key, cam,
        sphere_radius=rc.ssfr.particle_sphere_radius,
        max_radius_px=rc.max_radius_px,
        with_normals=rc.mode == RENDER_LIT_SPHERES,
        with_velocity=_needs_velocity(rc),
    )
    return _frame_from_bufs(bufs, view, rc, bg_color, bg_depth,
                            cubemap_faces=cubemap_faces,
                            thickness_deposits=thickness_deposits,
                            crop=_active_crop(rc))


def emitting_frame_fn(config, cam: Camera, substeps: int,
                      interpret: bool = False):
    """UNjitted (state, fluid, interactions, view) -> (state, cells): runs
    substeps-1 plain substeps then a final substep whose kernel F emits the
    per-cell splats in place (ops/pallas/fused.substep_fused_emit), saving
    the render-time re-read of the whole particle state (~1.9 ms/frame at
    1M, scripts/render_attrib.py). Requires the fused 3D path."""
    from ..ops.pallas import fused as _fused

    def fn(state, fp, inter, view):
        for _ in range(substeps - 1):  # unrolled: substeps/frame is 2-5
            state = _fused.substep_fused(state, config, fp, inter,
                                         interpret=interpret)
        rs = _fused.render_scals_for(view, cam)
        return _fused.substep_fused_emit(state, config, fp, inter, rs,
                                         interpret=interpret)

    return fn


def make_emitting_frame_step(config, cam: Camera, substeps: int,
                             donate: bool = True, interpret: bool = False):
    """Jitted emitting_frame_fn."""
    return jax.jit(emitting_frame_fn(config, cam, substeps, interpret),
                   donate_argnums=(0,) if donate else ())


def make_full_frame_step(config, rc: RenderConfig, substeps: int,
                         donate: bool = True, interpret: bool = False,
                         cubemap_faces=None):
    """ONE jit per rendered frame: the substeps (kernel-F splat emission on
    the last, g2p.glsl:149-150 parity) + the SSFR chain + the u8 tonemap in
    a single computation — (state, fluid, interactions, view, bg) ->
    (state, u8 frame). One host dispatch per frame: a separate renderer jit
    call costs ~7 ms through the tunnel (ARCHITECTURE.md
    "Platform gotchas").

    quality="particle" z-buffers slot-granularity splats extracted from the
    post-step state inside the same jit (with rc.surface_bands, only the
    grid shell's slots — splat.extract_band_slot_splats); the kernel-F
    cell splats still serve the additive thickness pass. (Until round 5
    this path silently rendered the CELL splats whatever rc.quality said —
    tests/test_band_extract.py pins the fix against render_frame_buckets.)"""
    step = emitting_frame_fn(config, rc.camera, substeps, interpret)

    def fn(state, fp, inter, view, bg):
        state, cells = step(state, fp, inter, view)
        # bg=None -> the ray-traced background is recomputed per frame
        # (moving-camera loops); static-camera loops pass the cached pair
        if rc.quality == "particle":
            from .splat import extract_band_slot_splats, extract_slot_splats

            slots = (
                extract_band_slot_splats(state, view, rc.camera,
                                         config.grid_res, rc.surface_bands)
                if rc.surface_bands is not None
                else extract_slot_splats(state, view, rc.camera))
            img = render_frame_cells(slots, view, rc,
                                     cubemap_faces=cubemap_faces, bg=bg,
                                     thickness_cells=cells)
        else:
            img = render_frame_cells(cells, view, rc,
                                     cubemap_faces=cubemap_faces, bg=bg)
        return state, frame_to_u8(img)

    if donate:
        return jax.jit(fn, donate_argnums=(0,), static_argnums=())
    return jax.jit(fn)


def make_bucket_renderer(rc: RenderConfig, interpret: bool = False) -> Callable:
    """Jitted bucket-state renderer: (bucket_state, view) -> frame."""
    return jax.jit(
        partial(render_frame_buckets, rc=rc, interpret=interpret)
    )


def domain_crop(rc: RenderConfig, config, view) -> RenderConfig:
    """RenderConfig with the static fluid crop for `config`'s simulation
    domain under a STATIC `view` (camera.crop_for_aabb): physics clamps
    positions to SimConfig.dres, so the domain AABB + dilation margin
    conservatively bounds every fluid pixel for any dynamics. Returns rc
    unchanged when cropping buys nothing (the projection covers the frame,
    the camera is inside the box, or a non-DEFAULT mode)."""
    import dataclasses as _dc

    from .camera import crop_for_aabb

    if rc.mode != RENDER_DEFAULT:
        return rc
    crop = crop_for_aabb(
        rc.camera, np.asarray(view), (0.0,) * len(config.dres), config.dres,
        margin=rc.max_radius_px + 8)
    return rc if crop is None else _dc.replace(rc, crop=crop)


def background_for_view(rc: RenderConfig, view: jax.Array):
    """Precompute the static-camera background once for a frame loop."""
    return jax.jit(
        lambda v: render_background(rc.camera, v, rc.background)
    )(view)


def frame_to_u8(img: jax.Array) -> jax.Array:
    """Device-side tonemap to uint8 (same gamma-2.2 transfer as
    image.to_uint8 / the native encoder's tonemap). Frame loops convert ON
    DEVICE and transfer u8: the axon tunnel moves ~35 MB/s, so a 960x540
    f32 frame is ~180 ms of pure transfer per frame — 4x that of u8 (the
    round-3 CLI frame-time fix; the f32 transfer dominated every frame)."""
    g = jnp.clip(img, 0.0, 1.0) ** np.float32(1.0 / 2.2)
    return (g * 255.0 + 0.5).astype(jnp.uint8)


def default_view(config_grid_res=(64, 64, 64)) -> jax.Array:
    """A pleasant default camera: looking at the domain center from an
    elevated diagonal, like the reference's main camera start pose.
    3D only — 2D scenes render through render2d.render_2d (no camera)."""
    if len(config_grid_res) != 3:
        raise ValueError(
            f"default_view needs a 3D grid, got {config_grid_res}; "
            "2D scenes use mpm_tpu.render.render2d.render_2d"
        )
    c = [r / 2.0 for r in config_grid_res]
    eye = (c[0] + 55.0, c[1] + 28.0, c[2] + 55.0)
    return jnp.asarray(look_at(eye, (c[0], c[1] - 8.0, c[2])))
