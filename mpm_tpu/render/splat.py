"""Particle splatting: billboard sphere impostors, TPU-style.

The reference renders each particle as a camera-facing quad whose fragment
shader discards outside the unit circle and writes analytic sphere depth
proj(VERTEX + n_z * r) plus velocity magnitude as color
(rendering/shaders/multi_mesh/depth_map.gdshader:63-87). Headless, rasterizing
157k quads is a scatter problem; the TPU-native formulation is scatter-free:

1. project particles to (pixel, linear depth);
2. sort by (depth, then stable by pixel id) — the nearest particle of every
   pixel becomes the *first element of its pixel segment*;
3. gather per-pixel nearest depth/velocity with `searchsorted` — a pure
   gather "z-buffer";
4. expand points to sphere discs in image space: a bounded morphological
   min over the stamp neighborhood, adding the analytic sphere depth
   correction  d(dx,dy) = z - r * sqrt(1 - s^2),  s = pixel offset / disc
   radius — dense shifted-window ops, the same pattern as the sim's P2G.

`sphere_render_ratio` reproduces the reference's LOD slider that drops a
fraction of instances (depth_map.gdshader:23-26).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .camera import Camera, view_to_screen, world_to_view

BG_DEPTH = 4000.0  # "no fluid here" sentinel, past the blur guard 3990


class SplatBuffers(NamedTuple):
    depth: jax.Array  # [H, W] linear view depth (BG_DEPTH where empty)
    velocity: jax.Array  # [H, W] |vel| of nearest particle (0 where empty)
    # sphere-local impostor offsets of the covering sphere (lit_spheres
    # mode only; None otherwise): normal = (sx, -sy, sqrt(1-sx^2-sy^2))
    sx: jax.Array | None = None
    sy: jax.Array | None = None


def extract_slot_splats(state, view: jax.Array, cam: Camera) -> jax.Array:
    """[5, K*C]: (pixel x, pixel y, linear depth, |vel|, live count) of
    EVERY live slot of a BucketState — the full-fidelity input to
    splat_cells (per-particle z-buffering, RenderConfig.quality="particle";
    count is 1 per live slot, matching the cell path's per-cell count).
    Pure elementwise XLA: unlike extract_kernel.extract_cell_splats there
    is no per-cell reduce, so no Pallas kernel is needed. Empty/
    behind-camera slots get depth CELL_BG (the splat_cells mask
    sentinel)."""
    from .extract_kernel import CELL_BG

    pos = state.pos.reshape(3, -1)
    vel = state.vel.reshape(3, -1).astype(jnp.float32)
    occ = state.mass.reshape(-1) > 0
    px, py, depth = view_to_screen(
        world_to_view(pos, view.astype(jnp.float32)), cam)
    vmag = jnp.sqrt(vel[0] ** 2 + vel[1] ** 2 + vel[2] ** 2)
    valid = occ & (depth > cam.near)
    return jnp.stack(
        [px, py, jnp.where(valid, depth, CELL_BG), vmag,
         valid.astype(jnp.float32)])


def _point_deposit(
    px: jax.Array,
    py: jax.Array,
    depth: jax.Array,
    velocity: jax.Array,
    cam: Camera,
    keep: jax.Array,
) -> SplatBuffers:
    """Nearest-particle depth/velocity per center pixel, scatter-free."""
    h, w = cam.height, cam.width
    ix = jnp.floor(px).astype(jnp.int32)
    iy = jnp.floor(py).astype(jnp.int32)
    on_screen = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h) & keep
    pix = jnp.where(on_screen, iy * w + ix, h * w)  # offscreen -> guard id

    # sort by depth, then stable-sort by pixel: first element of each pixel
    # segment is the nearest particle
    order_d = jnp.argsort(depth)
    pix_d = pix[order_d]
    order_p = jnp.argsort(pix_d, stable=True)
    order = order_d[order_p]
    pix_s = pix[order]

    seg_start = jnp.searchsorted(pix_s, jnp.arange(h * w, dtype=pix_s.dtype))
    seg_end = jnp.searchsorted(pix_s, jnp.arange(1, h * w + 1, dtype=pix_s.dtype))
    occupied = seg_end > seg_start

    depth_s = depth[order]
    vel_s = velocity[order]
    idx = jnp.clip(seg_start, 0, depth_s.shape[0] - 1)
    d = jnp.where(occupied, depth_s[idx], BG_DEPTH).reshape(h, w)
    v = jnp.where(occupied, vel_s[idx], 0.0).reshape(h, w)
    return SplatBuffers(depth=d, velocity=v)


def _dilate_spheres(
    bufs: SplatBuffers,
    cam: Camera,
    sphere_radius: float,
    max_radius_px: int,
    with_normals: bool = False,
    with_velocity: bool = True,
) -> SplatBuffers:
    """Expand point deposits into sphere impostor discs with analytic depth
    (depth_map.gdshader:63-84), via bounded shifted-window mins. With
    `with_normals`, the covering sphere's local offsets (sx, sy) are
    tracked per pixel for the lit-sphere debug view
    (billboard_sphere.gdshader:46-66). Shape comes from the buffers, not
    the camera: a static fluid crop (camera.crop_for_aabb) dilates a
    sub-rectangle — O(R^2) image-space work scales with its area."""
    h, w = bufs.depth.shape
    f = cam.focal_px
    pad = max(max_radius_px, 1)
    d0 = jnp.pad(bufs.depth, pad, constant_values=BG_DEPTH)
    v0 = jnp.pad(bufs.velocity, pad)
    # Factored tap math (round 5, scripts/render_roofline.py): the
    # per-tap candidate  src_d - r*sqrt(1 - s^2)  with
    # s^2 = c / r_px^2, r_px = min(f*r/z, R), c = dx^2 + dy^2 rewrites to
    #     cand = src_d - sqrt(max(r^2 - c * Q, 0)),
    #     Q = max((z/f)^2, (r/R)^2)        [one image, hoisted]
    # which is the SAME math with one per-source image instead of per-tap
    # radius/inv_r/s2 work — and the separate occupancy check vanishes: an
    # empty source has z = BG_DEPTH -> Q huge -> t < 0 -> no candidate,
    # the same branch that masks out-of-disc taps. ~10 -> ~7 vector ops
    # per tap (288 taps at R=8/1080p).
    r2 = sphere_radius * sphere_radius
    q_clamp = r2 / float(max_radius_px * max_radius_px) if max_radius_px else 1.0
    q = jnp.maximum((bufs.depth / f) ** 2, q_clamp)
    # explicit inf for empty sources: (BG_DEPTH/f)^2 alone only masks while
    # BG_DEPTH > r*f — not guaranteed for long-focal cameras
    q = jnp.where(bufs.depth < BG_DEPTH, q, jnp.inf)
    q0 = jnp.pad(q, pad, constant_values=jnp.inf)

    # center pixels: their own sphere pole (normal straight at the camera)
    center = bufs.depth < BG_DEPTH
    best_d = jnp.where(center, bufs.depth - sphere_radius, bufs.depth)
    best_v = bufs.velocity
    zeros = jnp.zeros_like(bufs.depth)
    best_sx, best_sy = zeros, zeros
    if with_normals:
        # sphere-local offset scale: s = sqrt(c) * sqrt(Q) / r per source
        sq0 = jnp.sqrt(q0) * (1.0 / sphere_radius)
    for dy in range(-max_radius_px, max_radius_px + 1):
        for dx in range(-max_radius_px, max_radius_px + 1):
            if dx == 0 and dy == 0:
                continue
            c = float(dx * dx + dy * dy)
            src_d = jax.lax.dynamic_slice(d0, (pad - dy, pad - dx), (h, w))
            src_q = jax.lax.dynamic_slice(q0, (pad - dy, pad - dx), (h, w))
            t = r2 - c * src_q
            # t < 0: the tap is outside the source's disc — no candidate
            # (an uncorrected src_d must NOT win: discs, not squares)
            cand = jnp.where(t >= 0.0,
                             src_d - jnp.sqrt(jnp.maximum(t, 0.0)),
                             BG_DEPTH)
            take = cand < best_d
            best_d = jnp.where(take, cand, best_d)
            if with_velocity:
                src_v = jax.lax.dynamic_slice(
                    v0, (pad - dy, pad - dx), (h, w))
                best_v = jnp.where(take, src_v, best_v)
            if with_normals:
                src_sq = jax.lax.dynamic_slice(
                    sq0, (pad - dy, pad - dx), (h, w))
                best_sx = jnp.where(take, dx * src_sq, best_sx)
                best_sy = jnp.where(take, dy * src_sq, best_sy)
    if not with_normals:
        return SplatBuffers(depth=best_d, velocity=best_v)
    return SplatBuffers(depth=best_d, velocity=best_v, sx=best_sx, sy=best_sy)


def zbuffer_cells(
    cells: jax.Array,  # [>=4, M] rows (px, py, depth, |vel|[, count...])
    cam: Camera,
    with_velocity: bool = True,
    crop=None,  # (y0, x0, ch, cw) static fluid crop (camera.crop_for_aabb)
):
    """The pre-dilation z-buffer: scatter-min depth [H, W] (BG_DEPTH where
    empty) and, with velocity, the packed attribution key [H, W] int32.
    With `crop`, buffers are the crop rectangle ([ch, cw]); splats outside
    it are dropped, so the crop MUST be conservative — crop_for_aabb over
    the simulation domain guarantees every splat center lands inside.

    Exposed separately from splat_cells because BOTH are pure mins — the
    distributed render composite (parallel/render.py) runs this per shard
    on the shard's own cells, then `pmin`s the buffers across the mesh:
    min over disjoint cell subsets == the global min, bit-exactly, so the
    sharded composite needs no merge protocol (the same property that makes
    the sim's overflow rejection merge-free). Dilation + SSFR then run once
    on the composited buffers."""
    from .extract_kernel import CELL_BG

    y0, x0, h, w = (crop if crop is not None
                    else (0, 0, cam.height, cam.width))
    px, py, depth, vel = cells[0], cells[1], cells[2], cells[3]
    ix = jnp.floor(px).astype(jnp.int32) - x0
    iy = jnp.floor(py).astype(jnp.int32) - y0
    on = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h) & (depth < CELL_BG)
    pix = jnp.where(on, iy * w + ix, h * w)  # offscreen -> guard slot

    d_img = (
        jnp.full((h * w + 1,), BG_DEPTH, depth.dtype)
        .at[pix]
        .min(jnp.where(on, depth, BG_DEPTH))
    )
    d = d_img[: h * w].reshape(h, w)
    if not with_velocity:
        return d, None
    # positive-float bit patterns sort like their values: the top 20
    # bits of the depth dominate the key, the low 12 carry quantized
    # velocity. The DEFAULT SSFR chain never reads the velocity buffer
    # (blur/shade are depth-only), so this second scatter-min only runs
    # for the velocity_spheres / lit_spheres modes (~1 ms at 640x360,
    # scripts/render_attrib.py).
    dbits = jax.lax.bitcast_convert_type(
        jnp.maximum(depth, 1e-6), jnp.int32
    ) & ~jnp.int32(0xFFF)
    qvel = jnp.clip(vel * 64.0, 0.0, 4095.0).astype(jnp.int32)
    key = jnp.where(on, dbits | qvel, jnp.int32(0x7F7FFFFF))
    k_img = (
        jnp.full((h * w + 1,), jnp.int32(0x7F7FFFFF)).at[pix].min(key)
    )
    return d, k_img[: h * w].reshape(h, w)


def buffers_from_zbuffer(
    d: jax.Array,  # [H, W] raw z-buffer depth (BG_DEPTH empties)
    key,  # [H, W] int32 packed velocity key, or None
    cam: Camera,
    sphere_radius: float = 1.0,
    max_radius_px: int = 6,
    with_normals: bool = False,
    with_velocity: bool = True,
) -> SplatBuffers:
    """Decode the velocity key and run the sphere-impostor dilation —
    the second half of splat_cells, shared with the distributed composite."""
    occ = d < BG_DEPTH
    if with_velocity and key is not None:
        v = jnp.where(
            occ, (key & 0xFFF).astype(d.dtype) / 64.0, 0.0
        )
    else:
        v = jnp.zeros_like(d)
    bufs = SplatBuffers(depth=jnp.where(occ, d, BG_DEPTH), velocity=v)
    return _dilate_spheres(bufs, cam, sphere_radius, max_radius_px,
                           with_normals=with_normals,
                           with_velocity=with_velocity)


def splat_cells(
    cells: jax.Array,  # [5, C] from extract_kernel.extract_cell_splats
    cam: Camera,
    sphere_radius: float = 1.0,
    max_radius_px: int = 6,
    with_normals: bool = False,
    with_velocity: bool = True,
    crop=None,  # (y0, x0, ch, cw) static fluid crop (camera.crop_for_aabb)
) -> SplatBuffers:
    """z-buffer + sphere dilation over per-CELL splat points (the fast path
    for bucket-state renders; see extract_kernel.py).

    The z-buffer is two scatter-mins instead of the particle path's two
    argsorts + per-element gathers: (1) exact f32 depth; (2) a packed key
    (high float-depth bits | 12-bit quantized velocity) whose winner
    attributes the velocity color — velocity attribution may differ from
    the exact depth winner within ~2^-11 relative depth, which is
    invisible in the velocity coloring (depth_map.gdshader:87 divides by
    10 for display)."""
    d, key = zbuffer_cells(cells, cam, with_velocity=with_velocity,
                           crop=crop)
    return buffers_from_zbuffer(d, key, cam, sphere_radius, max_radius_px,
                                with_normals=with_normals,
                                with_velocity=with_velocity)


def thickness_deposit(
    cells: jax.Array,  # [5, M] (px, py, depth, |vel|, count) splat points
    cam: Camera,
    sphere_radius: float = 1.0,
    crop=None,  # (y0, x0, ch, cw) static fluid crop (camera.crop_for_aabb)
) -> jax.Array:
    """ADDITIVE thickness splat [H, W]: every live particle deposits its
    material thickness (2r, the chord through a sphere's center) at its
    cell's center pixel — cells carry their live COUNT (row 4, emitted
    in-kernel by the fused step / the extraction kernel), so the scatter
    is over CELLS (~230k at 1M) while the deposited material is exact
    per-particle (count * 2r); occluded particles deposit too, so a
    pixel's total is the material column behind it in world units. A small
    normalized blur (ssfr.gaussian_blur) then spreads each deposit over
    its disc footprint. (Round 5: the count row replaced a 1M-element
    per-slot scatter-add measured at +13.5 ms/frame at 1080p —
    scripts/render_roofline.py; VERDICT r4 next #4.)

    Units (round 5): the deposit is weighted by the projected cell
    footprint — weight = count * 2r * (f/z)^2, the cell's material column
    times the pixel area its 1-world-unit footprint covers — so after the
    area-preserving blur spreads each point deposit over its local
    neighborhood, the per-pixel value approximates the WORLD-UNITS
    material column along the ray, independent of image resolution and
    zoom (the round-4 unweighted deposit read 9x brighter at 640x360 than
    at 1080p). tests/test_thickness.py pins it against an analytic
    lattice column.

    This is the SSFR-canonical thickness pass the reference SKIPPED
    ("Step 2: get fluid depth (didn't have time for that)",
    screen_space_fluid_rendering.gd:429) — it shades with a constant
    `thickness` uniform instead (fluid_render_fixed_depth.glsl:142-146).
    Default SSFRParams keep the constant (reference-exact);
    thickness_pass=True feeds this buffer into Beer's law + the refraction
    offset. Addition commutes, so the distributed composite is a `psum`
    of per-shard deposits (parallel/render.py), mirroring the depth pmin."""
    from .extract_kernel import CELL_BG

    y0, x0, h, w = (crop if crop is not None
                    else (0, 0, cam.height, cam.width))
    px, py, depth, count = cells[0], cells[1], cells[2], cells[4]
    ix = jnp.floor(px).astype(jnp.int32) - x0
    iy = jnp.floor(py).astype(jnp.int32) - y0
    on = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h) & (depth < CELL_BG)
    pix = jnp.where(on, iy * w + ix, h * w)  # offscreen -> guard slot
    fz = cam.focal_px / jnp.maximum(depth, 1e-3)
    area_px = fz * fz  # projected 1-world-unit cell footprint, in pixels^2
    t_img = (
        jnp.zeros((h * w + 1,), jnp.float32)
        .at[pix]
        .add(jnp.where(on, 2.0 * sphere_radius * count * area_px, 0.0))
    )
    return t_img[: h * w].reshape(h, w)


def splat_particles(
    pos: jax.Array,  # [3, N] world positions (lane-major)
    vel_mag: jax.Array,  # [N] velocity magnitudes
    view: jax.Array,  # [4, 4] world->view
    cam: Camera,
    sphere_radius: float = 1.0,
    max_radius_px: int = 6,
    sphere_render_ratio: float = 1.0,
    with_normals: bool = False,
) -> SplatBuffers:
    """Full splat pass: the headless equivalent of the fluid depth camera's
    MultiMesh draw (SURVEY.md §3.3)."""
    vp = world_to_view(pos, view)
    px, py, depth = view_to_screen(vp, cam)
    keep = depth > cam.near
    if sphere_render_ratio < 1.0:
        # LOD drop, reference semantics: instance kept when
        # (id % 100) + 1 <= ratio * 100 (depth_map.gdshader:23-26)
        n = pos.shape[-1]
        idx = jnp.arange(n)
        keep = keep & ((idx % 100) + 1 <= sphere_render_ratio * 100.0)
    bufs = _point_deposit(px, py, depth, vel_mag, cam, keep)
    return _dilate_spheres(bufs, cam, sphere_radius, max_radius_px,
                           with_normals=with_normals)
