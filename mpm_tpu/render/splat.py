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


def _slot_rows(pos, vel, mass, view: jax.Array, cam: Camera) -> jax.Array:
    """Shared slot-splat row math: ([3, ...], [3, ...], [...]) bucket
    fields -> [5, M] (pixel x, pixel y, linear depth, |vel|, live) rows.
    Factored so the full and surface-band extractions are op-identical
    (the band frame == full frame tests rely on bitwise-equal candidates)."""
    from .extract_kernel import CELL_BG

    pos = pos.reshape(3, -1)
    vel = vel.reshape(3, -1).astype(jnp.float32)
    occ = mass.reshape(-1) > 0
    px, py, depth = view_to_screen(
        world_to_view(pos, view.astype(jnp.float32)), cam)
    vmag = jnp.sqrt(vel[0] ** 2 + vel[1] ** 2 + vel[2] ** 2)
    valid = occ & (depth > cam.near)
    return jnp.stack(
        [px, py, jnp.where(valid, depth, CELL_BG), vmag,
         valid.astype(jnp.float32)])


def extract_slot_splats(state, view: jax.Array, cam: Camera) -> jax.Array:
    """[5, K*C]: (pixel x, pixel y, linear depth, |vel|, live count) of
    EVERY live slot of a BucketState — the full-fidelity input to
    splat_cells (per-particle z-buffering, RenderConfig.quality="particle";
    count is 1 per live slot, matching the cell path's per-cell count).
    Pure elementwise XLA: unlike extract_kernel.extract_cell_splats there
    is no per-cell reduce, so no Pallas kernel is needed. Empty/
    behind-camera slots get depth CELL_BG (the splat_cells mask
    sentinel)."""
    return _slot_rows(state.pos, state.vel, state.mass, view, cam)


def _band_slices(grid_res, bands):
    """The six cell-space slices of the surface-band keep set, or None when
    the bands cover (nearly) the whole grid — each slice is
    (x slice, y slice, z slice) over the [nx, ny, nz] cell axes; the union
    is the 'shell' of the grid: bf bottom y-planes, bt top y-planes, and
    bs-thick x/z wall faces of the middle. Disjoint by construction (the
    z-buffer min would tolerate duplicates, but disjoint slices keep the
    row count minimal)."""
    nx, ny, nz = grid_res
    bt, bf, bs = bands
    if bf + bt >= ny or 2 * bs >= min(nx, nz):
        return None
    ymid = slice(bf, ny - bt)
    return [
        (slice(None), slice(0, bf), slice(None)),
        (slice(None), slice(ny - bt, ny), slice(None)),
        (slice(0, bs), ymid, slice(None)),
        (slice(nx - bs, nx), ymid, slice(None)),
        (slice(bs, nx - bs), ymid, slice(0, bs)),
        (slice(bs, nx - bs), ymid, slice(nz - bs, nz)),
    ]


def extract_band_slot_splats(state, view: jax.Array, cam: Camera,
                             grid_res, bands) -> jax.Array:
    """Surface-band slot extraction: [5, M] splat rows of every slot in the
    grid's SHELL — `bands` = (top, bottom, side) cell-plane thicknesses:
    the bottom/top y bands plus bs-thick x/z wall-face bands.

    Rationale (the render roofline's "fewer scatter rows" lever,
    ARCHITECTURE.md): a slot strictly interior to the fluid can never win
    the min-depth z-buffer — every ray reaching it crosses >= the band's
    thickness of closer particles first — and for band-shaped fluid
    (pools, the official bench scene) every fluid-air interface lies in
    the grid shell: the air-window engine already crops the y-extent to
    the occupied range, so the free surface sits in the top band, and the
    reference's wall clamps (g2p.glsl:115-119) pin the other five faces to
    the walls. The keep set is a union of static SLICES — no gathers, no
    compaction (both serial on this platform) — cutting the per-slot
    z-buffer's scatter rows ~2.5-3x at the 1M bench shape.

    `surface_band_uncovered` is the certificate: the count of live cells
    within `reach` cells of air that the bands do NOT cover (0 == every
    near-surface particle was kept; interior-only culling). Scenes with
    interior air pockets (e.g. a collider crater) fire the counter and
    should render with surface_bands=None."""
    sl = _band_slices(grid_res, bands)
    if sl is None:
        return extract_slot_splats(state, view, cam)
    nx, ny, nz = grid_res
    k = state.mass.shape[0]

    def shell(a, lead):
        a = a.reshape(*lead, k, nx, ny, nz)
        parts = [a[..., xs, ys, zs].reshape(*lead, k, -1)
                 for xs, ys, zs in sl]
        return jnp.concatenate(parts, axis=-1)

    return _slot_rows(shell(state.pos, (3,)), shell(state.vel, (3,)),
                      shell(state.mass, ()), view, cam)


def _surface_cells(state, grid_res, reach: int):
    """[nx, ny, nz] bool: live cells within `reach` cells of air
    (6-neighborhood, array edges count as air) — the set every band keep
    set must contain."""
    nx, ny, nz = grid_res
    live = (state.mass > 0).any(axis=0).reshape(nx, ny, nz)
    near = jnp.logical_not(live)  # air
    for _ in range(reach):
        p = jnp.pad(near, 1, constant_values=True)
        near = (near
                | p[:-2, 1:-1, 1:-1] | p[2:, 1:-1, 1:-1]
                | p[1:-1, :-2, 1:-1] | p[1:-1, 2:, 1:-1]
                | p[1:-1, 1:-1, :-2] | p[1:-1, 1:-1, 2:])
    return live & near


def surface_band_uncovered(state, grid_res, bands, reach: int = 2):
    """Certificate counter for extract_band_slot_splats: live cells within
    `reach` cells of air (6-neighborhood, array edges count as air) that
    the bands do not cover. 0 certifies the band render's keep set
    contains the entire fluid-air interface plus a reach-deep margin —
    i.e. only >= reach-deep interior slots were culled. Cheap elementwise
    pass over [nx, ny, nz] bools; run it OUTSIDE timed windows (it is a
    diagnostic, not a render pass)."""
    nx, ny, nz = grid_res
    surface = _surface_cells(state, grid_res, reach)
    bt, bf, bs = bands
    ix = jax.lax.broadcasted_iota(jnp.int32, (nx, ny, nz), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (nx, ny, nz), 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, (nx, ny, nz), 2)
    in_band = ((iy < bf) | (iy >= ny - bt)
               | (ix < bs) | (ix >= nx - bs)
               | (iz < bs) | (iz >= nz - bs))
    return jnp.sum((surface & jnp.logical_not(in_band)).astype(jnp.int32))


def surface_band_min_top(state, grid_res, bf: int, bs: int,
                         reach: int = 2) -> jax.Array:
    """Minimal top-band thickness bt (traced int32 scalar) such that
    surface_band_uncovered(state, grid_res, (bt, bf, bs), reach) == 0 given
    the bottom/side thicknesses — i.e. ny minus the lowest y of any surface
    cell the bottom/side bands don't already cover (0 when they cover
    everything). ONE jit + ONE scalar readback fits the band; a search over
    candidate bt values would recompile the counter per candidate (band
    thicknesses are trace-time constants on the render path)."""
    nx, ny, nz = grid_res
    surface = _surface_cells(state, grid_res, reach)
    ix = jax.lax.broadcasted_iota(jnp.int32, (nx, ny, nz), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (nx, ny, nz), 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, (nx, ny, nz), 2)
    mid = (surface & (iy >= bf)
           & (ix >= bs) & (ix < nx - bs)
           & (iz >= bs) & (iz < nz - bs))
    return ny - jnp.min(jnp.where(mid, iy, ny))


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
