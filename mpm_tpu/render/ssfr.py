"""Screen-Space Fluid Rendering passes (van der Laan et al., GDC 2010).

Headless JAX reimplementation of the reference's compute chain
(rendering/compositor_effects/screen_space_fluid_rendering.gd:302-539):

    linearize depth -> bilateral blur X -> bilateral blur Y
    -> shade (normals from depth, Blinn specular, Schlick Fresnel,
       cubemap reflection, refraction offset, Beer's-law transmittance)
    -> composite over the background render

Our splat buffers are already linear view depth, so the linearize pass is an
identity here (the NDC<->linear utilities live in camera.py for parity).
All passes are dense image ops — XLA fuses them; the data-dependent blur
radius becomes a fixed max-radius loop with per-pixel weight masking
(SURVEY.md §7 hard part 4).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .camera import Camera, screen_to_view_dir, view_pos_from_depth
from .splat import BG_DEPTH

FAR_GUARD = 3990.0  # reference far-plane guard (bilateral_blur_directional.glsl:43)
IOR = 1.333
ETA = 1.0 / IOR
F0 = 0.02  # Fresnel at 0 degrees (fluid_render_fixed_depth.glsl:14)


@dataclasses.dataclass(frozen=True)
class SSFRParams:
    """Exported tunables of the SSFR effect
    (screen_space_fluid_rendering.gd:5-30), reference defaults."""

    particle_sphere_radius: float = 1.0
    depth_blur_enabled: bool = True
    blur_depth_scale: float = 10.0
    max_filter_size: int = 100
    blur_filter_size: float = 7.0
    diffuse_color: tuple[float, float, float] = (0.085, 0.6375, 0.765)
    thickness: float = 1.0  # "minimum_thickness"; constant — the reference
    # never rendered a thickness pass ("didn't have time for that",
    # screen_space_fluid_rendering.gd:429)
    optical_density: float = 2.0
    refraction_strength: float = 0.1
    specular_power: float = 250.0
    fresnel_clamp: float = 1.0
    light_dir: tuple[float, float, float] = (0.0, -1.0, 0.0)  # world, toward scene
    # debug render (screen_space_fluid_rendering.gd:27-29)
    debug_draw_depth: bool = False
    depth_divisor: float = 100.0
    # practical cap for the XLA masked blur loop (fallback path); the Pallas
    # blur kernel (render/blur_kernel.py) runs the full max_filter_size=100
    # on TPU — reference parity for near-camera fluid
    blur_tap_radius: int = 12
    use_pallas_blur: bool = True
    # Real thickness pass (round 4): the SSFR-canonical additive thickness
    # splat the reference skipped ("didn't have time for that",
    # screen_space_fluid_rendering.gd:429 — it shades with the constant
    # `thickness` uniform, fluid_render_fixed_depth.glsl:142-146). False
    # (default) = the reference's constant, exact parity. True = per-pixel
    # material thickness (splat.thickness_deposit, blurred) feeds Beer's
    # law and the refraction offset; `thickness` then acts as the minimum.
    thickness_pass: bool = False
    thickness_scale: float = 0.05  # world thickness units -> the scale the
    # reference's tunables (optical_density, refraction_strength) were
    # balanced for at thickness=1; the deposit is now RESOLUTION-
    # INDEPENDENT world column length (splat.thickness_deposit normalizes
    # by the projected cell footprint; round 5), and a typical pool column
    # is 10-40 world units — 0.05 maps it into the ~0.5-2 range the
    # reference's Beer's-law constants expect
    thickness_blur_radius: int = 6  # normalized Gaussian antialias of the
    # deposits (spreads each point deposit over its disc footprint)
    # Refraction-sample stride. The refracted-background fetch
    # (fluid_render_fixed_depth.glsl:142-144) is a per-pixel dependent
    # gather — the one texture-fetch-shaped op in the chain; TPUs have no
    # texture units and the XLA gather costs 14.3 of the 19 ms shade pass
    # at 1080p (scripts/render_attrib.py analysis). 1 = exact (reference
    # semantics, the default everywhere); N > 1 gathers every Nth pixel and
    # nearest-upsamples — visually minor through the blurred surface.
    # Measured at 1080p/1M (cached bg): full render 26.3 ms at ds=1,
    # 15.4 ms at ds=4; ds=2 anomalously lowers to a SLOWER gather (29.8 ms)
    # — use 1 (exact) or 4.
    refraction_downsample: int = 1


def bilateral_blur_1d(
    depth: jax.Array,  # [H, W] linear depth
    axis: int,  # 0 = y pass, 1 = x pass
    params: SSFRParams,
    cam: Camera,
) -> jax.Array:
    """Depth-adaptive separable bilateral blur
    (bilateral_blur_directional.glsl:50-77). Filter size shrinks with depth:
    min(max_filter, ceil(projected_particle_constant / depth)); Gaussian
    space weights (sigma = size/3) x Gaussian range weights
    (sigma = depth_threshold)."""
    # host-side constants (screen_space_fluid_rendering.gd:373-376)
    r = params.particle_sphere_radius
    depth_threshold = r * params.blur_depth_scale
    import math

    proj_const = (params.blur_filter_size * r * 0.1 * (cam.height / 2.0)) / math.tan(
        math.radians(cam.fov_y_deg) / 2.0
    )

    live = (depth > 0.0) & (depth <= FAR_GUARD)
    fsize = jnp.minimum(
        float(params.max_filter_size), jnp.ceil(proj_const / jnp.maximum(depth, 1e-3))
    )
    fsize = jnp.minimum(fsize, params.blur_tap_radius)
    sigma_space = jnp.maximum(fsize / 3.0, 1e-3)
    two_ss2 = 2.0 * sigma_space * sigma_space
    two_sr2 = 2.0 * depth_threshold * depth_threshold

    pad_width = [(0, 0), (0, 0)]
    pad_width[axis] = (params.blur_tap_radius, params.blur_tap_radius)
    dpad = jnp.pad(depth, pad_width, constant_values=BG_DEPTH)

    h, w = depth.shape
    num = jnp.zeros_like(depth)
    den = jnp.zeros_like(depth)
    for x in range(-params.blur_tap_radius, params.blur_tap_radius + 1):
        start = [0, 0]
        start[axis] = params.blur_tap_radius + x
        sample = jax.lax.dynamic_slice(dpad, start, (h, w))
        in_range = jnp.abs(x) <= fsize
        ws = jnp.exp(-(x * x) / two_ss2)
        rd = sample - depth
        wd = jnp.exp(-(rd * rd) / two_sr2)
        wgt = jnp.where(in_range, ws * wd, 0.0)
        num = num + sample * wgt
        den = den + wgt
    blurred = num / jnp.maximum(den, 1e-9)
    return jnp.where(live, blurred, depth)


def blur_depth(depth: jax.Array, params: SSFRParams, cam: Camera) -> jax.Array:
    if not params.depth_blur_enabled:
        return depth
    if params.use_pallas_blur and jax.default_backend() not in ("cpu",):
        from .blur_kernel import blur_depth_pallas, blur_shape_supported

        if blur_shape_supported(*depth.shape):
            # full reference fidelity: the VMEM-resident kernel affords the
            # true depth-adaptive radius up to max_filter_size (the XLA path
            # below caps at blur_tap_radius=12 — round-1/2 Weak item)
            return blur_depth_pallas(
                depth, cam,
                radius=params.max_filter_size,
                max_filter=params.max_filter_size,
                blur_filter_size=params.blur_filter_size
                * params.particle_sphere_radius,
                depth_threshold=params.particle_sphere_radius
                * params.blur_depth_scale,
            )
    d = bilateral_blur_1d(depth, 1, params, cam)  # X pass
    return bilateral_blur_1d(d, 0, params, cam)  # Y pass


def gaussian_blur(img: jax.Array, radius: int) -> jax.Array:
    """Separable normalized Gaussian (sigma = radius/2) — antialiases the
    additive thickness deposits. Normalized, so the blur preserves the
    total deposited material (each particle's 2r spreads over its
    footprint without gain)."""
    if radius <= 0:
        return img
    sigma = max(radius / 2.0, 1e-3)
    xs = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-(xs * xs) / (2.0 * sigma * sigma))
    k = (k / k.sum()).astype(np.float32)
    for axis in (0, 1):
        pad = [(0, 0), (0, 0)]
        pad[axis] = (radius, radius)
        p = jnp.pad(img, pad)
        acc = jnp.zeros_like(img)
        h, w = img.shape
        for i, kv in enumerate(k):
            start = [0, 0]
            start[axis] = i
            acc = acc + kv * jax.lax.dynamic_slice(p, start, (h, w))
        img = acc
    return img


def thickness_map(
    deposits: jax.Array,  # [H, W] raw additive deposits (world units)
    params: SSFRParams,
) -> jax.Array:
    """Blurred, scaled per-pixel thickness; `params.thickness` acts as the
    minimum (its reference name is `minimum_thickness`,
    screen_space_fluid_rendering.gd:12)."""
    t = gaussian_blur(deposits, params.thickness_blur_radius)
    return jnp.maximum(params.thickness, params.thickness_scale * t)


def reconstruct_normals(depth: jax.Array, cam: Camera, crop=None) -> jax.Array:
    """View-space normals from min-magnitude depth differences
    (fluid_render_fixed_depth.glsl:103-119). `crop` = (y0, x0, ch, cw) when
    `depth` is a static fluid crop of the frame (camera.crop_for_aabb); the
    roll-wrap at crop edges only touches pixels the crop margin guarantees
    are not fluid."""
    vpos = view_pos_from_depth(cam, depth, crop=crop)  # [H, W, 3]

    def diff(arr, axis, sign):
        shifted = jnp.roll(arr, -sign, axis=axis)
        d = (shifted - arr) * sign
        return d

    ddx1 = diff(vpos, 1, 1)
    ddx2 = diff(vpos, 1, -1)
    ddx = jnp.where(
        (jnp.abs(ddx1[..., 2]) > jnp.abs(ddx2[..., 2]))[..., None], ddx2, ddx1
    )
    ddy1 = diff(vpos, 0, 1)
    ddy2 = diff(vpos, 0, -1)
    ddy = jnp.where(
        (jnp.abs(ddy1[..., 2]) > jnp.abs(ddy2[..., 2]))[..., None], ddy2, ddy1
    )
    # screen y is stored top-down, so the "up" image axis is -y in view space;
    # cross(ddy, ddx) with this storage yields the camera-facing normal as in
    # the reference (which samples uv with the same orientation)
    n = jnp.cross(ddy, ddx)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)


def shade(
    fluid_depth: jax.Array,  # [H, W] blurred linear depth (crop-sized
    # when `crop` is set)
    bg_color: jax.Array,  # [H, W, 3] — always the FULL frame (the
    # refraction gather may sample outside the crop)
    bg_depth: jax.Array,  # [H, W] linear depth of background scene (full)
    cubemap_sample,  # callable dirs [..,3](view) -> [..,3] rgb
    view_rot: jax.Array,  # [3,3] world->view rotation (to rotate dirs back)
    params: SSFRParams,
    cam: Camera,
    thickness: jax.Array | None = None,  # [H, W] per-pixel thickness map
    # (ssfr.thickness_map); None = the reference's constant uniform
    crop=None,  # (y0, x0, ch, cw) static fluid crop (camera.crop_for_aabb):
    # fluid_depth/thickness are crop-sized, per-pixel shading work runs on
    # the crop only, and the returned color is crop-sized (the caller
    # composites it back into the full background)
):
    """The fluid_render_fixed_depth pass (fluid_render_fixed_depth.glsl:52-153).
    Returns (color [H,W,3], mask [H,W]) — crop-sized under `crop`."""
    if crop is not None:
        y0c, x0c, chc, cwc = crop
        bg_depth_c = jax.lax.slice(
            bg_depth, (y0c, x0c), (y0c + chc, x0c + cwc))
        bg_color_c = jax.lax.slice(
            bg_color, (y0c, x0c, 0), (y0c + chc, x0c + cwc, 3))
    else:
        bg_depth_c, bg_color_c = bg_depth, bg_color
    live = (fluid_depth <= FAR_GUARD) & (bg_depth_c >= fluid_depth)

    normal = reconstruct_normals(fluid_depth, cam, crop=crop)
    ray_dir = screen_to_view_dir(cam, crop=crop)  # [H, W, 3] unit, view space

    # light dir into view space (main_camera.gd pulls the scene light into
    # the effect, main_camera.gd:54-62); reference convention: light_dir
    # points from surface toward light in the half-vector formula
    light_v = view_rot @ np.asarray(params.light_dir, np.float32)
    light_v = -light_v / jnp.maximum(jnp.linalg.norm(light_v), 1e-9)

    hvec = light_v - ray_dir
    hvec = hvec / jnp.maximum(jnp.linalg.norm(hvec, axis=-1, keepdims=True), 1e-9)
    spec = jnp.maximum(0.0, jnp.sum(hvec * normal, axis=-1)) ** params.specular_power

    cos_t = jnp.sum(normal * (-ray_dir), axis=-1)
    fresnel = jnp.clip(
        F0 + (1.0 - F0) * jnp.maximum(1.0 - cos_t, 0.0) ** 5.0, 0.0, params.fresnel_clamp
    )

    # cubemap reflection: reflect in view space, rotate to world for sampling
    refl_v = ray_dir - 2.0 * cos_t[..., None] * (-normal)
    refl_w = refl_v @ view_rot  # R^T @ v per pixel
    refl_color = cubemap_sample(refl_w)

    # refraction: offset background UV by refracted direction xy
    # (fluid_render_fixed_depth.glsl:142-144)
    cos_i = jnp.clip(jnp.sum(-ray_dir * normal, axis=-1), -1.0, 1.0)
    k = 1.0 - ETA * ETA * (1.0 - cos_i * cos_i)
    refr_dir = ETA * ray_dir + (ETA * cos_i - jnp.sqrt(jnp.maximum(k, 0.0)))[
        ..., None
    ] * normal
    h, w = fluid_depth.shape
    # per-pixel thickness (the pass the reference skipped) or the constant
    # uniform (fluid_render_fixed_depth.glsl:142-146, exact parity)
    if thickness is None:
        t_scalar = params.thickness
        uv_off = refr_dir[..., :2] * (t_scalar * params.refraction_strength)
    else:
        uv_off = refr_dir[..., :2] * (
            thickness[..., None] * params.refraction_strength
        )
    # pixel coordinates and uv-offset scale stay in FULL-frame terms (the
    # reference's uv is [0,1] of the frame); a crop only changes WHICH
    # pixels are shaded, never the refraction geometry
    fw, fh = cam.width, cam.height
    y0c, x0c = (crop[0], crop[1]) if crop is not None else (0, 0)
    xs = jnp.arange(w, dtype=fluid_depth.dtype) + fluid_depth.dtype.type(x0c)
    ys = jnp.arange(h, dtype=fluid_depth.dtype) + fluid_depth.dtype.type(y0c)
    xg, yg = jnp.meshgrid(xs, ys, indexing="xy")
    # uv in [0,1] with y flipped like screen storage
    sx = jnp.clip(xg + uv_off[..., 0] * fw, 0, fw - 1).astype(jnp.int32)
    sy = jnp.clip(yg - uv_off[..., 1] * fh, 0, fh - 1).astype(jnp.int32)
    ds = int(params.refraction_downsample)
    # FLAT row gather: one linear index into [H*W, 3] rows. Value-identical
    # to bg_color[sy, sx]; measured 16.9 -> 11.4 ms at 1080p on chip
    # (scripts/render_roofline.py gather probes) — XLA lowers the 1-D row
    # gather better than the 2-coordinate form.
    bg_rows = bg_color.reshape(-1, 3)
    if ds > 1:
        # strided gather + nearest upsample (see SSFRParams doc); trailing
        # partial blocks clamp to the last full sample row/column
        lin = sy[::ds, ::ds] * fw + sx[::ds, ::ds]
        tsm = bg_rows[lin]
        tsm = jnp.repeat(jnp.repeat(tsm, ds, axis=0), ds, axis=1)
        transmitted = tsm[:h, :w]
        if transmitted.shape[0] < h or transmitted.shape[1] < w:
            transmitted = jnp.pad(
                transmitted,
                ((0, h - transmitted.shape[0]),
                 (0, w - transmitted.shape[1]), (0, 0)),
                mode="edge")
    else:
        transmitted = bg_rows[sy * fw + sx]

    diffuse = np.asarray(params.diffuse_color, np.float32)
    t_beer = params.thickness if thickness is None else thickness[..., None]
    transmittance = jnp.exp(
        -params.optical_density * (1.0 - diffuse) * t_beer
    )  # Beer's law (per-pixel when the thickness pass is on)
    refr_color = transmitted * transmittance

    color = (
        refr_color * (1.0 - fresnel[..., None])
        + refl_color * fresnel[..., None]
        + spec[..., None]
    )
    return jnp.where(live[..., None], color, bg_color_c), live


def depth_debug_image(fluid_depth: jax.Array, params: SSFRParams) -> jax.Array:
    """Greyscale linear-depth visualiser (particle_depth_visualiser.glsl:58-63)."""
    g = jnp.clip(fluid_depth / params.depth_divisor, 0.0, 1.0)
    g = jnp.where(fluid_depth > FAR_GUARD, 1.0, g)
    return jnp.stack([g, g, g], axis=-1)


def composite_threshold(
    dst: jax.Array, src: jax.Array, color_threshold: float = 0.01
) -> jax.Array:
    """The copy_texture pass: copy src where |rgb| >= threshold
    (copy_texture.glsl:28-33)."""
    mag = jnp.linalg.norm(src, axis=-1, keepdims=True)
    return jnp.where(mag >= color_threshold, src, dst)


def velocity_spheres_composite(
    bg_color: jax.Array,
    bg_depth: jax.Array,
    fluid_depth: jax.Array,
    fluid_color: jax.Array,
) -> jax.Array:
    """VELOCITY_SPHERES mode: depth-tested copy of the fluid-camera color
    into the main color (fluid_render_velocity_spheres.glsl:50-67)."""
    live = (fluid_depth <= FAR_GUARD) & (bg_depth >= fluid_depth)
    return jnp.where(live[..., None], fluid_color, bg_color)


def lit_spheres_shade(
    bufs,  # SplatBuffers with sx/sy populated
    bg_color: jax.Array,
    bg_depth: jax.Array,
    view_rot: jax.Array,  # [3,3] world->view rotation
    params: SSFRParams,
    cam: Camera,
) -> jax.Array:
    """Lit billboard-sphere debug view (billboard_sphere.gdshader:46-88):
    per-pixel impostor normal (sx, -sy, sqrt(1-s^2)) Rodrigues-rotated
    toward the per-pixel view direction, diffuse light() =
    clamp(dot(N, L), 0, 1) * light_color / pi on a uniform sphere color,
    composited depth-tested over the background."""
    from .camera import screen_to_view_dir

    s2 = jnp.clip(bufs.sx**2 + bufs.sy**2, 0.0, 1.0)
    n0 = jnp.stack(
        [bufs.sx, -bufs.sy, jnp.sqrt(1.0 - s2)], axis=-1
    )  # [H, W, 3]

    # Rodrigues rotation of the billboard frame's +z onto VIEW (the
    # fragment-to-camera direction): v = cross(z, VIEW), c = VIEW.z
    view_dir = -screen_to_view_dir(cam)  # fragment -> camera
    vx = -view_dir[..., 1]
    vy = view_dir[..., 0]
    c = view_dir[..., 2]
    s2v = jnp.maximum(vx * vx + vy * vy, 1e-12)
    k = (1.0 - c) / s2v
    # rot @ n0 expanded for v = (vx, vy, 0)
    nx, ny, nz = n0[..., 0], n0[..., 1], n0[..., 2]
    rx = nx * (1.0 - k * vy * vy) + ny * (k * vx * vy) + nz * vy
    ry = nx * (k * vx * vy) + ny * (1.0 - k * vx * vx) - nz * vx
    rz = -nx * vy + ny * vx + nz * c
    normal = jnp.stack([rx, ry, rz], axis=-1)

    light_v = view_rot @ np.asarray(params.light_dir, np.float32)
    to_light = -light_v / np.linalg.norm(np.asarray(params.light_dir))
    ndotl = jnp.clip(jnp.sum(normal * to_light, axis=-1), 0.0, 1.0)
    sphere_color = np.asarray([0.35, 0.55, 0.95], np.float32)
    ambient = 0.25
    lit = (ambient + ndotl[..., None] / np.pi * 2.2) * sphere_color

    live = (bufs.depth < BG_DEPTH) & (bufs.depth < bg_depth)
    return jnp.where(live[..., None], lit, bg_color)
