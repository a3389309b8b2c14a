"""Dormant reference render paths, rebuilt: R12 (GPUParticles) + R13
(legacy screen-quad SSFR).

The reference carries two superseded render paths that its host code keeps
but never activates (SURVEY.md §2.2 R12/R13):

R12 — the **GPUParticles alternative draw path**. A particles-process
shader places each particle from the sim's (pos.xyz, |vel|) output texture
by flat index (`rendering/shaders/gpu_particle/process_material/
particle_shader.gdshader:12-20`: texel = (idx % width, idx / width)), and
its draw pass renders the billboard sphere impostor writing **packed NDC
depth into the color channels** — `ALBEDO.x = depth; ALBEDO.y =
fract(depth * 65536.0)` (`.../draw_pass_material/particle_depth_map.
gdshader`, fragment; the host hookup exists but is commented out,
`MLSMPM3DFluidMultithreadGPU.cs:414-423`).

R13 — the **legacy full-screen-quad SSFR experiments** that preceded the
CompositorEffect pipeline (the FullScreenQuad node is hidden in
`main_camera.tscn:71-74`): a screen shader that *unpacks* the two-channel
16.16 depth (`rendering/shaders/screen_space_quad/screen_shader.
gdshader:33-34`), a NON-adaptive fixed-size separable bilateral blur in
linear depth with a color-mode variant (`.../bilateral_blur.gdshader`),
and a linear-depth visualiser quad (`.../full_screen_quad.gdshader`).

Headless TPU analogue: the texture contract is an RGBA32F array of width
floor(sqrt(n))+1 (`MLSMPM3DFluidMultithreadGPU.cs:196-197`) built by
particle id; the packed-depth splat reuses the production z-buffer +
sphere-impostor dilation and emits the two-channel packing; the legacy
quad chain (unpack -> linearize -> X blur -> Y blur -> /100 grayscale) is
plain jnp image math. Everything here is a debug/fallback path — none of
it is on the official bench's hot loop — so no Pallas kernels: XLA fuses
the fixed-tap loops fine at the sizes these paths serve.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .camera import Camera, linear_depth_to_ndc, ndc_depth_to_linear
from .splat import BG_DEPTH, splat_particles

# screen_shader.gdshader:36-39 — a pixel whose unpacked depth is below this
# was never drawn by the R12 pass (reverse-z: 0.0 == far plane / cleared)
DEPTH_DISCARD = 1e-4


# ---------------------------------------------------------------------------
# R12: the sim -> render texture contract + packed-depth draw pass
# ---------------------------------------------------------------------------


def pos_texture_width(n: int) -> int:
    """Texture side for n particles: floor(sqrt(n)) + 1
    (MLSMPM3DFluidMultithreadGPU.cs:196-197).

    Deliberate divergence: the reference truncates a float32 sqrt
    (`(uint)Mathf.Sqrt(num_particles) + 1`); exact `math.isqrt` can differ
    by 1 near n ~ 16.7M where the float sqrt rounds up across an integer
    boundary. Harmless (the texture only needs >= n texels) and
    self-consistent within this repo — noted in case texture-dimension
    bit-parity at extreme n ever matters."""
    return math.isqrt(n) + 1


def particle_pos_texture(pos: jax.Array, vel_mag: jax.Array,
                         n: int) -> jax.Array:
    """[W, W, 4] RGBA32F (pos.xyz, |vel|) texture from [3, n] lane-major
    positions in particle-id order — the array the GPU sim writes from g2p
    (g2p.glsl:44,149-150) and every render path samples. Texels >= n are
    zero (the reference leaves them unwritten)."""
    w = pos_texture_width(n)
    tex = jnp.zeros((w * w, 4), jnp.float32)
    tex = tex.at[:n, 0].set(pos[0].astype(jnp.float32))
    tex = tex.at[:n, 1].set(pos[1].astype(jnp.float32))
    tex = tex.at[:n, 2].set(pos[2].astype(jnp.float32))
    tex = tex.at[:n, 3].set(vel_mag.astype(jnp.float32))
    return tex.reshape(w, w, 4)


def particle_pos_texture_from_state(state, n: int) -> jax.Array:
    """The texture contract from a BucketState: slot (pos, |vel|) scattered
    to texel `ids[k, c]` — flat index IS the particle id, so the layout is
    stable across migrations exactly like the reference's INDEX-addressed
    buffer. Empty slots (ids == -1) route to a guard texel past the end."""
    w = pos_texture_width(n)
    pos = state.pos.reshape(state.dim, -1).astype(jnp.float32)
    vel = state.vel.reshape(state.dim, -1).astype(jnp.float32)
    ids = state.ids.reshape(-1)
    live = ids >= 0
    idx = jnp.where(live, ids, w * w)  # guard texel
    vmag = jnp.sqrt(jnp.sum(vel * vel, axis=0))
    texel = jnp.concatenate(
        [pos.T, vmag[:, None]], axis=1)  # [K*C, 4]
    tex = jnp.zeros((w * w + 1, 4), jnp.float32).at[idx].set(
        jnp.where(live[:, None], texel, 0.0))
    return tex[: w * w].reshape(w, w, 4)


def particles_from_texture(tex: jax.Array, n: int):
    """The process-shader read (particle_shader.gdshader:12-20): particle
    INDEX -> texel (idx % width, idx / width) -> (pos [3, n], |vel| [n])."""
    flat = tex.reshape(-1, 4)[:n]
    return flat[:, :3].T, flat[:, 3]


def pack_depth(ndc_depth: jax.Array) -> jax.Array:
    """[H, W] NDC depth -> [H, W, 3] packed color: R = depth, G =
    fract(depth * 65536), B = 0 (particle_depth_map.gdshader fragment —
    the low 16 bits ride the second channel so a 16-bit color buffer
    still reconstructs ~32-bit depth)."""
    lo = ndc_depth * 65536.0
    return jnp.stack(
        [ndc_depth, lo - jnp.floor(lo), jnp.zeros_like(ndc_depth)],
        axis=-1)


def unpack_depth(packed: jax.Array) -> jax.Array:
    """[H, W, 3] packed color -> [H, W] NDC depth
    (screen_shader.gdshader:33-34): floor(x*65536)/65536 +
    floor(y*65536)/65536^2. Pixels the draw pass discarded stay 0
    (== reverse-z far plane); callers test against DEPTH_DISCARD."""
    hi = jnp.floor(packed[..., 0] * 65536.0) / 65536.0
    lo = jnp.floor(packed[..., 1] * 65536.0) / (65536.0 * 65536.0)
    return hi + lo


def packed_depth_splat(
    pos: jax.Array,  # [3, N] world positions (lane-major)
    view: jax.Array,  # [4, 4] world->view
    cam: Camera,
    sphere_radius: float = 1.0,
    max_radius_px: int = 6,
) -> jax.Array:
    """R12's draw pass, headless: billboard sphere impostors with analytic
    depth (the same math as the production splat — the reference's R12
    fragment IS depth_map.gdshader's impostor with packed-albedo output),
    emitting the [H, W, 3] packed-NDC-depth color image. Empty pixels are
    (0, 0, 0): the fragment discards and writes DEPTH = 0.0 (reverse-z
    far), matching the cleared buffer."""
    vmag = jnp.zeros((pos.shape[-1],), jnp.float32)  # R12 packs no velocity
    bufs = splat_particles(pos, vmag, view, cam,
                           sphere_radius=sphere_radius,
                           max_radius_px=max_radius_px)
    occupied = bufs.depth < BG_DEPTH
    ndc = jnp.where(
        occupied,
        jnp.clip(linear_depth_to_ndc(
            jnp.maximum(bufs.depth, cam.near), cam), 0.0, 1.0),
        0.0)
    return jnp.where(occupied[..., None], pack_depth(ndc), 0.0)


# ---------------------------------------------------------------------------
# R13: the legacy screen-quad chain
# ---------------------------------------------------------------------------


def legacy_bilateral_blur_1d(
    linear_depth: jax.Array,  # [H, W] linear view depth
    blur_dir: tuple[int, int] = (1, 0),  # (x, y) like the shader uniform
    filter_size: int = 50,
    sigma_range: float = 2.0,
) -> jax.Array:
    """The legacy NON-adaptive separable bilateral blur, depth mode
    (bilateral_blur.gdshader fragment, mode 0): fixed filter_size (the
    production pipeline's depth-ADAPTIVE size is what superseded this),
    sigma_space = filter_size / 3, Gaussian space x Gaussian range weights
    over LINEAR depth. Every tap linearizes the raw sample — far-plane
    taps (depth 0 -> linear = far) fall out of the range kernel naturally,
    so no explicit fluid mask is needed, exactly like the GLSL. Edge taps
    clamp (Godot screen textures clamp to edge). Returns blurred linear
    depth (the shader's `sum`, before its /100 display scaling)."""
    h, w = linear_depth.shape
    dx, dy = blur_dir
    sigma_space = float(filter_size) / 3.0
    two_s2 = 2.0 * sigma_space * sigma_space
    two_r2 = 2.0 * sigma_range * sigma_range
    pad = filter_size
    padded = jnp.pad(linear_depth, pad, mode="edge")
    center = linear_depth

    def tap(i, carry):
        s, ws = carry
        t = i - filter_size
        sample = jax.lax.dynamic_slice(
            padded, (pad + t * dy, pad + t * dx), (h, w))
        wgt = jnp.exp(-jnp.float32(1.0) * (t * t) / two_s2)
        rd = sample - center
        wd = jnp.exp(-rd * rd / two_r2)
        return s + sample * wgt * wd, ws + wgt * wd

    zero = jnp.zeros_like(center)
    s, ws = jax.lax.fori_loop(0, 2 * filter_size + 1, tap, (zero, zero))
    return s / jnp.maximum(ws, 1e-20)


def legacy_color_blur_1d(
    color: jax.Array,  # [H, W, 3]
    blur_dir: tuple[int, int] = (1, 0),
    filter_size: int = 30,
    sigma_range: float = 1.0,
) -> jax.Array:
    """The legacy blur's color mode (bilateral_blur.gdshader, mode 1) —
    including its quirk: the range term is `sample.r - source` with vec3
    broadcasting, i.e. each channel's range weight compares the SAMPLE'S
    RED against that channel of the center (`vec3 rDepth = sample.r -
    source`). Reproduced bit-for-bit; do not "fix" it — this path exists
    for parity with the reference's dormant experiment."""
    h, w, _ = color.shape
    dx, dy = blur_dir
    sigma = float(filter_size) / 3.0
    two_s2 = 2.0 * sigma * sigma
    two_r2 = 2.0 * sigma_range * sigma_range
    pad = filter_size
    padded = jnp.pad(color, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    center = color

    def tap(i, carry):
        s, ws = carry
        t = i - filter_size
        sample = jax.lax.dynamic_slice(
            padded, (pad + t * dy, pad + t * dx, 0), (h, w, 3))
        wgt = jnp.exp(-jnp.float32(1.0) * (t * t) / two_s2)
        rd = sample[..., 0:1] - center  # the sample.r-vs-vec3 quirk
        wd = jnp.exp(-rd * rd / two_r2)
        return s + sample * wgt * wd, ws + wgt * wd

    zero = jnp.zeros_like(center)
    s, ws = jax.lax.fori_loop(0, 2 * filter_size + 1, tap, (zero, zero))
    return s / jnp.maximum(ws, 1e-20)


def legacy_depth_view(
    ndc_depth: jax.Array,  # [H, W]
    cam: Camera,
    bg_color: jax.Array,  # [H, W, 3] what discarded pixels show
    depth_range: float = 50.0,
) -> jax.Array:
    """The full-screen-quad linear-depth visualiser
    (full_screen_quad.gdshader:16-28): grayscale linear_depth /
    depth_range where linear_depth < depth_range, discard (background)
    beyond."""
    lin = ndc_depth_to_linear(jnp.maximum(ndc_depth, 1e-9), cam)
    gray = jnp.clip(lin / depth_range, 0.0, 1.0)
    show = (lin < depth_range) & (ndc_depth >= DEPTH_DISCARD)
    return jnp.where(show[..., None], gray[..., None], bg_color)


def legacy_quad_frame(
    state,  # BucketState
    n: int,  # particle count (texture sizing)
    view: jax.Array,
    cam: Camera,
    bg_color: jax.Array,  # [H, W, 3]
    sphere_radius: float = 1.0,
    max_radius_px: int = 6,
    filter_size: int = 50,
    sigma_range: float = 2.0,
) -> jax.Array:
    """The whole dormant pipeline end-to-end, as it would have composed had
    the reference finished it: sim state -> id-ordered position texture
    (R12 process contract) -> packed-depth impostor splat (R12 draw pass)
    -> 16.16 unpack (R13 screen shader) -> linearize -> X then Y legacy
    bilateral blur -> /100 grayscale (bilateral_blur.gdshader:88)
    composited over the background where fluid was drawn. Debug path: runs
    as one jit but makes no hot-loop promises."""
    tex = particle_pos_texture_from_state(state, n)
    return legacy_quad_from_texture(
        tex, n, view, cam, bg_color, sphere_radius=sphere_radius,
        max_radius_px=max_radius_px, filter_size=filter_size,
        sigma_range=sigma_range)


def legacy_quad_from_texture(
    tex: jax.Array,  # [W, W, 4] the R12 position texture
    n: int,
    view: jax.Array,
    cam: Camera,
    bg_color: jax.Array,
    sphere_radius: float = 1.0,
    max_radius_px: int = 6,
    filter_size: int = 50,
    sigma_range: float = 2.0,
) -> jax.Array:
    """legacy_quad_frame from the texture contract on (shared by the
    BucketState path and the plain [3, N] positions path)."""
    pos, _vmag = particles_from_texture(tex, n)
    packed = packed_depth_splat(pos, view, cam,
                                sphere_radius=sphere_radius,
                                max_radius_px=max_radius_px)
    ndc = unpack_depth(packed)
    fluid = ndc >= DEPTH_DISCARD
    lin = ndc_depth_to_linear(jnp.maximum(ndc, 1e-9), cam)
    lin = jnp.where(fluid, lin, cam.far)  # depth-0 taps linearize to far
    b = legacy_bilateral_blur_1d(lin, (1, 0), filter_size, sigma_range)
    b = legacy_bilateral_blur_1d(b, (0, 1), filter_size, sigma_range)
    gray = jnp.clip(b / 100.0, 0.0, 1.0)  # ALBEDO = vec3(sum / 100)
    return jnp.where(fluid[..., None], gray[..., None], bg_color)
