"""Pallas depth-adaptive separable bilateral blur (kernel BL).

The reference's blur (bilateral_blur_directional.glsl:50-77) runs a
depth-adaptive filter: size = min(max_filter_size, ceil(proj_const/depth)),
Gaussian space weights (sigma = size/3) x Gaussian range weights
(sigma = depth_threshold), as two separable X/Y dispatches. The XLA
implementation (ssfr.bilateral_blur_1d) caps the tap radius at 12 because
each tap is a full-image HBM round trip at XLA elementwise rates; this
kernel keeps each block (plus halos) VMEM-resident and supports the
reference's full max_filter_size=100.

Three structural tricks make radius-100 support affordable:

1. **Dynamic tap count.** The per-pass tap loop is a `lax.fori_loop` whose
   trip count is the BLOCK's actual worst-case filter size
   (max over live pixels of ceil(proj_const/depth), clamped to the radius)
   — a scene with its nearest fluid at depth d pays ~proj_const/d taps,
   not 100, and blocks with no fluid at all pay ZERO taps. Per-pixel
   adaptivity inside the loop is the same `|off| <= fsize` weight mask as
   the XLA path; masked taps add exact zeros, so blockwise trip counts
   change nothing numerically.
2. **Incremental ±1 rolls.** Tap k's shifted window is produced by rolling
   the previous iteration's padded block one lane (X pass) / sublane
   (Y pass), so every window slice is at a static aligned offset —
   no misaligned lane slices (a statically-unrolled version using
   201 misaligned slices measured ~200 ms/frame at 640x360; this one is
   data-proportional). Pad fill is BG_DEPTH and pad >= radius+1, so
   circular wrap never reaches the read window.
3. **Grid-tiled passes.** Each directional pass is its own `pallas_call`
   whose grid tiles the INDEPENDENT axis (row blocks for the X pass, lane
   blocks for the Y pass). Mosaic compiles the kernel body once per
   BLOCK shape, not per image: the round-3 single-program whole-image
   kernel measured **363.8 s of XLA/Mosaic compile at 1920x1080** (the
   entire 396 s render compile — per-op tile counts grow superlinearly),
   vs ~29 s for the full frame at 640x360. Tiling restores the small-
   image compile cost at every resolution and shrinks VMEM residency
   from the whole image (~77 MB at 1080p) to a few MB per block.

Non-fluid pixels (depth > FAR_GUARD) pass through unchanged — identical
semantics to the XLA path (which remains the CPU fallback and the oracle
in tests/test_render.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .camera import Camera
from .splat import BG_DEPTH

FAR_GUARD = 3990.0  # mirror ssfr.FAR_GUARD (import loop avoidance)


def _pass_kernel(in_ref, out_ref, *, axis: int, radius: int, pad: int,
                 proj_const: float, depth_threshold: float, max_filter: int,
                 interpret: bool):
    """One directional pass over a BG_DEPTH-padded block: in_ref is padded
    by `pad` along `axis`; out_ref is the unpadded block."""
    h, w = out_ref.shape
    inv_2sr2 = np.float32(1.0 / (2.0 * depth_threshold * depth_threshold))

    if interpret:
        roll = jnp.roll
    else:
        def roll(x, shift, axis):
            # pltpu.roll requires a non-negative shift; -1 == size-1 (rotate)
            return pltpu.roll(x, shift=shift % x.shape[axis], axis=axis)

    if axis == 1:
        window = lambda p: p[:, pad : pad + w]
    else:
        window = lambda p: p[pad : pad + h, :]
    padded = in_ref[:, :]
    center = window(padded)
    live = (center > 0.0) & (center <= FAR_GUARD)
    fsize = jnp.minimum(
        float(max_filter),
        jnp.ceil(proj_const / jnp.maximum(center, 1e-3)),
    )
    fsize = jnp.minimum(fsize, float(radius))
    sigma_s = jnp.maximum(fsize / 3.0, 1e-3)
    inv_2ss2 = 1.0 / (2.0 * sigma_s * sigma_s)
    # the block's worst-case tap count — the dynamic loop bound (taps with
    # |off| > fsize get exact-zero weight, so a smaller per-block bound is
    # numerically identical to the global one)
    needed = jnp.max(jnp.where(live, fsize, 0.0)).astype(jnp.int32)

    def body(k, carry):
        p_m, p_p, num, den = carry
        p_m = roll(p_m, 1, axis)   # window(p_m) == sample at -k
        p_p = roll(p_p, -1, axis)  # window(p_p) == sample at +k
        kf = k.astype(jnp.float32)
        in_range = kf <= fsize
        ws_arg = (kf * kf) * inv_2ss2
        for p in (p_m, p_p):
            s = window(p)
            rd = s - center
            wgt = jnp.where(
                in_range, jnp.exp(-(ws_arg + (rd * rd) * inv_2sr2)), 0.0
            )
            num = num + s * wgt
            den = den + wgt
        return p_m, p_p, num, den

    # off=0 tap has weight exp(0)=1 exactly, seeding num/den
    _, _, num, den = jax.lax.fori_loop(
        1, needed + 1, body,
        (padded, padded, center, jnp.ones_like(center)),
    )
    blurred = num / jnp.maximum(den, 1e-9)
    out_ref[:, :] = jnp.where(live, blurred, center)


def _block(n: int, quantum: int, hi: int) -> int:
    """Largest divisor of n that is a multiple of `quantum` and <= hi
    (the whole extent if none exists): the grid block along the
    independent axis of a pass."""
    best = n
    for b in range(quantum, min(hi, n) + 1, quantum):
        if n % b == 0:
            best = b
    return best


def blur_shape_supported(h: int, w: int) -> bool:
    """Lane dim must be 128-divisible; per-block VMEM is a few MB (grid
    tiling), so any sane image fits — keep a generous whole-column guard
    for the Y pass (its block spans all rows). Takes the BUFFER shape, not
    the camera: a static fluid crop (camera.crop_for_aabb) blurs a
    sub-rectangle of the frame."""
    if w % 128 != 0:
        return False
    ypad = -((100 + 1) // -8) * 8
    yblock = (h + 2 * ypad) * 128 * 4
    return 6 * yblock <= 100 * 2**20


def blur_supported(cam: Camera) -> bool:
    return blur_shape_supported(cam.height, cam.width)


@functools.partial(
    jax.jit, static_argnames=("radius", "max_filter", "cam", "blur_filter_size",
                              "depth_threshold", "interpret")
)
def blur_depth_pallas(
    depth: jax.Array,  # [H, W] linear view depth
    cam: Camera,
    radius: int,
    max_filter: int,
    blur_filter_size: float,
    depth_threshold: float,
    interpret: bool = False,
) -> jax.Array:
    """Both directional passes of the depth-adaptive bilateral blur.

    Host constants exactly as screen_space_fluid_rendering.gd:373-376:
    projected_particle_constant = (filt * r * 0.1 * (h/2)) / tan(fov/2)
    (the caller passes blur_filter_size*r and r*blur_depth_scale)."""
    h, w = depth.shape
    proj_const = (blur_filter_size * 0.1 * (cam.height / 2.0)) / math.tan(
        math.radians(cam.fov_y_deg) / 2.0
    )
    kern = dict(radius=radius, proj_const=float(proj_const),
                depth_threshold=float(depth_threshold),
                max_filter=max_filter, interpret=bool(interpret))
    params = pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024)

    # ---- pass X: row blocks (rows are independent), lane rolls ----
    # lane padding: 128-aligned and > radius so circular rolls never wrap
    # into the read window
    xpad = -((radius + 1) // -128) * 128
    dpad = jnp.pad(depth, ((0, 0), (xpad, xpad)), constant_values=BG_DEPTH)
    hb = _block(h, 8, 160)
    (bx,) = pl.pallas_call(
        functools.partial(_pass_kernel, axis=1, pad=xpad, **kern),
        grid=(h // hb,),
        in_specs=[pl.BlockSpec((hb, w + 2 * xpad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((hb, w), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),),
        out_shape=(jax.ShapeDtypeStruct((h, w), depth.dtype),),
        interpret=interpret,
        compiler_params=params,
    )(dpad)

    # ---- pass Y: lane blocks (columns are independent), sublane rolls ----
    # sublane padding: 8-aligned (the sublane granule) and > radius
    ypad = -((radius + 1) // -8) * 8
    bxp = jnp.pad(bx, ((ypad, ypad), (0, 0)), constant_values=BG_DEPTH)
    wb = _block(w, 128, 384)
    (out,) = pl.pallas_call(
        functools.partial(_pass_kernel, axis=0, pad=ypad, **kern),
        grid=(w // wb,),
        in_specs=[pl.BlockSpec((h + 2 * ypad, wb), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((h, wb), lambda i: (0, i),
                                memory_space=pltpu.VMEM),),
        out_shape=(jax.ShapeDtypeStruct((h, w), depth.dtype),),
        interpret=interpret,
        compiler_params=params,
    )(bxp)
    return out
