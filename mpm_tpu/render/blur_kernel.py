"""Pallas depth-adaptive separable bilateral blur (kernel BL).

The reference's blur (bilateral_blur_directional.glsl:50-77) runs a
depth-adaptive filter: size = min(max_filter_size, ceil(proj_const/depth)),
Gaussian space weights (sigma = size/3) x Gaussian range weights
(sigma = depth_threshold), as two separable X/Y dispatches. The XLA
implementation (ssfr.bilateral_blur_1d) caps the tap radius at 12 because
each tap is a full-image HBM round trip at XLA elementwise rates; this
kernel keeps the WHOLE image (plus halos) VMEM-resident and supports the
reference's full max_filter_size=100.

Two structural tricks make radius-100 support affordable:

1. **Dynamic tap count.** The per-pass tap loop is a `lax.fori_loop` whose
   trip count is the image's actual worst-case filter size
   (max over live pixels of ceil(proj_const/depth), clamped to the radius)
   — a scene with its nearest fluid at depth d pays ~proj_const/d taps,
   not 100. Per-pixel adaptivity inside the loop is the same
   `|off| <= fsize` weight mask as the XLA path.
2. **Incremental ±1 rolls.** Tap k's shifted window is produced by rolling
   the previous iteration's padded image one lane (X pass) / sublane
   (Y pass), so every window slice is at the static 128-aligned offset
   `rpad` — no misaligned lane slices (a statically-unrolled version using
   201 misaligned slices measured ~200 ms/frame at 640x360; this one is
   data-proportional). Pad fill is BG_DEPTH and `rpad >= radius+1`, so
   circular wrap never reaches the read window.

Both directional passes run in ONE kernel invocation: pass X writes its
result into a row-padded VMEM scratch, pass Y reads rolled windows of it.
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


def _blur_kernel(depth_ref, out_ref, xpad_ref, *, radius: int, rpad: int,
                 proj_const: float, depth_threshold: float, max_filter: int,
                 interpret: bool):
    h, w = out_ref.shape
    inv_2sr2 = np.float32(1.0 / (2.0 * depth_threshold * depth_threshold))

    if interpret:
        roll = jnp.roll
    else:
        def roll(x, shift, axis):
            # pltpu.roll requires a non-negative shift; -1 == size-1 (rotate)
            return pltpu.roll(x, shift=shift % x.shape[axis], axis=axis)

    def taps(padded, axis):
        """One directional pass over a BG_DEPTH-padded image; returns the
        blurred-or-passthrough unpadded image."""
        if axis == 1:
            window = lambda p: p[:, rpad : rpad + w]
        else:
            window = lambda p: p[rpad : rpad + h, :]
        center = window(padded)
        live = (center > 0.0) & (center <= FAR_GUARD)
        fsize = jnp.minimum(
            float(max_filter),
            jnp.ceil(proj_const / jnp.maximum(center, 1e-3)),
        )
        fsize = jnp.minimum(fsize, float(radius))
        sigma_s = jnp.maximum(fsize / 3.0, 1e-3)
        inv_2ss2 = 1.0 / (2.0 * sigma_s * sigma_s)
        # the whole image's worst-case tap count — the dynamic loop bound
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
        return jnp.where(live, blurred, center)

    # ---- pass X: lane rolls of the column-padded input ----
    bx = taps(depth_ref[:, :], 1)
    xpad_ref[rpad : rpad + h, :] = bx
    xpad_ref[0:rpad, :] = jnp.full((rpad, w), BG_DEPTH, bx.dtype)
    xpad_ref[rpad + h : 2 * rpad + h, :] = jnp.full((rpad, w), BG_DEPTH, bx.dtype)

    # ---- pass Y: sublane rolls of the row-padded X result ----
    out_ref[:, :] = taps(xpad_ref[:, :], 0)


def blur_supported(cam: Camera) -> bool:
    """Lane dim must be 128-divisible and the padded image, the row-padded
    scratch, and the four loop-carried copies must fit VMEM comfortably."""
    if cam.width % 128 != 0:
        return False
    padded = cam.height * (cam.width + 2 * 128) * 4
    ypadded = (cam.height + 2 * 128) * cam.width * 4
    # in + out + scratch + 4 fori_loop carries (worst of the two passes)
    bytes_needed = padded + 2 * cam.height * cam.width * 4 + ypadded \
        + 4 * max(padded, ypadded)
    return bytes_needed <= 100 * 2**20


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
    # lane padding: 128-aligned and > radius so circular rolls never wrap
    # into the read window
    rpad = -((radius + 1) // -128) * 128
    dpad = jnp.pad(depth, ((0, 0), (rpad, rpad)), constant_values=BG_DEPTH)

    (out,) = pl.pallas_call(
        functools.partial(
            _blur_kernel, radius=radius, rpad=rpad,
            proj_const=float(proj_const),
            depth_threshold=float(depth_threshold),
            max_filter=max_filter, interpret=bool(interpret),
        ),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((h, w + 2 * rpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((h, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((h, w), depth.dtype),),
        scratch_shapes=[
            pltpu.VMEM((h + 2 * rpad, w), depth.dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
    )(dpad)
    return out
