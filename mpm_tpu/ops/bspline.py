"""Quadratic B-spline interpolation — the normative weights shared by every
reference variant (SURVEY.md §2.1):

    d  = pos - floor(pos) - 0.5
    w0 = 0.5 * (0.5 - d)^2
    w1 = 0.75 - d^2
    w2 = 0.5 * (0.5 + d)^2

(reference mls-mpm/2d/fluid/MLSMPM2DFluid.cs:204-208,
mls-mpm/3d/fluid_multithread_gpu/compute_shaders/p2g_1.glsl:47-52).

The grid spacing dx is 1 in cell units everywhere, and the fixed 4/dx^2
stiffness factor is folded into the C update (C = 4B, g2p.glsl:108) and the
force term (eq16 = -4 V sigma dt, p2g_2.glsl:109).
"""

from __future__ import annotations

import itertools
from functools import lru_cache

import jax
import jax.numpy as jnp


def base_cell(pos: jax.Array) -> jax.Array:
    """Integer base cell index (floor) per particle. [N, D] -> [N, D] int32."""
    return jnp.floor(pos).astype(jnp.int32)


def cell_diff(pos: jax.Array) -> jax.Array:
    """Fractional offset from the base cell center: frac(pos) - 0.5."""
    return pos - jnp.floor(pos) - 0.5


def weights_1d(d: jax.Array) -> jax.Array:
    """Per-axis quadratic B-spline weights.

    d: [..., D] fractional offsets -> [..., 3, D] weights (tap index first so
    weights[..., k, a] is the weight of tap k on axis a).
    """
    return jnp.stack(
        [
            0.5 * (0.5 - d) ** 2,
            0.75 - d * d,
            0.5 * (0.5 + d) ** 2,
        ],
        axis=-2,
    )


@lru_cache(maxsize=None)
def taps(dim: int) -> tuple[tuple[int, ...], ...]:
    """The 3^D neighborhood tap offsets (0, 1, 2 per axis; cell = base + tap - 1),
    mirroring the reference's nested gx/gy/gz loops (p2g_1.glsl:56-93)."""
    return tuple(itertools.product((0, 1, 2), repeat=dim))


def tap_weight(w: jax.Array, tap: tuple[int, ...]) -> jax.Array:
    """Separable product weight for one tap. w: [..., 3, D] -> [...]."""
    out = w[..., tap[0], 0]
    for a in range(1, len(tap)):
        out = out * w[..., tap[a], a]
    return out
