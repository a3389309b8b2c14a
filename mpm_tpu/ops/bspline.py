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

Layout: lane-major — positions are [D, N] with the particle index minor
(see core/state.py for why).
"""

from __future__ import annotations

import itertools
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def base_cell(pos: jax.Array) -> jax.Array:
    """Integer base cell index (floor) per particle. [D, N] -> [D, N] int32."""
    return jnp.floor(pos).astype(jnp.int32)


def cell_diff(pos: jax.Array) -> jax.Array:
    """Fractional offset from the base cell center: frac(pos) - 0.5."""
    return pos - jnp.floor(pos) - 0.5


@lru_cache(maxsize=None)
def taps(dim: int) -> tuple[tuple[int, ...], ...]:
    """The 3^D neighborhood tap indices (0, 1, 2 per axis; cell = base + tap - 1),
    mirroring the reference's nested gx/gy/gz loops (p2g_1.glsl:56-93)."""
    return tuple(itertools.product((0, 1, 2), repeat=dim))


def axis_weight(tap_a: int, d_a: jax.Array) -> jax.Array:
    """Weight of tap index tap_a in {0,1,2} on one axis. d_a: [...]."""
    if tap_a == 0:
        return 0.5 * (0.5 - d_a) ** 2
    if tap_a == 1:
        return 0.75 - d_a * d_a
    return 0.5 * (0.5 + d_a) ** 2


def tap_weight(d: jax.Array, tap: tuple[int, ...]) -> jax.Array:
    """Separable product weight for one tap. d: [D, N] -> [N]."""
    w = axis_weight(tap[0], d[0])
    for a in range(1, len(tap)):
        w = w * axis_weight(tap[a], d[a])
    return w


def matvec(M: jax.Array, v: jax.Array) -> jax.Array:
    """Explicit small-D matrix-vector product: M [D, D, ...], v [D, ...] ->
    [D, ...]. Unrolled on purpose: jnp.einsum lowers to dot_general, for
    which XLA picks layouts with the tiny D dims minor (measured 10.7x pad
    blowup and 1.5 GB per materialized tap slice on TPU); elementwise
    mul-adds keep the big axis minor and fuse."""
    dim = M.shape[0]
    rows = []
    for i in range(dim):
        acc = M[i, 0] * v[0]
        for j in range(1, dim):
            acc = acc + M[i, j] * v[j]
        rows.append(acc)
    return jnp.stack(rows)


def matvec_t(M: jax.Array, v: jax.Array) -> jax.Array:
    """M^T @ v with the same unrolled formulation."""
    dim = M.shape[0]
    rows = []
    for i in range(dim):
        acc = M[0, i] * v[0]
        for j in range(1, dim):
            acc = acc + M[j, i] * v[j]
        rows.append(acc)
    return jnp.stack(rows)


def tap_dist(d: jax.Array, tap: tuple[int, ...]) -> jax.Array:
    """Cell-center minus particle position for one tap: (tap - 1) - d.

    Derivation: cell = base + tap - 1; dist = cell - pos + 0.5
    = (tap - 1) - (pos - base - 0.5) = (tap - 1) - d — exactly the
    reference's `cell_dist = (cell_x - p.pos) + 0.5` (p2g_1.glsl:70)."""
    # numpy constant: trace-time jnp.asarray creates a device array whose
    # embedding into the lowered module is pathologically slow on tunneled
    # platforms (measured ~58 s per constant)
    off = np.asarray([t - 1 for t in tap], "float32").reshape(-1, *([1] * (d.ndim - 1)))
    return off - d
