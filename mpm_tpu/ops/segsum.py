"""Scatter-free sorted segment sums — the core TPU trick of the engine.

XLA lowers scatter/segment_sum on TPU to a serial per-index loop, which makes
the reference's atomic-scatter P2G design (p2g_1.glsl:87-90) unreachable by
direct translation: measured ~0.5M particle-steps/s on a v5e. This module
computes segment sums over *sorted* ids with only dense, VPU-friendly
primitives: a within-block inclusive cumsum plus gathers at segment
boundaries.

Exactness: a segment [s, e) crosses at most one block boundary when segment
length <= block size B, so

    sum = L[e-1] - head                      (same block)
    sum = T[b_s] - head + L[e-1]             (adjacent blocks)

with L the within-block cumsum, T the block totals, head the within-block
prefix before s. No global prefix is ever formed, so there is no catastrophic
cancellation: float error is bounded by the ~B-element local cumsum
(~B * eps), and int32 fixed-point mode is exact.

Requirement: no segment may exceed B elements. A grid cell holds at most
~B/4 particles only under compression the EOS makes dynamically unreachable
(the reference's int32 fixed-point grid would overflow long before,
SURVEY.md §2.1 quirks).

Layout: contributions are [..., N] lane-major; segments run along the last
axis. Outputs are [..., S].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sorted_segment_sum(
    contrib: jax.Array,  # [..., N] per-element contributions, sorted by segment
    starts: jax.Array,  # [S] segment start index (inclusive)
    ends: jax.Array,  # [S] segment end index (exclusive)
    block: int = 1024,
) -> jax.Array:
    """Sum contributions per segment along the last axis. Segments must be
    contiguous ranges with length <= block. Returns [..., S]."""
    n = contrib.shape[-1]
    nb = -(-n // block)
    pad = [(0, 0)] * (contrib.ndim - 1) + [(0, nb * block - n)]
    xb = jnp.pad(contrib, pad).reshape(*contrib.shape[:-1], nb, block)
    lb = jnp.cumsum(xb, axis=-1)
    t = lb[..., -1]  # [..., nb] block totals
    l = lb.reshape(*contrib.shape[:-1], nb * block)

    s = starts.astype(jnp.int32)
    e = ends.astype(jnp.int32)
    bi = s // block
    zero = jnp.zeros((), l.dtype)  # dtype-preserving (int32 fixed-point mode!)
    head = jnp.where(s % block == 0, zero, l[..., jnp.maximum(s - 1, 0)])
    last = l[..., jnp.maximum(e - 1, 0)]
    same = bi == (jnp.maximum(e - 1, 0) // block)
    total = jnp.where(same, last - head, t[..., bi] - head + last)
    return jnp.where(e > s, total, jnp.zeros_like(total))


def segment_bounds_for_offset(
    seg_start: jax.Array,  # [num_cells + 1] start index per sorted cell id
    flat_offset: int,
    num_cells: int,
):
    """Start/end bounds for 'segment of cell (c - flat_offset)' — the P2G tap
    trick: on a row-major grid, tap t scatters particle cell ids by a constant
    flat offset, so the tap's receiving segment for cell c is the particle
    segment of cell c - offset. Out-of-range cells get empty segments."""
    c = jnp.arange(num_cells, dtype=jnp.int32) - flat_offset
    valid = (c >= 0) & (c < num_cells)
    cc = jnp.clip(c, 0, num_cells - 1)
    s = jnp.where(valid, seg_start[cc], 0)
    e = jnp.where(valid, seg_start[cc + 1], 0)
    return s, e
