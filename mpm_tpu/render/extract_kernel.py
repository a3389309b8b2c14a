"""Render extraction kernel: bucket state -> per-CELL nearest splat points.

The XLA extract path (reshape + mask + norm over every slot, then a
2-pass argsort z-buffer over all K*C slots) costs hundreds of ms per frame
at 1M particles — XLA elementwise streams ~6 GB/s on this platform and
per-element gathers are serial (ARCHITECTURE.md). This kernel runs ONE
plane sweep over the bucket arrays doing projection + velocity magnitude +
a per-cell nearest-particle reduction in VMEM, emitting 5 floats per CELL
instead of per SLOT — the downstream z-buffer sort shrinks by K and feeds
from pallas-rate DMA instead of XLA gathers.

Reduction semantics: per cell, the minimum-depth live slot wins (its exact
particle position/velocity are kept). Occluded particles WITHIN one cell
are dropped before the per-pixel z-buffer — sub-cell-scale approximation,
invisible after the SSFR bilateral blur; the reference's rasterizer
resolves the same occlusions in its depth test (depth_map.gdshader:82-84).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .camera import Camera

CELL_BG = 1.0e9  # "no splat from this cell" depth sentinel


def _extract_kernel(pos_ref, vel_ref, mass_ref, scal_ref, out_ref, *, pc: int):
    f32 = jnp.float32
    pos = pos_ref[:].astype(f32)  # [3, K, pc]
    vel = vel_ref[:].astype(f32)
    mass = mass_ref[:]
    occ = mass > 0

    # world -> view (row-major 3x3 + translation in scals[0:12])
    vp = [
        scal_ref[4 * i] * pos[0]
        + scal_ref[4 * i + 1] * pos[1]
        + scal_ref[4 * i + 2] * pos[2]
        + scal_ref[4 * i + 3]
        for i in range(3)
    ]
    fpx = scal_ref[12]
    w2 = scal_ref[13]
    h2 = scal_ref[14]
    near = scal_ref[15]
    depth = -vp[2]
    safe = jnp.where(depth > 1e-6, depth, 1e-6)
    px = w2 + fpx * vp[0] / safe
    py = h2 - fpx * vp[1] / safe
    vmag = jnp.sqrt(vel[0] * vel[0] + vel[1] * vel[1] + vel[2] * vel[2])

    valid = occ & (depth > near)
    dmask = jnp.where(valid, depth, CELL_BG)
    dmin = jnp.min(dmask, axis=0)  # [pc]

    k = pos.shape[1]
    sel = [jnp.zeros((pc,), f32) for _ in range(3)]  # px, py, vmag
    found = jnp.zeros((pc,), jnp.bool_)
    for kk in range(k):
        m = valid[kk] & (dmask[kk] == dmin) & jnp.logical_not(found)
        sel[0] = jnp.where(m, px[kk], sel[0])
        sel[1] = jnp.where(m, py[kk], sel[1])
        sel[2] = jnp.where(m, vmag[kk], sel[2])
        found = found | m

    out_ref[0, :] = sel[0]
    out_ref[1, :] = sel[1]
    out_ref[2, :] = jnp.where(found, dmin, CELL_BG)
    out_ref[3, :] = sel[2]
    # row 4: live on-screen count (thickness deposits = count * 2r;
    # matches the in-kernel emission, ops/pallas/fused._emit_splats)
    out_ref[4, :] = jnp.sum(valid.astype(f32), axis=0)


@functools.partial(jax.jit, static_argnames=("cam", "interpret"))
def extract_cell_splats(
    state,  # BucketState
    view: jax.Array,  # [4, 4] world->view
    cam: Camera,
    interpret: bool = False,
) -> jax.Array:
    """[5, C]: (pixel x, pixel y, linear depth, |vel|, live count) of each
    cell's nearest live particle; depth == CELL_BG marks empty cells."""
    dim, k, c = state.pos.shape
    assert dim == 3
    # plane blocking keeps blocks 128-aligned for any grid (c % 128 == 0
    # is guaranteed by the pallas support gates)
    n_blk = c // 512 if c % 512 == 0 else c // 128
    blk = c // n_blk
    view = view.astype(jnp.float32)
    scals = jnp.concatenate([
        view[:3, :4].reshape(-1),
        jnp.asarray(
            [cam.focal_px, cam.width / 2.0, cam.height / 2.0, cam.near],
            jnp.float32,
        ),
    ])

    def in_blk(lead):
        ndim = len(lead) + 2

        def index(t):
            idx = [0] * ndim
            idx[-1] = t
            return tuple(idx)

        return pl.BlockSpec((*lead, k, blk), index, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_extract_kernel, pc=blk),
        grid=(n_blk,),
        in_specs=[
            in_blk((3,)),
            in_blk((3,)),
            in_blk(()),
            pl.BlockSpec((16,), lambda t: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((5, blk), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((5, c), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(state.pos, state.vel, state.mass, scals)
