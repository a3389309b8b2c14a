"""2D scene visualization — the main_2d analogue.

The reference's 2D scenes draw particles as per-instance quads over a grid
of cell sprites (MLSMPMP2DFluid.tscn:39-46, camera zoom 8). Headless we
rasterize a density image: particles are binned to pixels with the same
scatter-free sort + segment trick as the 3D splat, colored by a velocity
ramp over a grid-line background.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def render_2d(
    pos: jax.Array,  # [2, N] in grid units
    vel_mag: jax.Array,  # [N]
    grid_res: tuple[int, int],
    scale: int = 8,  # pixels per cell (the reference camera zoom, :34-37)
    live: jax.Array | None = None,  # [N] bool; dead bucket slots excluded
) -> jax.Array:
    """Returns [H, W, 3] with W = res_x * scale, H = res_y * scale.
    x maps to image columns, y to rows (screen-down, like the reference)."""
    w = grid_res[0] * scale
    h = grid_res[1] * scale
    px = jnp.clip((pos[0] * scale).astype(jnp.int32), 0, w - 1)
    py = jnp.clip((pos[1] * scale).astype(jnp.int32), 0, h - 1)
    pix = py * w + px
    if live is not None:
        # park dead slots one past the last pixel: the segment bounds below
        # only cover [0, h*w), so they contribute to no pixel
        pix = jnp.where(live, pix, h * w)

    # per-pixel particle count and mean |v| — scatter-free: sort by pixel,
    # segment bounds via searchsorted (setup-scale arrays; runs fine on CPU)
    order = jnp.argsort(pix)
    pix_s = pix[order]
    v_s = vel_mag[order]
    bounds = jnp.searchsorted(pix_s, jnp.arange(h * w + 1, dtype=pix_s.dtype))
    count = (bounds[1:] - bounds[:-1]).astype(jnp.float32)
    cum_v = jnp.concatenate([jnp.zeros((1,), v_s.dtype), jnp.cumsum(v_s)])
    sum_v = cum_v[bounds[1:]] - cum_v[bounds[:-1]]
    mean_v = jnp.where(count > 0, sum_v / jnp.maximum(count, 1.0), 0.0)

    density = jnp.clip(count.reshape(h, w) / 2.0, 0.0, 1.0)
    speed = jnp.clip(mean_v.reshape(h, w) / 3.0, 0.0, 1.0)

    # dilate single-pixel hits into visible dots (the reference draws each
    # particle as a multi-pixel quad at camera zoom 8)
    r = max(1, scale // 4)
    win = 2 * r + 1
    density = jax.lax.reduce_window(
        density, 0.0, jax.lax.max, (win, win), (1, 1), "SAME"
    )
    speed = jax.lax.reduce_window(
        speed, 0.0, jax.lax.max, (win, win), (1, 1), "SAME"
    )

    # water-blue ramp shading toward white with speed
    base = jnp.stack(
        [0.10 + 0.8 * speed, 0.45 + 0.45 * speed, 0.85 + 0.1 * speed], axis=-1
    )
    fluid = base * density[..., None]

    # faint cell grid lines (the reference draws the grid as sprites)
    ys = jnp.arange(h) % scale == 0
    xs = jnp.arange(w) % scale == 0
    lines = (ys[:, None] | xs[None, :]).astype(jnp.float32) * 0.08
    bg = jnp.full((h, w, 3), 0.02) + lines[..., None]
    return jnp.where(density[..., None] > 0, fluid, bg)
