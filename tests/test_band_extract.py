"""Surface-band slot extraction (render/splat.extract_band_slot_splats).

The render roofline's residual floor is the per-slot z-buffer scatter at
quality="particle" (ARCHITECTURE.md "Render roofline at 1080p"); the honest
lever is FEWER SCATTER ROWS. For band-shaped fluid (pools — the official
bench scene) every fluid-air interface lies in the grid's shell: the
air-window crops y to the occupied range, and the reference's wall clamps
(g2p.glsl:115-119) pin the other faces — so slots outside the shell can
never win the min-depth z-buffer. The keep set is a union of static
SLICES (no gathers/compaction, both serial on this platform), and
`surface_band_uncovered` certifies per run that no live cell within
`reach` cells of air was culled.

Also pins the round-5 fix: make_full_frame_step used to render the
kernel-emitted CELL splats whatever rc.quality said, so the bench's
"particle quality" 1080p line was actually cell-granularity (pinholes).
"""

import dataclasses as dc

import numpy as np
import jax
import jax.numpy as jnp

from mpm_tpu.core.params import FluidParams, SimConfig
from mpm_tpu.core.state import make_state
from mpm_tpu.models.emitters import box_lattice
from mpm_tpu.ops import bucketed
from mpm_tpu.render import Camera, RenderConfig, SSFRParams
from mpm_tpu.render.camera import look_at
from mpm_tpu.render.pipeline import (
    background_for_view,
    make_full_frame_step,
    render_frame_buckets,
)
from mpm_tpu.render.splat import (
    extract_band_slot_splats,
    extract_slot_splats,
    surface_band_uncovered,
)

_GRID = (16, 16, 16)
_CAM = Camera(width=384, height=256)
_VIEW = look_at((40.0, 30.0, 40.0), (8.0, 6.0, 8.0))
_BANDS = (5, 4, 4)  # (top, bottom, side) cell planes
# top band rule: bt >= (ny - top_occupied_plane) + reach - 1 —
# the band must reach `reach` planes below the free surface


def _pool(full_height: bool = True):
    """A wall-to-wall pool. full_height=True fills to near the grid top
    (the air-window analogue: occupied y-range ~= array y-range), so the
    free surface sits inside the top band; False leaves the surface
    mid-grid, outside every band — the certificate must fire."""
    size = (11.5, 11.0, 11.5) if full_height else (11.5, 5.5, 11.5)
    cy = 8.0 if full_height else 5.2
    pos = box_lattice(_GRID, size, 0.8, center=(8.0, cy, 8.0))
    config = SimConfig(grid_res=_GRID, num_particles=pos.shape[0],
                       substeps=2, bin_capacity=8)
    fluid = FluidParams.create(dim=3, eos_stiffness=4.0, eos_power=4.0)
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(make_state(pos))
    return config, fluid, b


def test_band_rows_shrink_and_certificate_holds():
    config, _, b = _pool()
    full = np.asarray(extract_slot_splats(b, jnp.asarray(_VIEW), _CAM))
    band = np.asarray(extract_band_slot_splats(
        b, jnp.asarray(_VIEW), _CAM, _GRID, _BANDS))
    assert band.shape[0] == 5
    nx, ny, nz = _GRID
    bt, bf, bs = _BANDS
    interior = (nx - 2 * bs) * (ny - bt - bf) * (nz - 2 * bs)
    assert band.shape[1] == full.shape[1] - 8 * interior  # K=8 slots/cell
    # at the bench shape (64, 48, 64)@(6, 4, 4) the same formula keeps 39%
    # every kept live row exists in the full extraction (same op math)
    assert int(surface_band_uncovered(b, _GRID, _BANDS)) == 0


def test_band_frame_matches_full_frame():
    """Pool frame from band slots == from every slot: culled interior slots
    never win the min-depth z-buffer (that is the whole point)."""
    config, _, b = _pool()
    view = jnp.asarray(_VIEW)
    rc_full = RenderConfig(camera=_CAM, quality="particle", max_radius_px=6)
    rc_band = dc.replace(rc_full, surface_bands=_BANDS)
    img_full = np.asarray(render_frame_buckets(b, view, rc_full,
                                               interpret=True))
    img_band = np.asarray(render_frame_buckets(b, view, rc_band,
                                               interpret=True,
                                               grid_res=_GRID))
    diff = np.any(img_full != img_band, axis=-1)
    assert diff.sum() <= 5, f"{diff.sum()} differing pixels"


def test_band_frame_matches_with_thickness():
    """Thickness stays exact under bands: the additive deposit rides the
    ALL-cells cell-granularity splats, not the banded depth rows."""
    config, _, b = _pool()
    view = jnp.asarray(_VIEW)
    rc_full = RenderConfig(camera=_CAM, quality="particle", max_radius_px=6,
                           ssfr=SSFRParams(thickness_pass=True,
                                           thickness_scale=0.3))
    rc_band = dc.replace(rc_full, surface_bands=_BANDS)
    img_full = np.asarray(render_frame_buckets(b, view, rc_full,
                                               interpret=True))
    img_band = np.asarray(render_frame_buckets(b, view, rc_band,
                                               interpret=True,
                                               grid_res=_GRID))
    diff = np.any(img_full != img_band, axis=-1)
    assert diff.sum() <= 5, f"{diff.sum()} differing pixels"


def test_certificate_fires_for_mid_grid_surface():
    """A pool whose free surface sits mid-grid (no air-window cropping) has
    near-air cells outside every band: the counter must be nonzero — the
    signal that surface_bands is the wrong recipe for this state."""
    config, _, b = _pool(full_height=False)
    assert int(surface_band_uncovered(b, _GRID, _BANDS)) > 0


def test_degenerate_bands_fall_back_to_full():
    """Bands covering the whole grid: extraction falls back to every slot
    (identical rows, same order)."""
    config, _, b = _pool()
    view = jnp.asarray(_VIEW)
    full = np.asarray(extract_slot_splats(b, view, _CAM))
    fb = np.asarray(extract_band_slot_splats(b, view, _CAM, _GRID,
                                             (8, 8, 8)))
    np.testing.assert_array_equal(full, fb)


def test_full_frame_step_honors_particle_quality():
    """make_full_frame_step(quality=particle) == the post-hoc
    render_frame_buckets(particle) frame on the stepped state — the
    regression test for the round-4/5 bench bug (it silently rendered the
    kernel-emitted CELL splats; at 1080p that meant pinholes sold as
    'watertight particle quality')."""
    config, fluid, b = _pool()
    view = jnp.asarray(_VIEW)
    rc = RenderConfig(camera=_CAM, quality="particle", max_radius_px=6)
    bg = background_for_view(rc, view)
    step = make_full_frame_step(config, rc, 2, donate=False, interpret=True)
    b1, img_step = step(b, fluid, (), view, bg)

    from mpm_tpu.render.pipeline import frame_to_u8

    img_posthoc = frame_to_u8(render_frame_buckets(
        b1, view, rc, interpret=True, bg=(bg[0], bg[1])))
    np.testing.assert_array_equal(np.asarray(img_step),
                                  np.asarray(img_posthoc))


def test_full_frame_step_with_bands_matches():
    """The one-jit frame step with surface_bands == without, on the pool
    (certificate holds on the stepped state too)."""
    config, fluid, b = _pool()
    view = jnp.asarray(_VIEW)
    rc = RenderConfig(camera=_CAM, quality="particle", max_radius_px=6)
    rc_band = dc.replace(rc, surface_bands=_BANDS)
    bg = background_for_view(rc, view)
    step = make_full_frame_step(config, rc, 2, donate=False, interpret=True)
    step_b = make_full_frame_step(config, rc_band, 2, donate=False,
                                  interpret=True)
    b1, img = step(b, fluid, (), view, bg)
    b2, img_b = step_b(b, fluid, (), view, bg)
    assert int(surface_band_uncovered(b1, _GRID, _BANDS)) == 0
    diff = np.any(np.asarray(img) != np.asarray(img_b), axis=-1)
    assert diff.sum() <= 5, f"{diff.sum()} differing pixels"


def test_min_top_band_is_minimal():
    """surface_band_min_top returns the smallest bt whose certificate
    reads 0 (the one-jit band fit bench.py uses: a search over candidate
    bt values would recompile the counter per candidate)."""
    from mpm_tpu.render.splat import surface_band_min_top

    bt_top, bf, bs = _BANDS
    for full_height in (True, False):
        config, _, b = _pool(full_height)
        bt = int(surface_band_min_top(b, _GRID, bf, bs))
        ny = _GRID[1]
        assert 0 < bt < ny
        assert int(surface_band_uncovered(b, _GRID, (bt, bf, bs))) == 0
        assert int(surface_band_uncovered(b, _GRID, (bt - 1, bf, bs))) > 0
