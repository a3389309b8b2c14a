"""The SSFR thickness pass (render/splat.thickness_deposit +
ssfr.thickness_map feeding Beer's law).

The reference never built this pass — it admits so in-source ("Step 2: get
fluid depth (didn't have time for that)",
screen_space_fluid_rendering.gd:429) and shades with a constant `thickness`
uniform (fluid_render_fixed_depth.glsl:142-146). Default SSFRParams keep
that constant EXACTLY (thickness_pass=False changes nothing — pinned here);
thickness_pass=True is the matching-or-beating extension: per-pixel
material thickness drives Beer's-law transmittance and the refraction
offset."""

import numpy as np
import jax
import jax.numpy as jnp

from mpm_tpu.core.params import FluidParams, SimConfig
from mpm_tpu.core.state import make_state
from mpm_tpu.models.emitters import box_lattice
from mpm_tpu.ops import bucketed
from mpm_tpu.render import Camera, RenderConfig
from mpm_tpu.render.camera import look_at
from mpm_tpu.render.extract_kernel import extract_cell_splats
from mpm_tpu.render.pipeline import (
    SSFRParams,
    background_for_view,
    render_frame_buckets,
)
from mpm_tpu.render.splat import thickness_deposit


def _setup(grid=(16, 16, 16), box=(10.0, 6.0, 10.0), center=(8.0, 6.0, 8.0)):
    pos = box_lattice(grid, box, 0.8, center=center)
    config = SimConfig(grid_res=grid, num_particles=pos.shape[0],
                       substeps=2, bin_capacity=8)
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(make_state(pos))
    cam = Camera(width=128, height=96)
    view = jnp.asarray(look_at((40.0, 30.0, 40.0), (8.0, 6.0, 8.0)))
    return config, b, cam, view


def test_deposit_conserves_material():
    """The additive splat deposits exactly 2r per live on-screen splat —
    nothing gained, nothing lost (the normalized blur preserves the sum
    too)."""
    from mpm_tpu.render.extract_kernel import CELL_BG
    from mpm_tpu.render.ssfr import gaussian_blur

    _, b, cam, view = _setup()
    cells = extract_cell_splats(b, view, cam, interpret=True)
    t = jax.jit(lambda c: thickness_deposit(c, cam, sphere_radius=1.0))(cells)
    c = np.asarray(cells)
    on = (
        (np.floor(c[0]) >= 0) & (np.floor(c[0]) < cam.width)
        & (np.floor(c[1]) >= 0) & (np.floor(c[1]) < cam.height)
        & (c[2] < CELL_BG)
    )
    # cells carry their live-particle count (row 4): the deposit is exact
    # per-PARTICLE material (count * 2r), weighted by the projected cell
    # footprint (focal/z)^2 so the blurred field reads in world units
    expect = (2.0 * c[4][on] * (cam.focal_px / c[2][on]) ** 2).sum()
    np.testing.assert_allclose(float(np.asarray(t).sum()), expect, rtol=1e-5)
    assert c[4][on].sum() >= on.sum()  # count >= 1 per live cell
    tb = jax.jit(lambda x: gaussian_blur(x, 6))(t)
    np.testing.assert_allclose(float(np.asarray(tb).sum()),
                               float(np.asarray(t).sum()), rtol=1e-4)


def test_default_off_is_reference_exact():
    """thickness_pass=False (the default) must produce the identical frame
    as before the pass existed — the constant-uniform reference semantics."""
    config, b, cam, view = _setup()
    rc0 = RenderConfig(camera=cam)
    assert rc0.ssfr.thickness_pass is False
    img0 = np.asarray(render_frame_buckets(b, view, rc0, interpret=True))
    # a config that differs ONLY in the (unused-when-off) thickness knobs
    rc1 = RenderConfig(camera=cam, ssfr=SSFRParams(thickness_scale=99.0,
                                                   thickness_blur_radius=1))
    img1 = np.asarray(render_frame_buckets(b, view, rc1, interpret=True))
    np.testing.assert_array_equal(img0, img1)


def test_thickness_darkens_thick_columns():
    """Beer's law with the real pass: a pixel behind more material
    transmits less background light than one behind little material.
    Compare the same scene shaded with/without the pass: with the pass on,
    the transmitted component varies over the fluid (the constant cannot)."""
    config, b, cam, view = _setup(box=(10.0, 10.0, 10.0),
                                  center=(8.0, 8.0, 8.0))
    base = SSFRParams(refraction_strength=0.0)  # isolate Beer from the
    # refraction offset so the comparison is purely transmittance
    rc_off = RenderConfig(camera=cam, ssfr=base)
    rc_on = RenderConfig(
        camera=cam,
        ssfr=SSFRParams(refraction_strength=0.0, thickness_pass=True,
                        thickness_scale=0.3))  # small test scene: columns
    # are only ~6 world units; the flagship default 0.05 would sit below
    # the minimum-thickness floor
    img_off = np.asarray(
        render_frame_buckets(b, view, rc_off, interpret=True), np.float64)
    img_on = np.asarray(
        render_frame_buckets(b, view, rc_on, interpret=True), np.float64)
    assert img_off.shape == img_on.shape
    diff = np.abs(img_on - img_off).sum(-1)
    assert (diff > 1e-3).mean() > 0.01, "thickness pass changed nothing"
    # the per-pixel thickness is >= the constant minimum everywhere, so
    # Beer transmits LESS (or equal) everywhere: the thick image is not
    # brighter than the constant one where the fluid covers the pixel
    # (tiny float jitter tolerated)
    fluid = diff > 1e-3
    assert (img_on.sum(-1)[fluid] <= img_off.sum(-1)[fluid] + 1e-6).mean() > 0.95


def test_distributed_thickness_composite():
    """Distributed: the psum of per-shard deposits equals the single-device
    deposit (addition over disjoint cell subsets; f32 order tolerance)."""
    from jax.sharding import Mesh

    from mpm_tpu.parallel import domain
    from mpm_tpu.parallel.render import make_sharded_frame_step
    from mpm_tpu.render.pipeline import make_full_frame_step

    config, b, cam, view = _setup()
    fluid = FluidParams.create(dim=3, eos_stiffness=4.0, eos_power=4.0)
    rc = RenderConfig(camera=cam, ssfr=SSFRParams(thickness_pass=True))
    bg = background_for_view(rc, view)

    single = make_full_frame_step(config, rc, 2, donate=False, interpret=True)
    _, img1 = single(b, fluid, (), view, bg)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("x",))
    sharded = make_sharded_frame_step(config, mesh, rc, substeps=2,
                                      donate=False, interpret=True)
    _, img2 = sharded(domain.shard_bucket_state(b, mesh), fluid, (),
                      view, bg)
    a = np.asarray(img1).astype(np.int32)
    c = np.asarray(img2).astype(np.int32)
    assert np.mean(np.abs(a - c)) < 0.5


def test_deposit_blur_matches_analytic_column():
    """Error bound vs an analytic column (VERDICT r4 next #4): a solid
    lattice box at spacing s with r = s/2 carries exactly its geometric
    depth extent as material (each particle's center chord 2r = s; a ray
    through the box crosses extent/s particles per world-area unit). The
    footprint-normalized deposit + area-preserving blur must read the box's
    world depth extent on interior pixels."""
    from mpm_tpu.render.ssfr import gaussian_blur

    grid = (24, 24, 24)
    extent = 10.0  # box depth along the view axis
    pos = box_lattice(grid, (12.0, 12.0, extent), 1.0,
                      center=(12.0, 12.0, 12.0))
    config = SimConfig(grid_res=grid, num_particles=pos.shape[0],
                       substeps=2, bin_capacity=8)
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(make_state(pos))
    cam = Camera(width=160, height=120)
    # head-on along -z: rays through the box travel exactly `extent`
    view = jnp.asarray(look_at((12.0, 12.0, 60.0), (12.0, 12.0, 12.0)))
    cells = extract_cell_splats(b, view, cam, interpret=True)
    t = thickness_deposit(cells, cam, sphere_radius=0.5)
    tb = np.asarray(jax.jit(lambda x: gaussian_blur(x, 6))(t))
    # interior plateau: central quarter of the box's projection
    f = cam.focal_px
    z_face = 60.0 - 12.0 - extent / 2.0  # front face distance
    half_px = int(0.25 * 6.0 * f / z_face)  # quarter of half-width 6.0
    cy, cx = cam.height // 2, cam.width // 2
    plateau = tb[cy - half_px: cy + half_px + 1,
                 cx - half_px: cx + half_px + 1]
    err = np.abs(plateau - extent) / extent
    assert err.mean() < 0.15, (
        f"mean plateau error {err.mean():.3f} (plateau mean "
        f"{plateau.mean():.2f} vs analytic {extent})")
    assert err.max() < 0.35, f"max plateau error {err.max():.3f}"
