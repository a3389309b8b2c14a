"""Headless renderer tests (SSFR pipeline, SURVEY.md §2.2 R1-R10)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpm_tpu.models.scenes import fluid_3d
from mpm_tpu.render import (
    Camera,
    RenderConfig,
    SSFRParams,
    default_view,
    make_renderer,
    write_png,
)
from mpm_tpu.render.camera import linear_depth_to_ndc, ndc_depth_to_linear
from mpm_tpu.render.pipeline import (
    RENDER_DEPTH_DEBUG,
    RENDER_NONE,
    RENDER_VELOCITY_SPHERES,
)


@pytest.fixture(scope="module")
def small_scene():
    sc = fluid_3d(grid_res=16, box=8.0, spacing=0.8)
    vel_mag = jnp.linalg.norm(sc.state.vel, axis=0)
    cam = Camera(width=160, height=120)
    view = jnp.asarray(default_view(sc.config.grid_res))
    return sc, vel_mag, cam, view


@pytest.mark.parametrize(
    "mode", ["default", RENDER_VELOCITY_SPHERES, RENDER_DEPTH_DEBUG, RENDER_NONE]
)
def test_render_modes_produce_finite_frames(small_scene, mode):
    sc, vel_mag, cam, view = small_scene
    rc = RenderConfig(camera=cam, mode=mode)
    img = np.asarray(make_renderer(rc)(sc.state.pos, vel_mag, view))
    assert img.shape == (cam.height, cam.width, 3)
    assert np.all(np.isfinite(img))
    assert img.max() > 0.01  # something visible


def test_fluid_is_visible_in_default_mode(small_scene):
    """The fluid must change pixels vs background-only rendering."""
    sc, vel_mag, cam, view = small_scene
    fluid_img = np.asarray(
        make_renderer(RenderConfig(camera=cam, mode="default"))(
            sc.state.pos, vel_mag, view
        )
    )
    bg_img = np.asarray(
        make_renderer(RenderConfig(camera=cam, mode=RENDER_NONE))(
            sc.state.pos, vel_mag, view
        )
    )
    # the default camera frames 64^3 domains; the tiny 16^3 test box covers
    # only ~0.5% of the frame
    changed = np.mean(np.any(np.abs(fluid_img - bg_img) > 0.02, axis=-1))
    assert changed > 0.002, "fluid did not render"


def test_lod_ratio_reduces_coverage(small_scene):
    """sphere_render_ratio reproduces the reference's LOD drop
    (depth_map.gdshader:23-26): fewer instances -> less depth coverage."""
    from mpm_tpu.render.splat import splat_particles, BG_DEPTH

    sc, vel_mag, cam, view = small_scene

    @jax.jit
    def cover(ratio_full):
        full = splat_particles(sc.state.pos, vel_mag, view, cam, sphere_render_ratio=1.0)
        tenth = splat_particles(sc.state.pos, vel_mag, view, cam, sphere_render_ratio=0.1)
        return jnp.sum(full.depth < BG_DEPTH), jnp.sum(tenth.depth < BG_DEPTH)

    c_full, c_tenth = cover(1.0)
    assert int(c_tenth) < int(c_full)
    assert int(c_tenth) > 0


def test_depth_linearization_roundtrip():
    cam = Camera()
    lin = jnp.asarray([1.0, 10.0, 100.0, 1000.0])
    rt = ndc_depth_to_linear(linear_depth_to_ndc(lin, cam), cam)
    np.testing.assert_allclose(np.asarray(rt), np.asarray(lin), rtol=1e-4)


def test_png_write_native_and_fallback(tmp_path, small_scene):
    sc, vel_mag, cam, view = small_scene
    img = np.asarray(
        make_renderer(RenderConfig(camera=cam, mode="default"))(
            sc.state.pos, vel_mag, view
        )
    )
    path = str(tmp_path / "f.png")
    write_png(path, img)
    from mpm_tpu.render.image import read_png_rgb

    rt = read_png_rgb(path)
    assert rt.shape == (cam.height, cam.width, 3)


def test_render_2d_scene():
    """2D visualization (main_2d analogue): dam-break renders visible fluid."""
    import jax

    from mpm_tpu import get_scene, make_step
    from mpm_tpu.render.render2d import render_2d

    sc = get_scene("dam_break_2d")
    step = make_step(sc.config, mode="reference", donate=False)
    state = step(sc.state, sc.fluid, ())
    vel_mag = jnp.linalg.norm(state.vel, axis=0)
    img = np.asarray(jax.jit(
        lambda p, v: render_2d(p, v, sc.config.grid_res, scale=4)
    )(state.pos, vel_mag))
    assert img.shape == (256, 256, 3)
    assert np.all(np.isfinite(img))
    # 1,024 particles land on ~1.6% of pixels at this scale
    coverage = np.mean(img[..., 2] > 0.2)
    assert 0.005 < coverage < 0.8


def test_bucket_render_path_matches_particle_path():
    """The Pallas cell-extraction render path must agree with the particle
    z-buffer path up to within-cell occlusion (sub-cell-scale differences on
    a small fraction of pixels)."""
    import jax

    from mpm_tpu.models.scenes import fluid_3d
    from mpm_tpu.ops import bucketed
    from mpm_tpu.render import Camera, RenderConfig, default_view
    from mpm_tpu.render.pipeline import render_frame, render_frame_buckets

    sc = fluid_3d(grid_res=16, box=8.0, spacing=0.8)
    config = sc.config.replace(bin_capacity=8)
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(sc.state)
    cam = Camera(width=160, height=96)
    rc = RenderConfig(camera=cam, mode="depth_debug")
    view = jnp.asarray(default_view(config.grid_res))

    pos = b.pos.reshape(3, -1)
    live = b.mass.reshape(-1) > 0
    pos = jnp.where(live, pos, -1e6)
    vmag = jnp.linalg.norm(b.vel.reshape(3, -1), axis=0)
    img_p = np.asarray(render_frame(pos, vmag, view, rc))
    img_b = np.asarray(render_frame_buckets(b, view, rc, interpret=True))
    # depth_debug greyscale images; identical where no within-cell occlusion
    close = np.isclose(img_p, img_b, atol=5e-3).mean()
    assert close > 0.97, f"only {close:.3f} of pixels match"


def test_hud_burn_in():
    from mpm_tpu.render.hud import burn_in_hud
    from mpm_tpu.utils.timing import FrameStats

    stats = FrameStats()
    for _ in range(5):
        stats.tick()
    img = np.zeros((120, 200, 3), np.uint8)
    out = burn_in_hud(img, stats, extra="N=1000")
    assert out.max() > 0  # something was drawn
    img_f = np.zeros((120, 200, 3), np.float32)
    burn_in_hud(img_f, stats)
    assert img_f.max() > 0


def test_cubemap_png_loader(tmp_path):
    from mpm_tpu.render.background import load_cubemap, make_cubemap_sampler
    from mpm_tpu.render.image import write_png

    for i in range(1, 7):
        face = np.full((16, 16, 3), i * 30, np.uint8)
        write_png(str(tmp_path / f"sky-{i}.png"), face)
    faces = load_cubemap(str(tmp_path))
    assert faces.shape == (6, 16, 16, 3)
    sampler = make_cubemap_sampler(faces)
    dirs = jnp.asarray([[1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    rgb = np.asarray(sampler(dirs))
    np.testing.assert_allclose(rgb[0], 30 / 255.0, atol=1e-3)  # +x face 1
    np.testing.assert_allclose(rgb[1], 4 * 30 / 255.0, atol=1e-3)  # -y face 4


def test_lit_spheres_mode():
    """R2 parity: the lit billboard-sphere debug view renders shaded spheres
    with impostor normals (billboard_sphere.gdshader:46-88)."""
    import jax

    from mpm_tpu.models.scenes import fluid_3d
    from mpm_tpu.ops import bucketed
    from mpm_tpu.render import Camera, RenderConfig, default_view
    from mpm_tpu.render.pipeline import render_frame_buckets

    sc = fluid_3d(grid_res=16, box=8.0, spacing=0.8)
    config = sc.config.replace(bin_capacity=8)
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(sc.state)
    cam = Camera(width=160, height=96)
    rc = RenderConfig(camera=cam, mode="lit_spheres")
    view = jnp.asarray(default_view(config.grid_res))
    img = np.asarray(render_frame_buckets(b, view, rc, interpret=True))
    assert img.shape == (96, 160, 3)
    assert np.all(np.isfinite(img))
    # the fluid block must be visible (bluish spheres differ from the bg)
    rc_none = RenderConfig(camera=cam, mode="none")
    bg = np.asarray(render_frame_buckets(b, view, rc_none, interpret=True))
    changed = np.abs(img - bg).max(axis=-1) > 0.05
    assert changed.mean() > 0.002  # small box, distant default camera


def test_pallas_blur_matches_xla():
    """The Pallas bilateral blur (render/blur_kernel.py, interpret mode on
    CPU) must match the XLA path at equal radius caps. The kernels differ
    only in exp factorization (exp(a)*exp(b) vs exp(a+b)) — ulp-level."""
    from mpm_tpu.render.blur_kernel import blur_depth_pallas, blur_supported
    from mpm_tpu.render.splat import BG_DEPTH
    from mpm_tpu.render.ssfr import SSFRParams, bilateral_blur_1d

    cam = Camera(width=256, height=64)
    assert blur_supported(cam)
    rng = np.random.default_rng(7)
    depth = np.full((64, 256), BG_DEPTH, np.float32)
    # a blob of fluid depths with structure + a hole
    depth[10:50, 40:200] = 30.0 + rng.uniform(-2, 2, (40, 160)).astype(np.float32)
    depth[20:25, 90:110] = 12.0  # near-camera patch (bigger adaptive radius)
    depth = jnp.asarray(depth)

    r = 6
    params = SSFRParams(blur_tap_radius=r, max_filter_size=r)
    ref = bilateral_blur_1d(depth, 1, params, cam)
    ref = bilateral_blur_1d(ref, 0, params, cam)

    got = blur_depth_pallas(
        depth, cam, radius=r, max_filter=r,
        blur_filter_size=params.blur_filter_size * params.particle_sphere_radius,
        depth_threshold=params.particle_sphere_radius * params.blur_depth_scale,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4,
                               rtol=1e-5)


def test_pallas_blur_tiled_blocks_match_xla():
    """Multi-block grids (the round-4 tiled passes): 320x512 tiles the X
    pass into two 160-row blocks and the Y pass into two 256-lane blocks.
    Fluid confined to the upper-left quadrant makes block tap bounds
    DIFFER (empty blocks run zero taps) — per-block dynamic trip counts
    must not change results vs the XLA oracle (masked taps are exact
    zeros), and block seams must be invisible (each block reads its own
    halo-padded input)."""
    from mpm_tpu.render.blur_kernel import _block, blur_depth_pallas
    from mpm_tpu.render.splat import BG_DEPTH
    from mpm_tpu.render.ssfr import SSFRParams, bilateral_blur_1d

    h, w = 320, 512
    assert _block(h, 8, 160) == 160 and _block(w, 128, 384) == 256
    cam = Camera(width=w, height=h)
    rng = np.random.default_rng(11)
    depth = np.full((h, w), BG_DEPTH, np.float32)
    # fluid crosses the X-pass row seam (rows 140..180 span blocks 0/1)
    # but leaves the right Y-pass block (lanes 256+) empty
    depth[100:180, 30:220] = 25.0 + rng.uniform(-2, 2, (80, 190)).astype(np.float32)
    depth[150:160, 200:250] = 10.0  # near patch straddling the seam region
    depth = jnp.asarray(depth)

    r = 6
    params = SSFRParams(blur_tap_radius=r, max_filter_size=r)
    ref = bilateral_blur_1d(depth, 1, params, cam)
    ref = bilateral_blur_1d(ref, 0, params, cam)
    got = blur_depth_pallas(
        depth, cam, radius=r, max_filter=r,
        blur_filter_size=params.blur_filter_size * params.particle_sphere_radius,
        depth_threshold=params.particle_sphere_radius * params.blur_depth_scale,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4,
                               rtol=1e-5)


def test_particle_quality_resolves_within_cell_occlusion():
    """RenderConfig.quality="particle" z-buffers every live slot (the
    reference's per-instance raster fidelity, billboard_sphere.gdshader):
    two particles in the SAME grid cell projecting to different pixels must
    BOTH splat; the "cell" fast path keeps only the cell's nearest."""
    import jax

    from mpm_tpu.core.params import SimConfig
    from mpm_tpu.core.state import make_state
    from mpm_tpu.ops import bucketed
    from mpm_tpu.render import Camera, RenderConfig
    from mpm_tpu.render.camera import look_at, view_to_screen, world_to_view
    from mpm_tpu.render.pipeline import render_frame_buckets
    from mpm_tpu.render.splat import extract_slot_splats

    config = SimConfig(grid_res=(16, 16, 16), num_particles=2, bin_capacity=8)
    # both particles in cell (8, 8, 8), separated along x within the cell
    pos = np.asarray([[8.15, 8.5, 8.5], [8.85, 8.5, 8.5]], np.float32)
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(make_state(pos))
    cam = Camera(width=160, height=120)
    view = jnp.asarray(look_at((8.5, 8.5, 24.0), (8.5, 8.5, 8.5)))

    slots = np.asarray(extract_slot_splats(b, view, cam))
    from mpm_tpu.render.extract_kernel import CELL_BG

    live = slots[2] < CELL_BG
    assert live.sum() == 2
    px = np.floor(slots[0][live]).astype(int)
    assert px[0] != px[1]  # they land on distinct pixel columns

    from mpm_tpu.render.extract_kernel import extract_cell_splats
    from mpm_tpu.render.splat import BG_DEPTH, splat_cells

    def fluid_pixels(pts):
        bufs = splat_cells(pts, cam, sphere_radius=1.0, max_radius_px=0)
        return int(np.sum(np.asarray(bufs.depth) < BG_DEPTH))

    cells = extract_cell_splats(b, view, cam, interpret=True)
    assert fluid_pixels(cells) == 1          # cell path: nearest-only
    assert fluid_pixels(jnp.asarray(slots)) == 2  # particle path: both


def test_particle_quality_full_pipeline_finite():
    import jax

    from mpm_tpu.models.scenes import fluid_3d
    from mpm_tpu.ops import bucketed
    from mpm_tpu.render import Camera, RenderConfig, default_view
    from mpm_tpu.render.pipeline import render_frame_buckets

    sc = fluid_3d(grid_res=16, box=8.0, spacing=0.8)
    config = sc.config.replace(bin_capacity=8)
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(sc.state)
    cam = Camera(width=160, height=96)
    rc = RenderConfig(camera=cam, quality="particle")
    view = jnp.asarray(default_view(config.grid_res))
    img = np.asarray(render_frame_buckets(b, view, rc, interpret=True))
    assert img.shape == (96, 160, 3) and np.all(np.isfinite(img))
    assert img.max() > 0.01


def test_inkernel_splat_emission_matches_extract():
    """Kernel F's emit_splats output (the reference's in-g2p render-texture
    write, g2p.glsl:149-150) must equal the post-hoc extraction kernel on
    the stepped state, and the sentinel constants must agree."""
    import jax

    from mpm_tpu.models.scenes import fluid_3d
    from mpm_tpu.ops import bucketed
    from mpm_tpu.ops.pallas import fused
    from mpm_tpu.render import Camera, default_view
    from mpm_tpu.render.extract_kernel import CELL_BG, extract_cell_splats

    assert fused._CELL_BG == CELL_BG

    sc = fluid_3d(grid_res=16, box=8.0, spacing=0.8)
    config = sc.config.replace(bin_capacity=8)
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(sc.state)
    cam = Camera(width=160, height=96)
    view = jnp.asarray(default_view(config.grid_res))
    rs = fused.render_scals_for(view, cam)

    b2 = fused.substep_fused(b, config, sc.fluid, (), interpret=True)
    b2e, splats = fused.substep_fused_emit(b, config, sc.fluid, (), rs,
                                           interpret=True)
    for f in ("pos", "vel", "C", "mass", "ids"):
        np.testing.assert_array_equal(np.asarray(getattr(b2, f)),
                                      np.asarray(getattr(b2e, f)))
    want = extract_cell_splats(b2, view, cam, interpret=True)
    np.testing.assert_allclose(np.asarray(splats), np.asarray(want),
                               rtol=1e-6, atol=1e-5)


def test_full_frame_step_matches_separate_path():
    """make_full_frame_step (one jit: substeps + in-kernel splat emission +
    SSFR + u8) must produce the same frame as stepping then rendering
    separately, and the same state."""
    import jax

    from mpm_tpu import make_step
    from mpm_tpu.models.scenes import fluid_3d
    from mpm_tpu.ops import bucketed
    from mpm_tpu.render import Camera, RenderConfig, default_view
    from mpm_tpu.render.pipeline import (
        background_for_view,
        frame_to_u8,
        make_full_frame_step,
        render_frame_buckets,
    )

    sc = fluid_3d(grid_res=16, box=8.0, spacing=0.8)
    config = sc.config.replace(bin_capacity=8)
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(sc.state)
    cam = Camera(width=160, height=96)
    rc = RenderConfig(camera=cam)
    view = jnp.asarray(default_view(config.grid_res))
    bg = background_for_view(rc, view)

    # NOTE: the outer jit around interpret-mode pallas trips an XLA:CPU
    # lowering-cache bug; call the unjitted composition here (the jitted
    # wrapper is exercised on the real chip by bench.py)
    from mpm_tpu.render.pipeline import emitting_frame_fn, render_frame_cells

    step = emitting_frame_fn(config, rc.camera, 2, interpret=True)
    s1, cells = step(b, sc.fluid, (), view)
    img1 = frame_to_u8(render_frame_cells(cells, view, rc, bg=bg))

    from mpm_tpu.ops.pallas import fused

    s2 = b
    for _ in range(2):
        s2 = fused.substep_fused(s2, config, sc.fluid, (), interpret=True)
    img2 = frame_to_u8(render_frame_buckets(s2, view, rc, interpret=True,
                                            bg=bg))
    np.testing.assert_array_equal(np.asarray(s1.pos), np.asarray(s2.pos))
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))


def test_inkernel_splat_emission_fixed_point():
    """Splat emission composes with int32 fixed-point grid accumulation
    (kernel P int32 -> kernel F emit): emitted splats still equal the
    post-hoc extraction on the stepped state."""
    import jax

    from mpm_tpu.models.scenes import fluid_3d
    from mpm_tpu.ops import bucketed
    from mpm_tpu.ops.pallas import fused
    from mpm_tpu.render import Camera, default_view
    from mpm_tpu.render.extract_kernel import extract_cell_splats

    sc = fluid_3d(grid_res=16, box=8.0, spacing=0.8)
    config = sc.config.replace(bin_capacity=8, fixed_point=True)
    if not fused.fused_supported(config):
        import pytest

        pytest.skip("fixed-point fused path unsupported at this config")
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(sc.state)
    cam = Camera(width=160, height=96)
    view = jnp.asarray(default_view(config.grid_res))
    rs = fused.render_scals_for(view, cam)
    b2, splats = fused.substep_fused_emit(b, config, sc.fluid, (), rs,
                                          interpret=True)
    want = extract_cell_splats(b2, view, cam, interpret=True)
    np.testing.assert_allclose(np.asarray(splats), np.asarray(want),
                               rtol=1e-6, atol=1e-5)


def test_refraction_downsample_close_to_exact():
    """refraction_downsample=N strides the refracted-background gather and
    nearest-upsamples; on a smooth background the result stays close to the
    exact reference-semantics sample (ds=1, the default)."""
    from mpm_tpu.render import Camera, SSFRParams
    from mpm_tpu.render import ssfr as S
    from mpm_tpu.render.background import make_cubemap_sampler

    cam = Camera(width=160, height=96)
    h, w = 96, 160
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # smooth background gradient; flat fluid slab in front of it
    bgc = jnp.asarray(np.stack([xs / w, ys / h, 0.5 * np.ones_like(xs)],
                               -1).astype(np.float32))
    bgd = jnp.full((h, w), 50.0, jnp.float32)
    depth = jnp.full((h, w), 20.0, jnp.float32)
    sampler = make_cubemap_sampler(None)
    view3 = jnp.eye(3)
    c1, _ = S.shade(depth, bgc, bgd, sampler, view3, SSFRParams(), cam)
    c2, _ = S.shade(depth, bgc, bgd, sampler, view3,
                    SSFRParams(refraction_downsample=2), cam)
    diff = np.abs(np.asarray(c1) - np.asarray(c2)).mean()
    assert np.isfinite(np.asarray(c2)).all()
    assert diff < 0.01, diff


def test_composite_threshold_matches_reference_semantics():
    """R9 (copy_texture.glsl:28-33): copy src over dst where |rgb| >=
    color_threshold, keep dst elsewhere."""
    from mpm_tpu.render.ssfr import composite_threshold

    dst = jnp.ones((4, 4, 3)) * 0.5
    src = jnp.zeros((4, 4, 3)).at[1, 1].set(0.2).at[2, 2].set(0.001)
    out = np.asarray(composite_threshold(dst, src, color_threshold=0.01))
    np.testing.assert_allclose(out[1, 1], 0.2)       # above threshold: src
    np.testing.assert_allclose(out[2, 2], 0.5)       # below: dst kept
    np.testing.assert_allclose(out[0, 0], 0.5)
