"""Static fluid crop (camera.crop_for_aabb -> RenderConfig.crop).

The image-space SSFR passes (sphere dilation O(R^2), bilateral blur, shade
+ refraction gather) scale with PIXELS, and at the official bench camera
the 64^3 domain projects to only 43% of the 1080p frame (ARCHITECTURE.md
"Render roofline") — the reference rasterizes fluid-only fragments for
free in hardware (billboard discs, multi_mesh/billboard_sphere.gdshader),
so restricting the compute chain to where fluid can exist is the TPU
analogue of fragment-level early-out.

The correctness claim: the crop is VALUE-PRESERVING. Physics clamps
positions to the domain (SimConfig.dres), central projection maps the
domain AABB inside the convex hull of its projected corners, and the
margin covers the dilation radius + the normals' roll neighborhood — so
every pixel the full-frame chain would shade lies strictly inside the
crop, and the cropped chain computes IDENTICAL values there (scatter-min
is order-free, blur taps beyond the crop see the same BG_DEPTH the full
frame holds there). The frame with crop must equal the frame without,
bit-for-bit, at refraction_downsample=1.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mpm_tpu.core.params import FluidParams, SimConfig
from mpm_tpu.core.state import make_state
from mpm_tpu.models.emitters import box_lattice
from mpm_tpu.ops import bucketed
from mpm_tpu.render import Camera, RenderConfig, SSFRParams
from mpm_tpu.render.camera import crop_for_aabb, look_at
from mpm_tpu.render.pipeline import (
    background_for_view,
    domain_crop,
    make_full_frame_step,
    render_frame_buckets,
)


def _scene(grid=(16, 16, 16)):
    pos = box_lattice(grid, (10.0, 6.0, 10.0), 0.8, center=(8.0, 6.0, 8.0))
    config = SimConfig(grid_res=grid, num_particles=pos.shape[0],
                       substeps=2, bin_capacity=8)
    fluid = FluidParams.create(dim=3, eos_stiffness=4.0, eos_power=4.0)
    return config, fluid, make_state(pos)


_CAM = Camera(width=512, height=384)
_VIEW = look_at((40.0, 30.0, 40.0), (8.0, 6.0, 8.0))


def test_crop_rect_is_conservative_and_aligned():
    """Every projected particle pixel (+ dilation radius) lands strictly
    inside the crop; the rect is lane/sublane aligned and strictly smaller
    than the frame for this camera."""
    config, _, state = _scene()
    r = 6
    crop = crop_for_aabb(_CAM, _VIEW, (0.0, 0.0, 0.0), config.dres,
                         margin=r + 8)
    assert crop is not None
    y0, x0, ch, cw = crop
    assert cw % 128 == 0 and ch % 8 == 0
    assert 0 <= x0 and x0 + cw <= _CAM.width
    assert 0 <= y0 and y0 + ch <= _CAM.height
    assert ch * cw < _CAM.width * _CAM.height

    # project every particle; the splat disc (center +- r) must fit
    v = _VIEW[:3, :3] @ np.asarray(state.pos) + _VIEW[:3, 3][:, None]
    depth = -v[2]
    f = _CAM.focal_px
    px = _CAM.width / 2.0 + f * v[0] / depth
    py = _CAM.height / 2.0 - f * v[1] / depth
    assert px.min() - r > x0 and px.max() + r < x0 + cw
    assert py.min() - r > y0 and py.max() + r < y0 + ch


def test_crop_frame_bitexact_default_mode():
    """quality=cell DEFAULT chain with the crop == without, bit-for-bit
    (refraction_downsample=1, the exact reference semantics)."""
    config, _, state = _scene()
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(state)
    view = jnp.asarray(_VIEW)
    rc = RenderConfig(camera=_CAM, max_radius_px=6)
    rc_crop = domain_crop(rc, config, _VIEW)
    assert rc_crop.crop is not None

    img_full = render_frame_buckets(b, view, rc, interpret=True)
    img_crop = render_frame_buckets(b, view, rc_crop, interpret=True)
    np.testing.assert_array_equal(np.asarray(img_crop), np.asarray(img_full))


def test_crop_frame_bitexact_particle_quality_thickness():
    """quality=particle + thickness_pass through the crop: still
    bit-exact (the deposit scatter and its Gaussian blur are local to the
    crop; the margin covers the blur footprint of every deposit)."""
    config, _, state = _scene()
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(state)
    view = jnp.asarray(_VIEW)
    rc = RenderConfig(camera=_CAM, max_radius_px=6, quality="particle",
                      ssfr=SSFRParams(thickness_pass=True,
                                      thickness_scale=0.3))
    rc_crop = domain_crop(rc, config, _VIEW)
    assert rc_crop.crop is not None

    img_full = render_frame_buckets(b, view, rc, interpret=True)
    img_crop = render_frame_buckets(b, view, rc_crop, interpret=True)
    np.testing.assert_array_equal(np.asarray(img_crop), np.asarray(img_full))


def test_crop_none_when_camera_inside_domain():
    """A camera inside (or clipping) the domain gets NO crop — the
    corner-hull bound is invalid there, so crop_for_aabb refuses."""
    config, _, _ = _scene()
    inside = look_at((8.0, 6.0, 8.0), (0.0, 0.0, 0.0))
    assert crop_for_aabb(_CAM, inside, (0.0, 0.0, 0.0), config.dres) is None
    rc = RenderConfig(camera=_CAM)
    assert domain_crop(rc, config, inside).crop is None


def test_crop_ignored_for_debug_modes():
    """Non-DEFAULT modes ignore the crop (full-frame debug composites) —
    same frame with and without a crop set."""
    import dataclasses as dc

    config, _, state = _scene()
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(state)
    view = jnp.asarray(_VIEW)
    rc = RenderConfig(camera=_CAM, mode="velocity_spheres")
    crop = crop_for_aabb(_CAM, _VIEW, (0.0, 0.0, 0.0), config.dres,
                         margin=14)
    rc_crop = dc.replace(rc, crop=crop)
    img_a = render_frame_buckets(b, view, rc, interpret=True)
    img_b = render_frame_buckets(b, view, rc_crop, interpret=True)
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))


def test_crop_distributed_composite_matches():
    """The sharded frame step rides the crop too: per-shard crop-sized
    z-buffers (less ICI per pmin) -> same frame as the single-device
    cropped step, within the test_dist_render budget."""
    from mpm_tpu.parallel import domain
    from mpm_tpu.parallel.render import make_sharded_frame_step

    config, fluid, state = _scene()
    rc = domain_crop(RenderConfig(camera=Camera(width=384, height=256)),
                     config, _VIEW)
    assert rc.crop is not None
    view = jnp.asarray(_VIEW)
    bg = background_for_view(rc, view)
    b0 = jax.jit(lambda s: bucketed.from_simstate(s, config))(state)

    single = make_full_frame_step(config, rc, 2, donate=False,
                                  interpret=True)
    _, img1 = single(b0, fluid, (), view, bg)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("x",))
    sharded = make_sharded_frame_step(config, mesh, rc, substeps=2,
                                      donate=False, interpret=True)
    _, img2 = sharded(domain.shard_bucket_state(b0, mesh), fluid, (),
                      view, bg)
    a = np.asarray(img1).astype(np.int32)
    b = np.asarray(img2).astype(np.int32)
    assert a.shape == b.shape
    assert np.mean(np.abs(a - b)) < 0.5
