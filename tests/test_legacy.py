"""The rebuilt dormant render paths (render/legacy.py): R12 GPUParticles
packed-depth splat + texture contract, R13 legacy screen-quad SSFR.

Parity anchors (SURVEY.md §2.2 R12/R13):
- texture contract: width floor(sqrt(n))+1, texel index IS the particle id
  (MLSMPM3DFluidMultithreadGPU.cs:196-197, particle_shader.gdshader:12-20)
- 16.16 depth packing: ALBEDO = (d, fract(d*65536), 0); unpack
  floor(x*65536)/65536 + floor(y*65536)/65536^2
  (particle_depth_map.gdshader; screen_shader.gdshader:33-34)
- the color-blur `sample.r` quirk (bilateral_blur.gdshader, mode 1) is
  reproduced bit-for-bit, NOT fixed
"""

import numpy as np
import jax
import jax.numpy as jnp

from mpm_tpu import make_step
from mpm_tpu.core.params import SimConfig
from mpm_tpu.core.state import make_state
from mpm_tpu.models.emitters import box_lattice
from mpm_tpu.ops import bucketed
from mpm_tpu.render import Camera, RenderConfig
from mpm_tpu.render.camera import linear_depth_to_ndc, look_at
from mpm_tpu.render.legacy import (
    DEPTH_DISCARD,
    legacy_bilateral_blur_1d,
    legacy_color_blur_1d,
    legacy_quad_frame,
    pack_depth,
    packed_depth_splat,
    particle_pos_texture,
    particle_pos_texture_from_state,
    particles_from_texture,
    pos_texture_width,
    unpack_depth,
)
from mpm_tpu.render.splat import BG_DEPTH, splat_particles


def _bucket_scene(grid=(16, 16, 16), box=(8.0, 6.0, 8.0),
                  center=(8.0, 7.0, 8.0), spacing=0.8):
    pos = box_lattice(grid, box, spacing, center=center)
    config = SimConfig(grid_res=grid, num_particles=pos.shape[0],
                       substeps=2, bin_capacity=8)
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(make_state(pos))
    cam = Camera(width=128, height=96)
    view = jnp.asarray(look_at((40.0, 30.0, 40.0), (8.0, 6.0, 8.0)))
    return config, b, cam, view


# ---------------------------------------------------------------- packing


def test_pack_unpack_roundtrip():
    """16.16 two-channel packing reconstructs NDC depth to ~2^-32 (float32
    limited) — screen_shader.gdshader:33-34."""
    rng = np.random.default_rng(7)
    d = jnp.asarray(rng.uniform(0.0, 1.0, (64, 64)).astype(np.float32))
    rec = np.asarray(unpack_depth(pack_depth(d)))
    np.testing.assert_allclose(rec, np.asarray(d), atol=2e-6)
    # the high channel alone is only 16-bit: the low channel must carry
    # real information (otherwise the packing is pointless)
    hi_only = np.floor(np.asarray(d) * 65536.0) / 65536.0
    assert np.abs(rec - np.asarray(d)).max() < np.abs(
        hi_only - np.asarray(d)).max()


def test_pack_depth_channels():
    d = jnp.asarray([[0.5 + 3.0 / 65536.0 + 0.25 / 65536.0]], jnp.float32)
    p = np.asarray(pack_depth(d))[0, 0]
    assert p[0] == np.float32(d[0, 0])  # R = raw depth
    assert 0.0 <= p[1] < 1.0  # G = fract(d * 65536)
    assert p[2] == 0.0


# ------------------------------------------------------- texture contract


def test_pos_texture_width():
    # floor(sqrt(n)) + 1 (MLSMPM3DFluidMultithreadGPU.cs:196-197)
    assert pos_texture_width(157464) == 397
    assert pos_texture_width(1) == 2
    assert pos_texture_width(4) == 3


def test_texture_contract_roundtrip():
    """particles_from_texture inverts particle_pos_texture (the process
    shader read, particle_shader.gdshader:12-20)."""
    rng = np.random.default_rng(3)
    n = 37
    pos = jnp.asarray(rng.uniform(0, 16, (3, n)).astype(np.float32))
    vmag = jnp.asarray(rng.uniform(0, 4, (n,)).astype(np.float32))
    tex = particle_pos_texture(pos, vmag, n)
    w = pos_texture_width(n)
    assert tex.shape == (w, w, 4)
    p2, v2 = particles_from_texture(tex, n)
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(pos))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(vmag))
    # texels >= n stay zero (the reference leaves them unwritten)
    assert np.all(np.asarray(tex).reshape(-1, 4)[n:] == 0.0)


def test_texture_from_state_matches_fresh_state():
    """On a freshly bucketed (id-sorted) state the bucket-path texture
    equals the plain id-ordered one (ADVICE r4)."""
    config, b, cam, view = _bucket_scene()
    n = config.num_particles
    s = bucketed.to_simstate(b, n)
    vmag = jnp.linalg.norm(s.vel, axis=0)
    t_plain = np.asarray(particle_pos_texture(s.pos, vmag, n))
    t_state = np.asarray(particle_pos_texture_from_state(b, n))
    np.testing.assert_allclose(t_state, t_plain, atol=1e-6)


def test_texture_id_stable_across_migrations():
    """The flat texel index IS the particle id: after substeps that migrate
    particles between buckets, texel i still holds particle i's state —
    the reference's INDEX-addressed buffer semantics (g2p.glsl:149-150)."""
    config, b, cam, view = _bucket_scene()
    n = config.num_particles
    from mpm_tpu.core.params import FluidParams

    step = make_step(config, mode="bucketed", substeps=3, donate=False)
    fluid = FluidParams.create(dim=3)
    for _ in range(3):
        b = step(b, fluid, ())
    assert int(np.asarray(b.lost)) == 0
    s = bucketed.to_simstate(b, n)  # id-ordered unpack
    assert s.pos.shape[1] == n
    vmag = jnp.linalg.norm(s.vel, axis=0)
    t_plain = np.asarray(particle_pos_texture(s.pos, vmag, n))
    t_state = np.asarray(particle_pos_texture_from_state(b, n))
    np.testing.assert_allclose(t_state, t_plain, atol=1e-6)


# ---------------------------------------------------------- packed splat


def test_packed_depth_splat_unpacks_to_splat_depth():
    """Occupied pixels unpack to the production splat's NDC depth; empty
    pixels are exactly (0, 0, 0) — the cleared reverse-z buffer."""
    config, b, cam, view = _bucket_scene()
    n = config.num_particles
    s = bucketed.to_simstate(b, n)
    packed = np.asarray(packed_depth_splat(s.pos, view, cam))
    bufs = splat_particles(s.pos, jnp.zeros((n,), jnp.float32), view, cam)
    depth = np.asarray(bufs.depth)
    occ = depth < BG_DEPTH
    assert occ.any(), "test scene must be on screen"
    ndc_exp = np.asarray(jnp.clip(linear_depth_to_ndc(
        jnp.maximum(jnp.asarray(depth), cam.near), cam), 0.0, 1.0))
    rec = np.asarray(unpack_depth(jnp.asarray(packed)))
    np.testing.assert_allclose(rec[occ], ndc_exp[occ], atol=2e-6)
    assert np.all(packed[~occ] == 0.0)
    assert np.all(rec[~occ] < DEPTH_DISCARD)


# ----------------------------------------------------------- legacy blurs


def test_legacy_depth_blur_constant_preserved():
    d = jnp.full((24, 32), 37.5, jnp.float32)
    out = np.asarray(legacy_bilateral_blur_1d(d, (1, 0), filter_size=10))
    np.testing.assert_allclose(out, 37.5, rtol=1e-5)


def test_legacy_depth_blur_is_bilateral():
    """A large depth step survives: far-side taps fall out of the range
    kernel (sigma_range=2 vs a 1000-unit step)."""
    d = jnp.concatenate([
        jnp.full((16, 16), 10.0, jnp.float32),
        jnp.full((16, 16), 1000.0, jnp.float32)], axis=1)
    out = np.asarray(legacy_bilateral_blur_1d(d, (1, 0), filter_size=8,
                                              sigma_range=2.0))
    np.testing.assert_allclose(out[:, :14], 10.0, atol=1e-3)
    np.testing.assert_allclose(out[:, 18:], 1000.0, atol=1e-3)


def _color_blur_numpy_quirk(img, filter_size, sigma_range, fixed=False):
    """bilateral_blur.gdshader mode 1 in numpy, X direction. fixed=True
    computes the per-channel range term (what the quirk is NOT)."""
    h, w, _ = img.shape
    sigma = filter_size / 3.0
    pad = np.pad(img, ((0, 0), (filter_size, filter_size), (0, 0)),
                 mode="edge")
    num = np.zeros_like(img)
    den = np.zeros_like(img)
    for t in range(-filter_size, filter_size + 1):
        sample = pad[:, filter_size + t: filter_size + t + w]
        wgt = np.exp(-(t * t) / (2.0 * sigma * sigma))
        rd = (sample - img) if fixed else (sample[..., 0:1] - img)
        wd = np.exp(-(rd * rd) / (2.0 * sigma_range * sigma_range))
        num += sample * wgt * wd
        den += wgt * wd
    return num / np.maximum(den, 1e-20)


def test_legacy_color_blur_reproduces_sample_r_quirk():
    """The vec3-broadcast `sample.r - source` range term
    (bilateral_blur.gdshader mode 1) is reproduced exactly — and genuinely
    differs from the 'fixed' per-channel bilateral on the same image."""
    rng = np.random.default_rng(11)
    img = rng.uniform(0, 1, (8, 24, 3)).astype(np.float32)
    out = np.asarray(legacy_color_blur_1d(jnp.asarray(img), (1, 0),
                                          filter_size=5, sigma_range=0.3))
    exp = _color_blur_numpy_quirk(img, 5, 0.3)
    np.testing.assert_allclose(out, exp, atol=1e-5)
    fixed = _color_blur_numpy_quirk(img, 5, 0.3, fixed=True)
    assert np.abs(exp - fixed).max() > 1e-3  # the quirk is load-bearing


# ------------------------------------------------------------ end-to-end


def test_legacy_quad_frame_smoke():
    """The whole dormant chain composed: fluid pixels become grayscale
    blurred-depth, everything else shows the background."""
    config, b, cam, view = _bucket_scene()
    n = config.num_particles
    bg = jnp.broadcast_to(jnp.asarray([0.8, 0.1, 0.1], jnp.float32),
                          (cam.height, cam.width, 3))
    img = np.asarray(jax.jit(
        lambda st: legacy_quad_frame(st, n, view, cam, bg))(b))
    assert img.shape == (cam.height, cam.width, 3)
    assert np.all(np.isfinite(img))
    fluid = ~np.all(img == np.asarray([0.8, 0.1, 0.1], np.float32), axis=-1)
    assert fluid.any(), "fluid must be drawn"
    assert not fluid.all(), "background must survive"
    # fluid pixels are grayscale (ALBEDO = vec3(sum / 100))
    g = img[fluid]
    np.testing.assert_allclose(g[:, 0], g[:, 1], atol=1e-6)
    np.testing.assert_allclose(g[:, 1], g[:, 2], atol=1e-6)


def test_cli_render_legacy_quad(tmp_path):
    """CLI wiring: --render-mode legacy_quad end-to-end."""
    import glob
    import os

    from mpm_tpu.__main__ import main

    out = tmp_path / "frames"
    main([
        "render", "fluid_3d_cpu", "--frames", "1", "--mode", "bucketed",
        "--substeps", "1", "--out", str(out),
        "--width", "160", "--height", "90", "--render-mode", "legacy_quad",
    ])
    pngs = sorted(glob.glob(os.path.join(str(out), "*.png")))
    assert len(pngs) == 1
    assert os.path.getsize(pngs[0]) > 500
