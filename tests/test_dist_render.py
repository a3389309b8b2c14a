"""Distributed SSFR render composite (parallel/render.py): per-shard splat
emission -> per-shard z-buffer -> depth-min composite over the mesh.

The correctness claim has two halves:
1. the composite is EXACT: min over disjoint cell subsets == the global
   min, bit-for-bit (pure-function test, no mesh needed);
2. the end-to-end sharded frame (sharded substeps + emission + composite +
   SSFR) matches the single-device full-frame step (sharded P2G accumulates
   in a different order, so states match to ~1e-5 like tests/test_sharded.py
   — frames are compared as u8 images with a tight mean-error budget).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mpm_tpu.core.params import FluidParams, SimConfig
from mpm_tpu.core.state import make_state
from mpm_tpu.models.emitters import box_lattice
from mpm_tpu.ops import bucketed
from mpm_tpu.render import Camera, RenderConfig
from mpm_tpu.render.camera import look_at
from mpm_tpu.render.pipeline import (
    background_for_view,
    make_full_frame_step,
)
from mpm_tpu.parallel import domain
from mpm_tpu.parallel.render import make_sharded_frame_step


def _scene(grid=(16, 16, 16)):
    pos = box_lattice(grid, (10.0, 6.0, 10.0), 0.8, center=(8.0, 6.0, 8.0))
    config = SimConfig(grid_res=grid, num_particles=pos.shape[0],
                       substeps=2, bin_capacity=8)
    fluid = FluidParams.create(dim=3, eos_stiffness=4.0, eos_power=4.0)
    return config, fluid, make_state(pos)


def _rc(mode="default"):
    return RenderConfig(camera=Camera(width=128, height=96), mode=mode)


def test_zbuffer_composite_is_exact():
    """Splitting the splat points into disjoint subsets, z-buffering each,
    and taking the elementwise min reproduces the single z-buffer
    BIT-EXACTLY (both the f32 depth and the packed velocity key)."""
    from mpm_tpu.render.extract_kernel import extract_cell_splats
    from mpm_tpu.render.splat import zbuffer_cells

    config, fluid, state = _scene()
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(state)
    cam = Camera(width=128, height=96)
    view = jnp.asarray(look_at((40.0, 30.0, 40.0), (8.0, 6.0, 8.0)))
    cells = extract_cell_splats(b, view, cam, interpret=True)

    d_full, k_full = jax.jit(
        lambda c: zbuffer_cells(c, cam, with_velocity=True))(cells)

    n_shards = 4
    m = cells.shape[1] // n_shards
    parts = [
        jax.jit(lambda c: zbuffer_cells(c, cam, with_velocity=True))(
            cells[:, i * m : (i + 1) * m])
        for i in range(n_shards)
    ]
    d_min = np.minimum.reduce([np.asarray(p[0]) for p in parts])
    k_min = np.minimum.reduce([np.asarray(p[1]) for p in parts])
    np.testing.assert_array_equal(d_min, np.asarray(d_full))
    np.testing.assert_array_equal(k_min, np.asarray(k_full))


def test_sharded_frame_matches_single_device():
    """One full frame (2 substeps + emission + composite + SSFR + u8) over a
    4-device mesh vs the single-device make_full_frame_step from the same
    initial state."""
    config, fluid, state = _scene()
    rc = _rc()
    view = jnp.asarray(look_at((40.0, 30.0, 40.0), (8.0, 6.0, 8.0)))
    bg = background_for_view(rc, view)
    b0 = jax.jit(lambda s: bucketed.from_simstate(s, config))(state)

    single = make_full_frame_step(config, rc, 2, donate=False,
                                  interpret=True)
    s1, img1 = single(b0, fluid, (), view, bg)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("x",))
    sharded = make_sharded_frame_step(config, mesh, rc, substeps=2,
                                      donate=False, interpret=True)
    s2, img2 = sharded(domain.shard_bucket_state(b0, mesh), fluid, (),
                       view, bg)

    a = np.asarray(img1).astype(np.int32)
    b = np.asarray(img2).astype(np.int32)
    assert a.shape == b.shape == (96, 128, 3)
    # sharded P2G accumulation order -> ~1e-5 position deltas -> a handful
    # of boundary pixels may round differently; the images must agree
    # everywhere else
    diff = np.abs(a - b)
    assert np.mean(diff) < 0.5, f"mean u8 error {np.mean(diff)}"
    assert np.mean(diff > 2) < 0.02, f"{np.mean(diff > 2):.3%} pixels differ"
    # states agree like tests/test_sharded.py
    np.testing.assert_allclose(np.asarray(s2.pos), np.asarray(s1.pos),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(s2.ids), np.asarray(s1.ids))
    assert int(s2.lost) == int(s1.lost) == 0


def test_sharded_frame_velocity_mode():
    """The velocity-spheres mode composites the packed velocity key across
    the mesh too (the second pmin)."""
    config, fluid, state = _scene()
    rc = _rc(mode="velocity_spheres")
    view = jnp.asarray(look_at((40.0, 30.0, 40.0), (8.0, 6.0, 8.0)))
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
    assert np.mean(np.abs(a - b)) < 0.5


def test_sharded_frame_thickness_pass():
    """thickness_pass=True over the mesh: the additive thickness buffer is
    psum-composited across shards (disjoint interior cells, so the sum of
    per-shard deposits equals the single-device deposit) and the shaded
    frames must match the single-device thickness-pass frames within the
    same budget as the default mode."""
    from mpm_tpu.render import SSFRParams

    config, fluid, state = _scene()
    rc = RenderConfig(camera=Camera(width=128, height=96),
                      ssfr=SSFRParams(thickness_pass=True,
                                      thickness_scale=0.3))
    view = jnp.asarray(look_at((40.0, 30.0, 40.0), (8.0, 6.0, 8.0)))
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
    assert np.mean(np.abs(a - b)) < 0.5
    # and the pass is actually ON: it must differ from the constant-
    # thickness default frame
    rc0 = RenderConfig(camera=Camera(width=128, height=96))
    single0 = make_full_frame_step(config, rc0, 2, donate=False,
                                   interpret=True)
    _, img0 = single0(b0, fluid, (), view, bg)
    assert np.mean(np.abs(a - np.asarray(img0).astype(np.int32))) > 0.1


def test_sharded_frame_windowed_config():
    """Config 5's full clause: the air-window composes with the sharded
    render (windowed sharded substeps + distributed composite)."""
    from mpm_tpu.ops.window import window_config

    config, fluid, state = _scene(grid=(16, 32, 16))
    wcfg = window_config(config, 16)
    rc = _rc()
    view = jnp.asarray(look_at((40.0, 30.0, 40.0), (8.0, 6.0, 8.0)))
    bg = background_for_view(rc, view)
    b0 = jax.jit(lambda s: bucketed.from_simstate(s, wcfg))(state)

    single = make_full_frame_step(wcfg, rc, 2, donate=False, interpret=True)
    _, img1 = single(b0, fluid, (), view, bg)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("x",))
    sharded = make_sharded_frame_step(wcfg, mesh, rc, substeps=2,
                                      donate=False, interpret=True)
    s2, img2 = sharded(domain.shard_bucket_state(b0, mesh), fluid, (),
                       view, bg)
    a = np.asarray(img1).astype(np.int32)
    b = np.asarray(img2).astype(np.int32)
    assert np.mean(np.abs(a - b)) < 0.5
    assert int(s2.ceiling) == 0 and int(s2.lost) == 0
