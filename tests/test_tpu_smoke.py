"""Real-TPU Mosaic smoke tests (VERDICT r1 weak #8): run the flagship
substep NON-interpreted on the actual chip. The regular CI suite forces the
CPU backend (tests/conftest.py) and skips these; drive them with

    MPM_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -q
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="needs a real TPU (run with MPM_TPU_TESTS=1)",
)


def test_mosaic_flagship_substep():
    from mpm_tpu.models.scenes import fluid_3d
    from mpm_tpu.ops import bucketed
    from mpm_tpu.ops.pallas import fused

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    sc = fluid_3d()  # the full 157k-particle S5 analogue, 64^3
    config = sc.config
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(sc.state)
    n0 = int(np.sum(np.asarray(b.mass) > 0))
    step = jax.jit(
        lambda b, f: fused.substep_fused(b, config, f, ())
    )
    for _ in range(3):
        b = step(b, sc.fluid)
    pos = np.asarray(b.pos)
    occ = np.asarray(b.mass) > 0
    assert np.all(np.isfinite(pos))
    assert int(np.sum(occ)) == n0, "particle count not conserved"
    assert int(b.lost) == 0
    # invariant: every occupied slot floors to its bucket cell
    cell = np.asarray(bucketed.cell_coords(config, None))
    for a in range(3):
        d = np.floor(pos[a]) - cell[a][None, :]
        assert np.abs(d[occ]).max() < 0.5 + 1e-6


def test_mosaic_sharded_kernels_compile():
    """The SHARD-mode kernel variants (p2g1/p2g2u stages + F with global
    offsets and gvel halos) must compile under real Mosaic — the CPU suite
    only exercises them in interpret mode. A 1-device mesh runs the full
    sharded step on the chip."""
    from jax.sharding import Mesh

    from mpm_tpu.models.scenes import fluid_3d
    from mpm_tpu.ops import bucketed
    from mpm_tpu.parallel import domain

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    sc = fluid_3d(grid_res=32, box=16.0, spacing=0.8)
    config = sc.config.replace(substeps=2, bin_capacity=8)
    b0 = jax.jit(lambda s: bucketed.from_simstate(s, config))(sc.state)
    n0 = int(np.sum(np.asarray(b0.mass) > 0))
    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
    step = domain.make_sharded_bucket_step(
        config, mesh, substeps=2, interpret=False
    )
    out = step(domain.shard_bucket_state(b0, mesh), sc.fluid, ())
    pos = np.asarray(out.pos)
    assert np.all(np.isfinite(pos))
    assert int(out.lost) == 0
    assert int((np.asarray(out.mass) > 0).sum()) == n0


def test_mosaic_windowed_substep_with_emission():
    """Air-window config + in-kernel splat emission under REAL Mosaic:
    windowed trajectories stay finite and conserved, the ceiling counter
    stays 0 for a settled pool, and the emitted splats equal the post-hoc
    extraction kernel on-chip."""
    from mpm_tpu.core.params import FluidParams, SimConfig
    from mpm_tpu.core.state import make_state
    from mpm_tpu.models.emitters import box_lattice
    from mpm_tpu.ops import bucketed
    from mpm_tpu.ops.pallas import fused
    from mpm_tpu.ops.window import window_config
    from mpm_tpu.render import Camera, default_view
    from mpm_tpu.render.extract_kernel import extract_cell_splats

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    import jax.numpy as jnp

    grid = (16, 32, 16)
    pos = box_lattice(grid, (10.0, 6.0, 10.0), 0.8, center=(8.0, 6.0, 8.0))
    config = SimConfig(grid_res=grid, num_particles=pos.shape[0],
                       substeps=2, bin_capacity=8)
    wcfg = window_config(config, 16)
    assert fused.fused_supported(wcfg)
    fluid = FluidParams.create(dim=3, eos_stiffness=4.0, eos_power=4.0)
    b = jax.jit(lambda s: bucketed.from_simstate(s, wcfg))(make_state(pos))
    n0 = int(np.sum(np.asarray(b.mass) > 0))

    cam = Camera(width=256, height=128)
    view = jnp.asarray(default_view(config.grid_res))
    rs = fused.render_scals_for(view, cam)
    emit = jax.jit(lambda b, f: fused.substep_fused_emit(b, wcfg, f, (), rs))
    for _ in range(3):
        b, splats = emit(b, fluid)
    occ = np.asarray(b.mass) > 0
    assert np.all(np.isfinite(np.asarray(b.pos)))
    assert int(np.sum(occ)) == n0
    assert int(b.lost) == 0 and int(b.ceiling) == 0
    want = extract_cell_splats(b, view, cam)
    np.testing.assert_allclose(np.asarray(splats), np.asarray(want),
                               rtol=1e-6, atol=1e-4)
