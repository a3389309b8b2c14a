"""Pallas kernel equivalence vs the XLA bucketed engine (interpret mode on
CPU; the same kernels compile for real TPUs via Mosaic)."""

import jax
import jax.numpy as jnp
import numpy as np

from mpm_tpu.models.scenes import fluid_3d
from mpm_tpu.ops import bucketed
from mpm_tpu.ops.grid import update_grid
from mpm_tpu.ops.pallas import bucket_kernels as bk
from mpm_tpu.ops.pallas import migrate_kernels as mk


def _small():
    sc = fluid_3d(grid_res=16, box=8.0, spacing=0.8)
    return sc.config.replace(bin_capacity=8), sc.fluid, sc.state


def test_p2g_pallas_matches_bucketed():
    config, fluid, state = _small()
    b0 = jax.jit(lambda s: bucketed.from_simstate(s, config))(state)
    gx = jax.jit(lambda b, f: bucketed.p2g_bucketed(b, config, f))(b0, fluid)
    gp = bk.p2g_pallas(b0, config, fluid, interpret=True)
    np.testing.assert_allclose(np.asarray(gx.mass), np.asarray(gp.mass), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx.mom), np.asarray(gp.mom), atol=1e-6)


def test_substep_pallas_matches_bucketed():
    config, fluid, state = _small()
    b0 = jax.jit(lambda s: bucketed.from_simstate(s, config))(state)
    s_x = jax.jit(lambda b, f: bucketed.substep(b, config, f, ()))(b0, fluid)
    s_p = bk.substep(b0, config, fluid, (), interpret=True)
    np.testing.assert_allclose(np.asarray(s_x.pos), np.asarray(s_p.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_x.vel), np.asarray(s_p.vel), atol=1e-5)
    assert int(s_p.lost) == 0


def test_migration_pallas_matches_bucketed():
    """Random perturbation forces migrations in every direction; the Pallas
    axis-split repack must match the XLA one exactly (by particle id)."""
    config, fluid, state = _small()
    b0 = jax.jit(lambda s: bucketed.from_simstate(s, config))(state)
    occ = b0.mass > 0
    dpos = jax.random.uniform(
        jax.random.PRNGKey(3), b0.pos.shape, minval=-0.9, maxval=0.9
    )
    pos = jnp.clip(b0.pos + jnp.where(occ, dpos, 0.0), 2.0, 13.5)
    pre = bucketed.BucketState(
        pos=pos, vel=b0.vel, C=b0.C, mass=b0.mass, ids=b0.ids, lost=b0.lost,
        cfl_clamped=b0.cfl_clamped, deferred=b0.deferred,
    )
    mx = jax.jit(lambda b: bucketed.migrate(b, config))(pre)
    mp = mk.migrate_pallas(pre, config, interpret=True)
    a = bucketed.to_simstate(mx, state.num_particles)
    b = bucketed.to_simstate(mp, state.num_particles)
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.C), np.asarray(b.C))
    assert int(mx.lost) == int(mp.lost)
