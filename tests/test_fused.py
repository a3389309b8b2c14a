"""Fused kernel F (G2P + tail + 3-axis migration) equivalence vs the XLA
bucketed engine (interpret mode on CPU; Mosaic-compiled on real TPUs)."""

import jax
import jax.numpy as jnp
import numpy as np

from mpm_tpu.models.scenes import fluid_3d
from mpm_tpu.ops import bucketed
from mpm_tpu.ops.interact import Interaction
from mpm_tpu.ops.pallas import fused


def _small():
    sc = fluid_3d(grid_res=16, box=8.0, spacing=0.8)
    return sc.config.replace(bin_capacity=8), sc.fluid, sc.state


def test_fused_substep_matches_bucketed():
    config, fluid, state = _small()
    assert fused.fused_supported(config)
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(state)
    s_x, s_f = b, b
    for _ in range(3):  # several substeps so migration happens in every axis
        s_x = jax.jit(lambda b, f: bucketed.substep(b, config, f, ()))(s_x, fluid)
        s_f = fused.substep_fused(s_f, config, fluid, (), interpret=True)
    np.testing.assert_allclose(np.asarray(s_x.pos), np.asarray(s_f.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_x.vel), np.asarray(s_f.vel), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_x.C), np.asarray(s_f.C), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(s_x.ids), np.asarray(s_f.ids))
    assert int(s_f.lost) == int(s_x.lost) == 0
    assert int(s_f.cfl_clamped) == int(s_x.cfl_clamped)


def test_fused_substep_with_interaction():
    config, fluid, state = _small()
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(state)
    inter = (Interaction.sphere((8.0, 8.0, 8.0), radius=4.0, strength=0.5),)
    s_x = jax.jit(lambda b, f, it: bucketed.substep(b, config, f, it))(
        b, fluid, inter
    )
    s_f = fused.substep_fused(b, config, fluid, inter, interpret=True)
    np.testing.assert_allclose(np.asarray(s_x.pos), np.asarray(s_f.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_x.vel), np.asarray(s_f.vel), atol=1e-5)


def test_cfl_clamp_keeps_invariant_and_counts():
    """A particle kicked >1 cell/substep must be clamped into its bucket's
    ±1-cell range (weights stay in support) and the event counted."""
    config, fluid, state = _small()
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(state)
    occ = b.mass > 0
    vel = jnp.where(occ, 40.0, 0.0) * jnp.ones_like(b.vel)  # 8 cells/substep
    b = bucketed.BucketState(pos=b.pos, vel=vel, C=b.C, mass=b.mass, ids=b.ids,
                             lost=b.lost, cfl_clamped=b.cfl_clamped,
                             deferred=b.deferred)
    from mpm_tpu.ops.bucketed import cell_coords

    s = jax.jit(lambda b, f: bucketed.substep(b, config, f, ()))(b, fluid)
    assert int(s.cfl_clamped) > 0
    # invariant: every occupied slot's position floors to its bucket cell
    cell = np.asarray(cell_coords(config, jnp.float32))
    pos = np.asarray(s.pos)
    occ = np.asarray(s.mass) > 0
    for a in range(3):
        d = np.floor(pos[a]) - cell[a][None, :]
        assert np.all(np.abs(d[occ]) < 0.5 + 1e-6), f"axis {a}: {np.abs(d[occ]).max()}"


def test_bf16_storage_engines_match():
    """bf16 vel/C storage: arithmetic stays f32 and rounding happens at the
    same points in both engines, so XLA and fused stay slot-identical."""
    config, fluid, state = _small()
    config = config.replace(storage_dtype="bfloat16")
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(state)
    assert b.vel.dtype == jnp.bfloat16 and b.C.dtype == jnp.bfloat16
    s_x, s_f = b, b
    for _ in range(3):
        s_x = jax.jit(lambda b, f: bucketed.substep(b, config, f, ()))(s_x, fluid)
        s_f = fused.substep_fused(s_f, config, fluid, (), interpret=True)
    assert s_f.vel.dtype == jnp.bfloat16 and s_f.C.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(s_x.ids), np.asarray(s_f.ids))
    np.testing.assert_allclose(np.asarray(s_x.pos), np.asarray(s_f.pos), atol=1e-6)
    # the engines' f32 intermediates differ by FMA-contraction choices, so
    # values at a bf16 rounding boundary may land one ulp apart
    np.testing.assert_allclose(
        np.asarray(s_x.vel).astype(np.float32),
        np.asarray(s_f.vel).astype(np.float32),
        rtol=0.01, atol=1e-4,
    )
    assert int(s_f.lost) == int(s_x.lost) == 0
