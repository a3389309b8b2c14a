"""Bucket-state engine vs oracle cross-checks (SURVEY.md §4 oracle pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpm_tpu import get_scene, make_step
from mpm_tpu.ops import bucketed


def _to_bucket(scene):
    return jax.jit(
        lambda s: bucketed.from_simstate(s, scene.config), backend="cpu"
    )(scene.state)


def _small_3d_fixed():
    from mpm_tpu.models.scenes import fluid_3d_fixed_point

    return fluid_3d_fixed_point(grid_res=16, box=8.0, spacing=1.0)  # 512 p


def test_roundtrip_conversion():
    sc = get_scene("dam_break_2d")
    b = _to_bucket(sc)
    assert int(b.lost) == 0
    s2 = bucketed.to_simstate(b, sc.state.num_particles)
    np.testing.assert_allclose(np.asarray(s2.pos), np.asarray(sc.state.pos), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(s2.ids), np.asarray(sc.state.ids))


@pytest.mark.parametrize("scene_name", ["dam_break_2d", "small_3d_fixed"])
def test_bucketed_matches_oracle_one_substep(scene_name):
    sc = get_scene("dam_break_2d") if scene_name == "dam_break_2d" else _small_3d_fixed()
    ref_step = make_step(sc.config, mode="reference", donate=False, substeps=1)
    buck_step = make_step(sc.config, mode="bucketed", donate=False, substeps=1)

    a = ref_step(sc.state, sc.fluid, ()).by_id()
    bout = buck_step(_to_bucket(sc), sc.fluid, ())
    assert int(bout.lost) == 0
    b = bucketed.to_simstate(bout, sc.state.num_particles)
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
    # cross-path comparison: the bucketed pass-2 folds eq16 differently
    # (algebraically equal, float-rounding different), so even fixed-point
    # mode can differ by one 1e-7 quantum; bit-equality is asserted only
    # within a path (test_bucketed_permutation_determinism)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.C), np.asarray(b.C), atol=1e-5)


def test_bucketed_permutation_determinism():
    """Within the bucketed path, fixed-point mode must be bit-identical
    across particle input permutations (slot order is sort-stable)."""
    sc = _small_3d_fixed()
    buck_step = make_step(sc.config, mode="bucketed", donate=False, substeps=1)
    out1 = buck_step(_to_bucket(sc), sc.fluid, ())
    perm = np.random.RandomState(0).permutation(sc.state.num_particles)
    shuffled = sc.state.permute(jnp.asarray(perm))
    from mpm_tpu.models.scenes import Scene

    sc2 = Scene(sc.name, sc.config, sc.fluid, shuffled)
    out2 = buck_step(_to_bucket(sc2), sc.fluid, ())
    a = bucketed.to_simstate(out1, sc.state.num_particles)
    b = bucketed.to_simstate(out2, sc.state.num_particles)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.vel), np.asarray(b.vel))


def test_bucketed_trajectory_with_migration():
    """Multi-frame run: particles cross cell boundaries, so this exercises
    the axis-split migration; compare banded against the oracle."""
    sc = get_scene("dam_break_2d")
    ref_step = make_step(sc.config, mode="reference", donate=False)
    buck_step = make_step(sc.config, mode="bucketed", donate=False)
    s_ref = sc.state
    b = _to_bucket(sc)
    for _ in range(3):
        s_ref = ref_step(s_ref, sc.fluid, ())
        b = buck_step(b, sc.fluid, ())
    assert int(b.lost) == 0
    s_b = bucketed.to_simstate(b, sc.state.num_particles)
    a = s_ref.by_id()
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(s_b.pos), atol=2e-3)
    # every particle still in the bucket of its own cell (the core invariant)
    pos = np.asarray(b.pos)
    mass = np.asarray(b.mass)
    dim = sc.config.dim
    coords = np.asarray(bucketed.cell_coords(sc.config))
    for a_ in range(dim):
        base = np.floor(pos[a_])
        ok = (mass <= 0) | (base == coords[a_][None, :])
        assert np.all(ok), f"bucket invariant broken on axis {a_}"


def test_bucketed_conserves_mass_and_count():
    from mpm_tpu.models.scenes import fluid_3d_cpu

    sc = fluid_3d_cpu(grid_res=16, box=8.0, spacing=0.7)
    buck_step = make_step(sc.config, mode="bucketed", donate=False, substeps=2)
    b = _to_bucket(sc)
    total0 = float(jnp.sum(b.mass))
    b = buck_step(b, sc.fluid, ())
    assert int(b.lost) == 0
    np.testing.assert_allclose(float(jnp.sum(b.mass)), total0, rtol=1e-6)
    assert int(jnp.sum(b.mass > 0)) == sc.state.num_particles


def test_bucketed_interaction_broadcasts():
    """Interactions must broadcast over the bucketed [D, K, C] layout
    (the flagship's sphere collider, g2p.glsl:122-129)."""
    from mpm_tpu import Interaction

    sc = _small_3d_fixed()
    config = sc.config.replace(fixed_point=False)
    b0 = jax.jit(lambda s: bucketed.from_simstate(s, config))(sc.state)
    push = (Interaction.sphere(center=(8.0, 8.0, 8.0), radius=6.0, strength=1.0),)
    step_p = jax.jit(lambda b, f: bucketed.substep(b, config, f, push))
    step_f = jax.jit(lambda b, f: bucketed.substep(b, config, f, ()))
    bp = bf = b0
    for _ in range(3):  # the push lands on velocity AFTER advection
        bp = step_p(bp, sc.fluid)
        bf = step_f(bf, sc.fluid)
    sp = bucketed.to_simstate(bp, sc.state.num_particles)
    sf = bucketed.to_simstate(bf, sc.state.num_particles)
    d_push = np.linalg.norm(np.asarray(sp.pos) - 8.0, axis=0).mean()
    d_free = np.linalg.norm(np.asarray(sf.pos) - 8.0, axis=0).mean()
    assert np.all(np.isfinite(np.asarray(sp.pos)))
    assert d_push > d_free  # pushed away from the sphere center


def test_overflow_rejection_conserves_particles():
    """Crush the fluid into the floor under extreme gravity: buckets fill to
    K, and the overflow-rejection migration must DEFER moves (clamping the
    mover back into its source cell) rather than drop particles — the
    reference clamps instead of deleting (g2p.glsl:115-119). Over 60
    substeps: zero loss, exact particle-count conservation, occupancy <= K,
    and the deferred counter actually fires."""
    from mpm_tpu.models.scenes import fluid_3d

    sc = fluid_3d(grid_res=16, box=8.0, spacing=0.8)
    config = sc.config.replace(bin_capacity=8)
    fluid = sc.fluid.replace(gravity=jnp.asarray([0.0, -60.0, 0.0]))
    b = jax.jit(lambda s: bucketed.from_simstate(s, config), backend="cpu")(
        sc.state
    )
    n0 = int(np.sum(np.asarray(b.mass) > 0))
    assert int(b.lost) == 0

    step = jax.jit(
        lambda b, f: bucketed.substep(b, config, f, ()), backend="cpu"
    )
    for _ in range(60):
        b = step(b, fluid)
    occ = np.asarray(b.mass) > 0
    assert int(b.lost) == 0, f"lost {int(b.lost)} particles"
    assert int(np.sum(occ)) == n0, "particle count not conserved"
    assert int(b.deferred) > 0, "crush scenario never deferred a move"
    assert occ.sum(axis=0).max() <= config.bin_capacity
    # invariant: every occupied slot still floors to its bucket cell
    cell = np.asarray(bucketed.cell_coords(config, jnp.float32))
    pos = np.asarray(b.pos)
    for a in range(3):
        d = np.floor(pos[a]) - cell[a][None, :]
        assert np.all(np.abs(d[occ]) < 0.5 + 1e-6)


def test_overflow_rejection_fused_matches_bucketed():
    """The fused kernel's in-kernel rejection must be slot-identical to the
    XLA engine's under bucket-overflow pressure."""
    from mpm_tpu.models.scenes import fluid_3d
    from mpm_tpu.ops.pallas import fused

    sc = fluid_3d(grid_res=16, box=8.0, spacing=0.8)
    config = sc.config.replace(bin_capacity=8)
    fluid = sc.fluid.replace(gravity=jnp.asarray([0.0, -60.0, 0.0]))
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(sc.state)
    s_x, s_f = b, b
    for _ in range(8):
        s_x = jax.jit(lambda b, f: bucketed.substep(b, config, f, ()))(s_x, fluid)
        s_f = fused.substep_fused(s_f, config, fluid, (), interpret=True)
    assert int(s_x.deferred) > 0
    assert int(s_f.deferred) == int(s_x.deferred)
    assert int(s_f.lost) == int(s_x.lost) == 0
    np.testing.assert_allclose(
        np.asarray(s_x.pos), np.asarray(s_f.pos), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(s_x.ids), np.asarray(s_f.ids))


def test_free_fall_conservation_200_substeps():
    """VERDICT r1 gate: a free-fall dam break conserving the exact particle
    count over >= 200 substeps with zero loss (the reference never deletes
    fluid, g2p.glsl:115-119 clamps instead)."""
    from mpm_tpu import get_scene

    sc = get_scene("dam_break_2d")  # 1,024 particles crushing into the floor
    config = sc.config.replace(bin_capacity=8)
    b = jax.jit(lambda s: bucketed.from_simstate(s, config), backend="cpu")(
        sc.state
    )
    n0 = int(np.sum(np.asarray(b.mass) > 0))
    step = jax.jit(
        lambda b, f: bucketed.substep(b, config, f, ()), backend="cpu"
    )
    for _ in range(200):
        b = step(b, sc.fluid)
    occ = np.asarray(b.mass) > 0
    assert int(b.lost) == 0
    assert int(np.sum(occ)) == n0
    assert np.all(np.isfinite(np.asarray(b.pos)))
    assert occ.sum(axis=0).max() <= config.bin_capacity
