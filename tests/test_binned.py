"""Cross-check: the sorted fast path must match the dense oracle.

This formalizes the reference's implicit oracle pattern — its five variants
are redundant implementations cross-checked by eye (SURVEY.md §4); here the
check is numerical and automated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpm_tpu import get_scene, make_step
from mpm_tpu.ops import binned


@pytest.mark.parametrize("scene_name", ["dam_break_2d", "fluid_3d_fixed_point"])
def test_binned_matches_oracle_one_substep(scene_name):
    """One substep: only float accumulation order differs (scatter-add vs
    sorted segment-sum), so agreement must be tight. In fixed-point mode the
    accumulation is integer and therefore bit-exact."""
    sc = get_scene(scene_name)
    ref_step = make_step(sc.config, mode="reference", donate=False, substeps=1)
    fast_step = make_step(sc.config, mode="binned", donate=False, substeps=1)

    a = ref_step(sc.state, sc.fluid, ()).by_id()
    b = fast_step(sc.state, sc.fluid, ()).by_id()
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
    # cross-path comparison: XLA fuses the two paths differently, so even
    # fixed-point mode can land one 1e-7 quantum apart after float
    # reassociation; WITHIN-path bit-exactness is asserted by
    # test_fixed_point_bit_determinism
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.C), np.asarray(b.C), atol=1e-5)


def test_binned_matches_oracle_trajectory():
    """Multiple frames: trajectories drift by accumulation-order noise
    amplified by the dynamics; band the comparison (SURVEY.md §7 hard part 5)."""
    sc = get_scene("dam_break_2d")
    ref_step = make_step(sc.config, mode="reference", donate=False)
    fast_step = make_step(sc.config, mode="binned", donate=False)
    s_ref = s_fast = sc.state
    for _ in range(3):
        s_ref = ref_step(s_ref, sc.fluid, ())
        s_fast = fast_step(s_fast, sc.fluid, ())
    a, b = s_ref.by_id(), s_fast.by_id()
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), atol=2e-3)


def test_fixed_point_bit_determinism():
    """Fixed-point mode must be bit-identical across runs and across particle
    permutations (int add commutes exactly — the property the reference's
    atomic design relies on, MLSMPM3DFluidMultithreadNew.cs:336-339)."""
    sc = get_scene("fluid_3d_fixed_point")
    step = make_step(sc.config, mode="binned", donate=False)
    out1 = step(sc.state, sc.fluid, ())
    out2 = step(sc.state, sc.fluid, ())
    np.testing.assert_array_equal(np.asarray(out1.pos), np.asarray(out2.pos))

    perm = np.random.RandomState(0).permutation(sc.state.num_particles)
    shuffled = sc.state.permute(jnp.asarray(perm))
    out3 = step(shuffled, sc.fluid, ())
    a, b = out1.by_id(), out3.by_id()
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))


def test_sorted_segment_sum_conserves_mass():
    sc = get_scene("fluid_3d_cpu")

    @jax.jit
    def run(state):
        state, seg_start = binned.sort_by_cell(state, sc.config)
        from mpm_tpu.ops.transfer import geometry

        geom = geometry(state.pos, sc.config)
        return binned.p2g(state, geom, seg_start, sc.config, sc.fluid)

    grid = run(sc.state)
    np.testing.assert_allclose(
        float(jnp.sum(grid.mass)), float(jnp.sum(sc.state.mass)), rtol=1e-6
    )


def test_blocked_segment_sum_exactness():
    """Blocked segment sum must match direct per-segment sums, including
    segments that straddle a block boundary, for trailing-axis layouts."""
    from mpm_tpu.ops.segsum import sorted_segment_sum

    rng = np.random.RandomState(1)
    seg_lens = rng.randint(0, 60, size=300)
    starts = np.concatenate([[0], np.cumsum(seg_lens)])[:-1]
    ends = starts + seg_lens
    n = int(ends[-1])
    x = rng.randn(2, n).astype(np.float32)  # [F, N] lane-major
    got = np.asarray(
        jax.jit(lambda x: sorted_segment_sum(x, jnp.asarray(starts), jnp.asarray(ends), block=64))(
            jnp.asarray(x)
        )
    )
    want = np.stack([x[:, s:e].sum(-1) for s, e in zip(starts, ends)], axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_bin_slots_layout():
    """K-slot binning (reserved for Pallas kernels): every particle lands in
    its own cell's slot; no overflow on reference scenes."""
    sc = get_scene("dam_break_2d")

    @jax.jit
    def run(state):
        state, seg_start = binned.sort_by_cell(state, sc.config)
        from mpm_tpu.ops.binning import bin_slots, gather_slot_field

        slots = bin_slots(seg_start, sc.config, state.num_particles)
        mass_b = gather_slot_field(state.mass, slots)
        return slots, mass_b

    slots, mass_b = run(sc.state)
    assert int(slots.overflow) == 0
    np.testing.assert_allclose(
        float(jnp.sum(mass_b)), float(jnp.sum(sc.state.mass)), rtol=1e-6
    )
    assert int(jnp.sum(slots.count)) == sc.state.num_particles
