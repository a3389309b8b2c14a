"""Invariant and sanity tests for the oracle (dense reference) path.

Test strategy per SURVEY.md §4: the reference has no automated tests; we
formalize its implicit oracle pattern (multiple implementations cross-checked)
plus property tests on physical invariants. Layout note: SimState is
lane-major — pos is [D, N].
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpm_tpu import get_scene, make_step, zero_grid
from mpm_tpu.ops import bspline, reference
from mpm_tpu.ops.transfer import geometry, flat_tap_offsets


@pytest.fixture()
def scene2d():
    return get_scene("dam_break_2d")


def test_scene_particle_counts():
    # reference counts: SURVEY.md §2.1 / BASELINE.md
    assert get_scene("dam_break_2d").state.num_particles == 1024
    assert get_scene("fluid_3d_cpu").state.num_particles == 32768
    assert get_scene("fluid_3d_fixed_point").state.num_particles == 4096
    assert get_scene("fluid_3d").state.num_particles == 157464


def test_bspline_partition_of_unity(scene2d):
    geom = geometry(scene2d.state.pos, scene2d.config)
    taps = bspline.taps(scene2d.config.dim)
    wsum = sum(np.asarray(bspline.tap_weight(geom.d, t)) for t in taps)
    np.testing.assert_allclose(wsum, 1.0, atol=1e-6)
    # first moment: sum_t w_t * dist_t == 0 (quadratic B-spline reproduces
    # linear fields) — this is what makes P2G momentum-conserving
    m1 = sum(
        np.asarray(bspline.tap_weight(geom.d, t) * bspline.tap_dist(geom.d, t))
        for t in taps
    )
    np.testing.assert_allclose(m1, 0.0, atol=1e-5)


def test_p2g_conserves_mass_and_momentum(scene2d):
    state, config = scene2d.state, scene2d.config
    key = jax.random.PRNGKey(0)
    state.vel = jax.random.normal(key, state.vel.shape) * 0.1

    @jax.jit
    def run(state):
        geom = geometry(state.pos, config)
        return reference.p2g_1(state, zero_grid(config), geom, config)

    grid = run(state)
    np.testing.assert_allclose(
        float(jnp.sum(grid.mass)), float(jnp.sum(state.mass)), rtol=1e-6
    )
    gm = np.asarray(jnp.sum(grid.mom, axis=1))
    pm = np.asarray(jnp.sum(state.mass * state.vel, axis=1))
    np.testing.assert_allclose(gm, pm, atol=1e-3)


def test_frames_run_and_stay_bounded(scene2d):
    state, config, fluid = scene2d.state, scene2d.config, scene2d.fluid
    step = make_step(config, mode="reference")
    for _ in range(10):
        state = step(state, fluid, ())
    pos = np.asarray(state.pos)
    assert np.all(np.isfinite(pos))
    assert np.all(pos >= config.clamp_lo - 1e-6)
    res = np.asarray(config.grid_res).reshape(-1, 1)
    assert np.all(pos <= res - config.clamp_hi_offset + 1e-6)
    assert np.all(np.isfinite(np.asarray(state.vel)))
    # fluid should be falling: mean y position increased (gravity +y in 2D)
    assert float(np.mean(pos[1])) > 32.0


def test_dam_break_x_symmetry(scene2d):
    """A mirror-symmetric configuration must stay x-symmetric (SURVEY.md §4).

    Note: the reference's own lattice seeds particles at exact integer
    positions, where floor() breaks the mirror map (d = -0.5 mirrors to
    d = -0.5, not +0.5), so we build an off-integer lattice symmetric about
    the grid's BC mirror plane (res-1)/2 + 0.5 = 31.5.
    """
    from mpm_tpu import make_state

    config, fluid = scene2d.config, scene2d.fluid
    c = 31.5
    half = 0.2 + np.arange(16)
    xs = np.concatenate([c - half, c + half])
    ys = 16.0 + 0.3 + np.arange(32)
    xg, yg = np.meshgrid(xs, ys, indexing="ij")
    pos = np.stack([xg.reshape(-1), yg.reshape(-1)], axis=-1)
    state = make_state(pos)
    step = make_step(config.replace(num_particles=pos.shape[0]), mode="reference")
    for _ in range(5):
        state = step(state, fluid, ())
    x = np.asarray(state.pos[0])
    np.testing.assert_allclose(np.mean(x), c, atol=1e-3)
    np.testing.assert_allclose(np.sort(x - c), np.sort(-(x - c)), atol=1e-3)


def test_mass_never_created(scene2d):
    state, config, fluid = scene2d.state, scene2d.config, scene2d.fluid
    total0 = float(jnp.sum(state.mass))
    step = make_step(config, mode="reference")
    state = step(state, fluid, ())
    assert float(jnp.sum(state.mass)) == total0


def test_interaction_pushes_particles(scene2d):
    from mpm_tpu import Interaction

    state, config, fluid = scene2d.state, scene2d.config, scene2d.fluid
    step = make_step(config, mode="reference")
    center = jnp.asarray([32.0, 32.0])
    push = (Interaction.mouse(center, radius=10.0, strength=0.5),)
    s_push = step(state, fluid, push)
    state2 = get_scene("dam_break_2d").state
    s_free = step(state2, fluid, ())
    d_push = np.linalg.norm(np.asarray(s_push.pos) - 32.0, axis=0)
    d_free = np.linalg.norm(np.asarray(s_free.pos) - 32.0, axis=0)
    assert np.mean(d_push) > np.mean(d_free)
