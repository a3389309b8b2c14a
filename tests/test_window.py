"""Air-window engine (ops/window.py): the windowed step must reproduce the
full-grid engine EXACTLY (bit-equal trajectories), grow when the fluid rises
and shrink when it settles, and compose with the fused Pallas kernels.

The physics claim being tested: with config.domain_res carrying the true
grid, every clamp/spring/BC position is domain-anchored, so cells above the
window are provably inert and windowing is invisible to the trajectory."""

import numpy as np
import jax
import jax.numpy as jnp

from mpm_tpu import make_step
from mpm_tpu.core.params import FluidParams, SimConfig
from mpm_tpu.models.emitters import box_lattice
from mpm_tpu.core.state import make_state
from mpm_tpu.ops import bucketed
from mpm_tpu.ops.pallas import fused
from mpm_tpu.ops.window import YWindow, window_config


def _pool_scene(ny=32, gy=-0.3):
    """A low pool in a tall domain: grid (16, ny, 16), particles y in
    roughly [3, 9] -> plenty of inert air above."""
    grid = (16, ny, 16)
    pos = box_lattice(grid, (10.0, 6.0, 10.0), 0.8, center=(8.0, 6.0, 8.0))
    config = SimConfig(grid_res=grid, num_particles=pos.shape[0],
                       substeps=2, bin_capacity=8)
    fluid = FluidParams.create(dim=3, eos_stiffness=4.0, eos_power=4.0,
                               gravity=gy)
    return config, fluid, make_state(pos)


def _linear(bstate, n):
    s = bucketed.to_simstate(bstate, n)
    return [np.asarray(x) for x in (s.pos, s.vel, s.C, s.mass, s.ids)]


def _assert_same(a, b):
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_windowed_matches_full_grid_exactly():
    config, fluid, state = _pool_scene()
    n = config.num_particles
    full_step = make_step(config, mode="bucketed", substeps=4, donate=False)
    s_full = jax.jit(lambda s: bucketed.from_simstate(s, config))(state)

    win = YWindow(config, mode="bucketed", substeps=4, donate=False,
                  sync_polls=True)
    s_win = win.init(state)
    assert win.wy < config.grid_res[1]  # the air is actually windowed out

    for _ in range(5):
        s_full = full_step(s_full, fluid, ())
        s_win = win.step(s_win, fluid, ())
        _assert_same(_linear(s_full, n), _linear(s_win, n))
    assert int(s_win.lost) == 0
    assert win.interference == 0 and int(s_win.ceiling) == 0


def test_window_grows_under_gravity_flip_and_stays_exact():
    """Upward gravity drives the pool to the ceiling: the window must grow
    (eventually to the full grid, where the TRUE top wall fires identically
    to the unwindowed engine)."""
    config, fluid, state = _pool_scene(ny=32, gy=+0.5)
    n = config.num_particles
    full_step = make_step(config, mode="bucketed", substeps=4, donate=False)
    s_full = jax.jit(lambda s: bucketed.from_simstate(s, config))(state)

    win = YWindow(config, mode="bucketed", substeps=4, donate=False,
                  sync_polls=True)
    s_win = win.init(state)
    wy0 = win.wy
    assert wy0 < config.grid_res[1]
    for _ in range(12):
        s_full = full_step(s_full, fluid, ())
        s_win = win.step(s_win, fluid, ())
        _assert_same(_linear(s_full, n), _linear(s_win, n))
    assert win.wy > wy0 and win.resizes >= 1
    assert win.wy == config.grid_res[1]  # reached the ceiling -> full grid
    assert win.interference == 0  # fresh polls + S+5 margin -> certified


def test_window_shrinks_as_column_collapses():
    """A tall thin column collapsing under gravity: max occupied y falls,
    so the window must shrink (with hysteresis) while staying exact."""
    grid = (16, 48, 16)
    pos = box_lattice(grid, (4.0, 24.0, 4.0), 0.8, center=(8.0, 14.0, 8.0))
    config = SimConfig(grid_res=grid, num_particles=pos.shape[0],
                       substeps=2, bin_capacity=8)
    fluid = FluidParams.create(dim=3, eos_stiffness=4.0, eos_power=4.0)
    n = config.num_particles

    full_step = make_step(config, mode="bucketed", substeps=4, donate=False)
    s_full = jax.jit(lambda s: bucketed.from_simstate(s, config))(state := make_state(pos))
    win = YWindow(config, mode="bucketed", substeps=4, donate=False,
                  quantum=4, sync_polls=True)
    s_win = win.init(state)
    wy0 = win.wy
    for _ in range(12):
        s_full = full_step(s_full, fluid, ())
        s_win = win.step(s_win, fluid, ())
    _assert_same(_linear(s_full, n), _linear(s_win, n))
    assert win.wy < wy0 and win.resizes >= 1


def test_windowed_fused_kernels_match_full_grid():
    """The production Pallas path (kernel P + F, interpret mode on CPU)
    under a windowed config must equal the full-grid fused path."""
    config, fluid, state = _pool_scene(ny=32)
    n = config.num_particles
    wcfg = window_config(config, 16)
    assert fused.fused_supported(wcfg)

    s_full = jax.jit(lambda s: bucketed.from_simstate(s, config))(state)
    s_win = jax.jit(lambda s: bucketed.from_simstate(s, wcfg))(state)
    for _ in range(3):
        s_full = fused.substep_fused(s_full, config, fluid, (), interpret=True)
        s_win = fused.substep_fused(s_win, wcfg, fluid, (), interpret=True)
    _assert_same(_linear(s_full, n), _linear(s_win, n))


def test_resize_preserves_particles_and_parking():
    config, _, state = _pool_scene(ny=32)
    n = config.num_particles
    win = YWindow(config, mode="bucketed", substeps=2, donate=False)
    s = win.init(state)
    before = _linear(s, n)
    # force a grow then a shrink through the jitted resize fns
    grown = win._resize_fn(win.wy, win.wy + 8)(s)
    back = win._resize_fn(win.wy + 8, win.wy)(grown)
    _assert_same(before, _linear(back, n))
    # empty slots in the grown region are parked at their own cell centers
    gcfg = window_config(config, win.wy + 8)
    centers = np.asarray(bucketed.cell_coords(gcfg, jnp.float32)) + 0.5
    gm = np.asarray(grown.mass)
    gp = np.asarray(grown.pos)
    empty = gm == 0
    for d in range(3):
        np.testing.assert_array_equal(
            gp[d].T[empty.T], np.broadcast_to(centers[d][:, None],
                                              gm.T.shape)[empty.T])


def test_ceiling_band_rejects_and_counts():
    """The window's top 3 planes reject incoming y-movers like a full
    bucket (counted in state.ceiling), keeping the invariant in-kernel —
    identically in the XLA and fused engines."""
    grid = (16, 32, 16)
    wcfg = window_config(
        SimConfig(grid_res=grid, num_particles=0, substeps=2, bin_capacity=8),
        16)
    # particles in row y=12 (= wy-4, the last allowed row) moving up fast
    pos = np.stack(np.meshgrid(np.arange(5, 11) + 0.5,
                               [12.9], np.arange(5, 11) + 0.5,
                               indexing="ij"), -1).reshape(-1, 3)
    st = make_state(np.asarray(pos, np.float32))
    st = st.replace(vel=st.vel.at[1].set(5.0)) if hasattr(st, "replace") else st
    import dataclasses
    st = dataclasses.replace(st, vel=jnp.asarray(st.vel).at[1].set(5.0))
    fluid = FluidParams.create(dim=3, gravity=0.0)
    wcfg = dataclasses.replace(wcfg, num_particles=pos.shape[0])

    b = jax.jit(lambda s: bucketed.from_simstate(s, wcfg))(st)
    s_x = jax.jit(lambda b, f: bucketed.substep(b, wcfg, f, ()))(b, fluid)
    s_f = fused.substep_fused(b, wcfg, fluid, (), interpret=True)
    for s_out in (s_x, s_f):
        assert int(s_out.ceiling) > 0  # movers were ceiling-rejected
        # nothing lost, nothing above the band
        assert int(s_out.lost) == 0
        occ = np.asarray(s_out.mass) > 0
        ys = np.floor(np.asarray(s_out.pos[1]))[occ]
        assert ys.max() <= 16 - 4
        assert occ.sum() == pos.shape[0]
    # the engines agree (float paths are close, not bit-equal — as in
    # tests/test_fused.py); the integer counters and ids agree exactly
    for a, b in zip(_linear(s_x, pos.shape[0]), _linear(s_f, pos.shape[0])):
        np.testing.assert_allclose(a, b, atol=1e-5)
    assert int(s_x.ceiling) == int(s_f.ceiling)


def test_ceiling_counter_is_cumulative_across_substeps():
    """Regression (ADVICE r3): g2p_bucketed rebuilt BucketState without
    ceiling=, resetting the counter every substep — after a multi-substep
    chunk it held only the LAST substep's hits, so YWindow._confirm (which
    diffs a supposedly monotonic counter) could under-count interference
    and falsely certify a windowed run. The counter must accumulate across
    substeps identically in the XLA-bucketed and fused engines."""
    import dataclasses

    grid = (16, 32, 16)
    wcfg = window_config(
        SimConfig(grid_res=grid, num_particles=0, substeps=2, bin_capacity=8),
        16)
    pos = np.stack(np.meshgrid(np.arange(5, 11) + 0.5,
                               [12.9], np.arange(5, 11) + 0.5,
                               indexing="ij"), -1).reshape(-1, 3)
    st = make_state(np.asarray(pos, np.float32))
    st = dataclasses.replace(st, vel=jnp.asarray(st.vel).at[1].set(5.0))
    fluid = FluidParams.create(dim=3, gravity=0.0)
    wcfg = dataclasses.replace(wcfg, num_particles=pos.shape[0])

    b0 = jax.jit(lambda s: bucketed.from_simstate(s, wcfg))(st)
    s_x, s_f = b0, b0
    ceil_after_1 = None
    for i in range(3):
        s_x = jax.jit(lambda b, f: bucketed.substep(b, wcfg, f, ()))(s_x, fluid)
        s_f = fused.substep_fused(s_f, wcfg, fluid, (), interpret=True)
        if i == 0:
            ceil_after_1 = int(s_x.ceiling)
            assert ceil_after_1 > 0
        assert int(s_x.ceiling) == int(s_f.ceiling)
    # hits occur on EVERY substep here (movers keep pressing the band), so a
    # reset-per-substep counter would show ~ceil_after_1, not the sum
    assert int(s_x.ceiling) > ceil_after_1


def test_windowed_state_renders_identically():
    """Rendering a windowed state must produce the same frame as the
    full-grid state (positions are world-space; the renderer never sees the
    window)."""
    from mpm_tpu.render import Camera, RenderConfig
    from mpm_tpu.render.camera import look_at
    from mpm_tpu.render.pipeline import render_frame_buckets

    config, fluid, state = _pool_scene()
    full_step = make_step(config, mode="bucketed", substeps=4, donate=False)
    s_full = jax.jit(lambda s: bucketed.from_simstate(s, config))(state)
    win = YWindow(config, mode="bucketed", substeps=4, donate=False,
                  sync_polls=True)
    s_win = win.init(state)
    for _ in range(2):
        s_full = full_step(s_full, fluid, ())
        s_win = win.step(s_win, fluid, ())

    cam = Camera(width=120, height=80)
    rc = RenderConfig(camera=cam)
    view = jnp.asarray(look_at((40.0, 30.0, 40.0), (8.0, 6.0, 8.0)))
    img_f = np.asarray(render_frame_buckets(s_full, view, rc, interpret=True))
    img_w = np.asarray(render_frame_buckets(s_win, view, rc, interpret=True))
    np.testing.assert_array_equal(img_f, img_w)


def test_windowed_config_composes_with_sharding():
    """The air-window composes with the multi-device slab decomposition:
    a y-windowed config through the sharded production kernels (shard_map,
    virtual mesh) must match the unsharded windowed fused step slot-for-slot
    — walls/clamps stay at the true domain on every shard, and the ceiling
    band applies identically (it is a per-column rule, bitwise-consistent
    across shard boundaries like the overflow rejection)."""
    import jax
    from jax.sharding import Mesh

    from mpm_tpu.parallel import domain

    config, fluid, state = _pool_scene(ny=32)
    wcfg = window_config(config, 16)
    assert fused.fused_supported(wcfg)
    b0 = jax.jit(lambda s: bucketed.from_simstate(s, wcfg))(state)

    s_ref = b0
    for _ in range(3):
        s_ref = fused.substep_fused(s_ref, wcfg, fluid, (), interpret=True)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("x",))
    step = domain.make_sharded_bucket_step(wcfg, mesh, substeps=3,
                                           interpret=True)
    s_sh = step(domain.shard_bucket_state(b0, mesh), fluid, ())

    np.testing.assert_allclose(np.asarray(s_sh.pos), np.asarray(s_ref.pos),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(s_sh.ids), np.asarray(s_ref.ids))
    assert int(s_sh.lost) == int(s_ref.lost) == 0
    assert int(s_sh.ceiling) == int(s_ref.ceiling)


def test_dynamic_window_driver_over_mesh():
    """The full dynamic window driver (grow/shrink) over a device mesh:
    a collapsing column stepped by YWindow(mesh=...) must match the
    unsharded windowed driver exactly, including the resize schedule."""
    from jax.sharding import Mesh

    grid = (16, 48, 16)
    pos = box_lattice(grid, (4.0, 24.0, 4.0), 0.8, center=(8.0, 14.0, 8.0))
    config = SimConfig(grid_res=grid, num_particles=pos.shape[0],
                       substeps=2, bin_capacity=8)
    fluid = FluidParams.create(dim=3, eos_stiffness=4.0, eos_power=4.0)
    n = config.num_particles
    state = make_state(pos)

    win1 = YWindow(config, mode="pallas", substeps=4, donate=False,
                   quantum=4, sync_polls=True, interpret=True)
    s1 = win1.init(state)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("x",))
    win2 = YWindow(config, substeps=4, donate=False, quantum=4,
                   sync_polls=True, mesh=mesh, interpret=True)
    s2 = win2.init(state)
    assert win1.wy == win2.wy
    for _ in range(10):
        s1 = win1.step(s1, fluid, ())
        s2 = win2.step(s2, fluid, ())
        assert win1.wy == win2.wy, "resize schedules diverged"
    # sharded P2G stages accumulate in a different order than unsharded
    # kernel P — allclose like tests/test_sharded.py; ids exact
    a, b = _linear(s1, n), _linear(s2, n)
    for x, y in zip(a[:4], b[:4]):
        np.testing.assert_allclose(x, y, atol=1e-5)
    np.testing.assert_array_equal(a[4], b[4])
    assert win2.resizes >= 1  # the collapse shrank the window
    assert win1.interference == 0 and win2.interference == 0
