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


def test_chunked_select_matches_bucketed():
    """Sub-plane select gating (fused._CHUNK, default 512): planes with
    pc > 512 run the migration selects per column span, skipping mover-free
    spans. Must stay slot-identical to the XLA engine — this grid
    (16, 16, 64), pc = 1024 = 2 chunks, is the smallest config that
    exercises the chunked path (the other tests' 16^3 grids fall back to
    full-plane selects)."""
    from mpm_tpu.core.params import SimConfig
    from mpm_tpu.core.state import make_state
    from mpm_tpu.models.emitters import box_lattice
    from mpm_tpu.core.params import FluidParams

    assert fused._CHUNK == 512  # test assumes the production default
    pos = box_lattice((16, 16, 64), (8.0, 8.0, 24.0), 0.9)
    config = SimConfig(
        grid_res=(16, 16, 64),
        num_particles=pos.shape[0],
        substeps=2,
        clamp_lo=2.0,
        clamp_hi_offset=2.0,
        wall_min=3.0,
        wall_max_offset=3.0,
        wall_stiffness=1.0,
        bin_capacity=8,
    )
    fluid = FluidParams.create(dim=3, eos_stiffness=1.0, eos_power=7.0)
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(make_state(pos))
    s_x, s_f = b, b
    for _ in range(3):
        s_x = jax.jit(lambda b, f: bucketed.substep(b, config, f, ()))(s_x, fluid)
        s_f = fused.substep_fused(s_f, config, fluid, (), interpret=True)
    np.testing.assert_array_equal(np.asarray(s_x.ids), np.asarray(s_f.ids))
    np.testing.assert_allclose(np.asarray(s_x.pos), np.asarray(s_f.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_x.vel), np.asarray(s_f.vel), atol=1e-5)
    assert int(s_f.lost) == int(s_x.lost) == 0


def _small_fixed():
    sc = fluid_3d(grid_res=16, box=8.0, spacing=0.8)
    config = sc.config.replace(bin_capacity=8, fixed_point=True)
    return config, sc.fluid, sc.state


def test_fused_fixed_point_runs_production_path():
    """S4-style fixed-point configs must run the Pallas kernels P + F (int32
    grid accumulators, p2g_1.glsl:87-90), not the XLA fallback, and track the
    XLA bucketed fixed-point engine closely (the two engines factor per-tap
    contributions differently, so agreement is tolerance-level; bit-level
    guarantees are across permutations/shards WITHIN an engine, below)."""
    config, fluid, state = _small_fixed()
    assert fused.fused_supported(config)  # the dispatch gate now accepts S4
    from mpm_tpu.ops.pallas.p2g_fused import p2g_update_supported

    assert p2g_update_supported(config)
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(state)
    s_x, s_f = b, b
    for _ in range(3):
        s_x = jax.jit(lambda b, f: bucketed.substep(b, config, f, ()))(s_x, fluid)
        s_f = fused.substep_fused(s_f, config, fluid, (), interpret=True)
    np.testing.assert_array_equal(np.asarray(s_x.ids), np.asarray(s_f.ids))
    np.testing.assert_allclose(np.asarray(s_x.pos), np.asarray(s_f.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_x.vel), np.asarray(s_f.vel), atol=1e-4)
    assert int(s_f.lost) == int(s_x.lost) == 0


def test_fused_fixed_point_permutation_bit_exact():
    """int32 grid accumulation commutes exactly and every per-particle
    contribution is slot-intrinsic, so the Pallas fixed-point substep must be
    BIT-identical across particle input permutations (the reference's
    order-insensitive atomicAdd guarantee, MLSMPM3DFluidMultithreadNew.cs:336)."""
    config, fluid, state = _small_fixed()
    rng = np.random.default_rng(42)
    perm = jnp.asarray(rng.permutation(state.num_particles))
    state_p = state.permute(perm)

    def run(s0):
        b = jax.jit(lambda s: bucketed.from_simstate(s, config))(s0)
        for _ in range(3):
            b = fused.substep_fused(b, config, fluid, (), interpret=True)
        # overflow rejection picks victims by slot rank, which IS
        # order-sensitive — bit-exactness across permutations is claimed
        # (and tested) for overflow-free steps only
        assert int(b.deferred) == 0 and int(b.lost) == 0
        return bucketed.to_simstate(b, config.num_particles).by_id()

    a = run(state)
    c = run(state_p)
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(c.ids))
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(c.pos))
    np.testing.assert_array_equal(np.asarray(a.vel), np.asarray(c.vel))
    np.testing.assert_array_equal(np.asarray(a.C), np.asarray(c.C))


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


def test_bf16_packed_windowed_matches_full_grid():
    """The official-bench combination: bf16 storage (the PACKED migration —
    vel+C as 6 bf16-pair int32 rows through the selects) under a y-window.
    Windowing must stay invisible: windowed == full-grid bit-for-bit."""
    from mpm_tpu.ops.window import window_config

    sc = fluid_3d(grid_res=16, box=8.0, spacing=0.8)
    config = sc.config.replace(bin_capacity=8, grid_res=(16, 32, 16),
                               storage_dtype="bfloat16")
    wcfg = window_config(config, 16)
    assert fused.fused_supported(wcfg)
    b_full = jax.jit(lambda s: bucketed.from_simstate(s, config))(sc.state)
    b_win = jax.jit(lambda s: bucketed.from_simstate(s, wcfg))(sc.state)
    for _ in range(3):
        b_full = fused.substep_fused(b_full, config, sc.fluid, (),
                                     interpret=True)
        b_win = fused.substep_fused(b_win, wcfg, sc.fluid, (),
                                    interpret=True)
    a = bucketed.to_simstate(b_full, config.num_particles)
    b = bucketed.to_simstate(b_win, config.num_particles)
    for x, y in ((a.pos, b.pos), (a.vel, b.vel), (a.C, b.C), (a.ids, b.ids)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert int(b_win.ceiling) == 0 and int(b_win.lost) == 0


def test_bf16_packed_sharded_matches_fused():
    """Config-5 combination: the packed-migration kernels inside shard_map
    (slab halos exchange bf16 vel/C state) must match the single-device
    packed path slot-for-slot."""
    from jax.sharding import Mesh

    from mpm_tpu.parallel import domain

    sc = fluid_3d(grid_res=16, box=8.0, spacing=0.8)
    config = sc.config.replace(bin_capacity=8, storage_dtype="bfloat16")
    b0 = jax.jit(lambda s: bucketed.from_simstate(s, config))(sc.state)
    s_ref = b0
    for _ in range(3):
        s_ref = fused.substep_fused(s_ref, config, sc.fluid, (),
                                    interpret=True)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("x",))
    step = domain.make_sharded_bucket_step(config, mesh, substeps=3,
                                           interpret=True)
    s_sh = step(domain.shard_bucket_state(b0, mesh), sc.fluid, ())
    np.testing.assert_array_equal(np.asarray(s_sh.ids), np.asarray(s_ref.ids))
    np.testing.assert_allclose(np.asarray(s_sh.pos), np.asarray(s_ref.pos),
                               atol=1e-6)
    # sharded P2G accumulates in a different order -> values at a bf16
    # rounding boundary may land one ulp apart (same tolerance as
    # test_bf16_storage_engines_match)
    np.testing.assert_allclose(
        np.asarray(s_sh.vel).astype(np.float32),
        np.asarray(s_ref.vel).astype(np.float32), rtol=0.01, atol=1e-4)
    assert int(s_sh.lost) == int(s_ref.lost) == 0
