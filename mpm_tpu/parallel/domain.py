"""Spatial domain decomposition over the TPU mesh — SPMD grid-slab sharding.

The reference is strictly single-device (SURVEY.md §2.5: "no multi-device
decomposition of any kind"); this is the subsystem the TPU rebuild adds. The
design follows SURVEY.md §5 "long-context" mapping: the spatial analogue of
sequence/context parallelism is grid-domain decomposition —

- the dense grid is sharded in slabs along axis 0 over a 1-D device mesh;
- each shard owns the particles whose base cell lies in its slab, in
  fixed-capacity lane-major arrays with dead-slot masking (mass == 0);
- P2G accumulates into a local grid with one halo plane per side (the
  quadratic B-spline support is one cell, p2g_1.glsl:56-93), which is
  reduce-exchanged to neighbors over ICI with `lax.ppermute`;
- the updated grid's edge planes are exchanged back so G2P can gather its
  3^D neighborhood;
- after advection, particles whose base cell left the slab migrate to the
  neighbor via fixed-capacity ppermute buffers, folded into the existing
  per-substep sort (migrants sort to the ends of the sorted order because
  their cell ids are extreme — no extra sort, no scatter).

Determinism: per-cell accumulation order equals the sorted order of the
owning shard; in int32 fixed-point mode sharded and unsharded runs are
bit-identical (integer adds commute).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.params import FluidParams, SimConfig
from ..core.state import Grid, SimState
from ..models.scenes import Scene
from ..ops import binned, reference, transfer
from ..ops.grid import update_grid
from ..ops.interact import Interaction
from ..ops.segsum import segment_bounds_for_offset, sorted_segment_sum

DEAD_CID = np.int32(2_000_000_000)


@dataclasses.dataclass(frozen=True)
class ShardConfig:
    n_shards: int
    axis: str = "x"
    local_capacity: int = 0  # particle slots per shard (N_cap)
    migration_capacity: int = 0  # per-side migration buffer (P_cap)

    def local_planes(self, config: SimConfig) -> int:
        assert config.grid_res[0] % self.n_shards == 0, (
            "grid axis 0 must divide evenly over shards"
        )
        return config.grid_res[0] // self.n_shards


def _plane_cells(config: SimConfig) -> int:
    return math.prod(config.grid_res[1:])


def _local_config(config: SimConfig, sconf: ShardConfig) -> SimConfig:
    """Config describing the padded local grid (slab + 1 halo plane/side);
    used only for tap offsets / cell counts / dtype flags."""
    loc_x = sconf.local_planes(config)
    return config.replace(grid_res=(loc_x + 2, *config.grid_res[1:]))


def _local_geometry(pos, alive, config: SimConfig, sconf: ShardConfig, x0):
    """Geometry against the padded local grid: flat id uses the halo-shifted
    x plane; dead particles get DEAD_CID (sort last, excluded from every
    segment)."""
    base_raw = jnp.floor(pos).astype(jnp.int32)
    # per-axis python-int bounds: array-constant operands to clip trigger a
    # closed_call lowering KeyError under shard_map+scan in jax 0.9
    base = jnp.stack(
        [
            jnp.clip(base_raw[a], 1, config.grid_res[a] - 2)
            for a in range(config.dim)
        ]
    )
    d = pos - base.astype(pos.dtype) - 0.5
    px = base[0] - x0 + 1  # padded plane index, interior = [1, loc_x]
    lcid = px
    for a in range(1, config.dim):
        lcid = lcid * config.grid_res[a] + base[a]
    lcid = jnp.where(alive, lcid, DEAD_CID)
    return transfer.TransferGeometry(base=base, d=d, flat_base=lcid)


def _update_grid_local(
    grid: Grid, cfg_local: SimConfig, config: SimConfig, fp: FluidParams, x0
) -> Grid:
    """Grid update with GLOBAL boundary bands: axis-0 band membership is
    evaluated at global coordinates (local plane p -> global x = x0 + p - 1);
    other axes are global already. Reuses the dense update by temporarily
    treating the padded grid as the full grid and masking axis-0 bands
    manually."""
    from ..ops import fixed_point
    from ..ops.grid import axis_indices
    from ..core.params import BC_FRICTION, BC_SLIP, BC_STICK

    if config.fixed_point:
        mass = fixed_point.decode(grid.mass, config.fixed_point_mult, config.dtype)
        mom = fixed_point.decode(grid.mom, config.fixed_point_mult, config.dtype)
    else:
        mass, mom = grid.mass, grid.mom

    has_mass = mass > 0
    vel = mom / jnp.where(has_mass, mass, 1.0) + fp.dt * fp.gravity[:, None]

    idxs = axis_indices(cfg_local)
    gx = x0 + idxs[0] - 1  # global x of each padded plane
    bands = [
        (gx < config.bc_band_lo)
        | (gx > config.grid_res[0] - 1 - config.bc_band_hi)
    ]
    for a in range(1, config.dim):
        bands.append(
            (idxs[a] < config.bc_band_lo)
            | (idxs[a] > config.grid_res[a] - 1 - config.bc_band_hi)
        )

    if config.bc == BC_SLIP:
        vel = jnp.stack(
            [jnp.where(bands[a], 0.0, vel[a]) for a in range(config.dim)]
        )
    elif config.bc == BC_STICK:
        any_band = bands[0]
        for a in range(1, config.dim):
            any_band = any_band | bands[a]
        vel = jnp.where(any_band, 0.0, vel)
    elif config.bc == BC_FRICTION:
        for a in range(config.dim):
            scale = jnp.where(bands[a], config.friction, 1.0)
            rows = [
                jnp.where(bands[a], 0.0, vel[i]) if i == a else vel[i] * scale
                for i in range(config.dim)
            ]
            vel = jnp.stack(rows)

    vel = jnp.where(has_mass, vel, 0.0)
    if config.fixed_point:
        vel = fixed_point.encode(vel, config.fixed_point_mult)
    return Grid(mom=vel, mass=grid.mass)


def _perm(n, shift):
    return [(i, (i + shift) % n) for i in range(n)]


def sharded_substep(
    state: SimState,
    config: SimConfig,
    sconf: ShardConfig,
    fp: FluidParams,
    interactions: Sequence[Interaction] = (),
) -> SimState:
    """One substep on the local shard (runs inside shard_map)."""
    n = sconf.n_shards
    axname = sconf.axis
    ax = jax.lax.axis_index(axname)
    loc_x = sconf.local_planes(config)
    pc = _plane_cells(config)
    x0 = ax * loc_x
    cfg_local = _local_config(config, sconf)
    n_cap = state.num_particles
    p_cap = sconf.migration_capacity

    alive = state.mass > 0

    # ---- sort by local cell id (dead last) ----
    geom0 = _local_geometry(state.pos, alive, config, sconf, x0)
    order = jnp.argsort(geom0.flat_base)
    state = state.permute(order)
    alive = state.mass > 0
    lcid_s = geom0.flat_base[order]
    seg_start = jnp.searchsorted(
        lcid_s, jnp.arange(cfg_local.num_cells + 1, dtype=lcid_s.dtype)
    ).astype(jnp.int32)
    geom = _local_geometry(state.pos, alive, config, sconf, x0)

    # ---- P2G pass 1 into padded local grid ----
    grid = binned.p2g_pass1(state, geom, seg_start, cfg_local)

    # ---- halo reduce (pass-1 mass + momentum) ----
    def plane(gr, p):
        return (
            jax.lax.dynamic_slice_in_dim(gr.mom, p * pc, pc, axis=1),
            jax.lax.dynamic_slice_in_dim(gr.mass, p * pc, pc, axis=0),
        )

    zero = jnp.zeros((), grid.mom.dtype)

    def halo_reduce(gr, mom_only: bool = False):
        """Add my halo planes into the neighbors' edge interiors (wrap-around
        at the global edges is physically zero — positions are clamped inside,
        g2p.glsl:115-119 — masked anyway). `mom_only` skips mass — the second
        reduce must not re-add the filled halo mass (it is the neighbor's own
        interior mass, not a contribution)."""
        lo_mom, lo_mass = plane(gr, 0)  # my x0-1 plane -> left nbr's last
        hi_mom, hi_mass = plane(gr, loc_x + 1)  # -> right nbr's first
        recv_hi_mom = jax.lax.ppermute(lo_mom, axname, _perm(n, -1))
        recv_hi_mass = jax.lax.ppermute(lo_mass, axname, _perm(n, -1))
        recv_lo_mom = jax.lax.ppermute(hi_mom, axname, _perm(n, 1))
        recv_lo_mass = jax.lax.ppermute(hi_mass, axname, _perm(n, 1))
        recv_lo_mom = jnp.where(ax == 0, zero, recv_lo_mom)
        recv_lo_mass = jnp.where(ax == 0, zero, recv_lo_mass)
        recv_hi_mom = jnp.where(ax == n - 1, zero, recv_hi_mom)
        recv_hi_mass = jnp.where(ax == n - 1, zero, recv_hi_mass)
        if mom_only:
            recv_lo_mass = jnp.zeros_like(recv_lo_mass)
            recv_hi_mass = jnp.zeros_like(recv_hi_mass)

        def add_plane(g, p, dmom, dmass):
            mom = jax.lax.dynamic_update_slice_in_dim(
                g.mom,
                jax.lax.dynamic_slice_in_dim(g.mom, p * pc, pc, 1) + dmom,
                p * pc,
                1,
            )
            mass = jax.lax.dynamic_update_slice_in_dim(
                g.mass,
                jax.lax.dynamic_slice_in_dim(g.mass, p * pc, pc, 0) + dmass,
                p * pc,
                0,
            )
            return Grid(mom=mom, mass=mass)

        gr = add_plane(gr, 1, recv_lo_mom, recv_lo_mass)
        return add_plane(gr, loc_x, recv_hi_mom, recv_hi_mass)

    def set_plane(gr, p, dmom, dmass):
        mom = jax.lax.dynamic_update_slice_in_dim(gr.mom, dmom, p * pc, 1)
        mass = jax.lax.dynamic_update_slice_in_dim(gr.mass, dmass, p * pc, 0)
        return Grid(mom=mom, mass=mass)

    def halo_fill(gr, mom_too: bool):
        """Fill my halo planes with the neighbors' edge-interior values (mass
        always — the pass-2 density gather needs the complete neighborhood;
        momentum only for the post-update velocity exchange). When momentum
        is not filled the halo momentum is ZEROED so pass 2's fresh halo
        contributions can be reduced over cleanly."""
        first_mom, first_mass = plane(gr, 1)
        last_mom, last_mass = plane(gr, loc_x)
        fill_hi_mom = jax.lax.ppermute(first_mom, axname, _perm(n, -1))
        fill_hi_mass = jax.lax.ppermute(first_mass, axname, _perm(n, -1))
        fill_lo_mom = jax.lax.ppermute(last_mom, axname, _perm(n, 1))
        fill_lo_mass = jax.lax.ppermute(last_mass, axname, _perm(n, 1))
        lo_mom = jnp.where(ax == 0, zero, fill_lo_mom) if mom_too else (
            jnp.zeros_like(fill_lo_mom)
        )
        hi_mom = jnp.where(ax == n - 1, zero, fill_hi_mom) if mom_too else (
            jnp.zeros_like(fill_hi_mom)
        )
        gr = set_plane(gr, 0, lo_mom, jnp.where(ax == 0, zero, fill_lo_mass))
        return set_plane(
            gr, loc_x + 1, hi_mom, jnp.where(ax == n - 1, zero, fill_hi_mass)
        )

    grid = halo_reduce(grid)
    # mass halo fill (density gather support) + zero halo momentum so the
    # second reduce carries exactly pass-2's contributions
    grid = halo_fill(grid, mom_too=False)

    # ---- P2G pass 2 (density + EOS/viscosity force) ----
    grid = binned.p2g_pass2(state, geom, seg_start, grid, cfg_local, fp)

    # ---- second halo reduce: pass-2 momentum written into halo planes ----
    grid = halo_reduce(grid, mom_only=True)

    # ---- grid update (global boundary bands) ----
    grid = _update_grid_local(grid, cfg_local, config, fp, x0)

    # ---- halo exchange of updated velocities for G2P ----
    grid = halo_fill(grid, mom_too=True)

    # ---- G2P + tail ----
    # gather against the LOCAL padded grid, but run the advection tail
    # (clamps, wall springs) against GLOBAL coordinates — using cfg_local
    # there would clamp every shard's particles into [0, loc_x+2)
    vel_g, C_g = reference.g2p_gather(grid, geom, cfg_local)
    new_state = reference.g2p_tail(state, vel_g, C_g, config, fp, interactions)
    # freeze dead slots (parking inside the slab so their cell id stays local)
    dtype = new_state.pos.dtype
    park_rest = jnp.asarray(
        [0.0] + [r / 2.0 for r in config.grid_res[1:]], dtype
    )
    park_x = jnp.asarray([1.0] + [0.0] * (config.dim - 1), dtype) * (
        x0.astype(dtype) + loc_x / 2.0
    )
    park = (park_rest + park_x)[:, None]
    pos = jnp.where(alive, new_state.pos, park)
    vel = jnp.where(alive, new_state.vel, 0.0)
    C = jnp.where(alive, new_state.C, 0.0)
    state = SimState(pos=pos, vel=vel, C=C, mass=state.mass, ids=state.ids)

    # ---- migration ----
    new_bx = jnp.clip(
        jnp.floor(state.pos[0]).astype(jnp.int32), 1, config.grid_res[0] - 2
    )
    go_left = alive & (new_bx < x0)
    go_right = alive & (new_bx >= x0 + loc_x)

    n_live = seg_start[-1]

    def get_buffer(sl_start, mask):
        idx = sl_start + jnp.arange(p_cap, dtype=jnp.int32)
        idx = jnp.clip(idx, 0, n_cap - 1)
        m = mask[idx]
        buf = SimState(
            pos=state.pos[:, idx],
            vel=state.vel[:, idx],
            C=state.C[:, :, idx],
            mass=jnp.where(m, state.mass[idx], 0.0),
            ids=jnp.where(m, state.ids[idx], -1),
        )
        return buf

    # migrants-to-left sit at the front of the sorted order (lowest cell ids),
    # migrants-to-right at the live tail (highest) — the sort already grouped
    # them; fixed windows + masks extract up to p_cap each
    left_buf = get_buffer(jnp.int32(0), go_left)
    r_start = jnp.maximum(n_live - p_cap, 0)
    right_buf = get_buffer(r_start, go_right)

    # Mark ONLY the exported migrants dead; migrants outside the windows
    # (more boundary-plane particles than p_cap) stay alive and retry next
    # substep — their out-of-slab cell id sorts them to the array ends, and
    # meanwhile their P2G contributions land in the halo planes, which the
    # halo-reduce already routes to the owning neighbor.
    idx_all = jnp.arange(n_cap, dtype=jnp.int32)
    exported = (go_left & (idx_all < p_cap)) | (
        go_right & (idx_all >= r_start) & (idx_all < n_live)
    )
    state = SimState(
        pos=state.pos,
        vel=state.vel,
        C=state.C,
        mass=jnp.where(exported, 0.0, state.mass),
        ids=state.ids,
    )

    # exchange: left_buf -> left neighbor, right_buf -> right neighbor
    recv_from_right = jax.tree_util.tree_map(
        lambda x: jax.lax.ppermute(x, axname, _perm(n, -1)), left_buf
    )
    recv_from_left = jax.tree_util.tree_map(
        lambda x: jax.lax.ppermute(x, axname, _perm(n, 1)), right_buf
    )
    # wrap-around at the global edges carries no live particles (positions
    # clamped inside the domain) — mask defensively
    recv_from_left = dataclasses.replace(
        recv_from_left, mass=jnp.where(ax == 0, 0.0, recv_from_left.mass)
    )
    recv_from_right = dataclasses.replace(
        recv_from_right, mass=jnp.where(ax == n - 1, 0.0, recv_from_right.mass)
    )

    # land received particles in the tail 2*p_cap slots: live particles never
    # reach there (capacity invariant n_live <= n_cap - 2*p_cap)
    def land(st, buf, offset):
        return SimState(
            pos=jax.lax.dynamic_update_slice_in_dim(st.pos, buf.pos, offset, 1),
            vel=jax.lax.dynamic_update_slice_in_dim(st.vel, buf.vel, offset, 1),
            C=jax.lax.dynamic_update_slice_in_dim(st.C, buf.C, offset, 2),
            mass=jax.lax.dynamic_update_slice_in_dim(st.mass, buf.mass, offset, 0),
            ids=jax.lax.dynamic_update_slice_in_dim(st.ids, buf.ids, offset, 0),
        )

    state = land(state, recv_from_left, n_cap - 2 * p_cap)
    state = land(state, recv_from_right, n_cap - p_cap)
    return state


def make_sharded_step(
    config: SimConfig,
    sconf: ShardConfig,
    mesh: Mesh,
    substeps: int | None = None,
):
    """Jitted sharded frame step: (global SimState, FluidParams, interactions)
    with particle arrays sharded along the particle axis."""
    pspecs = SimState(
        pos=P(None, sconf.axis),
        vel=P(None, sconf.axis),
        C=P(None, None, sconf.axis),
        mass=P(sconf.axis),
        ids=P(sconf.axis),
    )

    nsub = substeps if substeps is not None else config.substeps

    def frame(state, fp, interactions):
        def local(state, fp, interactions):
            def body(s, _):
                return (
                    sharded_substep(s, config, sconf, fp, interactions),
                    None,
                )

            out, _ = jax.lax.scan(body, state, None, length=nsub)
            return out

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(pspecs, P(), P()),
            out_specs=pspecs,
        )(state, fp, interactions)

    return jax.jit(frame, donate_argnums=(0,))


def shard_scene(
    scene: Scene,
    sconf: ShardConfig,
    mesh: Mesh,
) -> SimState:
    """Distribute a scene's particles into per-shard fixed-capacity arrays
    (dead-slot padded) and device_put with the matching sharding."""
    config = scene.config
    n = sconf.n_shards
    loc_x = config.grid_res[0] // n
    n_cap = sconf.local_capacity
    p_cap = sconf.migration_capacity
    assert n_cap > 0 and p_cap >= 0

    pos = np.asarray(scene.state.pos)  # [D, N]
    vel = np.asarray(scene.state.vel)
    C = np.asarray(scene.state.C)
    mass = np.asarray(scene.state.mass)
    ids = np.asarray(scene.state.ids)
    shard_of = np.clip(np.floor(pos[0]).astype(np.int64) // loc_x, 0, n - 1)

    dim = config.dim
    g_pos = np.zeros((dim, n * n_cap), np.float32)
    g_vel = np.zeros((dim, n * n_cap), np.float32)
    g_C = np.zeros((dim, dim, n * n_cap), np.float32)
    g_mass = np.zeros((n * n_cap,), np.float32)
    g_ids = np.full((n * n_cap,), -1, np.int32)

    for s in range(n):
        sel = np.nonzero(shard_of == s)[0]
        cnt = len(sel)
        assert cnt <= n_cap - 2 * p_cap, (
            f"shard {s}: {cnt} particles exceed capacity {n_cap} - 2*{p_cap}"
        )
        base = s * n_cap
        g_pos[:, base : base + cnt] = pos[:, sel]
        g_vel[:, base : base + cnt] = vel[:, sel]
        g_C[:, :, base : base + cnt] = C[:, :, sel]
        g_mass[base : base + cnt] = mass[sel]
        g_ids[base : base + cnt] = ids[sel]
        # park dead slots inside the slab
        park_x = (s + 0.5) * loc_x
        g_pos[0, base + cnt : base + n_cap] = park_x
        for a in range(1, dim):
            g_pos[a, base + cnt : base + n_cap] = config.grid_res[a] / 2.0

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return SimState(
        pos=put(g_pos, P(None, sconf.axis)),
        vel=put(g_vel, P(None, sconf.axis)),
        C=put(g_C, P(None, None, sconf.axis)),
        mass=put(g_mass, P(sconf.axis)),
        ids=put(g_ids, P(sconf.axis)),
    )


def gather_live(state: SimState) -> SimState:
    """Host-side: drop dead slots and order by id (for analysis/compare)."""
    mass = np.asarray(state.mass)
    live = mass > 0
    idx = np.nonzero(live)[0]
    out = SimState(
        pos=jnp.asarray(np.asarray(state.pos)[:, idx]),
        vel=jnp.asarray(np.asarray(state.vel)[:, idx]),
        C=jnp.asarray(np.asarray(state.C)[:, :, idx]),
        mass=jnp.asarray(mass[idx]),
        ids=jnp.asarray(np.asarray(state.ids)[idx]),
    )
    return out.by_id()


def demo_sharded_step(n_devices: int) -> None:
    """Compile + run one tiny sharded step on an n-device mesh (the driver's
    dryrun_multichip entry)."""
    from ..models.scenes import fluid_3d

    devs = jax.devices()[:n_devices]
    mesh = Mesh(np.array(devs), ("x",))
    scene = fluid_3d(grid_res=16, box=8.0, spacing=1.0)
    config = scene.config.replace(substeps=1)
    # capacity covers the worst shard (particles are NOT uniform across
    # slabs: the centered box occupies only the middle shards)
    sconf = ShardConfig(
        n_shards=n_devices,
        local_capacity=scene.state.num_particles + 2 * 96 + 64,
        migration_capacity=96,  # >= one boundary plane's population
    )
    state = shard_scene(
        Scene(scene.name, config, scene.fluid, scene.state), sconf, mesh
    )
    step = make_sharded_step(config, sconf, mesh, substeps=1)
    out = step(state, scene.fluid, ())
    np.asarray(out.pos)


# --------------------------------------------------------------------------
# Bucket-state sharding: the PRODUCTION Pallas kernels inside shard_map
# --------------------------------------------------------------------------
#
# The bucket engine's plane-sweep kernels shard naturally along the sweep
# axis: each device owns a slab of x-planes of the [.., K, C] bucket arrays
# (C = nx * pc flat, plane-major). Per substep:
#
#   1. state halo exchange: 2 boundary planes per side via ppermute — enough
#      for each shard to REDUNDANTLY compute its halo planes' G2P + zy
#      migration (and their x-mover census), which makes the overflow-
#      rejection decisions at the boundary bitwise identical on both sides
#      without any merge step;
#   2. kernel P (P2G x2 + grid update) over the padded slab in halo mode:
#      accumulators grow one plane per side; only locally-complete planes
#      are updated in-kernel;
#   3. grid-velocity halo exchange: 2 planes per side (complete at the
#      neighbor) replace the locally-incomplete ends;
#   4. kernel F (G2P + tail + 3-axis migration) over the padded slab; the
#      interior loc_x planes are exact and become the shard's new state.
#
# Counters (lost/deferred/cfl) accumulate interior-plane events only (the
# kernels gate on plane ownership), and are psum-reduced once per frame.

def _bucket_pspecs(axis: str):
    from ..ops.bucketed import BucketState

    return BucketState(
        pos=P(None, None, axis),
        vel=P(None, None, axis),
        C=P(None, None, None, axis),
        mass=P(None, axis),
        ids=P(None, axis),
        lost=P(),
        cfl_clamped=P(),
        deferred=P(),
        ceiling=P(),
    )


def _exchange_state_halo(state, config: SimConfig, n: int, axname: str):
    """Build the padded slab: [left nbr's last 2 planes | local | right nbr's
    first 2 planes]. Global-edge halos are dead (mass 0, ids -1)."""
    import dataclasses as _dc

    pc = _plane_cells(config)
    ax = jax.lax.axis_index(axname)

    def roll(x, shift):
        return jax.lax.ppermute(x, axname, _perm(n, shift))

    def pad(x, dead=None):
        lo = roll(x[..., -2 * pc :], 1)  # from left neighbor
        hi = roll(x[..., : 2 * pc], -1)  # from right neighbor
        if dead is not None:
            lo = jnp.where(ax == 0, dead, lo)
            hi = jnp.where(ax == n - 1, dead, hi)
        return jnp.concatenate([lo, x, hi], axis=-1)

    return _dc.replace(
        state,
        pos=pad(state.pos),
        vel=pad(state.vel),
        C=pad(state.C),
        mass=pad(state.mass, dead=jnp.zeros((), state.mass.dtype)),
        ids=pad(state.ids, dead=jnp.full((), -1, jnp.int32)),
    )


def _exchange_gvel(gvel, loc_x: int, n: int, axname: str):
    """Replace the locally-incomplete accumulator planes with the neighbors'
    complete ones. gvel [loc_x+6, 3, pcp]; local plane a holds global plane
    x0 - 3 + a; locally complete: a in [2, loc_x+3]."""
    ax = jax.lax.axis_index(axname)

    def roll(x, shift):
        return jax.lax.ppermute(x, axname, _perm(n, shift))

    lo = roll(gvel[loc_x : loc_x + 2], 1)  # left's (x0-3, x0-2)
    hi = roll(gvel[4:6], -1)  # right's (x0+loc_x+1, x0+loc_x+2)
    zero = jnp.zeros((), gvel.dtype)
    lo = jnp.where(ax == 0, zero, lo)
    hi = jnp.where(ax == n - 1, zero, hi)
    return jnp.concatenate([lo, gvel[2 : loc_x + 4], hi], axis=0)


def make_sharded_bucket_step(
    config: SimConfig,
    mesh: Mesh,
    substeps: int | None = None,
    axis: str = "x",
    interpret: bool = False,
):
    """Jitted sharded frame step over BucketState (the production Pallas
    path, kernels P + F per shard). Requires grid_res[0] % n_shards == 0 and
    local slabs of >= 2 planes."""
    import dataclasses as _dc

    from ..ops.pallas.fused import _g2p_migrate_fused, _pack_scals
    from ..ops.pallas.p2g_fused import p2g1_shard_pallas, p2g2u_shard_pallas

    n = mesh.shape[axis]
    assert config.grid_res[0] % n == 0
    loc_x = config.grid_res[0] // n
    assert loc_x >= 2, "slabs must hold >= 2 planes (the halo depth)"
    pc = _plane_cells(config)
    nsub = substeps if substeps is not None else config.substeps
    pspecs = _bucket_pspecs(axis)

    def substep_local(state, fp, interactions):
        ax = jax.lax.axis_index(axis)
        dtype = state.pos.dtype
        x0f = (ax * loc_x - 2).astype(dtype)
        padded = _exchange_state_halo(state, config, n, axis)
        # pass-1 mass -> exchange mass halos (pass 2's DENSITY gathers grid
        # mass one plane out, so exactness needs the neighbors' planes
        # BEFORE the force pass) -> merged momentum (pass-1 APIC + pass-2
        # force, emitted from the padded slab's own exact state — no
        # momentum exchange needed) + grid update -> exchange gvel
        gmass = p2g1_shard_pallas(
            padded, fp, config, x0f, interpret=interpret
        )
        gmass = _exchange_gvel(gmass, loc_x, n, axis)
        gvel = p2g2u_shard_pallas(
            padded, gmass, fp, config, x0f, interpret=interpret
        )
        gvel = _exchange_gvel(gvel, loc_x, n, axis)
        scals = _pack_scals(fp, interactions, dtype, x0=x0f)
        out = _g2p_migrate_fused(
            padded, gvel, scals, config, len(interactions),
            shard=True, interpret=interpret,
        )
        lo = 2 * pc
        hi = (loc_x + 2) * pc
        return _dc.replace(
            out,
            pos=out.pos[..., lo:hi],
            vel=out.vel[..., lo:hi],
            C=out.C[..., lo:hi],
            mass=out.mass[..., lo:hi],
            ids=out.ids[..., lo:hi],
        )

    def frame(state, fp, interactions):
        def local(state, fp, interactions):
            c0 = (state.lost, state.cfl_clamped, state.deferred,
                  state.ceiling)

            def body(s, _):
                return substep_local(s, fp, interactions), None

            s, _ = jax.lax.scan(body, state, None, length=nsub)
            # interior-gated per-shard counter deltas -> global sums
            s = _dc.replace(
                s,
                lost=c0[0] + jax.lax.psum(s.lost - c0[0], axis),
                cfl_clamped=c0[1] + jax.lax.psum(s.cfl_clamped - c0[1], axis),
                deferred=c0[2] + jax.lax.psum(s.deferred - c0[2], axis),
                ceiling=c0[3] + jax.lax.psum(s.ceiling - c0[3], axis),
            )
            return s

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(pspecs, P(), P()),
            out_specs=pspecs,
            # pallas_call outputs carry no varying-mesh-axes metadata
            check_vma=False,
        )(state, fp, interactions)

    return jax.jit(frame, donate_argnums=(0,))


def shard_bucket_state(bstate, mesh: Mesh, axis: str = "x"):
    """device_put a (host/global) BucketState with slab sharding."""
    specs = _bucket_pspecs(axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        bstate,
        specs,
        is_leaf=lambda x: x is None,
    )


def demo_sharded_bucket_step(n_devices: int) -> None:
    """Compile + run one tiny sharded-BUCKET step (the production Pallas
    kernels inside shard_map) — the driver's dryrun_multichip entry.
    Uses interpret-mode kernels on CPU meshes; real Mosaic otherwise."""
    from ..models.scenes import fluid_3d
    from ..ops import bucketed

    devs = jax.devices()[:n_devices]
    mesh = Mesh(np.array(devs), ("x",))
    scene = fluid_3d(grid_res=16, box=8.0, spacing=0.8)
    config = scene.config.replace(substeps=1, bin_capacity=8)
    b0 = jax.jit(lambda s: bucketed.from_simstate(s, config))(scene.state)
    interpret = devs[0].platform == "cpu"
    step = make_sharded_bucket_step(config, mesh, substeps=1,
                                    interpret=interpret)
    out = step(shard_bucket_state(b0, mesh), scene.fluid, ())
    assert int(out.lost) == 0
    np.asarray(out.pos)

    # the air-window engine composes with the slab decomposition: a
    # y-windowed config through the same sharded step (true-domain walls,
    # in-kernel ceiling band; tests/test_window.py asserts slot-exactness)
    from ..ops.window import window_config

    tall = scene.config.replace(grid_res=(16, 32, 16), substeps=1,
                                bin_capacity=8)
    wcfg = window_config(tall, 16)
    bw = jax.jit(lambda s: bucketed.from_simstate(s, wcfg))(scene.state)
    wstep = make_sharded_bucket_step(wcfg, mesh, substeps=1,
                                     interpret=interpret)
    wout = wstep(shard_bucket_state(bw, mesh), scene.fluid, ())
    assert int(wout.lost) == 0
    np.asarray(wout.pos)

    # the official scenes store vel/C in bf16 since round 4, which routes
    # kernel F through the PACKED migration (vel+C as 6 bf16-pair int32
    # rows; ops/pallas/fused.py "packed migration") — validate that path
    # sharded too
    pcfg = config.replace(storage_dtype="bfloat16")
    bp = jax.jit(lambda s: bucketed.from_simstate(s, pcfg))(scene.state)
    pstep = make_sharded_bucket_step(pcfg, mesh, substeps=1,
                                     interpret=interpret)
    pout = pstep(shard_bucket_state(bp, mesh), scene.fluid, ())
    assert int(pout.lost) == 0
    np.asarray(pout.pos)
