"""Bucket-state engine — the production TPU path.

Measured on a v5e: XLA lowers every per-element gather/scatter on the lane
axis to a serial loop (~4 ms per 157k-element gather), so ANY design that
converts between particle-sorted and cell-dense layouts each substep is
gather-bound. This engine removes the conversion entirely: particle state
lives PERMANENTLY in a dense cell-bucket layout

    pos [D, K, C]   vel [D, K, C]   C [D, D, K, C]   mass [K, C]   ids [K, C]

(C = num_cells flat row-major, K = slots per cell, lane-major with the big
axis minor; mass == 0 marks an empty slot). The invariant is
floor(pos) == bucket cell. Every pass is then a dense shifted-window op:

- P2G: for each of the 3^D taps, the contribution of bucket b to cell
  c = b + off is a static flat-offset slice of the padded bucket arrays —
  the tap-offset trick (ops/binned.py) without the sort. Row-crossing never
  corrupts: the geometry clip keeps the edge planes of every axis empty, so
  wrapped/padded reads always see mass == 0.
- G2P/density: each bucket reads grid values at b + off — static slices of
  the padded grid.
- migration (replaces sorting): after advection, particles move at most one
  cell per axis (CFL; faster movement is clamped one cell per substep and
  counted). Migration runs as D axis-split phases; each phase repacks every
  cell from its [own, left, right] 3K candidate slots with a masked cumsum
  rank and a one-hot select — dense VPU ops.

The reference's analogous structures: atomic scatter (p2g_1.glsl:87-90) ->
windowed sums; its fixed 80 B/particle AoS (MLSMPM3DFluidMultithreadGPU.cs:8-22)
-> K-slot SoA; overflow here (cell > K particles) drops the excess and counts
it in `lost` — the reference's int32 fixed-point grid would overflow first
(SURVEY.md §2.1 quirks).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.params import FluidParams, SimConfig
from ..core.state import Grid, SimState
from . import bspline, fixed_point
from .grid import update_grid
from .interact import Interaction, apply_interactions
from .stress import eos_pressure
from .transfer import flat_tap_offsets


CFL_EPS = 1e-3  # cell + 2 - eps still floors to cell + 1 for any res < 2^10


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BucketState:
    pos: jax.Array  # [D, K, C]
    vel: jax.Array  # [D, K, C]
    C: jax.Array  # [D, D, K, C]
    mass: jax.Array  # [K, C]
    ids: jax.Array  # [K, C] int32, -1 = empty
    lost: jax.Array  # [] int32 — particles dropped by bucket overflow
    cfl_clamped: jax.Array  # [] int32 — CFL bucket-clamp events (see g2p tail)
    deferred: jax.Array  # [] int32 — moves rejected by a full destination
    # bucket and retried next substep (overflow rejection; conserves mass)
    # y-movers rejected by the air-window CEILING band (ops/window.py): the
    # window's top 3 planes behave as a full destination. 0 across a run
    # certifies the windowed trajectory == the full-grid trajectory exactly
    # (no particle ever interacted with the window edge). Always 0 for
    # non-windowed configs.
    ceiling: jax.Array = dataclasses.field(
        default_factory=lambda: np.zeros((), np.int32))

    @property
    def dim(self) -> int:
        return self.pos.shape[0]


def _strides(config: SimConfig) -> list[int]:
    s = [1] * config.dim
    for a in range(config.dim - 2, -1, -1):
        s[a] = s[a + 1] * config.grid_res[a + 1]
    return s


def _max_off(config: SimConfig) -> int:
    return sum(_strides(config))


def cell_coords(config: SimConfig, dtype=jnp.float32) -> jax.Array:
    """[D, C] integer coordinates of each flat cell."""
    i = jnp.arange(config.num_cells, dtype=jnp.int32)
    coords = []
    stride = config.num_cells
    for a in range(config.dim):
        stride //= config.grid_res[a]
        coords.append((i // stride) % config.grid_res[a])
    return jnp.stack(coords).astype(dtype)


def _pad_last(x: jax.Array, h: int) -> jax.Array:
    pad = [(0, 0)] * (x.ndim - 1) + [(h, h)]
    return jnp.pad(x, pad)


def _shift(padded: jax.Array, h: int, off: int, c: int) -> jax.Array:
    """R[c] = original[c + off]; padded along the last axis by h."""
    return jax.lax.slice_in_dim(padded, h + off, h + off + c, axis=-1)


def _encode(x, config: SimConfig):
    if config.fixed_point:
        return fixed_point.encode(x, config.fixed_point_mult)
    return x


def _decode(x, config: SimConfig):
    if config.fixed_point:
        return fixed_point.decode(x, config.fixed_point_mult, config.dtype)
    return x


# ---------------------------------------------------------------- transfers


def p2g_bucketed(
    state: BucketState, config: SimConfig, fp: FluidParams
) -> Grid:
    """Both P2G passes as dense windowed sums (p2g_1.glsl + p2g_2.glsl)."""
    dim, k, c = state.pos.shape
    h = _max_off(config)
    center = cell_coords(config, state.pos.dtype) + 0.5  # [D, C]

    pos_p = _pad_last(state.pos, h)
    # vel/C may be stored bf16 (SimConfig.storage_dtype); ALL arithmetic is
    # f32 — rounding happens only at the g2p store, identically in Pallas
    vel_p = _pad_last(state.vel.astype(state.pos.dtype), h)
    C_p = _pad_last(state.C.astype(state.pos.dtype), h)
    mass_p = _pad_last(state.mass, h)

    from ..core.state import zero_grid

    grid0 = zero_grid(config)
    gmass, gmom = grid0.mass, grid0.mom

    taps = bspline.taps(dim)
    offs = flat_tap_offsets(config)
    offvecs = [np.asarray([t[a] - 1 for a in range(dim)], np.float32) for t in taps]

    # ---- pass 1: mass + APIC momentum ----
    for tap, off, ov in zip(taps, offs, offvecs):
        P = _shift(pos_p, h, off, c)  # bucket b = cell + off... see below
        M = _shift(mass_p, h, off, c)
        V = _shift(vel_p, h, off, c)
        CB = _shift(C_p, h, off, c)
        # reading bucket b at target cell index c0 requires b = c0 - off:
        # slice offset -off; equivalently iterate with negated offset. We
        # instead exploit tap symmetry: the tap set is symmetric (off <-> -off
        # maps tap t <-> 2-t), so summing over all taps with b = c0 + off and
        # tap index (1 - o) per axis covers the same contributions.
        tap_r = tuple(2 - t_a for t_a in tap)  # reflected tap, = 1 - off
        # particle in bucket b = c0 + off; its cell center = center[c0] + off,
        # so d = pos - b - 0.5 exactly
        d = P - (center[:, None, :] + ov[:, None, None])
        w = bspline.tap_weight(d, tap_r) * (M > 0)
        dist = bspline.tap_dist(d, tap_r)
        mass_c = w * M
        Cd = bspline.matvec(CB, dist)
        mom_c = mass_c * (V + Cd)
        gmass = gmass + jnp.sum(_encode(mass_c, config), axis=-2)
        gmom = gmom + jnp.sum(_encode(mom_c, config), axis=-2)

    grid = Grid(mom=gmom, mass=gmass)

    # ---- density gather (windowed grid reads) ----
    gmass_pad = _pad_last(grid.mass, h)
    density = jnp.zeros((k, c), state.pos.dtype)
    d_own = state.pos - center[:, None, :]  # [D, K, C], = frac - 0.5
    for tap, off in zip(taps, offs):
        gm = _decode(_shift(gmass_pad, h, off, c), config)  # [C] at b + off
        w = bspline.tap_weight(d_own, tap)
        density = density + w * gm[None, :]

    # ---- pass 2: EOS + viscosity force (fused per tap, no eq16 buffer) ----
    occ = state.mass > 0
    safe_density = jnp.where(occ, density, 1.0)
    volume = jnp.where(occ, state.mass / safe_density, 0.0)
    pressure = eos_pressure(safe_density, fp, config.eos_power_static)
    coef = -4.0 * fp.dt * volume  # [K, C]
    a_p = coef * (-pressure)  # pressure * identity part
    b_mu = coef * fp.dynamic_viscosity
    a_p_pad = _pad_last(a_p, h)
    b_mu_pad = _pad_last(b_mu, h)

    for tap, off, ov in zip(taps, offs, offvecs):
        P = _shift(pos_p, h, off, c)
        M = _shift(mass_p, h, off, c)
        CB = _shift(C_p, h, off, c)
        AP = _shift(a_p_pad, h, off, c)
        BM = _shift(b_mu_pad, h, off, c)
        tap_r = tuple(2 - t_a for t_a in tap)
        d = P - (center[:, None, :] + ov[:, None, None])
        w = bspline.tap_weight(d, tap_r) * (M > 0)
        dist = bspline.tap_dist(d, tap_r)
        if config.legacy_strain:
            # 2D serial variant strain (MLSMPM2DFluid.cs:276-281)
            Ct = jnp.swapaxes(CB, 0, 1)
            eye = np.eye(dim, dtype=np.float32)[:, :, None, None]
            S = CB + Ct - eye * Ct
            Sd = bspline.matvec(S, dist)
        else:
            Sd = bspline.matvec(CB, dist) + bspline.matvec_t(CB, dist)
        mom_c = w * (AP * dist + BM * Sd)
        gmom = gmom + jnp.sum(_encode(mom_c, config), axis=-2)

    return Grid(mom=gmom, mass=gmass)


def g2p_bucketed(
    state: BucketState,
    grid: Grid,
    config: SimConfig,
    fp: FluidParams,
    interactions: Sequence[Interaction] = (),
) -> BucketState:
    """Windowed G2P gather + advection tail (g2p.glsl:52-147)."""
    dim, k, c = state.pos.shape
    h = _max_off(config)
    center = cell_coords(config, state.pos.dtype) + 0.5
    d_own = state.pos - center[:, None, :]

    gvel_pad = _pad_last(grid.mom, h)
    vel = jnp.zeros_like(state.vel, dtype=state.pos.dtype)
    B = jnp.zeros_like(state.C, dtype=state.pos.dtype)
    for tap, off in zip(bspline.taps(dim), flat_tap_offsets(config)):
        gv = _decode(_shift(gvel_pad, h, off, c), config)  # [D, C] at b + off
        w = bspline.tap_weight(d_own, tap)  # [K, C]
        dist = bspline.tap_dist(d_own, tap)  # [D, K, C]
        wv = w[None] * gv[:, None, :]  # [D, K, C]
        vel = vel + wv
        B = B + wv[:, None] * dist[None]
    Cmat = 4.0 * B

    pos = state.pos + vel * fp.dt
    res = np.asarray(config.dres, np.float32).reshape(-1, 1, 1)
    pos = jnp.clip(pos, config.clamp_lo, res - config.clamp_hi_offset)

    # interactions operate on [D, M] shapes; bucket arrays broadcast fine
    vel = apply_interactions(pos, vel, interactions)

    x_n = pos + vel
    lo = config.wall_min
    hi = res - config.wall_max_offset
    vel = vel + config.wall_stiffness * (
        jnp.maximum(lo - x_n, 0.0) + jnp.minimum(hi - x_n, 0.0)
    )

    occ = state.mass > 0
    # CFL bucket clamp: particles faster than one cell/substep would leave the
    # bucket's ±1-cell migration range and evaluate B-spline weights outside
    # their support next substep — clamp pos into range and count the events
    cell = center[:, None, :] - 0.5
    pos_cfl = jnp.clip(pos, cell - 1.0, cell + 2.0 - CFL_EPS)
    moved = occ & jnp.any(pos_cfl != pos, axis=0)
    pos = pos_cfl

    pos = jnp.where(occ, pos, center[:, None, :] - 0.0)  # park empties in-cell
    vel = jnp.where(occ, vel, 0.0)
    Cmat = jnp.where(occ, Cmat, 0.0)
    return BucketState(
        pos=pos,
        vel=vel.astype(config.vc_dtype),
        C=Cmat.astype(config.vc_dtype),
        mass=state.mass,
        ids=state.ids,
        lost=state.lost,
        cfl_clamped=state.cfl_clamped + jnp.sum(moved.astype(jnp.int32)),
        deferred=state.deferred,
        # ceiling must survive the rebuild: YWindow._confirm diffs this
        # counter as a monotonic series — resetting it each substep would let
        # a windowed bucketed run falsely certify bit-exactness
        ceiling=state.ceiling,
    )


# ---------------------------------------------------------------- migration


def reject_overflow(state: BucketState, config: SimConfig, axis: int) -> BucketState:
    """Overflow rejection along one axis, applied BEFORE the migration phase:
    a mover whose destination bucket cannot take it stays in its source cell
    with pos clamped back inside (counted in `deferred`; it retries next
    substep). Acceptance is conservative: incoming candidate i (in canonical
    [from-left, from-right] order) is accepted iff occ0(dest) + i < K, where
    occ0 is the destination's PRE-phase occupancy. Since stayers +
    rejected-own <= occ0(source) <= K and each accepted incoming lands at a
    final rank <= occ0 + i < K, no bucket ever exceeds K and nothing is
    dropped — the reference likewise clamps instead of deleting fluid
    (g2p.glsl:115-119). Both endpoints of an exchange evaluate the identical
    formula on the identical pre-phase state, so they always agree."""
    dim, k, c = state.pos.shape
    stride = _strides(config)[axis]
    coord = cell_coords(config, jnp.float32)[axis]
    delta = jnp.clip(jnp.floor(state.pos[axis]) - coord[None, :], -1.0, 1.0)
    occ = state.mass > 0

    occ0 = jnp.sum(occ.astype(jnp.int32), axis=0)  # [C]
    movr = occ & (delta == 1.0)
    movl = occ & (delta == -1.0)
    rank_r = jnp.cumsum(movr.astype(jnp.int32), axis=0) - 1  # within own cell
    rank_l = jnp.cumsum(movl.astype(jnp.int32), axis=0) - 1
    nmovr = jnp.sum(movr.astype(jnp.int32), axis=0)  # [C]

    def shiftc(x, off_cells):
        """value at cell c taken from cell c + off_cells along this axis."""
        off = off_cells * stride
        h2 = abs(off)
        return _shift(_pad_last(x, h2), h2, off, c)

    # destination's incoming candidate order is [from-left, from-right]:
    # a right-mover's index among dest incoming is its rank among the
    # source's right-movers; a left-mover's is dest's from-left count
    # (right-movers of dest-1 = source-2) plus its rank among left-movers
    pr_r = shiftc(occ0, 1)[None, :] + rank_r
    pr_l = shiftc(occ0, -1)[None, :] + shiftc(nmovr, -2)[None, :] + rank_l
    rej = (movr & (pr_r >= k)) | (movl & (pr_l >= k))
    ceiling = state.ceiling
    if (axis == 1 and config.domain_res is not None
            and config.grid_res[1] < config.domain_res[1]):
        # air-window ceiling (ops/window.py): upward moves into the window's
        # top 3 planes are rejected exactly like a full destination; counted
        # separately so ceiling == 0 certifies window non-interference
        band = coord >= config.grid_res[1] - 4
        rej_ceil = movr & band[None, :] & jnp.logical_not(rej)
        rej = rej | rej_ceil
        ceiling = ceiling + jnp.sum(rej_ceil.astype(jnp.int32))
    pos_ax = jnp.clip(
        state.pos[axis], coord[None, :], coord[None, :] + 1.0 - CFL_EPS
    )
    new_pos = state.pos.at[axis].set(jnp.where(rej, pos_ax, state.pos[axis]))
    deferred = state.deferred + jnp.sum(rej.astype(jnp.int32))
    return dataclasses.replace(state, pos=new_pos, deferred=deferred,
                               ceiling=ceiling)


def _migrate_axis(state: BucketState, config: SimConfig, axis: int) -> BucketState:
    """One axis-split migration phase: repack every cell from its [stay,
    from-left, from-right] 3K candidates by masked-cumsum rank + one-hot
    select. Deterministic: candidate order is (own slots, left's, right's),
    slot-ordered.

    Overflow rejection (mass conservation): a move whose destination bucket
    cannot take it is REJECTED — the particle stays in its source cell with
    pos clamped back inside (counted in `deferred`, retried next substep).
    Acceptance is conservative: incoming candidate i (in canonical order) is
    accepted iff occ0(dest) + i < K, where occ0 is the destination's
    PRE-migration occupancy. Since stayers + rejected-own <= occ0 <= K and
    every accepted incoming lands at a final rank <= occ0 + i < K, no bucket
    ever exceeds K and nothing is dropped — the reference likewise clamps
    instead of deleting (g2p.glsl:115-119)."""
    dim, k, c = state.pos.shape
    stride = _strides(config)[axis]
    coord = cell_coords(config, jnp.float32)[axis]  # [C]

    state = reject_overflow(state, config, axis)

    # desired cell delta along this axis, clamped to one cell per substep
    delta = jnp.floor(state.pos[axis]) - coord[None, :]  # [K, C]
    delta = jnp.clip(delta, -1.0, 1.0)
    occ = state.mass > 0

    def cand(shift_cells):
        """Candidate block arriving from bucket (cell - shift) moving
        +shift."""
        off = shift_cells * stride
        h = abs(off) if off != 0 else 0

        def sh(x):
            if off == 0:
                return x
            return _shift(_pad_last(x, h), h, -off, c)

        mask = sh((occ & (delta == shift_cells)).astype(jnp.float32)) > 0.5
        return mask, sh

    masks = []
    shifters = []
    for s_ in (0, 1, -1):
        mask, sh = cand(s_)
        masks.append(mask)
        shifters.append(sh)
    cand_mask = jnp.concatenate(masks, axis=0)  # [3K, C]

    def gather_field(name):
        x = getattr(state, name)
        parts = [sh(x) for sh in shifters]
        return jnp.concatenate(parts, axis=-2)  # [..., 3K, C]

    cand_pos = gather_field("pos")
    cand_vel = gather_field("vel")
    cand_C = gather_field("C")
    cand_mass = gather_field("mass")
    cand_ids = gather_field("ids")

    rank = jnp.cumsum(cand_mask.astype(jnp.int32), axis=0) - 1  # [3K, C]
    rank = jnp.where(cand_mask, rank, -1)

    total = jnp.sum(cand_mask.astype(jnp.int32), axis=0)  # [C]
    lost = state.lost + jnp.sum(jnp.maximum(total - k, 0))

    # one-hot select: out[k] = sum_j cand[j] * (rank[j] == k). Unrolled over
    # the K output slots as masked reductions — no dot_general (bad layouts),
    # everything stays [3K, C]-elementwise + a reduce on the 3K axis.
    def select(candf, ids=False):
        x = candf.astype(state.pos.dtype) if ids else candf
        outs = []
        for kk in range(k):
            m = (rank == kk).astype(x.dtype)  # [3K, C]; one-hot mult is
            outs.append(jnp.sum(x * m, axis=-2))  # exact in any dtype
        out = jnp.stack(outs, axis=-2)  # [..., K, C]
        if ids:
            return jnp.round(out).astype(jnp.int32)
        return out

    new_mass = select(cand_mass)
    new_ids = jnp.where(new_mass > 0, select(cand_ids, ids=True), -1)
    return BucketState(
        pos=select(cand_pos),
        vel=select(cand_vel),
        C=select(cand_C),
        mass=new_mass,
        ids=new_ids,
        lost=lost,
        cfl_clamped=state.cfl_clamped,
        deferred=state.deferred,
        ceiling=state.ceiling,
    )


def migrate(state: BucketState, config: SimConfig) -> BucketState:
    # last axis first (3D: z, y, x) — the physics is order-independent (each
    # phase fixes one axis; the per-cell particle multiset is identical for
    # any order), but slot ASSIGNMENT within a cell depends on arrival order,
    # and the Pallas kernels sweep z, y, x; matching the order keeps the
    # engines bit-identical slot-for-slot, not just id-for-id
    for a in range(config.dim - 1, -1, -1):
        state = _migrate_axis(state, config, a)
    return state


# ----------------------------------------------------------------- substep


def substep(
    state: BucketState,
    config: SimConfig,
    fp: FluidParams,
    interactions: Sequence[Interaction] = (),
) -> BucketState:
    grid = p2g_bucketed(state, config, fp)
    grid = update_grid(grid, config, fp)
    state = g2p_bucketed(state, grid, config, fp, interactions)
    return migrate(state, config)


# ------------------------------------------------------------- conversions


def from_simstate(state: SimState, config: SimConfig) -> BucketState:
    """Pack a linear SimState into buckets (setup-time; uses sort+gather,
    which is fine off the hot path)."""
    from . import binned, binning

    s_sorted, seg_start = binned.sort_by_cell(state, config)
    slots = binning.bin_slots(seg_start, config, s_sorted.num_particles)

    def pack(field):  # [..., N] -> [..., K, C] (big axis minor throughout)
        return binning.gather_slot_field_kc(field, slots)

    mass = pack(s_sorted.mass)
    ids = jnp.where(mass > 0, pack(s_sorted.ids.astype(jnp.float32)).astype(jnp.int32), -1)
    # park empty slots at their own cell center so the invariant holds
    center = cell_coords(config, state.pos.dtype) + 0.5
    pos = pack(s_sorted.pos)
    pos = jnp.where(mass > 0, pos, center[:, None, :])
    return BucketState(
        pos=pos,
        vel=pack(s_sorted.vel).astype(config.vc_dtype),
        C=pack(s_sorted.C).astype(config.vc_dtype),
        mass=mass,
        ids=ids,
        lost=jnp.asarray(
            slots.overflow, jnp.int32
        ),
        cfl_clamped=jnp.asarray(0, jnp.int32),
        deferred=jnp.asarray(0, jnp.int32),
    )


def to_simstate(bstate: BucketState, num_particles: int) -> SimState:
    """Unpack to a linear SimState ordered by id (host/test path)."""
    import numpy as np

    mass = np.asarray(bstate.mass).reshape(-1)
    live = mass > 0
    idx = np.nonzero(live)[0]
    dim = bstate.dim
    k, c = bstate.mass.shape
    pos = np.asarray(bstate.pos).reshape(dim, -1)[:, idx]
    vel = np.asarray(bstate.vel).reshape(dim, -1)[:, idx]
    C = np.asarray(bstate.C).reshape(dim, dim, -1)[:, :, idx]
    ids = np.asarray(bstate.ids).reshape(-1)[idx]
    order = np.argsort(ids)
    return SimState(
        pos=jnp.asarray(pos[:, order]),
        vel=jnp.asarray(vel[:, order]),
        C=jnp.asarray(C[:, :, order]),
        mass=jnp.asarray(mass[idx][order]),
        ids=jnp.asarray(ids[order]),
    )
