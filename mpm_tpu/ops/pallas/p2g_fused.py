"""Fused P2G pass 1 + pass 2 + grid update (kernel P).

The platform is streaming-bandwidth-bound (scripts/hbm_bw.py: ~25-35 GB/s
through pallas block DMA, ~6 GB/s through XLA elementwise), so the split
P2G pipeline's cost is its bytes: kernel A reads {pos, vel, C, mass}
(64 B/slot), kernel B re-reads {pos, C, mass} (52 B/slot), and the XLA glue
(update_grid + pad/swapaxes) re-streams the grid arrays through the slow XLA
path. This kernel collapses all of it into ONE sweep that reads the particle
state exactly once and emits the halo-padded grid-velocity array that the
fused G2P kernel (fused.py, kernel F) consumes directly — no XLA glue at all.

Pipeline (grid = nx + 3 sequential steps, three phases in flight):

  step t:
    A-phase (plane t      < nx): P2G pass 1 — 27-tap scatter of mass + APIC
        momentum into the VMEM grid accumulators (p2g_1.glsl:56-93); the
        plane's {pos, C, mass} is stashed in a 3-deep VMEM ring for B.
    B-phase (plane j = t-2 >= 0): pass-1 mass for planes j-1..j+1 is final
        (A scatters one plane each way), so the density gather + EOS/viscous
        force scatter runs from the ring (p2g_2.glsl:52-159).
    U-phase (plane q = t-3 >= 0): pass-2 momentum for plane q is final, so
        the grid update (momentum -> velocity, gravity, boundary bands;
        update_grid.glsl:36-74) runs in place on the output.

Spill columns of the padded accumulators are structurally zero (the geometry
clip keeps every axis' edge planes/rows empty — see bucket_kernels.py), so
the halo padding the G2P views read is exactly the zeros _init wrote.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.params import BC_FRICTION, BC_SLIP, BC_STICK, FluidParams, SimConfig
from ..stress import pow_static
from .. import bspline
from .bucket_kernels import (
    _TAPS3,
    _halo,
    _plane_geometry,
    _tap_parts,
    _weight_tables,
)


def _pass1_moments(d, mass, velp, C9):
    """Separable-moment decomposition of the pass-1 scatter: the tap
    contribution factorizes as  q_t[a] = b[a] + sum_j t_j * mc[a][j]  with
    mc = mass*C and b = mass*v - mc @ (1 + d)  (dist_j(t) = t_j - (1+d_j)),
    so the 27 taps share per-axis partial products (~1.6x fewer VPU ops
    than the naive per-tap loop; p2g_1.glsl:56-93 computes the same sums
    tap-by-tap)."""
    mc = [[mass * C9[3 * a + j] for j in range(3)] for a in range(3)]
    b = [
        mass * velp[a]
        - mc[a][0] * (1.0 + d[0])
        - mc[a][1] * (1.0 + d[1])
        - mc[a][2] * (1.0 + d[2])
        for a in range(3)
    ]
    return b, mc


def _scatter_pass1(d, mass, velp, C9, z, emit):
    """emit(tx, ty, tz, m_p [pc], mom_p [3, pc]) for each tap, with the
    K-axis already reduced."""
    wxs = [bspline.axis_weight(i, d[0]) for i in range(3)]
    wys = [bspline.axis_weight(i, d[1]) for i in range(3)]
    wzs = [bspline.axis_weight(i, d[2]) for i in range(3)]
    b, mc = _pass1_moments(d, mass, velp, C9)
    for tz in range(3):
        wz = wzs[tz]
        Z0 = wz * mass
        Zq = [wz * b[a] + (wz * float(tz)) * mc[a][2] for a in range(3)]
        Zc0 = [wz * mc[a][0] for a in range(3)]
        Zc1 = [wz * mc[a][1] for a in range(3)]
        for ty in range(3):
            wy = wys[ty]
            Y0 = wy * Z0
            Yq = [wy * Zq[a] + (wy * float(ty)) * Zc1[a] for a in range(3)]
            Yc0 = [wy * Zc0[a] for a in range(3)]
            for tx in range(3):
                wx = wxs[tx]
                m_p = jnp.sum(wx * Y0, axis=0)
                mom_p = jnp.stack([
                    jnp.sum(wx * Yq[a] + (wx * float(tx)) * Yc0[a], axis=0)
                    for a in range(3)
                ])
                emit(tx, ty, tz, m_p, mom_p)


def _scatter_pass2(d, a_p, b_mu, C9, legacy_strain, emit):
    """Pass-2 force scatter, same factorization: contribution
    w * (a_p*dist + b_mu*S@dist) = w * (M @ dist) with M = a_p*I + b_mu*S;
    q_t = b + sum_j t_j * M[:, j], b = -M @ (1 + d)."""
    wxs = [bspline.axis_weight(i, d[0]) for i in range(3)]
    wys = [bspline.axis_weight(i, d[1]) for i in range(3)]
    wzs = [bspline.axis_weight(i, d[2]) for i in range(3)]
    # S = C + C^T (minus diag(C^T) in the 2D-legacy form)
    S = [[C9[3 * a + j] + C9[3 * j + a] for j in range(3)] for a in range(3)]
    if legacy_strain:
        for a in range(3):
            S[a][a] = S[a][a] - C9[3 * a + a]
    M = [
        [b_mu * S[a][j] + (a_p if a == j else 0.0) for j in range(3)]
        for a in range(3)
    ]
    b = [
        -(M[a][0] * (1.0 + d[0]) + M[a][1] * (1.0 + d[1])
          + M[a][2] * (1.0 + d[2]))
        for a in range(3)
    ]
    for tz in range(3):
        wz = wzs[tz]
        Zq = [wz * b[a] + (wz * float(tz)) * M[a][2] for a in range(3)]
        Zc0 = [wz * M[a][0] for a in range(3)]
        Zc1 = [wz * M[a][1] for a in range(3)]
        for ty in range(3):
            wy = wys[ty]
            Yq = [wy * Zq[a] + (wy * float(ty)) * Zc1[a] for a in range(3)]
            Yc0 = [wy * Zc0[a] for a in range(3)]
            for tx in range(3):
                wx = wxs[tx]
                mom_p = jnp.stack([
                    jnp.sum(wx * Yq[a] + (wx * float(tx)) * Yc0[a], axis=0)
                    for a in range(3)
                ])
                emit(tx, ty, tz, mom_p)


def _p2g_update_kernel(
    pos_ref, vel_ref, C_ref, mass_ref, scal_ref,
    gvel_o,
    r_pos, r_C, r_mass, gmass,
    *, config: SimConfig, legacy_strain: bool, shard: bool,
):
    t = pl.program_id(0)
    L = pl.num_programs(0) - 3  # local planes swept (== nx when unsharded)
    nx = config.grid_res[0]  # GLOBAL plane count
    z = config.grid_res[2]
    pc = config.grid_res[1] * z
    h = _halo(config)
    ao = 1 if shard else 0  # accumulator halo-plane offset (sharded: the
    # scatter reach of the padded slab extends one plane past it each side)
    dtype = pos_ref.dtype

    dt = scal_ref[0]
    rest_density = scal_ref[1]
    viscosity = scal_ref[2]
    stiffness = scal_ref[3]
    power = scal_ref[4]
    floor = scal_ref[5]
    x0 = scal_ref[9]  # global plane coordinate of local plane 0 (0 unsharded)

    @pl.when(t == 0)
    def _init():
        gvel_o[:] = jnp.zeros_like(gvel_o)
        gmass[:] = jnp.zeros_like(gmass)

    # ---- A-phase: P2G pass 1 for plane t (p2g_1.glsl:56-93) ----
    @pl.when(t < L)
    def _a_phase():
        mass = mass_ref[:]
        r_mass[jax.lax.rem(t, 3)] = mass  # always: B occupancy-masks via mass

        @pl.when(jnp.max(mass) > 0)
        def _occupied():
            rt = jax.lax.rem(t, 3)
            pos = pos_ref[:]
            # vel/C may be stored bf16; arithmetic is f32 (ring scratch too)
            velp = vel_ref[:].astype(pos.dtype)
            C9 = C_ref[:].astype(pos.dtype)
            r_pos[rt] = pos
            r_C[rt] = C9
            g = x0 + t.astype(dtype)  # global plane coordinate
            d = _plane_geometry(pos, g, z, dtype)

            def emit1(tx, ty, tz, m_p, mom_p):
                dx = tx - 1
                p = t + dx + ao
                ok = (g + dx >= 0) & (g + dx <= nx - 1)
                if not shard:
                    ok = (t + dx >= 0) & (t + dx < L)
                else:
                    p = jnp.clip(p, 0, L + 2 * ao - 1)
                lo = h + (ty - 1) * z + (tz - 1)

                @pl.when(ok)
                def _(p=p, m_p=m_p, mom_p=mom_p, lo=lo):
                    gmass[p, lo : lo + pc] += m_p
                    gvel_o[p, :, lo : lo + pc] += mom_p

            _scatter_pass1(d, mass, velp, C9, z, emit1)

    # ---- B-phase: density + P2G pass 2 for plane j = t - 2 ----
    @pl.when((t >= 2) & (t - 2 < L))
    def _b_phase():
        j = t - 2
        rj = jax.lax.rem(j, 3)
        mass = r_mass[rj]

        @pl.when(jnp.max(mass) > 0)
        def _occupied():
            pos = r_pos[rj]
            C9 = r_C[rj]
            occ = mass > 0
            gj = x0 + j.astype(dtype)
            d = _plane_geometry(pos, gj, z, dtype)
            wxy, wz_t, dists = _weight_tables(d)

            density = jnp.zeros_like(mass)
            for tap, (dx, oyz) in zip(_TAPS3, _tap_parts(config)):
                w = wxy[tap[0]][tap[1]] * wz_t[tap[2]]
                p = jnp.clip(j + dx + ao, 0, L + 2 * ao - 1)
                lo = h + oyz
                plane = gmass[p, lo : lo + pc]
                ok = (gj + dx >= 0) & (gj + dx <= nx - 1)
                gm = jnp.where(ok, plane, 0.0)
                density = density + w * gm[None, :]

            safe_density = jnp.where(occ, density, 1.0)
            volume = jnp.where(occ, mass / safe_density, 0.0)
            ratio = safe_density / rest_density
            if config.eos_power_static:
                rp = pow_static(ratio, config.eos_power_static)
            else:  # traced exponent: exp(p*log(x)) — runtime-tunable, slow
                rp = ratio**power
            pressure = jnp.maximum(floor, stiffness * (rp - 1.0))
            coef = -4.0 * dt * volume
            a_p = coef * (-pressure)
            b_mu = coef * viscosity

            def emit2(tx, ty, tz, mom_p):
                # volume (hence a_p/b_mu) is zero on empty slots — no mask
                dx = tx - 1
                p = j + dx + ao
                ok = (gj + dx >= 0) & (gj + dx <= nx - 1)
                if not shard:
                    ok = (j + dx >= 0) & (j + dx < L)
                else:
                    p = jnp.clip(p, 0, L + 2 * ao - 1)
                lo = h + (ty - 1) * z + (tz - 1)

                @pl.when(ok)
                def _(p=p, mom_p=mom_p, lo=lo):
                    gvel_o[p, :, lo : lo + pc] += mom_p

            _scatter_pass2(d, a_p, b_mu, C9, legacy_strain, emit2)

    # ---- U-phase: grid update for plane q = t - 3 (update_grid.glsl) ----
    # Row-by-row, no jnp.stack: Mosaic cannot concatenate vectors whose lane
    # layouts carry different shift offsets (the momentum rows are halo-
    # offset slices), so each velocity row is computed and written alone.
    # sharded: only planes whose accumulated momentum is locally complete
    # are updated (local a in [1+ao, L-2+ao]); the rest arrive by exchange
    u_ok = (t >= 3) if not shard else (t >= 3 + 1) & (t - 3 <= L - 2)

    @pl.when(u_ok)
    def _u_phase():
        q = t - 3 + ao  # accumulator plane index
        gq = x0 + (t - 3).astype(dtype)  # global plane coordinate
        gm = gmass[pl.ds(q, 1), h : h + pc]  # [1, pc]
        has = gm > 0
        safe = jnp.where(has, gm, 1.0)

        # boundary bands at global coordinates, all [1, pc]
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, pc), 1)
        cy = idx // z
        cz = idx % z
        lo_b, hi_b = config.bc_band_lo, config.bc_band_hi
        band_x = (gq < float(lo_b)) | (gq > float(nx - 1 - hi_b))
        bands = [
            jnp.zeros_like(has) | band_x,  # scalar x-band broadcast
            (cy < lo_b) | (cy > config.grid_res[1] - 1 - hi_b),
            (cz < lo_b) | (cz > config.grid_res[2] - 1 - hi_b),
        ]
        for i in range(3):
            v = gvel_o[pl.ds(q, 1), i, h : h + pc] / safe + dt * scal_ref[6 + i]
            if config.bc == BC_SLIP:
                v = jnp.where(bands[i], 0.0, v)
            elif config.bc == BC_STICK:
                v = jnp.where(bands[0] | bands[1] | bands[2], 0.0, v)
            elif config.bc == BC_FRICTION:
                # normal component zeroed in its own band; tangential scaled
                # by `friction` per other-axis band (multiplicative compose)
                for a in range(3):
                    if a == i:
                        v = jnp.where(bands[a], 0.0, v)
                    else:
                        v = v * jnp.where(bands[a], config.friction, 1.0)
            else:
                raise ValueError(f"unknown bc flavor: {config.bc}")
            gvel_o[pl.ds(q, 1), i, h : h + pc] = jnp.where(has, v, 0.0)


def p2g_update_supported(config: SimConfig) -> bool:
    """Same envelope as the F kernel: 3D float, 128-divisible planes, and the
    full padded grid-velocity + accumulator + rings fit VMEM."""
    if config.dim != 3 or config.fixed_point:
        return False
    pc = config.grid_res[1] * config.grid_res[2]
    if pc % 128 != 0:
        return False
    nx = config.grid_res[0]
    k = config.bin_capacity
    pcp = pc + 2 * _halo(config)
    grid_bytes = nx * 4 * pcp * 4
    ring_bytes = 3 * 13 * k * pc * 4
    blocks = 2 * 16 * k * pc * 4
    return grid_bytes + ring_bytes + blocks <= 100 * 2**20


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def p2g_update_pallas(
    state,  # BucketState
    fp: FluidParams,
    config: SimConfig,
    x0=None,
    interpret: bool = False,
) -> jax.Array:
    """Returns gvel_pad: updated grid velocities with zeroed halo columns —
    the exact input of fused._g2p_migrate_fused.

    Unsharded (x0 None): state covers all nx planes; output [nx, 3, pc+2h].
    Sharded (x0 = traced global plane coordinate of the local array's plane
    0): state is a shard's padded slab of L planes; the output grows one
    halo plane per side, [L+2, 3, pc+2h], and only the locally-complete
    interior planes are grid-updated (parallel/domain.py exchanges the
    rest from the neighbors)."""
    dim, k, c = state.pos.shape
    nx = config.grid_res[0]
    z = config.grid_res[2]
    pc = config.grid_res[1] * z
    L = c // pc
    h = _halo(config)
    dtype = state.pos.dtype
    shard = x0 is not None
    ao = 1 if shard else 0

    def in_plane(lead):
        ndim = len(lead) + 2

        def index(t):
            idx = [0] * ndim
            idx[-1] = jnp.clip(t, 0, L - 1)
            return tuple(idx)

        return pl.BlockSpec((*lead, k, pc), index, memory_space=pltpu.VMEM)

    scals = jnp.stack([
        jnp.asarray(fp.dt, dtype),
        jnp.asarray(fp.rest_density, dtype),
        jnp.asarray(fp.dynamic_viscosity, dtype),
        jnp.asarray(fp.eos_stiffness, dtype),
        jnp.asarray(fp.eos_power, dtype),
        jnp.asarray(fp.pressure_floor, dtype),
        jnp.asarray(fp.gravity[0], dtype),
        jnp.asarray(fp.gravity[1], dtype),
        jnp.asarray(fp.gravity[2], dtype),
        jnp.asarray(0.0 if x0 is None else x0, dtype),
    ])

    n_acc = L + 2 * ao
    (gvel,) = pl.pallas_call(
        functools.partial(
            _p2g_update_kernel,
            config=config,
            legacy_strain=config.legacy_strain,
            shard=shard,
        ),
        grid=(L + 3,),
        in_specs=[
            in_plane((3,)),
            in_plane((3,)),
            in_plane((9,)),
            in_plane(()),
            pl.BlockSpec((10,), lambda t: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (n_acc, 3, pc + 2 * h), lambda t: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(jax.ShapeDtypeStruct((n_acc, 3, pc + 2 * h), dtype),),
        scratch_shapes=[
            pltpu.VMEM((3, 3, k, pc), dtype),
            pltpu.VMEM((3, 9, k, pc), dtype),
            pltpu.VMEM((3, k, pc), dtype),
            pltpu.VMEM((n_acc, pc + 2 * h), dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
    )(
        state.pos,
        state.vel,
        state.C.reshape(9, k, c),
        state.mass,
        scals,
    )
    return gvel


# ----------------------------------------------------------- sharded stages
#
# The one-shot kernel above cannot be locally exact near slab ends: a
# particle's pass-2 force needs its DENSITY, which gathers grid mass from
# one plane away — so exact force at plane g needs exact mass at g+-1,
# i.e. particles from g-2..g+2. With 2-plane state halos that chain breaks.
# The sharded path therefore splits at the natural exchange point: pass 1
# accumulates mass+momentum (exact on [x0+1, x0+loc_x+2] of the padded
# slab's accumulator), the neighbors' exact planes replace the stale ends,
# and pass 2 + grid update then see exact density everywhere they need it.


def _p2g1_shard_kernel(
    pos_ref, vel_ref, C_ref, mass_ref, scal_ref,
    gmass_o, gmom_o,
    *, config: SimConfig,
):
    """Pass 1 only (A-phase of _p2g_update_kernel), halo-mode accumulators."""
    t = pl.program_id(0)
    L = pl.num_programs(0)
    nx = config.grid_res[0]
    z = config.grid_res[2]
    pc = config.grid_res[1] * z
    h = _halo(config)
    dtype = pos_ref.dtype
    x0 = scal_ref[9]

    @pl.when(t == 0)
    def _init():
        gmass_o[:] = jnp.zeros_like(gmass_o)
        gmom_o[:] = jnp.zeros_like(gmom_o)

    mass = mass_ref[:]

    @pl.when(jnp.max(mass) > 0)
    def _occupied():
        pos = pos_ref[:]
        velp = vel_ref[:].astype(pos.dtype)
        C9 = C_ref[:].astype(pos.dtype)
        g = x0 + t.astype(dtype)
        d = _plane_geometry(pos, g, z, dtype)

        def emit1(tx, ty, tz, m_p, mom_p):
            dx = tx - 1
            p = jnp.clip(t + dx + 1, 0, L + 1)
            ok = (g + dx >= 0) & (g + dx <= float(nx - 1))
            lo = h + (ty - 1) * z + (tz - 1)

            @pl.when(ok)
            def _(p=p, m_p=m_p, mom_p=mom_p, lo=lo):
                gmass_o[p, lo : lo + pc] += m_p
                gmom_o[p, :, lo : lo + pc] += mom_p

        _scatter_pass1(d, mass, velp, C9, z, emit1)


def _p2g2u_shard_kernel(
    pos_ref, C_ref, mass_ref, gmass_ref, scal_ref, gmom_in_ref,
    gvel_o,
    *, config: SimConfig, legacy_strain: bool,
):
    # gmom_in_ref is aliased onto gvel_o (input_output_aliases) — the pass-1
    # momentum is accumulated into in place
    """Pass 2 + grid update with EXACT (exchanged) grid mass: B for plane t
    runs immediately (no lag — density needs no local accumulation), U for
    plane t-2 once its force contributions are in. gvel_o arrives holding
    the exchanged pass-1 momentum and is updated in place."""
    t = pl.program_id(0)
    L = pl.num_programs(0) - 2
    nx = config.grid_res[0]
    z = config.grid_res[2]
    pc = config.grid_res[1] * z
    h = _halo(config)
    dtype = pos_ref.dtype

    dt = scal_ref[0]
    rest_density = scal_ref[1]
    viscosity = scal_ref[2]
    stiffness = scal_ref[3]
    power = scal_ref[4]
    floor = scal_ref[5]
    x0 = scal_ref[9]

    @pl.when(t < L)
    def _b_phase():
        mass = mass_ref[:]

        @pl.when(jnp.max(mass) > 0)
        def _occupied():
            pos = pos_ref[:]
            C9 = C_ref[:].astype(pos.dtype)
            occ = mass > 0
            gj = x0 + t.astype(dtype)
            d = _plane_geometry(pos, gj, z, dtype)
            wxy, wz_t, dists = _weight_tables(d)

            density = jnp.zeros_like(mass)
            for tap, (dx, oyz) in zip(_TAPS3, _tap_parts(config)):
                w = wxy[tap[0]][tap[1]] * wz_t[tap[2]]
                p = jnp.clip(t + dx + 1, 0, L + 1)
                lo = h + oyz
                plane = gmass_ref[p, lo : lo + pc]
                ok = (gj + dx >= 0) & (gj + dx <= float(nx - 1))
                gm = jnp.where(ok, plane, 0.0)
                density = density + w * gm[None, :]

            safe_density = jnp.where(occ, density, 1.0)
            volume = jnp.where(occ, mass / safe_density, 0.0)
            ratio = safe_density / rest_density
            if config.eos_power_static:
                rp = pow_static(ratio, config.eos_power_static)
            else:
                rp = ratio**power
            pressure = jnp.maximum(floor, stiffness * (rp - 1.0))
            coef = -4.0 * dt * volume
            a_p = coef * (-pressure)
            b_mu = coef * viscosity

            def emit2(tx, ty, tz, mom_p):
                dx = tx - 1
                p = jnp.clip(t + dx + 1, 0, L + 1)
                ok = (gj + dx >= 0) & (gj + dx <= float(nx - 1))
                lo = h + (ty - 1) * z + (tz - 1)

                @pl.when(ok)
                def _(p=p, mom_p=mom_p, lo=lo):
                    gvel_o[p, :, lo : lo + pc] += mom_p

            _scatter_pass2(d, a_p, b_mu, C9, legacy_strain, emit2)

    # U for accumulator plane a = t - 2 + 1, locally complete a in [2, L-1]
    @pl.when((t >= 3) & (t - 2 <= L - 2))
    def _u_phase():
        q = t - 1  # accumulator index (= state plane (t-2) + 1)
        gq = x0 + (t - 2).astype(dtype)
        gm = gmass_ref[pl.ds(q, 1), h : h + pc]
        has = gm > 0
        safe = jnp.where(has, gm, 1.0)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, pc), 1)
        cy = idx // z
        cz = idx % z
        lo_b, hi_b = config.bc_band_lo, config.bc_band_hi
        band_x = (gq < float(lo_b)) | (gq > float(nx - 1 - hi_b))
        bands = [
            jnp.zeros_like(has) | band_x,
            (cy < lo_b) | (cy > config.grid_res[1] - 1 - hi_b),
            (cz < lo_b) | (cz > config.grid_res[2] - 1 - hi_b),
        ]
        for i in range(3):
            v = gvel_o[pl.ds(q, 1), i, h : h + pc] / safe + dt * scal_ref[6 + i]
            if config.bc == BC_SLIP:
                v = jnp.where(bands[i], 0.0, v)
            elif config.bc == BC_STICK:
                v = jnp.where(bands[0] | bands[1] | bands[2], 0.0, v)
            elif config.bc == BC_FRICTION:
                for a in range(3):
                    if a == i:
                        v = jnp.where(bands[a], 0.0, v)
                    else:
                        v = v * jnp.where(bands[a], config.friction, 1.0)
            else:
                raise ValueError(f"unknown bc flavor: {config.bc}")
            gvel_o[pl.ds(q, 1), i, h : h + pc] = jnp.where(has, v, 0.0)


def _scals10(fp: FluidParams, dtype, x0) -> jax.Array:
    return jnp.stack([
        jnp.asarray(fp.dt, dtype),
        jnp.asarray(fp.rest_density, dtype),
        jnp.asarray(fp.dynamic_viscosity, dtype),
        jnp.asarray(fp.eos_stiffness, dtype),
        jnp.asarray(fp.eos_power, dtype),
        jnp.asarray(fp.pressure_floor, dtype),
        jnp.asarray(fp.gravity[0], dtype),
        jnp.asarray(fp.gravity[1], dtype),
        jnp.asarray(fp.gravity[2], dtype),
        jnp.asarray(x0, dtype),
    ])


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def p2g1_shard_pallas(state, fp, config: SimConfig, x0, interpret=False):
    """Pass 1 over a padded slab of L planes -> (gmass [L+2, pcp],
    gmom [L+2, 3, pcp]); exact on accumulator planes [2, L-1]."""
    dim, k, c = state.pos.shape
    z = config.grid_res[2]
    pc = config.grid_res[1] * z
    L = c // pc
    h = _halo(config)
    dtype = state.pos.dtype

    def in_plane(lead):
        ndim = len(lead) + 2

        def index(t):
            idx = [0] * ndim
            idx[-1] = t
            return tuple(idx)

        return pl.BlockSpec((*lead, k, pc), index, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_p2g1_shard_kernel, config=config),
        grid=(L,),
        in_specs=[
            in_plane((3,)),
            in_plane((3,)),
            in_plane((9,)),
            in_plane(()),
            pl.BlockSpec((10,), lambda t: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((L + 2, pc + 2 * h), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L + 2, 3, pc + 2 * h), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L + 2, pc + 2 * h), dtype),
            jax.ShapeDtypeStruct((L + 2, 3, pc + 2 * h), dtype),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
    )(state.pos, state.vel, state.C.reshape(9, k, c), state.mass,
      _scals10(fp, dtype, x0))


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def p2g2u_shard_pallas(state, gmass, gmom, fp, config: SimConfig, x0,
                       interpret=False):
    """Pass 2 + grid update over a padded slab with EXACT exchanged gmass;
    gmom arrives holding the exchanged pass-1 momentum and leaves as grid
    velocity (exact on accumulator planes [2, L-1])."""
    dim, k, c = state.pos.shape
    z = config.grid_res[2]
    pc = config.grid_res[1] * z
    L = c // pc
    h = _halo(config)
    dtype = state.pos.dtype

    def in_plane(lead):
        ndim = len(lead) + 2

        def index(t):
            idx = [0] * ndim
            idx[-1] = jnp.clip(t, 0, L - 1)
            return tuple(idx)

        return pl.BlockSpec((*lead, k, pc), index, memory_space=pltpu.VMEM)

    fixed = lambda shape: pl.BlockSpec(
        shape, lambda t: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    (gvel,) = pl.pallas_call(
        functools.partial(
            _p2g2u_shard_kernel,
            config=config,
            legacy_strain=config.legacy_strain,
        ),
        grid=(L + 2,),
        in_specs=[
            in_plane((3,)),
            in_plane((9,)),
            in_plane(()),
            fixed((L + 2, pc + 2 * h)),
            pl.BlockSpec((10,), lambda t: (0,), memory_space=pltpu.SMEM),
            fixed((L + 2, 3, pc + 2 * h)),
        ],
        out_specs=(fixed((L + 2, 3, pc + 2 * h)),),
        out_shape=(jax.ShapeDtypeStruct((L + 2, 3, pc + 2 * h), dtype),),
        input_output_aliases={5: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
    )(state.pos, state.C.reshape(9, k, c), state.mass, gmass,
      _scals10(fp, dtype, x0), gmom)
    return gvel
