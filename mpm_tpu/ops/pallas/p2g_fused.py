"""Fused P2G pass 1 + pass 2 + grid update (kernel P).

One sweep reads the particle state exactly once and emits the halo-padded
grid-velocity array that the fused G2P kernel (fused.py, kernel F) consumes
directly — no XLA glue. Round-3 restructure: the dominant cost of this
kernel is its unaligned accumulator read-modify-writes (attribution measured
the original pass-1 scatter — 27 taps x 4 rows — at ~2.3 ms of the 7.9 ms
1M substep), so the pass-1 APIC momentum scatter is DEFERRED to the B-phase
and merged with the force scatter: both are moment-form fields
(w_tap * (b + sum_j t_j M[:, j]), see _scatter_moments), so their sum
scatters for the cost of one. Accumulator RMW rows per plane: 27 mass +
27x3 merged momentum = 108, vs 189 in the two-scatter form.

Pipeline (grid = nx + 3 sequential steps, three phases in flight):

  step t:
    A-phase (plane t      < nx): P2G pass-1 MASS scatter into the VMEM grid
        accumulator (p2g_1.glsl:56-93); the plane's {pos, vel, C, mass} is
        stashed in a 3-deep VMEM ring for B.
    B-phase (plane j = t-2 >= 0): pass-1 mass for planes j-1..j+1 is final
        (A scatters one plane each way), so the density gather runs, then
        ONE merged scatter emits pass-1 APIC momentum + pass-2 EOS/viscous
        force from the ring (p2g_1.glsl:56-93 + p2g_2.glsl:52-159).
    U-phase (plane q = t-3 >= 0): momentum for plane q is final (B of
        planes q-1..q+1 ran at steps <= t, and step t's B textually
        precedes U), so the grid update (momentum -> velocity, gravity,
        boundary bands; update_grid.glsl:36-74) runs in place on the output.

Spill columns of the padded accumulators are structurally zero (the geometry
clip keeps every axis' edge planes/rows empty — see bucket_kernels.py), so
the halo padding the G2P views read is exactly the zeros _init wrote.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
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

import os

# Perf-attribution knobs for kernel P (physics-breaking; fresh-process
# experiments via scripts/quickbench.py — production = all defaults)
_KP_NOS1 = os.environ.get("MPM_KP_NOS1", "0") == "1"   # skip pass-1 scatter
_KP_NOS2 = os.environ.get("MPM_KP_NOS2", "0") == "1"   # skip pass-2 scatter
_KP_NODEN = os.environ.get("MPM_KP_NODEN", "0") == "1"  # density := 1
_KP_NOU = os.environ.get("MPM_KP_NOU", "0") == "1"      # skip grid update
# Structural variant (physics-preserving): taps accumulate into ALIGNED
# per-(ty,tz) scratch rows (a 3-plane ring) and each completed plane flushes
# with 9 shifted row-adds instead of 27 (mass) / 81 (momentum) — the
# round-3 "aligned-accumulate + single shifted reduction" experiment.
# Regroups f32 partial sums (ulp-level vs the direct path; int32 fixed
# point is exactly associative and bit-identical).
_KP_ALIGNED = os.environ.get("MPM_KP_ALIGNED", "0") == "1"


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


def _k_reduce(fixed_mult):
    """K-axis reduction of per-slot tap contributions. Float mode sums in
    f32; fixed-point mode encodes each SLOT's contribution to int32 first
    (trunc toward zero, the reference's `int(x * mult)` cast, p2g_1.glsl:87-90)
    then sums exactly — int32 addition commutes and associates, which is what
    makes the mode bit-reproducible across permutations and shard counts."""
    if fixed_mult is None:
        return lambda x: jnp.sum(x, axis=0)
    m = np.float32(fixed_mult)
    return lambda x: jnp.sum(jnp.trunc(x * m).astype(jnp.int32), axis=0)


def _force_moments(d, a_p, b_mu, C9, legacy_strain):
    """Pass-2 force term in moment form: contribution
    w * (a_p*dist + b_mu*S@dist) = w * (M @ dist) with M = a_p*I + b_mu*S;
    per tap q_t = b + sum_j t_j * M[:, j], b = -M @ (1 + d)."""
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
    return b, M


def _scatter_moments(d, b, M, emit, reduce=None):
    """Scatter a momentum field given in moment form: tap (tx,ty,tz) emits
    w_tap * (b + sum_j t_j * M[:, j]) with per-axis partial products shared
    across taps. The pass-1 APIC term (_pass1_moments), the pass-2 force
    term (_force_moments), and their SUM all have this form — merging both
    momentum scatters into one costs the same 27x3 accumulator rows as
    pass 2 alone (the round-3 kernel-P restructure; attribution measured
    pass-1's separate momentum scatter at ~2.3 ms of the 7.9 ms substep)."""
    red = reduce if reduce is not None else (lambda x: jnp.sum(x, axis=0))
    wxs = [bspline.axis_weight(i, d[0]) for i in range(3)]
    wys = [bspline.axis_weight(i, d[1]) for i in range(3)]
    wzs = [bspline.axis_weight(i, d[2]) for i in range(3)]
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
                    red(wx * Yq[a] + (wx * float(tx)) * Yc0[a])
                    for a in range(3)
                ])
                emit(tx, ty, tz, mom_p)


def _scatter_mass(d, mass, emit, reduce=None):
    """Mass-only pass-1 scatter: emit(tx, ty, tz, m_p [pc]) per tap."""
    red = reduce if reduce is not None else (lambda x: jnp.sum(x, axis=0))
    wxs = [bspline.axis_weight(i, d[0]) for i in range(3)]
    wys = [bspline.axis_weight(i, d[1]) for i in range(3)]
    wzs = [bspline.axis_weight(i, d[2]) for i in range(3)]
    for tz in range(3):
        Z0 = wzs[tz] * mass
        for ty in range(3):
            Y0 = wys[ty] * Z0
            for tx in range(3):
                emit(tx, ty, tz, red(wxs[tx] * Y0))


def _p2g_update_kernel(
    pos_ref, vel_ref, C_ref, mass_ref, scal_ref,
    gvel_o,
    r_pos, r_vel, r_C, r_mass, gmass, a_ms, a_mo,
    *, config: SimConfig, legacy_strain: bool, shard: bool,
    fixed_mult: float | None = None,
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

    # aligned-accumulate only on the unsharded sweep (the sharded halo
    # planes would need their own flush schedule; direct emit there)
    aligned = _KP_ALIGNED and not shard

    @pl.when(t == 0)
    def _init():
        gvel_o[:] = jnp.zeros_like(gvel_o)
        gmass[:] = jnp.zeros_like(gmass)
        if aligned:
            a_ms[:] = jnp.zeros_like(a_ms)
            a_mo[:] = jnp.zeros_like(a_mo)

    # ---- A-phase: P2G pass-1 MASS scatter for plane t (p2g_1.glsl:56-93;
    # the pass-1 APIC momentum is deferred to the B-phase, where it merges
    # with the force scatter at zero extra accumulator traffic) ----
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
            r_vel[rt] = velp
            r_C[rt] = C9
            g = x0 + t.astype(dtype)  # global plane coordinate
            d = _plane_geometry(pos, g, z, dtype)

            def emit1(tx, ty, tz, m_p):
                dx = tx - 1
                p = t + dx + ao
                ok = (g + dx >= 0) & (g + dx <= nx - 1)
                if not shard:
                    ok = (t + dx >= 0) & (t + dx < L)
                else:
                    p = jnp.clip(p, 0, L + 2 * ao - 1)
                lo = h + (ty - 1) * z + (tz - 1)

                @pl.when(ok)
                def _(p=p, m_p=m_p, lo=lo):
                    if aligned:  # ALIGNED += at offset 0 of the ring row
                        a_ms[jax.lax.rem(p, 3), ty * 3 + tz, :] += m_p
                    else:
                        gmass[p, lo : lo + pc] += m_p

            if not _KP_NOS1:
                _scatter_mass(d, mass, emit1, reduce=_k_reduce(fixed_mult))

    # ---- mass flush: plane t-1's ring rows -> 9 shifted adds (vs 27 at
    # emit). Runs BEFORE the B-phase below, whose density gather reads
    # gmass planes (t-3 .. t-1) ----
    if aligned and not _KP_NOS1:

        @pl.when((t >= 1) & (t - 1 < L))
        def _flush_mass():
            fpl = t - 1
            r = jax.lax.rem(fpl, 3)
            for row in range(9):
                lo = h + (row // 3 - 1) * z + (row % 3 - 1)
                gmass[fpl, lo : lo + pc] += a_ms[r, row, :]
            a_ms[r] = jnp.zeros_like(a_ms[r])

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

            density = jnp.zeros_like(pos[0])
            if _KP_NODEN:
                density = density + 1.0
            else:
                for tap, (dx, oyz) in zip(_TAPS3, _tap_parts(config)):
                    w = wxy[tap[0]][tap[1]] * wz_t[tap[2]]
                    p = jnp.clip(j + dx + ao, 0, L + 2 * ao - 1)
                    lo = h + oyz
                    plane = gmass[p, lo : lo + pc]
                    ok = (gj + dx >= 0) & (gj + dx <= nx - 1)
                    if fixed_mult is None:
                        gm = jnp.where(ok, plane, 0.0)
                    else:  # decode int32 grid mass (ops/fixed_point.decode)
                        gm = jnp.where(ok, plane, 0).astype(dtype) / np.float32(
                            fixed_mult
                        )
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
                # mass/volume (hence both moment sets) are zero on empty
                # slots — no mask
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
                    if aligned:  # ALIGNED += at offset 0 of the ring row
                        a_mo[jax.lax.rem(p, 3), ty * 3 + tz] += mom_p
                    else:
                        gvel_o[p, :, lo : lo + pc] += mom_p

            if not _KP_NOS2:
                # merged momentum scatter: pass-1 APIC m(v + C d) + pass-2
                # force — both are moment-form fields, so one scatter with
                # summed moments emits both for the cost of one
                b1, mc = _pass1_moments(d, mass, r_vel[rj], C9)
                b2, M2 = _force_moments(d, a_p, b_mu, C9, legacy_strain)
                bc = [b1[a] + b2[a] for a in range(3)]
                Mc = [
                    [mc[a][jj] + M2[a][jj] for jj in range(3)]
                    for a in range(3)
                ]
                _scatter_moments(d, bc, Mc, emit2,
                                 reduce=_k_reduce(fixed_mult))

    # ---- momentum flush: plane (t-3)'s ring rows -> 9 shifted [3, pc]
    # adds (vs 27 at emit); B(t-2) above contributed its dx=-1 share this
    # step, and the U-phase below reads the flushed plane ----
    if aligned and not _KP_NOS2:

        @pl.when((t >= 3) & (t - 3 < L))
        def _flush_mom():
            q = t - 3
            r = jax.lax.rem(q, 3)
            for row in range(9):
                lo = h + (row // 3 - 1) * z + (row % 3 - 1)
                gvel_o[q, :, lo : lo + pc] += a_mo[r, row]
            a_mo[r] = jnp.zeros_like(a_mo[r])

    # ---- U-phase: grid update for plane q = t - 3 (update_grid.glsl) ----
    # Row-by-row, no jnp.stack: Mosaic cannot concatenate vectors whose lane
    # layouts carry different shift offsets (the momentum rows are halo-
    # offset slices), so each velocity row is computed and written alone.
    # sharded: only planes whose accumulated momentum is locally complete
    # are updated (local a in [1+ao, L-2+ao]); the rest arrive by exchange
    u_ok = (t >= 3) if not shard else (t >= 3 + 1) & (t - 3 <= L - 2)
    if _KP_NOU:
        u_ok = u_ok & (t < 0)

    @pl.when(u_ok)
    def _u_phase():
        q = t - 3 + ao  # accumulator plane index
        gq = x0 + (t - 3).astype(dtype)  # global plane coordinate
        gm = gmass[pl.ds(q, 1), h : h + pc]  # [1, pc]
        if fixed_mult is not None:  # decode int32 mass (ops/grid.update_grid)
            gm = gm.astype(dtype) / np.float32(fixed_mult)
        has = gm > 0
        safe = jnp.where(has, gm, 1.0)

        # boundary bands at global coordinates, all [1, pc]
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, pc), 1)
        cy = idx // z
        cz = idx % z
        lo_b, hi_b = config.bc_band_lo, config.bc_band_hi
        band_x = (gq < float(lo_b)) | (gq > float(config.dres[0] - 1 - hi_b))
        bands = [
            jnp.zeros_like(has) | band_x,  # scalar x-band broadcast
            (cy < lo_b) | (cy > config.dres[1] - 1 - hi_b),
            (cz < lo_b) | (cz > config.dres[2] - 1 - hi_b),
        ]
        for i in range(3):
            mom = gvel_o[pl.ds(q, 1), i, h : h + pc]
            if fixed_mult is not None:  # decode int32 momentum
                mom = mom.astype(dtype) / np.float32(fixed_mult)
            v = mom / safe + dt * scal_ref[6 + i]
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
            v = jnp.where(has, v, 0.0)
            if fixed_mult is not None:  # re-encode: grid velocity stays i32
                v = jnp.trunc(v * np.float32(fixed_mult)).astype(jnp.int32)
            gvel_o[pl.ds(q, 1), i, h : h + pc] = v


def p2g_update_supported(config: SimConfig) -> bool:
    """Same envelope as the F kernel: 3D, 128-divisible planes, and the
    full padded grid-velocity + accumulator + rings fit VMEM. Fixed-point
    configs run the same sweep with int32 accumulators (same byte count)."""
    if config.dim != 3:
        return False
    pc = config.grid_res[1] * config.grid_res[2]
    if pc % 128 != 0:
        return False
    nx = config.grid_res[0]
    k = config.bin_capacity
    pcp = pc + 2 * _halo(config)
    grid_bytes = nx * 4 * pcp * 4
    ring_bytes = 3 * 16 * k * pc * 4  # pos 3 + vel 3 + C 9 + mass 1
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

    fixed_mult = config.fixed_point_mult if config.fixed_point else None
    acc_dtype = jnp.int32 if config.fixed_point else dtype
    n_acc = L + 2 * ao
    (gvel,) = pl.pallas_call(
        functools.partial(
            _p2g_update_kernel,
            config=config,
            legacy_strain=config.legacy_strain,
            shard=shard,
            fixed_mult=fixed_mult,
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
        out_shape=(jax.ShapeDtypeStruct((n_acc, 3, pc + 2 * h), acc_dtype),),
        scratch_shapes=[
            pltpu.VMEM((3, 3, k, pc), dtype),
            pltpu.VMEM((3, 3, k, pc), dtype),
            pltpu.VMEM((3, 9, k, pc), dtype),
            pltpu.VMEM((3, k, pc), dtype),
            pltpu.VMEM((n_acc, pc + 2 * h), acc_dtype),
            # aligned-accumulate rings (MPM_KP_ALIGNED): 9 per-(ty,tz) mass
            # rows and 9 [3]-axis momentum rows per in-flight plane
            pltpu.VMEM((3, 9, pc), acc_dtype),
            pltpu.VMEM((3, 9, 3, pc), acc_dtype),
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
# The sharded path therefore splits at the natural exchange point: stage 1
# accumulates MASS (exact on [x0+1, x0+loc_x+2] of the padded slab's
# accumulator), the neighbors' exact planes replace the stale ends, and
# stage 2 then sees exact density everywhere it needs it and emits ALL
# momentum (merged pass-1 APIC + pass-2 force) from the padded slab's own
# exact state — identical formulas on identical exchanged state on both
# sides of a boundary, so no momentum exchange is needed at all.


def _p2g1_shard_kernel(
    pos_ref, mass_ref, scal_ref,
    gmass_o,
    *, config: SimConfig, fixed_mult: float | None = None,
):
    """Pass-1 MASS scatter only (A-phase of _p2g_update_kernel), halo-mode
    accumulator. Momentum is deferred to the merged B-phase of the stage-2
    kernel — which removes the [L+2, 3, pcp] gmom ICI exchange entirely
    (stage 2 emits momentum from the padded slab's own exact state)."""
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

    mass = mass_ref[:]

    @pl.when(jnp.max(mass) > 0)
    def _occupied():
        pos = pos_ref[:]
        g = x0 + t.astype(dtype)
        d = _plane_geometry(pos, g, z, dtype)

        def emit1(tx, ty, tz, m_p):
            dx = tx - 1
            p = jnp.clip(t + dx + 1, 0, L + 1)
            ok = (g + dx >= 0) & (g + dx <= float(nx - 1))
            lo = h + (ty - 1) * z + (tz - 1)

            @pl.when(ok)
            def _(p=p, m_p=m_p, lo=lo):
                gmass_o[p, lo : lo + pc] += m_p

        _scatter_mass(d, mass, emit1, reduce=_k_reduce(fixed_mult))


def _p2g2u_shard_kernel(
    pos_ref, vel_ref, C_ref, mass_ref, gmass_ref, scal_ref,
    gvel_o,
    *, config: SimConfig, legacy_strain: bool,
    fixed_mult: float | None = None,
):
    """Merged momentum (pass-1 APIC + pass-2 force) + grid update with EXACT
    (exchanged) grid mass: B for plane t runs immediately (density needs no
    local accumulation), U for plane t-2 once its momentum contributions are
    in. All momentum is emitted here from the padded slab's own exact state,
    so no pass-1 momentum exchange exists."""
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

    @pl.when(t == 0)
    def _init():
        gvel_o[:] = jnp.zeros_like(gvel_o)

    @pl.when(t < L)
    def _b_phase():
        mass = mass_ref[:]

        @pl.when(jnp.max(mass) > 0)
        def _occupied():
            pos = pos_ref[:]
            velp = vel_ref[:].astype(pos.dtype)
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
                if fixed_mult is None:
                    gm = jnp.where(ok, plane, 0.0)
                else:
                    gm = jnp.where(ok, plane, 0).astype(dtype) / np.float32(
                        fixed_mult
                    )
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

            b1, mc = _pass1_moments(d, mass, velp, C9)
            b2, M2 = _force_moments(d, a_p, b_mu, C9, legacy_strain)
            bc = [b1[a] + b2[a] for a in range(3)]
            Mc = [
                [mc[a][jj] + M2[a][jj] for jj in range(3)] for a in range(3)
            ]
            _scatter_moments(d, bc, Mc, emit2, reduce=_k_reduce(fixed_mult))

    # U for accumulator plane a = t - 2 + 1, locally complete a in [2, L-1]
    @pl.when((t >= 3) & (t - 2 <= L - 2))
    def _u_phase():
        q = t - 1  # accumulator index (= state plane (t-2) + 1)
        gq = x0 + (t - 2).astype(dtype)
        gm = gmass_ref[pl.ds(q, 1), h : h + pc]
        if fixed_mult is not None:
            gm = gm.astype(dtype) / np.float32(fixed_mult)
        has = gm > 0
        safe = jnp.where(has, gm, 1.0)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, pc), 1)
        cy = idx // z
        cz = idx % z
        lo_b, hi_b = config.bc_band_lo, config.bc_band_hi
        band_x = (gq < float(lo_b)) | (gq > float(config.dres[0] - 1 - hi_b))
        bands = [
            jnp.zeros_like(has) | band_x,
            (cy < lo_b) | (cy > config.dres[1] - 1 - hi_b),
            (cz < lo_b) | (cz > config.dres[2] - 1 - hi_b),
        ]
        for i in range(3):
            mom = gvel_o[pl.ds(q, 1), i, h : h + pc]
            if fixed_mult is not None:
                mom = mom.astype(dtype) / np.float32(fixed_mult)
            v = mom / safe + dt * scal_ref[6 + i]
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
            v = jnp.where(has, v, 0.0)
            if fixed_mult is not None:
                v = jnp.trunc(v * np.float32(fixed_mult)).astype(jnp.int32)
            gvel_o[pl.ds(q, 1), i, h : h + pc] = v


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
    """Pass-1 mass scatter over a padded slab of L planes -> gmass
    [L+2, pcp]; exact on accumulator planes [2, L-1]."""
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

    acc_dtype = jnp.int32 if config.fixed_point else dtype
    (gmass,) = pl.pallas_call(
        functools.partial(
            _p2g1_shard_kernel, config=config,
            fixed_mult=config.fixed_point_mult if config.fixed_point else None,
        ),
        grid=(L,),
        in_specs=[
            in_plane((3,)),
            in_plane(()),
            pl.BlockSpec((10,), lambda t: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((L + 2, pc + 2 * h), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L + 2, pc + 2 * h), acc_dtype),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
    )(state.pos, state.mass, _scals10(fp, dtype, x0))
    return gmass


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def p2g2u_shard_pallas(state, gmass, fp, config: SimConfig, x0,
                       interpret=False):
    """Merged momentum (pass-1 APIC + pass-2 force) + grid update over a
    padded slab with EXACT exchanged gmass -> grid velocity (exact on
    accumulator planes [2, L-1])."""
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

    acc_dtype = jnp.int32 if config.fixed_point else dtype
    (gvel,) = pl.pallas_call(
        functools.partial(
            _p2g2u_shard_kernel,
            config=config,
            legacy_strain=config.legacy_strain,
            fixed_mult=config.fixed_point_mult if config.fixed_point else None,
        ),
        grid=(L + 2,),
        in_specs=[
            in_plane((3,)),
            in_plane((3,)),
            in_plane((9,)),
            in_plane(()),
            fixed((L + 2, pc + 2 * h)),
            pl.BlockSpec((10,), lambda t: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=(fixed((L + 2, 3, pc + 2 * h)),),
        out_shape=(jax.ShapeDtypeStruct((L + 2, 3, pc + 2 * h), acc_dtype),),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
    )(state.pos, state.vel, state.C.reshape(9, k, c), state.mass, gmass,
      _scals10(fp, dtype, x0))
    return gvel
