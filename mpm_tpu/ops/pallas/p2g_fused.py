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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.params import BC_FRICTION, BC_SLIP, BC_STICK, FluidParams, SimConfig
from .bucket_kernels import _TAPS3, _halo, _plane_geometry, _tap_parts, _tap_w_dist


def _matvec9(C9, v):
    """rows i = sum_j C9[3i+j] * v[j] for [9, K, pc] x [3, K, pc]."""
    return jnp.stack([
        C9[3 * i] * v[0] + C9[3 * i + 1] * v[1] + C9[3 * i + 2] * v[2]
        for i in range(3)
    ])


def _matvec9_t(C9, v):
    return jnp.stack([
        C9[i] * v[0] + C9[3 + i] * v[1] + C9[6 + i] * v[2]
        for i in range(3)
    ])


def _p2g_update_kernel(
    pos_ref, vel_ref, C_ref, mass_ref, scal_ref,
    gvel_o,
    r_pos, r_C, r_mass, gmass,
    *, config: SimConfig, legacy_strain: bool,
):
    t = pl.program_id(0)
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

    @pl.when(t == 0)
    def _init():
        gvel_o[:] = jnp.zeros_like(gvel_o)
        gmass[:] = jnp.zeros_like(gmass)

    # ---- A-phase: P2G pass 1 for plane t (p2g_1.glsl:56-93) ----
    @pl.when(t < nx)
    def _a_phase():
        mass = mass_ref[:]
        r_mass[jax.lax.rem(t, 3)] = mass  # always: B occupancy-masks via mass

        @pl.when(jnp.max(mass) > 0)
        def _occupied():
            rt = jax.lax.rem(t, 3)
            pos = pos_ref[:]
            velp = vel_ref[:]
            C9 = C_ref[:]
            r_pos[rt] = pos
            r_C[rt] = C9
            occ = mass > 0
            d = _plane_geometry(pos, t, z, dtype)

            for tap, (dx, oyz) in zip(_TAPS3, _tap_parts(config)):
                w, dist = _tap_w_dist(d, tap)
                w = jnp.where(occ, w, 0.0)
                mass_c = w * mass
                Cd = _matvec9(C9, dist)
                mom_c = mass_c * (velp + Cd)
                m_p = jnp.sum(mass_c, axis=0)
                mom_p = jnp.sum(mom_c, axis=1)
                p = t + dx
                lo = h + oyz

                @pl.when((p >= 0) & (p < nx))
                def _(p=p, m_p=m_p, mom_p=mom_p, lo=lo):
                    gmass[p, lo : lo + pc] += m_p
                    gvel_o[p, :, lo : lo + pc] += mom_p

    # ---- B-phase: density + P2G pass 2 for plane j = t - 2 ----
    @pl.when((t >= 2) & (t - 2 < nx))
    def _b_phase():
        j = t - 2
        rj = jax.lax.rem(j, 3)
        mass = r_mass[rj]

        @pl.when(jnp.max(mass) > 0)
        def _occupied():
            pos = r_pos[rj]
            C9 = r_C[rj]
            occ = mass > 0
            d = _plane_geometry(pos, j, z, dtype)

            density = jnp.zeros_like(mass)
            for tap, (dx, oyz) in zip(_TAPS3, _tap_parts(config)):
                w, _ = _tap_w_dist(d, tap)
                p = jnp.clip(j + dx, 0, nx - 1)
                lo = h + oyz
                plane = gmass[p, lo : lo + pc]
                ok = ((j + dx) >= 0) & ((j + dx) < nx)
                gm = jnp.where(ok, plane, 0.0)
                density = density + w * gm[None, :]

            safe_density = jnp.where(occ, density, 1.0)
            volume = jnp.where(occ, mass / safe_density, 0.0)
            ratio = safe_density / rest_density
            pressure = jnp.maximum(floor, stiffness * (ratio**power - 1.0))
            coef = -4.0 * dt * volume
            a_p = coef * (-pressure)
            b_mu = coef * viscosity

            for tap, (dx, oyz) in zip(_TAPS3, _tap_parts(config)):
                w, dist = _tap_w_dist(d, tap)
                w = jnp.where(occ, w, 0.0)
                if legacy_strain:
                    # 2D serial variant strain (MLSMPM2DFluid.cs:276-281):
                    # S = C + C^T - diag(C^T)
                    Sd = _matvec9(C9, dist) + _matvec9_t(C9, dist)
                    diag = jnp.stack([C9[0], C9[4], C9[8]])
                    Sd = Sd - diag * dist
                else:
                    Sd = _matvec9(C9, dist) + _matvec9_t(C9, dist)
                mom_c = w * (a_p * dist + b_mu * Sd)
                mom_p = jnp.sum(mom_c, axis=1)
                p = j + dx
                lo = h + oyz

                @pl.when((p >= 0) & (p < nx))
                def _(p=p, mom_p=mom_p, lo=lo):
                    gvel_o[p, :, lo : lo + pc] += mom_p

    # ---- U-phase: grid update for plane q = t - 3 (update_grid.glsl) ----
    # Row-by-row, no jnp.stack: Mosaic cannot concatenate vectors whose lane
    # layouts carry different shift offsets (the momentum rows are halo-
    # offset slices), so each velocity row is computed and written alone.
    @pl.when(t >= 3)
    def _u_phase():
        q = t - 3
        gm = gmass[pl.ds(q, 1), h : h + pc]  # [1, pc]
        has = gm > 0
        safe = jnp.where(has, gm, 1.0)

        # boundary bands at global coordinates, all [1, pc]
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, pc), 1)
        cy = idx // z
        cz = idx % z
        lo_b, hi_b = config.bc_band_lo, config.bc_band_hi
        band_x = (q < lo_b) | (q > nx - 1 - hi_b)
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
    interpret: bool = False,
) -> jax.Array:
    """Returns gvel_pad [nx, 3, pc + 2h]: updated grid velocities with zeroed
    halo columns — the exact input of fused._g2p_migrate_fused."""
    dim, k, c = state.pos.shape
    nx = config.grid_res[0]
    pc = c // nx
    h = _halo(config)
    dtype = state.pos.dtype

    def in_plane(lead):
        ndim = len(lead) + 2

        def index(t):
            idx = [0] * ndim
            idx[-1] = jnp.clip(t, 0, nx - 1)
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
    ])

    (gvel,) = pl.pallas_call(
        functools.partial(
            _p2g_update_kernel,
            config=config,
            legacy_strain=config.legacy_strain,
        ),
        grid=(nx + 3,),
        in_specs=[
            in_plane((3,)),
            in_plane((3,)),
            in_plane((9,)),
            in_plane(()),
            pl.BlockSpec((9,), lambda t: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (nx, 3, pc + 2 * h), lambda t: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(jax.ShapeDtypeStruct((nx, 3, pc + 2 * h), dtype),),
        scratch_shapes=[
            pltpu.VMEM((3, 3, k, pc), dtype),
            pltpu.VMEM((3, 9, k, pc), dtype),
            pltpu.VMEM((3, k, pc), dtype),
            pltpu.VMEM((nx, pc + 2 * h), dtype),
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
