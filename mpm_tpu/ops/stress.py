"""Constitutive model: weakly-compressible EOS + viscous stress.

Normative numerics (SURVEY.md §2.1; reference p2g_2.glsl:94-109,
MLSMPM2DFluid.cs:263-285):

    volume   = m / rho
    pressure = max(floor, k * ((rho / rho0)^gamma - 1))          (Tait/Murnaghan)
    sigma    = -p I + mu (C + C^T)
    eq16     = -4 dt V sigma           (fused MLS-MPM force term, eq. 16)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.params import FluidParams


def pow_static(x: jax.Array, p: float) -> jax.Array:
    """x ** p for a STATIC exponent. Integer powers unroll to multiplies via
    binary exponentiation — a traced `x ** p` lowers to exp(p * log(x)),
    dozens of transcendental VPU ops per element. The multiply order is
    fixed so the XLA engines and the Pallas kernels round identically
    (slot-equality tests depend on it)."""
    if float(p).is_integer() and 0 < p <= 32:
        n = int(p)
        result = None
        base = x
        while n:
            if n & 1:
                result = base if result is None else result * base
            n >>= 1
            if n:
                base = base * base
        return result
    return x**p


def eos_pressure(
    density: jax.Array, fp: FluidParams, power_static: float = 0.0
) -> jax.Array:
    """Tait/Murnaghan pressure (p2g_2.glsl:94). `power_static` (from
    SimConfig.eos_power_static) specializes the exponent at compile time;
    0.0 keeps the fully runtime-tunable traced path."""
    ratio = density / fp.rest_density
    rp = pow_static(ratio, power_static) if power_static else ratio**fp.eos_power
    return jnp.maximum(
        fp.pressure_floor,
        fp.eos_stiffness * (rp - 1.0),
    )


def viscous_strain(C: jax.Array, legacy: bool = False) -> jax.Array:
    """Strain-rate proxy from the APIC affine matrix. C: [D, D, N] lane-major.

    3D kernels use the full symmetrization C + C^T (p2g_2.glsl:103-105).
    The 2D serial variant keeps the diagonal unscaled and only symmetrizes the
    off-diagonals (MLSMPM2DFluid.cs:276-281); `legacy=True` reproduces that
    for bit-parity trajectory replay of the 2D scene.
    """
    Ct = jnp.swapaxes(C, 0, 1)
    full = C + Ct
    if not legacy:
        return full
    d = C.shape[0]
    eye = np.eye(d, dtype=np.float32)[:, :, None]
    # off-diagonals = C_ij + C_ji, diagonal = C_ii
    return full - eye * Ct


def fused_force_term(
    density: jax.Array,  # [N]
    mass: jax.Array,  # [N]
    C: jax.Array,  # [D, D, N] lane-major
    fp: FluidParams,
    legacy_strain: bool = False,
) -> jax.Array:
    """The per-particle eq16 matrix scattered in P2G pass 2 (p2g_2.glsl:96-109).

    Guards density == 0 (a particle whose whole 3^D neighborhood has zero mass
    cannot happen after P2G pass 1 deposited its own mass, but the guard keeps
    masked/padded lanes finite)."""
    d = C.shape[0]
    safe_density = jnp.where(density > 0, density, 1.0)
    volume = mass / safe_density  # [N]
    pressure = eos_pressure(safe_density, fp)  # [N]
    eye = np.eye(d, dtype=np.float32)[:, :, None]
    stress = -pressure * eye + fp.dynamic_viscosity * viscous_strain(C, legacy_strain)
    eq16 = (-4.0 * fp.dt) * volume * stress
    return jnp.where(density > 0, eq16, 0.0)
