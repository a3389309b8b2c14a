"""Direct unit tests of the constitutive model (ops/stress.py) against
hand-computed values of the reference formulas (p2g_2.glsl:94-109,
MLSMPM2DFluid.cs:263-285). The engines exercise this module indirectly;
these pin the formulas themselves."""

import numpy as np
import jax.numpy as jnp

from mpm_tpu.core.params import FluidParams
from mpm_tpu.ops.stress import (
    eos_pressure,
    fused_force_term,
    pow_static,
    viscous_strain,
)


def _fp(**kw):
    return FluidParams.create(dim=3, **kw)


def test_pow_static_matches_float_pow():
    x = jnp.asarray([0.5, 1.0, 1.7, 3.2], jnp.float32)
    for p in (1.0, 2.0, 4.0, 7.0, 13.0):
        np.testing.assert_allclose(
            np.asarray(pow_static(x, p)), np.asarray(x) ** p, rtol=1e-6)
    # non-integer exponent falls through to x ** p
    np.testing.assert_allclose(
        np.asarray(pow_static(x, 2.5)), np.asarray(x) ** 2.5, rtol=1e-6)


def test_eos_pressure_tait_form_and_floor():
    """p = max(floor, k ((rho/rho0)^gamma - 1)) — p2g_2.glsl:94."""
    fp = _fp(rest_density=4.0, eos_stiffness=3.0, eos_power=7.0,
             pressure_floor=-0.1)
    rho = jnp.asarray([8.0, 4.0, 1.0], jnp.float32)
    p = np.asarray(eos_pressure(rho, fp))
    np.testing.assert_allclose(p[0], 3.0 * (2.0**7 - 1.0), rtol=1e-6)
    np.testing.assert_allclose(p[1], 0.0, atol=1e-6)
    np.testing.assert_allclose(p[2], -0.1)  # clamped (raw would be ~-3)
    # static-exponent specialization agrees with the traced power
    p_s = np.asarray(eos_pressure(rho, fp, power_static=7.0))
    np.testing.assert_allclose(p_s, p, rtol=1e-6)


def test_viscous_strain_full_and_legacy():
    """3D: C + C^T (p2g_2.glsl:103-105); 2D legacy keeps the diagonal
    unscaled (MLSMPM2DFluid.cs:276-281)."""
    C = jnp.asarray([[[1.0], [2.0]], [[3.0], [4.0]]], jnp.float32)  # [2,2,1]
    full = np.asarray(viscous_strain(C))[:, :, 0]
    np.testing.assert_allclose(full, [[2.0, 5.0], [5.0, 8.0]])
    legacy = np.asarray(viscous_strain(C, legacy=True))[:, :, 0]
    np.testing.assert_allclose(legacy, [[1.0, 5.0], [5.0, 4.0]])


def test_fused_force_term_formula_and_guard():
    """eq16 = -4 dt V sigma with sigma = -p I + mu (C + C^T)
    (p2g_2.glsl:96-109); zero-density lanes stay exactly zero."""
    fp = _fp(dt=0.1, rest_density=4.0, eos_stiffness=3.0, eos_power=2.0,
             dynamic_viscosity=0.5, pressure_floor=-0.1)
    d = 3
    C = jnp.zeros((d, d, 2), jnp.float32).at[0, 1, 0].set(1.0)
    density = jnp.asarray([8.0, 0.0], jnp.float32)
    mass = jnp.asarray([2.0, 1.0], jnp.float32)
    out = np.asarray(fused_force_term(density, mass, C, fp))

    p = 3.0 * ((8.0 / 4.0) ** 2 - 1.0)  # 9.0
    vol = 2.0 / 8.0
    sigma = -p * np.eye(3)
    sigma[0, 1] += 0.5 * 1.0  # mu * (C + C^T)[0,1]
    sigma[1, 0] += 0.5 * 1.0
    eq16 = -4.0 * 0.1 * vol * sigma
    np.testing.assert_allclose(out[:, :, 0], eq16, rtol=1e-6)
    np.testing.assert_array_equal(out[:, :, 1], np.zeros((3, 3)))
