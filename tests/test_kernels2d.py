"""2D fused substep kernel vs the XLA bucket engine (slot-for-slot)."""

import jax
import jax.numpy as jnp
import numpy as np

from mpm_tpu import get_scene
from mpm_tpu.ops import bucketed
from mpm_tpu.ops.interact import Interaction
from mpm_tpu.ops.pallas import kernels2d


def _scene():
    sc = get_scene("dam_break_2d")
    return sc.config.replace(bin_capacity=8), sc.fluid, sc.state


def test_2d_kernel_matches_bucketed():
    config, fluid, state = _scene()
    assert kernels2d.supported2d(config)
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(state)
    s_x, s_k = b, b
    for _ in range(4):
        s_x = jax.jit(lambda b, f: bucketed.substep(b, config, f, ()))(s_x, fluid)
        s_k = kernels2d.substep2d(s_k, config, fluid, (), interpret=True)
    np.testing.assert_allclose(np.asarray(s_x.pos), np.asarray(s_k.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_x.vel), np.asarray(s_k.vel), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_x.C), np.asarray(s_k.C), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(s_x.ids), np.asarray(s_k.ids))
    assert int(s_k.lost) == int(s_x.lost) == 0
    assert int(s_k.deferred) == int(s_x.deferred)
    assert int(s_k.cfl_clamped) == int(s_x.cfl_clamped)


def test_2d_kernel_with_mouse_interaction():
    config, fluid, state = _scene()
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(state)
    inter = (Interaction.mouse((32.0, 20.0), radius=10.0, strength=0.5),)
    s_x = jax.jit(lambda b, f, it: bucketed.substep(b, config, f, it))(
        b, fluid, inter
    )
    s_k = kernels2d.substep2d(b, config, fluid, inter, interpret=True)
    np.testing.assert_allclose(np.asarray(s_x.pos), np.asarray(s_k.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_x.vel), np.asarray(s_k.vel), atol=1e-5)


def test_2d_kernel_crush_conserves():
    """Overflow rejection in the 2D kernel: heavy gravity crush, zero loss."""
    config, fluid, state = _scene()
    config = config.replace(bin_capacity=8)
    fluid = fluid.replace(gravity=jnp.asarray([0.0, 40.0]))  # 2D: +y is down
    b = jax.jit(lambda s: bucketed.from_simstate(s, config))(state)
    n0 = int(np.sum(np.asarray(b.mass) > 0))
    for _ in range(30):
        b = kernels2d.substep2d(b, config, fluid, (), interpret=True)
    occ = np.asarray(b.mass) > 0
    assert int(b.lost) == 0
    assert int(np.sum(occ)) == n0
    assert int(b.deferred) > 0
    assert occ.sum(axis=0).max() <= config.bin_capacity
