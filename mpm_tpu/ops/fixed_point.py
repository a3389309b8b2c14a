"""int32 fixed-point grid accumulation mode.

The reference accumulates grid mass/momentum as int32 fixed-point with
multiplier 1e7 so atomic adds commute exactly
(MLSMPM3DFluidMultithreadGPU.cs:98, p2g_1.glsl:34-37,
MLSMPM3DFluidMultithreadNew.cs:336-339). Our float path is already
deterministic (segment sums have a fixed order), so this mode exists for
bit-reproducibility cross-checks and parity tests, not correctness.

Encoding truncates toward zero like the reference's `int(x * mult)` cast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def encode(x: jax.Array, mult: float) -> jax.Array:
    return jnp.trunc(x * mult).astype(jnp.int32)


def decode(x: jax.Array, mult: float, dtype=jnp.float32) -> jax.Array:
    return x.astype(dtype) / dtype(mult)
