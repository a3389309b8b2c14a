"""Interactive force injection — the mouse/sphere analogue.

The reference applies impulse forces to particles inside G2P, after advection:

- 2D mouse repulsion (MLSMPM2DFluid.cs:382-406): inside `mouse_radius`,
  force = normalize(d) * (radius / |d|) * 0.1, NaN-guarded.
- 3D sphere collider repulsion (g2p.glsl:122-129,
  MLSMPM3DFluidMultithreadNew.cs:570-576): inside radius 15,
  force = normalize(d) * strength (unit radial push).

Headless TPU equivalent: `Interaction` is a traced pytree (the analogue of the
g2p push-constant patch, MLSMPM3DFluidMultithreadGPU.cs:618-642), so moving
the sphere or pressing the mouse never recompiles the step.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Interaction:
    """One radial force emitter. `active` gates it (traced; 0.0 = off)."""

    center: jax.Array  # [D]
    radius: jax.Array  # scalar
    strength: jax.Array  # scalar
    # 0.0 -> constant radial push (3D sphere, g2p.glsl:126-128)
    # 1.0 -> 1/r falloff scaled by radius (2D mouse, MLSMPM2DFluid.cs:391-392)
    inv_falloff: jax.Array
    active: jax.Array  # scalar 0/1

    @staticmethod
    def sphere(center, radius=15.0, strength=1.0, active=1.0, dtype=jnp.float32):
        """The flagship's sphere collider (g2p.glsl:122-129)."""
        return Interaction(
            center=np.asarray(center, dtype),
            radius=np.asarray(radius, dtype),
            strength=np.asarray(strength, dtype),
            inv_falloff=np.asarray(0.0, dtype),
            active=np.asarray(active, dtype),
        )

    @staticmethod
    def mouse(center, radius=10.0, strength=0.1, active=1.0, dtype=jnp.float32):
        """The 2D mouse repulsion (MLSMPM2DFluid.cs:382-406)."""
        return Interaction(
            center=np.asarray(center, dtype),
            radius=np.asarray(radius, dtype),
            strength=np.asarray(strength, dtype),
            inv_falloff=np.asarray(1.0, dtype),
            active=np.asarray(active, dtype),
        )

    @staticmethod
    def none(dim: int, dtype=jnp.float32):
        return Interaction(
            center=np.zeros((dim,), dtype),
            radius=np.asarray(1.0, dtype),
            strength=np.asarray(0.0, dtype),
            inv_falloff=np.asarray(0.0, dtype),
            active=np.asarray(0.0, dtype),
        )


def apply_interactions(
    pos: jax.Array, vel: jax.Array, interactions: Sequence[Interaction]
) -> jax.Array:
    """Add interaction impulses to `vel`. Shapes: pos/vel [D, ...] lane-major
    (linear [D, N] or bucketed [D, K, C])."""
    for it in interactions:
        center = it.center.reshape(-1, *([1] * (pos.ndim - 1)))
        d = pos - center  # [D, ...]
        r2 = jnp.sum(d * d, axis=0)
        inside = (r2 < it.radius * it.radius) & (it.active > 0)
        norm = jnp.sqrt(r2)
        safe_norm = jnp.where(norm > 0, norm, 1.0)
        dirn = d / safe_norm
        # falloff: lerp between constant push and radius/|d| scaling
        falloff = 1.0 + it.inv_falloff * (it.radius / safe_norm - 1.0)
        force = dirn * (it.strength * falloff)
        # NaN guard as in the reference (MLSMPM2DFluid.cs:394): a particle
        # exactly at the center gets no force.
        ok = inside & (norm > 0) & jnp.all(jnp.isfinite(force), axis=0)
        vel = vel + jnp.where(ok, force, 0.0)
    return vel
