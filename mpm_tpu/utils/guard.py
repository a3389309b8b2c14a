"""Step-level failure detection with last-good-state rollback.

The reference has no failure handling (SURVEY.md §5) — its stability relies
on clamps (pressure floor, position clamps, wall springs) that "keep running
even if the sim explodes". Headless long runs deserve better: `GuardedStep`
checks the state for non-finite values after each frame and rolls back to
the last good state (optionally with a reduced dt), which is cheap because
states are just pytrees.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def state_is_finite(state) -> bool:
    """Host-side finiteness check across all float leaves."""
    for leaf in jax.tree_util.tree_leaves(state):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                return False
    return True


def finite_check_jit(state) -> jax.Array:
    """Traced scalar: 1.0 iff every float leaf is finite (compose into jitted
    steps for cheap on-device checks)."""
    ok = jnp.asarray(True)
    for leaf in jax.tree_util.tree_leaves(state):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            ok = ok & jnp.all(jnp.isfinite(leaf))
    return ok


class GuardedStep:
    """Wraps a step fn with NaN/blow-up detection + rollback.

    On failure: restores the last good state, optionally scales dt down by
    `dt_backoff`, and counts the event. Check `failures` / `current_dt_scale`
    for diagnostics.
    """

    def __init__(self, step: Callable, check_every: int = 1, dt_backoff: float = 0.5,
                 max_failures: int = 8):
        self._step = step
        self.check_every = check_every
        self.dt_backoff = dt_backoff
        self.max_failures = max_failures
        self.failures = 0
        self.current_dt_scale = 1.0
        self._good = None
        self._count = 0

    def __call__(self, state, fluid, interactions=()):
        if self._good is None:
            # copy: steps built with donate=True donate `state`'s buffers on
            # this very call — an aliased reference would be deleted with them
            self._good = jax.tree_util.tree_map(jnp.copy, state)
        fluid_eff = (
            fluid
            if self.current_dt_scale == 1.0
            else fluid.replace(dt=float(np.asarray(fluid.dt)) * self.current_dt_scale)
        )
        out = self._step(state, fluid_eff, interactions)
        self._count += 1
        if self._count % self.check_every == 0:
            if not state_is_finite(out):
                self.failures += 1
                if self.failures > self.max_failures:
                    raise RuntimeError(
                        f"simulation diverged {self.failures} times; giving up"
                    )
                self.current_dt_scale *= self.dt_backoff
                # hand out the saved state but keep our own fresh copy: the
                # caller's next step may donate the returned buffers
                good = self._good
                self._good = jax.tree_util.tree_map(jnp.copy, good)
                return good
            # copy: steps built with donate=True would otherwise donate the
            # saved buffers on the next call, deleting the rollback target
            self._good = jax.tree_util.tree_map(jnp.copy, out)
        return out
