"""Step-level failure detection with last-good-state rollback.

The reference has no failure handling (SURVEY.md §5) — its stability relies
on clamps (pressure floor, position clamps, wall springs) that "keep running
even if the sim explodes". Headless long runs deserve better: `GuardedStep`
checks the state for non-finite values and rolls back to the last VERIFIED
snapshot (optionally with a reduced dt).

Production policy (round 4 — the round-3 version copied the full state
EVERY call, ~125 MB/frame at 1M, unusable in the hot loop):

- snapshots are taken every `snapshot_every` frames (one on-device pytree
  copy; rollback can lose up to `snapshot_every` frames of progress — the
  standard checkpoint-interval tradeoff);
- finiteness is ONE fused on-device scalar per `check_every` frames,
  fetched ASYNCHRONOUSLY (jax.Array.is_ready, the same non-blocking pattern
  as the air-window's polls — a blocking scalar readback costs a ~70 ms
  tunnel round-trip, CLAUDE.md measurement rules) and consumed
  opportunistically;
- a snapshot becomes the rollback target only once every check at or
  before its frame has resolved finite (double-buffered promotion), so a
  late-detected blow-up can never roll back INTO a poisoned state.

Measured overhead at the official 1M bench config on the chip, guarded
render-shaped loop vs bare (snapshot_every=16, check_every=4):
see tests/test_guard.py + scripts/guard_overhead.py — the docstring of
GuardedStep carries the number.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def state_is_finite(state) -> bool:
    """Host-side finiteness check across all float leaves (BLOCKING — test
    and debug use; the guard's hot path uses finite_check_jit + async)."""
    for leaf in jax.tree_util.tree_leaves(state):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                return False
    return True


def finite_check_jit(state) -> jax.Array:
    """Traced scalar: True iff every float leaf is finite (compose into
    jitted steps for cheap on-device checks)."""
    ok = jnp.asarray(True)
    for leaf in jax.tree_util.tree_leaves(state):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            ok = ok & jnp.all(jnp.isfinite(leaf))
    return ok


class GuardedStep:
    """Wraps a step fn with NaN/blow-up detection + verified-snapshot
    rollback. Safe with donate=True steps (snapshots are real copies).

    On detected failure: restores the last VERIFIED snapshot, scales dt
    down by `dt_backoff`, and counts the event. Detection can lag the
    failing frame by up to `check_every` frames (async readback) — the
    promotion protocol guarantees the restored snapshot predates the first
    unverified frame, so the rollback target is always finite.

    Measured overhead at the 1M official bench config (chip, chunked
    10-substep calls, scripts/guard_overhead.py round 5 — INTERLEAVED
    bare/guarded windows so platform drift cancels, 3 fresh processes):
    **7-10% at snapshot_every=32/check_every=8 with the pos-only check**,
    stable across three formulations (per-leaf vs fused-copy snapshots,
    per-call vs per-check is_ready polling — neither moved it), i.e. the
    cost is per check EVENT, not per dispatch: on this platform every
    device round trip rides a ~35 MB/s tunnel with ~tens-of-ms latency,
    so the async scalar readback itself is the floor (CLAUDE.md
    measurement rules). The structural device work is trivial — one
    fused-copy (~125 MB at 1M) per snapshot_every calls and one pos
    reduce (~30 MB) per check_every — a PCIe-attached host pays only
    that. These are the CLI defaults (--guard, 32/8); scale both up for
    cheaper-but-laggier detection.

    `failures` / `current_dt_scale` / `frames_lost` are diagnostics."""

    def __init__(self, step: Callable, check_every: int = 4,
                 dt_backoff: float = 0.5, max_failures: int = 8,
                 snapshot_every: int = 16, sync: bool = False,
                 check_field: str | None = "pos"):
        # sync=True blocks on every check (detection on the failing call,
        # rollback to the immediately previous snapshot) — deterministic,
        # right for tests and CPU; costs a device round-trip per check, so
        # production loops keep the async default.
        # check_field: the finiteness reduce READS what it checks (the full
        # 1M bucket state is ~125 MB -> ~20 ms/check); a NaN anywhere in
        # the pipeline reaches the positions within <= 2 substeps
        # (pos += vel*dt; C/vel rebuild from the grid each substep), so
        # checking `pos` alone (30 MB) detects every blow-up with at most
        # that extra lag. None = check every float leaf.
        self._step = step
        self.sync = sync
        self.check_field = check_field
        self.check_every = max(1, check_every)
        self.snapshot_every = max(1, snapshot_every)
        self.dt_backoff = dt_backoff
        self.max_failures = max_failures
        self.failures = 0
        self.frames_lost = 0
        self.current_dt_scale = 1.0
        self._copy_jit = None    # lazy: one fused-copy dispatch (see _copy)
        self._good = None        # (frame, state): fully verified
        self._candidate = None   # (frame, state): newer, awaiting checks
        self._pending = []       # [(frame, ok_scalar)] oldest first, async
        self._verified = -1      # highest frame with all checks <= it ok
        self._count = 0

        def _sel(state):
            f = self.check_field
            if f is not None and hasattr(state, f):
                return finite_check_jit(getattr(state, f))
            return finite_check_jit(state)

        self._check = jax.jit(_sel)

    def _copy(self, state):
        # real copies: steps built with donate=True would otherwise donate
        # (delete) the snapshot's buffers on a later call. ONE jitted
        # dispatch for the whole tree — the eager tree_map(jnp.copy, ...)
        # issued a dispatch PER LEAF (9 for a BucketState), and a separate
        # dispatch costs ~6.5 ms through the tunnel (CLAUDE.md measurement
        # rules): per-leaf copies alone were ~3% of the 1M substep budget
        # at snapshot_every=32 (round-5 guard_overhead.py A/B: 6.2-6.7%
        # total -> 1.2-2.3% with the fused copy).
        if self._copy_jit is None:
            self._copy_jit = jax.jit(
                lambda s: jax.tree_util.tree_map(jnp.copy, s))
        return self._copy_jit(state)

    def _drain(self, block: bool) -> bool:
        """Consume resolved checks oldest-first; returns False on the first
        non-finite result (leaving self._verified at the last good frame)."""
        while self._pending:
            frame, arr = self._pending[0]
            if not block and not arr.is_ready():
                break
            self._pending.pop(0)
            if not bool(np.asarray(arr)):
                return False
            self._verified = frame
            self._promote()
        return True

    def _promote(self):
        if self._candidate is not None and self._candidate[0] <= self._verified:
            self._good = self._candidate
            self._candidate = None

    def _fail(self, at_frame: int):
        self.failures += 1
        if self.failures > self.max_failures:
            raise RuntimeError(
                f"simulation diverged {self.failures} times; giving up")
        self.current_dt_scale *= self.dt_backoff
        self._pending.clear()
        self._candidate = None  # may postdate the poison — discard
        frame, good = self._good
        self.frames_lost += at_frame - frame
        self._count = frame
        self._verified = frame
        self._good = (frame, self._copy(good))
        return good

    def __call__(self, state, fluid, interactions=()):
        if self._good is None:
            self._good = (self._count, self._copy(state))
            self._verified = self._count
        fluid_eff = (
            fluid
            if self.current_dt_scale == 1.0
            else fluid.replace(
                dt=float(np.asarray(fluid.dt)) * self.current_dt_scale)
        )
        out = self._step(state, fluid_eff, interactions)
        self._count += 1
        polled = False
        if self._count % self.check_every == 0:
            ok = self._check(out)
            ok.copy_to_host_async()
            self._pending.append((self._count, ok))
            # Drain at CHECK boundaries only (or when sync): is_ready()
            # goes through the platform runtime, and polling it every call
            # measured as the guard's dominant cost through the tunnel
            # (~43 ms per 10-call window at check_every=8 -> ~7-10%
            # overhead; scripts/guard_overhead.py round 5). Detection lag
            # grows by at most check_every calls — the promotion protocol
            # already tolerates arbitrary lag.
            polled = True
            if not self._drain(block=self.sync):
                return self._fail(self._count)
        if self.sync and not polled and not self._drain(block=True):
            return self._fail(self._count)
        if self._count % self.snapshot_every == 0:
            # the new snapshot may postdate in-flight checks: hold it as
            # candidate until every check <= its frame resolves finite.
            # Ensure a check covers this exact frame so promotion happens
            # even when snapshot_every is not a multiple of check_every.
            if not self._pending or self._pending[-1][0] < self._count:
                ok = self._check(out)
                ok.copy_to_host_async()
                self._pending.append((self._count, ok))
            self._candidate = (self._count, self._copy(out))
            self._promote()
        return out

    def flush(self) -> bool:
        """Block-drain all in-flight checks. Call at end of run before
        trusting the final state. Returns True iff no failure was pending;
        on False the rollback bookkeeping has run (failures/dt/frames_lost)
        and `last_good()` is the state to resume from — the caller's own
        final state may be poisoned."""
        if not self._drain(block=True):
            self._fail(self._count)
            return False
        self._promote()
        return True

    def last_good(self):
        """The newest fully verified snapshot (resume point after a flush
        that returned False)."""
        return self._good[1]
