"""Air-window engine: run the production kernels on the occupied y-range.

On TPU every bucket slot costs real DMA + VPU work whether it holds fluid or
air (ARCHITECTURE.md "Occupancy is the cost model"), and array shapes are
static, so air above the fluid surface is paid for on every substep. The
reference pays the same tax structurally (it dispatches compute over ALL
cells, MLSMPM3DFluidMultithreadGPU.cs:399-400) but its GPU air threads
early-out; here the analogous win comes from shrinking the arrays.

This wrapper keeps the PHYSICS at the true domain and the ARRAYS at a
y-window [0, wy) of it:

- The windowed SimConfig sets grid_res=(nx, wy, nz) and domain_res to the
  true grid. Every physics POSITION — particle clamps, predictive wall
  springs, grid BC bands — is computed against domain_res (see
  core/params.SimConfig.domain_res), so the windowed trajectory is EXACTLY
  the full-grid trajectory: the cells above the window are provably inert
  (zero mass -> update_grid zeroes their velocity; no particle's B-spline
  support, migration target, clamp, or spring position reaches them).
  tests/test_window.py asserts slot-level bit-equality against the
  full-grid engine.

- Invariant: max occupied y <= wy - 4 at every substep, ENFORCED IN-KERNEL:
  the window's top 3 planes form a ceiling band that rejects incoming
  y-movers exactly like a full destination bucket (the overflow-rejection
  machinery, ops/bucketed.reject_overflow / pallas/fused._reject_intra) —
  the mover stays in its source cell, clamped, and is counted in the
  BucketState.ceiling counter. Safety therefore never depends on host
  timing. The counter is the exactness CERTIFICATE: ceiling == 0 across a
  run proves no particle ever interacted with the window edge, i.e. the
  windowed trajectory IS the full-grid trajectory (tests/test_window.py
  asserts bit-equality). Nonzero ceiling means the fluid outran the window
  growth for some substeps (a transient wall S+5 planes above the surface,
  the same clamping the reference applies at its true walls,
  g2p.glsl:115-119) — reported, never silent.

- Growth policy: the wrapper enqueues a (max_y, ceiling) readback after
  every chunk but consumes it OPPORTUNISTICALLY (jax.Array.is_ready) — a
  blocking per-chunk scalar read costs a full tunnel round-trip (~70 ms
  measured) and would serialize dispatch; with the in-kernel ceiling no
  read ever needs to block. The window keeps S + 5 planes of headroom over
  the last confirmed surface; a confirmed ceiling-hit increment grows the
  window immediately and counts in `interference`. Shrink has 2*quantum
  hysteresis.

- Resizes are rare (the surface moves ~1 plane per S substeps at most) and
  cost one pad/slice pass; each distinct wy compiles once (persistent
  compilation cache across processes).

The reference has no analogue of any of this — its grid is a fixed
allocation (MLSMPM3DFluidMultithreadGPU.cs:43) — but the VISIBLE behavior
(trajectories, walls at the true domain bounds) is identical by
construction.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.params import FluidParams, SimConfig
from ..core.state import SimState
from .interact import Interaction
from . import bucketed
from .step import make_frame_fn


def window_config(config: SimConfig, wy: int) -> SimConfig:
    """The windowed SimConfig for a y-window [0, wy) of `config`'s domain.
    wy == ny returns `config` itself (same jit cache as the plain engine)."""
    if config.domain_res is not None:
        raise ValueError("window_config expects a non-windowed config")
    nx, ny, nz = config.grid_res
    if wy >= ny:
        return config
    return config.replace(grid_res=(nx, wy, nz), domain_res=config.grid_res)


def _poll_vals(state: bucketed.BucketState, nx: int, wy: int, nz: int):
    """[2] int32: (max occupied y, ceiling-hit counter). lax.iota (not
    jnp.arange): trace-time constants are ~58 s each through the tunneled
    platform."""
    occ_y = jnp.any((state.mass > 0).reshape(-1, nx, wy, nz), axis=(0, 1, 3))
    maxy = jnp.max(jnp.where(occ_y, jax.lax.iota(jnp.int32, wy), -1))
    return jnp.stack([maxy, state.ceiling.astype(jnp.int32)])


def _resize(state: bucketed.BucketState, old_cfg: SimConfig,
            new_cfg: SimConfig) -> bucketed.BucketState:
    """Pad (grow) or slice (shrink) the bucket arrays along y. Empty slots
    in the new region are parked at their own cell centers (the bucket
    invariant; idempotent for existing empties)."""
    nx, wy_o, nz = old_cfg.grid_res
    wy_n = new_cfg.grid_res[1]

    def r(x, fill):
        lead = x.shape[:-1]
        x = x.reshape(*lead, nx, wy_o, nz)
        if wy_n > wy_o:
            pad = [(0, 0)] * (len(lead) + 1) + [(0, wy_n - wy_o), (0, 0)]
            x = jnp.pad(x, pad, constant_values=fill)
        else:
            x = x[..., :wy_n, :]
        return x.reshape(*lead, nx * wy_n * nz)

    mass = r(state.mass, 0.0)
    occ = mass > 0
    center = bucketed.cell_coords(new_cfg, state.pos.dtype) + 0.5  # [D, C]
    pos = jnp.where(occ[None], r(state.pos, 0.0), center[:, None, :])
    return bucketed.BucketState(
        pos=pos,
        vel=jnp.where(occ[None], r(state.vel, 0.0), 0.0),
        C=jnp.where(occ[None, None], r(state.C, 0.0), 0.0),
        mass=mass,
        ids=jnp.where(occ, r(state.ids, -1), -1),
        lost=state.lost,
        cfl_clamped=state.cfl_clamped,
        deferred=state.deferred,
        ceiling=state.ceiling,
    )


class YWindow:
    """Windowed step driver. Usage:

        win = YWindow(config, mode="pallas", substeps=chunk)
        state = win.init(sim_state)          # SimState -> windowed BucketState
        state = win.step(state, fluid, ())   # one chunk; may resize

    `win.config` is the current windowed SimConfig (for rendering etc.);
    `win.wy` the current window height; `win.interference` the total
    ceiling-hit count observed (0 == the windowed run is certified exactly
    equal to the full-grid run). Not thread-safe; one driver per simulation.
    Physics safety never depends on poll timing — the kernel's ceiling band
    enforces the window invariant itself.
    """

    def __init__(self, config: SimConfig, mode: str = "pallas",
                 substeps: int | None = None, quantum: int = 8,
                 donate: bool = True, sync_polls: bool = False,
                 mesh=None, interpret: bool = False,
                 headroom: int | None = None):
        # headroom: planes of slack kept above the last confirmed surface
        # (None -> substeps + 5, the CFL-worst-case policy: the surface can
        # rise at most 1 cell/substep, so a chunk can never outrun the
        # window). Tighter values (>= 4: the 3-plane ceiling band + 1 legal
        # row) trade that certainty for fewer slots — SAFE regardless,
        # because the in-kernel band rejects-and-counts any mover that does
        # reach it (zero loss; interference > 0 reported, and the window
        # grows on the next confirmed hit). The official bench runs
        # headroom=4 over its settled pool (certified: interference == 0).
        # sync_polls: consume every (maxy, ceiling) readback synchronously —
        # the growth decision then always sees a fresh surface height, so a
        # rise bounded by S cells/chunk can never touch the ceiling band
        # (interference provably 0). Costs a blocking device round-trip per
        # chunk: right on CPU / locally-attached devices, wrong through the
        # axon tunnel (~70 ms RTT).
        # mesh: a jax.sharding.Mesh -> the chunks run the SHARDED production
        # kernels (parallel/domain.make_sharded_bucket_step; x-slabs) while
        # the window tracks y. Resizes are host-coordinated and global (one
        # wy for every shard); polls/resizes operate on the jit-global view
        # of the sharded arrays, so no extra collectives are needed.
        if config.dim != 3:
            raise ValueError("YWindow supports 3D configs")
        self.true_config = config
        self.mode = mode
        self.mesh = mesh
        self.interpret = interpret
        self.S = substeps if substeps is not None else config.substeps
        self.headroom = headroom if headroom is not None else self.S + 5
        if self.headroom < 4:
            raise ValueError("headroom must cover the 3-plane ceiling band "
                             "plus one legal row (>= 4)")
        self.q = quantum
        if mode == "pallas" or mesh is not None:
            # the fused kernels (and the sharded path, which uses them with
            # no fallback) require 128-divisible plane sizes wy*nz; round the
            # quantum up so EVERY window height stays on the fused path —
            # the per-pass fallback kernels do not enforce the ceiling band
            # (substep_fused raises rather than silently losing the
            # invariant, ADVICE r3)
            nz = config.grid_res[2]
            self.q = quantum * (128 // math.gcd(quantum * nz, 128))
        self.donate = donate
        self.sync_polls = sync_polls
        self.wy = config.grid_res[1]
        self.resizes = 0
        self.interference = 0   # confirmed ceiling hits (0 = certified exact)
        self._confirmed = -1    # last confirmed max occupied y
        self._ceil_seen = 0     # last confirmed ceiling counter value
        self._pending: list = []  # in-flight [maxy, ceiling] arrays, oldest first
        self._steps: dict[int, Callable] = {}
        self._resizes: dict[tuple[int, int], Callable] = {}

    # ---- per-window-size compiled artifacts (cached) ----
    @property
    def config(self) -> SimConfig:
        return window_config(self.true_config, self.wy)

    def _step_fn(self, wy: int) -> Callable:
        # the (maxy, ceiling) poll is FUSED into the chunk's jit: a separate
        # poll call costs a full dispatch (~6.5 ms through the tunnel) and
        # an unfused reduce; inside the same computation it is ~free
        if wy not in self._steps:
            wcfg = window_config(self.true_config, wy)
            nx, _, nz = self.true_config.grid_res
            if self.mesh is not None:
                from ..parallel.domain import make_sharded_bucket_step

                sharded = make_sharded_bucket_step(
                    wcfg, self.mesh, substeps=self.S,
                    interpret=self.interpret)

                def chunk(s, fp, it, wy=wy):
                    s2 = sharded(s, fp, it)
                    return s2, self._poll_jit(wy)(s2)

                self._steps[wy] = chunk  # sharded step is jitted inside
            else:
                frame = make_frame_fn(wcfg, mode=self.mode, substeps=self.S,
                                      interpret=self.interpret)

                def chunk(s, fp, it, wy=wy):
                    s2 = frame(s, fp, it)
                    return s2, _poll_vals(s2, nx, wy, nz)

                self._steps[wy] = jax.jit(
                    chunk, donate_argnums=(0,) if self.donate else ())
        return self._steps[wy]

    def _poll_jit(self, wy: int) -> Callable:
        key = ("poll", wy)
        if key not in self._resizes:
            nx, _, nz = self.true_config.grid_res
            self._resizes[key] = jax.jit(
                lambda s: _poll_vals(s, nx, wy, nz))
        return self._resizes[key]

    def _resize_fn(self, wy_o: int, wy_n: int) -> Callable:
        key = (wy_o, wy_n)
        if key not in self._resizes:
            co = window_config(self.true_config, wy_o)
            cn = window_config(self.true_config, wy_n)
            self._resizes[key] = jax.jit(
                lambda s: _resize(s, co, cn),
                donate_argnums=(0,) if self.donate else ())
        return self._resizes[key]

    # ---- window policy ----
    def _target_wy(self, maxy: int) -> int:
        ny = self.true_config.grid_res[1]
        # headroom planes over the confirmed surface (default: one chunk of
        # CFL-bounded growth + the 3 ceiling-band planes + slack)
        want = maxy + self.headroom
        wy = max(self.q, math.ceil(want / self.q) * self.q)
        return min(ny, wy)

    def _confirm(self, block: bool) -> int:
        """Consume resolved (maxy, ceiling) readbacks, oldest first; if
        `block`, wait for all of them. Returns newly observed ceiling
        hits and updates self._confirmed / self.interference."""
        new_hits = 0
        while self._pending:
            arr = self._pending[0]
            if not block and not arr.is_ready():
                break
            vals = np.asarray(arr)
            self._pending.pop(0)
            self._confirmed = int(vals[0])
            hits = int(vals[1]) - self._ceil_seen
            self._ceil_seen = int(vals[1])
            if hits > 0:
                self.interference += hits
                new_hits += hits
        return new_hits

    # ---- API ----
    def init(self, state: SimState) -> bucketed.BucketState:
        maxy = int(np.max(np.floor(np.asarray(state.pos[1]))))
        self._confirmed = maxy
        self._ceil_seen = 0
        self._pending = []
        self.wy = self._target_wy(maxy)
        cfg = self.config
        b = jax.jit(lambda s: bucketed.from_simstate(s, cfg))(
            jax.device_put(state))
        if self.mesh is not None:
            from ..parallel.domain import shard_bucket_state

            b = shard_bucket_state(b, self.mesh)
        return b

    def step(self, state: bucketed.BucketState, fp: FluidParams,
             interactions: Sequence[Interaction] = ()) -> bucketed.BucketState:
        state, m = self._step_fn(self.wy)(state, fp, interactions)
        m.copy_to_host_async()
        self._pending.append(m)
        hits = self._confirm(block=self.sync_polls)
        ny = self.true_config.grid_res[1]
        if hits and self.wy < ny:
            # fluid is pressing the ceiling: grow aggressively NOW (the
            # certificate already recorded the interference)
            self._confirm(block=True)
            need = min(ny, self._target_wy(self._confirmed) + 2 * self.q)
        else:
            need = self._target_wy(self._confirmed)
            if not (need > self.wy or need <= self.wy - 2 * self.q):
                return state
            # drain in-flight reads before resizing (shrink decisions must
            # be exact; resize fns expect the freshest state anyway)
            self._confirm(block=True)
            need = self._target_wy(self._confirmed)
        if need != self.wy:
            state = self._resize_fn(self.wy, need)(state)
            self.wy = need
            self.resizes += 1
        return state
