#!/usr/bin/env python
"""Fresh-process substep timing at the bench config — the ONLY trustworthy
measurement on this platform (long-lived processes with many live buffers
degrade effective HBM bandwidth several-fold; separate per-phase jit calls
add ~7 ms tunnel dispatch each). Run one configuration per process.

Usage: python scripts/quickbench.py [n_particles] [K]
Env: MPM_FUSED_GATE=0, MPM_FUSED_NOMIG=1, MPM_FUSED_NOG2P=1 select kernel
variants (perf attribution experiments in ops/pallas/fused.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

from mpm_tpu import make_step
from mpm_tpu.models.scenes import benchmark_scene
from mpm_tpu.ops import bucketed
from mpm_tpu.utils.timing import fence


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    scene = benchmark_scene(n_target, bin_capacity=k)
    config, fluid = scene.config, scene.fluid
    if os.environ.get("MPM_F32", "0") == "1":  # storage-dtype attribution
        config = config.replace(storage_dtype="float32")
    if os.environ.get("MPM_BF16", "0") == "1":  # bf16 storage -> the packed
        # migration path (vel+C as 6 int32 bf16-pair select rows, fused.py)
        config = config.replace(storage_dtype="bfloat16")
    n = scene.state.num_particles
    flags = {f: os.environ.get(f) for f in
             ("MPM_FUSED_GATE", "MPM_FUSED_NOMIG", "MPM_FUSED_NOG2P",
              "MPM_FUSED_NOP2G1", "MPM_FUSED_NOP2G2",
              "MPM_KP_NOS1", "MPM_KP_NOS2", "MPM_KP_NODEN", "MPM_KP_NOU",
              "MPM_SELECT_CHUNK", "MPM_FORCE_LIVE",
              "MPM_PALLAS_OLD", "MPM_DT0", "MPM_BF16", "MPM_WINDOW_WY")
             if os.environ.get(f)}
    if os.environ.get("MPM_DT0", "0") == "1":  # static fluid: isolates the
        fluid = fluid.replace(dt=0.0)          # no-churn select cost
    if os.environ.get("MPM_WINDOW_WY"):  # air-window at a FIXED wy (no
        # dynamic driver): measures the array-shrink effect in isolation
        from mpm_tpu.ops.window import window_config

        config = window_config(config, int(os.environ["MPM_WINDOW_WY"]))
        flags["MPM_WINDOW_WY"] = os.environ["MPM_WINDOW_WY"]
    print(f"# {n} particles, grid {config.grid_res}, K={k}, flags {flags}")
    state = jax.jit(lambda s: bucketed.from_simstate(s, config))(
        jax.device_put(scene.state))
    step = make_step(config, mode="pallas", substeps=10)
    t0 = time.perf_counter()
    state = step(state, fluid, ())
    fence(state.pos)
    print(f"# compile+chunk: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(4):
        state = step(state, fluid, ())
    fence(state.pos)
    print(f"# settle 40: {time.perf_counter()-t0:.1f}s "
          f"lost={int(np.asarray(state.lost))}")
    t0 = time.perf_counter()
    for _ in range(10):
        state = step(state, fluid, ())
    np.asarray(state.lost)  # fence: the sweep's last output; the FULL pos
    # transfer must stay OUT of the window (it costs ~0.5s/100MB through
    # the tunnel and no production loop does it)
    dt = time.perf_counter() - t0
    host = np.asarray(state.pos)
    assert np.all(np.isfinite(host))
    print(f"RESULT {dt*10:.1f} ms/substep  {100*n/dt/1e6:.1f} M ps/s  "
          f"lost={int(np.asarray(state.lost))}")


if __name__ == "__main__":
    main()
