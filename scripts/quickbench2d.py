#!/usr/bin/env python
"""Config-2 ladder measurement: 2D 100k/256^2 friction pool, XLA bucketed vs
the fused 2D Pallas kernel (fresh process, real chip)."""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
from mpm_tpu import make_step
from mpm_tpu.models.scenes import benchmark_scene_2d
from mpm_tpu.ops import bucketed
from mpm_tpu.utils.timing import fence

mode = sys.argv[1] if len(sys.argv) > 1 else "pallas"
scene = benchmark_scene_2d()
config, fluid = scene.config, scene.fluid
n = scene.config.num_particles
state = jax.jit(lambda s: bucketed.from_simstate(s, config))(
    jax.device_put(scene.state))
step = make_step(config, mode=mode, substeps=10)
t0 = time.perf_counter()
state = step(state, fluid, ())
fence(state.pos)
print(f"# compile: {time.perf_counter()-t0:.1f}s")
for _ in range(4):
    state = step(state, fluid, ())
fence(state.pos)
t0 = time.perf_counter()
for _ in range(10):
    state = step(state, fluid, ())
np.asarray(state.lost)  # fence; full pos transfer stays OUT of the window
dt = time.perf_counter() - t0
host = np.asarray(state.pos)
assert np.all(np.isfinite(host))
print(f"RESULT [{mode}] {dt*10:.2f} ms/substep  {100*n/dt/1e6:.1f} M ps/s  "
      f"lost={int(np.asarray(state.lost))} deferred={int(np.asarray(state.deferred))}")
