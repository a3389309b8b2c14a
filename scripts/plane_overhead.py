#!/usr/bin/env python
"""Microbenchmark: raw Pallas plane-pipeline cost at the bench config shape.

Kernel does NOTHING but stream the fused kernel's plane blocks in and write
them out (17 channels x K x pc per plane, same BlockSpecs as kernel F) — the
floor any plane-sweep kernel pays for DMA + pipeline bookkeeping. Compare
against kernel F's measured time to see how much is compute vs streaming.

Usage: python scripts/plane_overhead.py [nx] [pc] [K] [iters]
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

from mpm_tpu.utils.timing import fence


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    pc = int(sys.argv[2]) if len(sys.argv) > 2 else 3200
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    contig = len(sys.argv) > 5 and sys.argv[5] == "contig"
    c = nx * pc
    dtype = jnp.float32

    def kernel(pos_ref, vel_ref, C_ref, mass_ref, ids_ref,
               pos_o, vel_o, C_o, mass_o, ids_o):
        pos_o[:] = pos_ref[:]
        vel_o[:] = vel_ref[:]
        C_o[:] = C_ref[:]
        mass_o[:] = mass_ref[:]
        ids_o[:] = ids_ref[:]

    if contig:
        # plane-major layout [nx, ch, K, pc]: one contiguous run per plane
        def spec(lead):
            ndim = len(lead) + 3

            def index(t):
                return (t,) + (0,) * (ndim - 1)

            return pl.BlockSpec((1, *lead, k, pc), index,
                                memory_space=pltpu.VMEM)

        def shape(lead, dt=dtype):
            return jax.ShapeDtypeStruct((nx, *lead, k, pc), dt)
    else:
        def spec(lead):
            ndim = len(lead) + 2

            def index(t):
                idx = [0] * ndim
                idx[-1] = t
                return tuple(idx)

            return pl.BlockSpec((*lead, k, pc), index, memory_space=pltpu.VMEM)

        def shape(lead, dt=dtype):
            return jax.ShapeDtypeStruct((*lead, k, c), dt)

    @jax.jit
    def run(pos, vel, C9, mass, ids):
        def body(carry, _):
            pos, vel, C9, mass, ids = carry
            out = pl.pallas_call(
                kernel,
                grid=(nx,),
                in_specs=[spec((3,)), spec((3,)), spec((9,)), spec(()), spec(())],
                out_specs=(spec((3,)), spec((3,)), spec((9,)), spec(()), spec(())),
                out_shape=(
                    shape((3,)),
                    shape((3,)),
                    shape((9,)),
                    shape(()),
                    shape((), jnp.int32),
                ),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=128 * 1024 * 1024
                ),
            )(pos, vel, C9, mass, ids)
            return out, None

        carry, _ = jax.lax.scan(
            body, (pos, vel, C9, mass, ids), None, length=10
        )
        return carry

    key = jax.random.PRNGKey(0)

    def mk(lead, dt=dtype, fill=None):
        s = (nx, *lead, k, pc) if contig else (*lead, k, c)
        if fill is None:
            return jax.random.normal(key, s, dtype)
        return jnp.full(s, fill, dt)

    pos = mk((3,))
    vel = mk((3,), fill=0.0)
    C9 = mk((9,), fill=0.0)
    mass = mk((), fill=1.0)
    ids = mk((), jnp.int32, fill=0)

    t0 = time.perf_counter()
    out = run(pos, vel, C9, mass, ids)
    fence(out[0])
    print(f"# compile: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(*out)
    fence(out[0])
    dt = (time.perf_counter() - t0) / (iters * 10)
    gb = 2 * 17 * k * c * 4 / 1e9
    print(f"RESULT copy-through sweep: {dt*1e3:.2f} ms/sweep  "
          f"({gb:.2f} GB moved -> {gb/dt:.0f} GB/s, "
          f"{dt*1e6/nx:.1f} us/plane)")


if __name__ == "__main__":
    main()
