#!/usr/bin/env python
"""Raw HBM bandwidth probe: XLA elementwise x+1 on a large array inside a
scan (no pallas), plus a pallas whole-array copy, fresh process.

Usage: python scripts/hbm_bw.py [mb]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

from mpm_tpu.utils.timing import fence


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n = mb * 1024 * 1024 // 4
    x = jnp.ones((n,), jnp.float32)

    @jax.jit
    def bump(x):
        def body(x, _):
            return x + 1.0, None

        x, _ = jax.lax.scan(body, x, None, length=10)
        return x

    x = bump(x)
    fence(x)
    t0 = time.perf_counter()
    for _ in range(10):
        x = bump(x)
    fence(x)
    dt = (time.perf_counter() - t0) / 100
    gb = 2 * n * 4 / 1e9
    print(f"RESULT xla x+1: {dt*1e3:.2f} ms for {gb:.2f} GB -> {gb/dt:.0f} GB/s")

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    blk = 4 * 1024 * 1024 // 4  # 4 MB blocks
    nb = n // blk

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    @jax.jit
    def pcopy(x):
        def body(x, _):
            y = pl.pallas_call(
                kernel,
                grid=(nb,),
                in_specs=[pl.BlockSpec((1, blk), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, blk), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nb, blk), jnp.float32),
            )(x)
            return y, None

        x, _ = jax.lax.scan(body, x.reshape(nb, blk), None, length=10)
        return x.reshape(-1)

    x = pcopy(x)
    fence(x)
    t0 = time.perf_counter()
    for _ in range(10):
        x = pcopy(x)
    fence(x)
    dt = (time.perf_counter() - t0) / 100
    print(f"RESULT pallas 4MB-block copy: {dt*1e3:.2f} ms for {gb:.2f} GB -> "
          f"{gb/dt:.0f} GB/s")


if __name__ == "__main__":
    main()
