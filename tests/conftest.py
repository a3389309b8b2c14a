"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding layer is
exercised without TPU hardware (the TPU analogue of "test multi-node without
a cluster", SURVEY.md §4). NOTE: in this environment the classic
`XLA_FLAGS=--xla_force_host_platform_device_count=N` is silently ignored
(1 device results); `jax_num_cpu_devices` must be set via jax.config BEFORE
first device use. Must run before jax is used anywhere.
"""

import os

# MPM_TPU_TESTS=1 leaves the real backend in place so the Mosaic smoke tests
# (tests/test_tpu_smoke.py) can drive the actual chip; everything else skips
_TPU_MODE = bool(os.environ.get("MPM_TPU_TESTS"))

if not _TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# BOTH updates are required, in this order — with only the env var (or only
# num_cpu_devices), the device count silently stays 1 and every collective
# degenerates to a single-device no-op
if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# TPU/CPU compiles of the unrolled 3^D-tap graphs are slow; cache them
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
