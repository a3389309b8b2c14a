"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding layer is
exercised without TPU hardware (the TPU analogue of "test multi-node without
a cluster", SURVEY.md §4). Must run before jax is imported anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# TPU/CPU compiles of the unrolled 3^D-tap graphs are slow; cache them
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
