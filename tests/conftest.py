"""Test config: run on CPU with 8 virtual devices.

Multi-chip sharding is validated the standard JAX way
(``xla_force_host_platform_device_count``) so the suite runs anywhere;
real-TPU numerics are exercised by bench.py / the driver.
"""

import os

# Force CPU even if the ambient environment selects a TPU platform —
# unit tests must not monopolise (or wait on) the real chip.  NOTE:
# this image imports jax at interpreter startup (sitecustomize), so the
# env var alone is too late; jax.config.update works because the
# backend itself is initialised lazily.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: this box has one CPU core, so XLA compiles
# dominate test wall-time; cache them across pytest invocations.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("TEIO_TEST_CACHE", "/tmp/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# NOTE: do NOT set jax_persistent_cache_enable_xla_caches="all" here.
# With it, stale cached XLA-internal state from earlier sessions made a
# later 8-partition GSPMD program SIGABRT mid-suite (reproducible with
# the old cache dir, gone with a fresh one); the default executable
# cache alone is stable and still removes the bulk of recompile time.
