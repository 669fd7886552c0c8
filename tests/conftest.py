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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU cross-partition collectives run one rendezvous thread per
# virtual device; on this ONE-core box the 8 participants can take
# minutes to all get scheduled (especially while other programs are
# still compiling), and the default 40s rendezvous watchdog then
# F-aborts the whole process ("Termination timeout for `all reduce`
# ... Exiting to ensure a consistent program state") — the mid-suite
# SIGABRT in the 8-partition GSPMD tests.  Give the rendezvous room.
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=1200"
              " --xla_cpu_collective_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: this box has one CPU core, so XLA compiles
# dominate test wall-time; cache them across pytest invocations.
# Loading CPU AOT entries logs a noisy cpu_aot_loader.cc E-line per
# program ("+prefer-no-scatter ... doesn't match host features"):
# that's LLVM tuning pseudo-features recorded as compile-machine
# features and absent from cpuinfo — the load still proceeds and the
# code is host-built, so the warning is benign here.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("TEIO_TEST_CACHE", "/tmp/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# NOTE: do NOT set jax_persistent_cache_enable_xla_caches="all" here —
# see git history (e30cc8d): stale XLA-internal cached state made a
# GSPMD program abort; the default executable-only cache is stable.
