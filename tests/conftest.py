"""Test config: run on a virtual 8-device CPU mesh.

The reference cannot test distributed code below full 8-GPU scale
(SURVEY.md §4); we exercise all sharding on host-simulated devices.

This environment bakes in an `axon` TPU-tunnel backend via sitecustomize
(PALLAS_AXON_POOL_IPS) that registers the remote TPU before conftest runs
and would route every test compile through the tunnel. jax is already
imported at that point, so we override the platform via jax.config (the
env var alone is ignored once the plugin is registered).
"""

import os

_TPU_SMOKE = os.environ.get("DUO_TPU_TESTS") == "1"

if not _TPU_SMOKE:
    # Must precede first backend initialization.
    # Collective-rendezvous timeouts: 8 virtual devices time-slice onto
    # ONE host core here, so arrival spread at a collective is unbounded
    # under load and XLA's defaults (warn 20s, ABORT 40s) turn scheduler
    # jitter into a SIGABRT mid-suite.
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    ).strip()

import jax  # noqa: E402

if not _TPU_SMOKE:
    # DUO_TPU_TESTS=1 keeps the default (TPU) backend for the on-TPU
    # smoke suite (tests/test_tpu_smoke.py); everything else runs on the
    # virtual 8-device CPU mesh.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Compiles through the axon tunnel are slow; local CPU compiles are fast,
# but keep a disk cache anyway so repeated runs get faster.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
