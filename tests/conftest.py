"""Test environment: CPU backend with 8 virtual devices.

The CI/test pyramid runs entirely on CPU (SURVEY.md §4): an 8-device
virtual host emulates the TPU mesh so TP / dual-sub-mesh logic is
exercised without hardware. Note the axon TPU plugin force-registers
itself via sitecustomize and overrides JAX_PLATFORMS, so we must update
jax.config programmatically, before any backend is touched.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("NANO_PEARL_PALLAS", "0")

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the CPU test programs too: the suite
# rebuilds near-identical tiny engines in every module, and the fused
# whole-loop programs dominate wall time. A lower entry threshold than
# the engine default (0.5 s vs 2 s) captures the many mid-size test
# programs; repeat suite runs then skip most XLA compiles entirely.
from nano_pearl_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
