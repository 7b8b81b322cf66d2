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
