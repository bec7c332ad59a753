"""Test configuration: CPU backend with a virtual 8-device mesh for sharding
tests, float64 available for numerical-accuracy oracles.

The session environment preselects the TPU plugin (JAX_PLATFORMS=axon via
sitecustomize), so the platform must be forced back to CPU through the jax
config API before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
