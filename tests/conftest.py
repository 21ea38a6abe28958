"""Test configuration: CPU backend, 8 virtual devices, float64 enabled.

Sharding tests run on a virtual 8-device CPU mesh
(``xla_force_host_platform_device_count``); numerical-fidelity tests use
float64 (the 1e-10 oracle of BASELINE.md requires it).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on (virtual multi-)CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
