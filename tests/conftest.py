"""Test configuration: CPU backend, float64, 8 virtual devices.

The virtual 8-device CPU mesh is the standard JAX substitute for testing
multi-chip sharding without a pod (SURVEY.md section 4).  The sandbox's
sitecustomize pins JAX_PLATFORMS=axon (the TPU tunnel), so the platform is
forced back to cpu via jax.config before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
