"""Test configuration.

Tests run on the CPU backend with 8 virtual devices (so multi-chip sharding
paths execute without TPU hardware) and with float64 enabled (golden tests
compare against a float64 numpy oracle).

Note: this environment pre-imports jax at interpreter startup with
JAX_PLATFORMS=axon (remote TPU tunnel), so the platform must be overridden
via jax.config *after* import — plain os.environ edits are latched too late.
The XLA_FLAGS edit still works because the backend has not been initialized
yet when conftest runs.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
