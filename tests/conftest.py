"""Test configuration: force an 8-device virtual CPU mesh.

Tests run on CPU (deterministic, no TPU required) with 8 virtual devices so
the pt.dist sharding paths are exercised exactly as the driver's
dryrun_multichip does. Must run before jax initializes a backend.
"""

import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# the environment pre-seeds JAX_PLATFORMS=axon (TPU); override for tests
jax.config.update("jax_platforms", "cpu")
