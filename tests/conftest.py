"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's axon site-config forces jax_platforms=axon,cpu; tests
# run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
