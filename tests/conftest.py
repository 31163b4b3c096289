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

# Persistent compile cache for the CPU suite: the big 8-device SPMD
# training graphs (sharded compacted train_chunk) take minutes to
# compile on a 1-core box and XLA's CPU compiler segfaulted flakily
# on one of them (~1 in 3 suite runs, crash inside
# backend_compile_and_load with 120 GB free — an XLA bug, not OOM).
# Caching makes every graph a one-time exposure per machine and cuts
# repeat suite wall time. Keyed by HLO hash, so staleness is safe.
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "cache", "jaxcache-cpu")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
