"""Time the 720p hybrid orbit for one repo version; print fps."""
import os, sys, time
import numpy as np
repo = sys.argv[1]
mode = sys.argv[2] if len(sys.argv) > 2 else "baked"
sys.path.insert(0, repo)
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/assets/cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")  # bench module: use current for scene cache paths
from bench import make_renderer, time_orbit
sys.path.pop(0)
snap = "/root/repo/assets/cache/bench_head_v2.msgpack"
renderer, nerf = make_renderer(snap)
if mode in ("baked", "deferred"):
    nerf.bake(256)
if mode == "deferred":
    nerf.deferred_shading = True
fps = time_orbit(renderer)
print(f"{repo} {mode}: {fps:.3f} fps")
