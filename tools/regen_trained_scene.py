"""Regenerate the trained-scene bench snapshot cache (bench_scene
SCENE_VERSION) and print the trained-content metrics — run after any
bench_scene change so the driver's bench.py run starts warm."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/assets/cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench

out, picked, snap = bench.trained_holdout_and_bundle()
out["picked_bundle"] = picked[0]
print(json.dumps(out, indent=1), flush=True)
