"""Decompose training-step cost on the real TPU.

Times 32-step train() windows (2 train_chunk dispatches) across option
variants on the capture dataset to find where the ~300 ms/step goes.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/assets/cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

import bench_scene
from nerf_glasses_tpu.config import NGPConfig
from nerf_glasses_tpu.train.trainer import TrainOptions, Trainer

BASE = dict(config=NGPConfig.native_fast())

VARIANTS = [
    ("default (splitVJP, 64s)", {}),
    ("samples_per_ray=48", {"samples_per_ray": 48}),
    ("march_hops=64", {"march_hops": 64}),
    ("grid_samples=2^17", {"grid_samples_per_update": 1 << 17}),
    ("rays=4096", {"rays_per_batch": 1 << 12}),
    ("hops64+grid17", {"march_hops": 64,
                       "grid_samples_per_update": 1 << 17}),
]


def main():
    ds = bench_scene.build_capture_dataset()
    results = {}
    for name, kw in VARIANTS:
        opts = TrainOptions(**{**BASE, **kw})
        tr = Trainer(ds, opts, seed=3)
        t0 = time.perf_counter()
        tr.train(32)     # compile + settle
        print(f"compiled {name:32s} ({time.perf_counter() - t0:.0f} s)",
              flush=True)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            tr.train(64)
            dt = (time.perf_counter() - t0) / 64 * 1000.0
            best = min(best, dt)
        sps = 1000.0 / best
        print(f"  {name:32s} {best:7.1f} ms/step  ({sps:.2f} steps/s)",
              flush=True)
        results[name] = round(best, 1)
    print(results, flush=True)


if __name__ == "__main__":
    main()
