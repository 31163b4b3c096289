"""Decompose the flash march's frame cost on the real TPU.

One background run, interleaved rounds over march-option variants on the
bench blob (NeRF-only, 720p) to answer:
  - cost of the new safe defaults (vector_occ_gate on, lowres_cull off)
    vs the round-2 aggressive settings;
  - the fixed-cost floor (max_rounds=1: raygen + coarse init + 1 epoch);
  - chunk / rounds_per_epoch retune now that rounds carry the occ gate.
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

import bench

REPS = 6

VARIANTS = [
    ("default (splat, gate on)", {}),
    ("splat, gate off", {"vector_occ_gate": False}),
    ("floor (max_rounds=1)", {"max_rounds": 1}),
    ("chunk=4096", {"chunk": 4096}),
    ("chunk=8192", {"chunk": 8192}),
    ("steps_per_round=32", {"steps_per_round": 32}),
    ("rounds_per_epoch=2", {"rounds_per_epoch": 2}),
    ("rounds_per_epoch=4", {"rounds_per_epoch": 4}),
    ("advance_iters=8", {"advance_iters": 8}),
    ("advance_iters=48", {"advance_iters": 48}),
    ("spr=32,rpe=2,chunk=4096", {"steps_per_round": 32,
                                 "rounds_per_epoch": 2, "chunk": 4096}),
]


def main():
    snap = "/root/repo/assets/cache/bench_head_v2.msgpack"
    if not os.path.exists(snap):
        bench.build_bench_snapshot(snap)
    renderer, nerf = bench.make_renderer(snap, load_glasses=False)
    nerf.bake(256)
    nerf.flash = True
    w, h = renderer.render_width, renderer.render_height

    def run():
        fb, db = nerf.render_frame_buffers(w, h)
        run.out = fb

    def drain():
        return float(run.out[0, 0, 3])

    results = {}
    # compile pass first (sequential), then interleaved timing rounds
    for name, kw in VARIANTS:
        nerf.march_overrides = dict(kw)
        t0 = time.perf_counter()
        run()
        drain()
        print(f"compiled {name:32s} ({time.perf_counter() - t0:.0f} s)",
              flush=True)
    for rnd in range(3):
        for name, kw in VARIANTS:
            nerf.march_overrides = dict(kw)
            run()
            drain()
            t0 = time.perf_counter()
            for _ in range(REPS):
                run()
            drain()
            dt = (time.perf_counter() - t0) / REPS * 1000.0
            print(f"[r{rnd}] {name:32s} {dt:8.2f} ms", flush=True)
            results.setdefault(name, []).append(dt)
    print({k: round(min(v), 1) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
