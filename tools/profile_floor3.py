"""Pin down the flash frame's ~63 ms fixed block (r3, after floor2).

floor2: E (no advance, 1-sample round, 1 epoch, no color) = 63 ms of the
79 ms feat-shade frame. Candidates: full-N raygen/init ops, the
stable-partition, per-chunk dispatch overhead (170 chunks at 2048), the
drain roundtrip. Interleaved over one run:

  - E at chunk 2048 / 8192 / 32768 (chunk-loop dispatch scaling)
  - E at 1280x720 vs 640x360 (full-N scaling; quarter the rays)
  - E with REPS=24 vs 6 on one leg (drain amortization: the tunnel's
    ~77 ms scalar fetch is shared over REPS frames)
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

E = {"deferred_color": False, "sig_threshold": 1e9, "advance_iters": 0,
     "steps_per_round": 1, "max_rounds": 1}

VARIANTS = [
    ("E c2048 720p", dict(E), (1280, 720), 6),
    ("E c8192 720p", dict(E, chunk=8192), (1280, 720), 6),
    ("E c32768 720p", dict(E, chunk=32768), (1280, 720), 6),
    ("E c2048 360p", dict(E), (640, 360), 6),
    ("E c2048 720p r24", dict(E), (1280, 720), 24),
    ("A feat flash 720p", {}, (1280, 720), 6),
]


def main():
    snap = "/root/repo/assets/cache/bench_head_v2.msgpack"
    if not os.path.exists(snap):
        bench.build_bench_snapshot(snap)
    renderer, nerf = bench.make_renderer(snap, load_glasses=False)
    nerf.bake(256)
    nerf.flash = True

    def run(w, h):
        fb, db = nerf.render_frame_buffers(w, h)
        run.out = fb

    def drain():
        return float(run.out[0, 0, 3])

    for name, kw, (w, h), _ in VARIANTS:
        nerf.march_overrides = dict(kw)
        t0 = time.perf_counter()
        run(w, h)
        drain()
        print(f"compiled {name:22s} ({time.perf_counter() - t0:.0f} s)",
              flush=True)

    results = {}
    for rnd in range(4):
        for name, kw, (w, h), reps in VARIANTS:
            nerf.march_overrides = dict(kw)
            run(w, h)
            drain()
            t0 = time.perf_counter()
            for _ in range(reps):
                run(w, h)
            drain()
            dt = (time.perf_counter() - t0) / reps * 1000.0
            print(f"[r{rnd}] {name:22s} {dt:8.2f} ms", flush=True)
            results.setdefault(name, []).append(dt)
    print({k: round(min(v), 1) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
