"""Clean dist-advance A/B on the feat-shade flash baseline (r3).

The first advance A/B ran pre-feature-grid under heavy host load and
read as noise. With the frame at ~78 ms the advance's ~16 ms dispatch
share is worth a clean look: dist-grid hops cover the coarse-init slack
(28 dt steps) in ~2 probes vs mip-boundary jumps.
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

REPS = 8

VARIANTS = [
    ("mip24 (default)", {}),
    ("dist16", {"dist_advance": True, "advance_iters": 16}),
    ("dist12", {"dist_advance": True, "advance_iters": 12}),
    ("dist12 slack3", {"dist_advance": True, "advance_iters": 12,
                       "lowres_slack": 3.0 / 128.0}),
]


def main():
    snap = "/root/repo/assets/cache/bench_head_v2.msgpack"
    if not os.path.exists(snap):
        bench.build_bench_snapshot(snap)
    renderer, nerf = bench.make_renderer(snap, load_glasses=False)
    nerf.bake(256)
    nerf.flash = True
    w, h = bench.W, bench.H

    def run():
        fb, db = nerf.render_frame_buffers(w, h)
        run.out = fb

    def drain():
        return float(run.out[0, 0, 3])

    frames = {}
    for name, kw in VARIANTS:
        nerf.march_overrides = dict(kw)
        t0 = time.perf_counter()
        run()
        drain()
        frames[name] = np.asarray(run.out)
        print(f"compiled {name:16s} ({time.perf_counter() - t0:.0f} s)",
              flush=True)
    ref = frames[VARIANTS[0][0]]
    for name, _ in VARIANTS[1:]:
        mse = float(np.mean((frames[name][..., :3] - ref[..., :3]) ** 2))
        print(f"{name} vs default PSNR: "
              f"{10.0 * np.log10(1.0 / max(mse, 1e-12)):.2f} dB", flush=True)

    results = {}
    for rnd in range(4):
        for name, kw in VARIANTS:
            nerf.march_overrides = dict(kw)
            run()
            drain()
            t0 = time.perf_counter()
            for _ in range(REPS):
                run()
            drain()
            dt = (time.perf_counter() - t0) / REPS * 1000.0
            print(f"[r{rnd}] {name:16s} {dt:8.2f} ms", flush=True)
            results.setdefault(name, []).append(dt)
    print({k: round(min(v), 1) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
