"""fps + bake-time cost of higher sigma-bake resolutions (r3).

psnr_trained_attrib: trained-scene holdout flash PSNR is 34.15 dB at a
256^3 sigma bake, 36.93 at 384, 38.09 at 512 (within 1 dB of the exact
render) — sigma quantization is the whole flash fidelity gap. This
measures what 384/512 cost per frame (brick table leaves cache) with the
feature grid held at 256^3, plus a clean dist16 leg on the 256 rig
(the earlier advance A/B ran under host load, pre-feature-grid).
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


def main():
    snap = "/root/repo/assets/cache/bench_head_v2.msgpack"
    if not os.path.exists(snap):
        bench.build_bench_snapshot(snap)
    rigs = []
    for res, feat_res in ((256, None), (384, 256), (512, 256)):
        renderer, nerf = bench.make_renderer(snap, load_glasses=False)
        t0 = time.perf_counter()
        nerf.bake(res, feat_resolution=feat_res)
        print(f"bake({res}, feat={feat_res or res}): "
              f"{time.perf_counter() - t0:.1f} s", flush=True)
        nerf.flash = True
        rigs.append((f"sigma{res}", nerf))
    rigs.append(("sigma256 dist16", rigs[0][1]))
    w, h = bench.W, bench.H

    def run(nerf):
        fb, db = nerf.render_frame_buffers(w, h)
        run.out = fb

    def drain():
        return float(run.out[0, 0, 3])

    def set_opts(name, nerf):
        nerf.march_overrides = (
            {"dist_advance": True, "advance_iters": 16}
            if "dist16" in name else {})

    for name, nerf in rigs:
        set_opts(name, nerf)
        t0 = time.perf_counter()
        run(nerf)
        drain()
        print(f"compiled {name:16s} ({time.perf_counter() - t0:.0f} s)",
              flush=True)

    results = {}
    for rnd in range(4):
        for name, nerf in rigs:
            set_opts(name, nerf)
            run(nerf)
            drain()
            t0 = time.perf_counter()
            for _ in range(REPS):
                run(nerf)
            drain()
            dt = (time.perf_counter() - t0) / REPS * 1000.0
            print(f"[r{rnd}] {name:16s} {dt:8.2f} ms", flush=True)
            results.setdefault(name, []).append(dt)
    print({k: round(min(v), 1) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
