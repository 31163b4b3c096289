"""A/B the Chebyshev distance-grid advance (MarchOptions.dist_advance)
vs the mip-jump-grid advance on the real TPU, interleaved in one run
(end-to-end 720p flash frame on the bench blob, NeRF-only), plus a PSNR
check that every variant renders the same image.

The advance pass is ~35 ms of the ~110 ms NeRF-only flash frame at 24
sequential gather+fuse iterations; distance stepping keeps the same
per-iteration cost but hops the full empty clearance, so the candidate
variants cut the iteration budget.
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
    ("mip jump 24", {}),
    ("dist 24", {"dist_advance": True}),
    ("dist 16", {"dist_advance": True, "advance_iters": 16}),
    ("dist 12", {"dist_advance": True, "advance_iters": 12}),
    ("dist 8", {"dist_advance": True, "advance_iters": 8}),
    ("mip 24 chunk8192", {"chunk": 8192}),
    ("dist 12 chunk8192", {"dist_advance": True, "advance_iters": 12,
                           "chunk": 8192}),
    ("dist 8 chunk8192", {"dist_advance": True, "advance_iters": 8,
                          "chunk": 8192}),
    ("dist 12 c8192 slack3", {"dist_advance": True, "advance_iters": 12,
                              "chunk": 8192, "lowres_slack": 3.0 / 128.0}),
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

    import traceback
    frames = {}
    ok_variants = []
    for name, kw in VARIANTS:
        nerf.march_overrides = dict(kw)
        t0 = time.perf_counter()
        try:
            run()
            drain()
        except Exception:
            print(f"VARIANT FAILED: {name}", flush=True)
            traceback.print_exc()
            continue
        frames[name] = np.asarray(run.out)
        ok_variants.append((name, kw))
        print(f"compiled {name:16s} ({time.perf_counter() - t0:.0f} s)",
              flush=True)
    ref_frame = frames[ok_variants[0][0]]
    for name, _ in ok_variants[1:]:
        mse = float(np.mean((frames[name][..., :3]
                             - ref_frame[..., :3]) ** 2))
        psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
        print(f"{name} vs baseline frame PSNR: {psnr:.2f} dB", flush=True)

    results = {}
    for rnd in range(4):
        for name, kw in ok_variants:
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
