"""A/B the Pallas advance kernel vs the XLA advance pass on the real
TPU, interleaved in one run (end-to-end 720p flash frame on the bench
blob, NeRF-only), plus a PSNR check that the two paths render the same
image.
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
    ("xla advance", {}),
    ("pallas advance", {"pallas_advance": True}),
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

    frames = {}
    for name, kw in VARIANTS:
        nerf.march_overrides = dict(kw)
        t0 = time.perf_counter()
        run()
        drain()
        frames[name] = np.asarray(run.out)
        print(f"compiled {name:16s} ({time.perf_counter() - t0:.0f} s)",
              flush=True)
    a, b = (frames[n] for n, _ in VARIANTS)
    mse = float(np.mean((a[..., :3] - b[..., :3]) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    print(f"pallas-vs-xla frame PSNR: {psnr:.2f} dB", flush=True)

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
