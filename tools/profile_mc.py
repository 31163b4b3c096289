"""Multicascade flash-frame variant sweep on the real TPU (r5).

BENCH_r05 has the mc leg at 4.25 fps vs single-cascade flash 9.74 —
a 2.3x gap (VERDICT r4 #4 asks ~2x). Interleaved same-run timing of
march-option variants on the baked aabb_scale=4 scene, each gated by
PSNR vs the current bundle's frame (a variant that loses >0.3 dB vs
the 42.6 dB-vs-exact baseline is a no-go regardless of speed).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/assets/cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

import bench
from nerf_glasses_tpu.config import NGPConfig

CACHE = os.path.join(os.path.dirname(os.path.abspath(bench.__file__)),
                     "assets", "cache")

VARIANTS = [
    ("base", {}),
    ("occ_gate_off", {"vector_occ_gate": False}),
    ("spr32", {"steps_per_round": 32}),
    ("adv16", {"advance_iters": 16}),
    ("adv32", {"advance_iters": 32}),
    ("lowres16", {"lowres_factor": 16}),
    ("chunk12", {"chunk": 1 << 12}),
]

ROUNDS = 3


def main():
    snap = os.path.join(CACHE, "bench_head_mc4_v1.msgpack")
    if not os.path.exists(snap):
        bench.build_bench_snapshot(snap,
                                   NGPConfig.native_fast(aabb_scale=4))
    renderer, nerf = bench.make_renderer(snap)
    nerf.render_aabb.min = np.array([-1.5] * 3, np.float32)
    nerf.render_aabb.max = np.array([2.5] * 3, np.float32)
    cam = bench.cam_snapshot(renderer)
    nerf.bake(256)
    nerf.flash = True
    base_overrides = dict(nerf.march_overrides)

    frames, fps = {}, {k: [] for k, _ in VARIANTS}
    for name, kw in VARIANTS:  # compile + fidelity frame first
        nerf.march_overrides = {**base_overrides, **kw}
        frames[name] = bench.fidelity_frame(renderer, cam)
        print(f"compiled {name}", flush=True)
    for _ in range(ROUNDS):  # interleaved timing
        for name, kw in VARIANTS:
            nerf.march_overrides = {**base_overrides, **kw}
            t0 = time.perf_counter()
            f, _ = bench.time_leg(renderer, rounds=1)
            fps[name].append(f)
    for name, _ in VARIANTS:
        p = bench.psnr(frames[name], frames["base"])
        print(f"  {name:14s} fps {max(fps[name]):6.3f}  "
              f"rounds {[round(v, 2) for v in fps[name]]}  "
              f"psnr_vs_base {p:5.1f}", flush=True)


if __name__ == "__main__":
    main()
