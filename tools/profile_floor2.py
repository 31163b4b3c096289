"""Decompose the flash frame's fixed-cost floor (r3 follow-up).

profile_march_flash found max_rounds=1 costs 92 of the ~97 ms NeRF-only
flash frame — the knobs on later epochs don't matter. This isolates the
components of that first epoch by ablation, interleaved:

  A  flash default                      (reference)
  B  deferred gutted (wn never set -> sig_threshold=inf equivalent:
     deferred_color off + sig_threshold=1e9 so NO color network runs)
  C  B + advance_iters=0                (advance pass cost)
  D  B + steps_per_round=4              (sigma-round scaling)
  E  B + advance 0 + spr=1              (~raygen/init/partition floor)

A-B = deferred-shade cost; B-C = advance cost; C-E ~ sigma rounds.
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

GUT = {"deferred_color": False, "sig_threshold": 1e9}
# (name, use_feature_grid, overrides)
VARIANTS = [
    ("A feat-shade flash", True, {}),
    ("A2 net-shade flash", False, {}),
    ("B no-color march", False, dict(GUT)),
    ("C B+adv0", False, dict(GUT, advance_iters=0)),
    ("D B+spr4", False, dict(GUT, steps_per_round=4)),
    ("E B+adv0+spr1", False, dict(GUT, advance_iters=0, steps_per_round=1,
                                  max_rounds=1)),
    ("F B+max_rounds1", False, dict(GUT, max_rounds=1)),
]


def main():
    snap = "/root/repo/assets/cache/bench_head_v2.msgpack"
    if not os.path.exists(snap):
        bench.build_bench_snapshot(snap)
    rigs = {}
    for use_feat in (True, False):
        renderer, nerf = bench.make_renderer(snap, load_glasses=False)
        nerf.bake(256, features=use_feat)
        nerf.flash = True
        rigs[use_feat] = nerf
    w, h = bench.W, bench.H

    def run(nerf):
        fb, db = nerf.render_frame_buffers(w, h)
        run.out = fb

    def drain():
        return float(run.out[0, 0, 3])

    frames = {}
    for name, use_feat, kw in VARIANTS:
        nerf = rigs[use_feat]
        nerf.march_overrides = dict(kw)
        t0 = time.perf_counter()
        run(nerf)
        drain()
        frames[name] = np.asarray(run.out)
        print(f"compiled {name:20s} ({time.perf_counter() - t0:.0f} s)",
              flush=True)
    mse = float(np.mean((frames["A feat-shade flash"][..., :3]
                         - frames["A2 net-shade flash"][..., :3]) ** 2))
    print(f"feat vs net shade PSNR: {10.0 * np.log10(1.0 / max(mse, 1e-12)):.2f} dB",
          flush=True)

    results = {}
    for rnd in range(4):
        for name, use_feat, kw in VARIANTS:
            nerf = rigs[use_feat]
            nerf.march_overrides = dict(kw)
            run(nerf)
            drain()
            t0 = time.perf_counter()
            for _ in range(REPS):
                run(nerf)
            drain()
            dt = (time.perf_counter() - t0) / REPS * 1000.0
            print(f"[r{rnd}] {name:20s} {dt:8.2f} ms", flush=True)
            results.setdefault(name, []).append(dt)
    best = {k: round(min(v), 1) for k, v in results.items()}
    print(best, flush=True)


if __name__ == "__main__":
    main()
