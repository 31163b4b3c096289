"""Interleaved A/B of flash-bundle knobs on the TRAINED-capture hybrid
frame (the r4 bench headline) — the blob tunings don't necessarily
transfer: the trained grid's occupancy is sparser and lumpier
(post-floaty), the render aabb is wider ([0.1, 0.9]^3), and the bake is
log-space.

Each variant renders the full 720p hybrid frame (trained NeRF +
glasses.gltf); legs are interleaved over rounds and the per-variant
best is reported, plus PSNR vs the first variant as a same-content
check. Usage: python tools/profile_trained.py [variant ...]
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
import bench_scene

ROUNDS = 3
N_FRAMES = 24

VARIANTS = [
    ("base (bench bundle)", {}),
    ("dist24", {"dist_advance": True}),
    ("dist16", {"dist_advance": True, "advance_iters": 16}),
    ("adv16", {"advance_iters": 16}),
    ("adv32", {"advance_iters": 32}),
    ("chunk4096", {"chunk": 1 << 12}),
    ("spr8", {"steps_per_round": 8}),
    ("spr24", {"steps_per_round": 24}),
    ("splat2", {"lowres_splat_radius": 2}),
    ("splat4", {"lowres_splat_radius": 4}),
    ("lowres6", {"lowres_factor": 6}),
    ("lowres12", {"lowres_factor": 12}),
]


def main():
    snap = bench_scene.get_trained_snapshot(bench.CACHE)
    renderer, nerf = bench.make_renderer(snap)
    nerf.render_aabb.min = np.array([0.1, 0.1, 0.1], np.float32)
    nerf.render_aabb.max = np.array([0.9, 0.9, 0.9], np.float32)
    renderer.remove_floaties()
    cam0 = bench.cam_snapshot(renderer)
    nerf.bake(bench.BAKE_RES, feat_resolution=bench.FEAT_RES)
    nerf.flash = True
    saved = dict(nerf.march_overrides)

    names = [n for n, _ in VARIANTS]
    sel = [a for a in sys.argv[1:] if a in names]
    variants = [(n, ov) for n, ov in VARIANTS if not sel or n in sel]

    frames = {}
    for name, ov in variants:
        nerf.march_overrides = {**saved, **ov}
        frames[name] = bench.fidelity_frame(renderer, cam0)
    ref_name = variants[0][0]

    best = {name: 0.0 for name, _ in variants}
    for r in range(ROUNDS):
        for name, ov in variants:
            nerf.march_overrides = {**saved, **ov}
            fps = bench.time_orbit(renderer, n_frames=N_FRAMES)
            best[name] = max(best[name], fps)
            print(f"  r{r} {name:24s} {fps:6.2f} fps", flush=True)
    print("---", flush=True)
    for name, _ in variants:
        p = bench.psnr(frames[name], frames[ref_name])
        print(f"{name:24s} {best[name]:6.2f} fps  "
              f"(vs {ref_name}: {p:.1f} dB)", flush=True)


if __name__ == "__main__":
    main()
