"""End-to-end drive of the multicascade (aabb_scale=4) fast path on the
real TPU: snapshot -> load_nerf -> exact render vs bake()+flash render,
PSNR gate + frame timing. Mirrors bench.py's new leg, standalone."""
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

print("devices:", jax.devices(), flush=True)

CACHE = os.path.join(os.path.dirname(os.path.abspath(bench.__file__)),
                     "assets", "cache")
snap = os.path.join(CACHE, "bench_head_mc4_v1.msgpack")
if not os.path.exists(snap):
    bench.build_bench_snapshot(snap, NGPConfig.native_fast(aabb_scale=4))
    print("built snapshot", flush=True)

renderer, nerf = bench.make_renderer(snap)
nerf.render_aabb.min = np.array([-1.5] * 3, np.float32)
nerf.render_aabb.max = np.array([2.5] * 3, np.float32)
cam = bench.cam_snapshot(renderer)

t0 = time.time()
frame_exact = bench.fidelity_frame(renderer, cam)
print(f"exact fidelity frame: {time.time()-t0:.1f}s (incl compile)",
      flush=True)

t0 = time.time()
nerf.bake(256)
print(f"bake(256) pyramid: {time.time()-t0:.1f}s", flush=True)
nerf.flash = True
t0 = time.time()
frame_fast = bench.fidelity_frame(renderer, cam)
print(f"fast fidelity frame: {time.time()-t0:.1f}s (incl compile)",
      flush=True)
p = bench.psnr(frame_fast, frame_exact)
print(f"psnr_multicascade_fast_vs_unbaked_db = {p:.2f}", flush=True)
print("exact mean", frame_exact.mean(), "fast mean", frame_fast.mean(),
      flush=True)

# timing: chained 720p frames, drain with one scalar from the device
# frame buffer (block_until_ready is unreliable through the tunnel)
for leg in range(2):
    t0 = time.time()
    for _ in range(8):
        renderer.frame()
    _ = float(np.asarray(renderer._frame_buffer)[0, 0, 0])
    dt = (time.time() - t0) / 8
    print(f"leg{leg}: {dt*1000:.1f} ms/frame = {1/dt:.2f} fps", flush=True)
