"""Bisect the fixed per-frame overhead of march_frame.

The counts probe showed a frame with only ~4k active rays still costs
~330 ms -> the floor, not the marching, dominates. Measure:
  A. dispatch floor: trivial jit chained like a frame
  B. bench-camera frame (the real workload, for scale)
  C. init+finalize only (ray state build, init_skip DDA, finalize)
  D. init+finalize with init_skip_iters=0
  E. ray-gen only (camera -> o,d with norm)
  F. full frame with advance_iters=12 (vs default 48)
  G. full frame with default-camera (4k active rays) again for reference
"""
import dataclasses
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, "assets", "cache")
jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

W, H = 1280, 720


def timeit(fn, n=6, warmup=2):
    for i in range(warmup):
        r = fn(i)
    _ = float(np.asarray(r).reshape(-1)[0])
    t0 = time.perf_counter()
    for i in range(n):
        r = fn(warmup + i)
    _ = float(np.asarray(r).reshape(-1)[0])
    return (time.perf_counter() - t0) / n


def report(label, fn, n=6):
    t0 = time.perf_counter()
    dt = timeit(fn, n=n)
    print(f"{label}: {dt*1000:.1f} ms  (wall {time.perf_counter()-t0:.0f}s)",
          flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}", flush=True)
    from bench import make_renderer, build_bench_snapshot
    snap = os.path.join(CACHE, "bench_head_fast_prof.msgpack")
    if not os.path.exists(snap):
        build_bench_snapshot(snap)
    renderer, tb = make_renderer(snap)
    from nerf_glasses_tpu.ops import raymarch as rm

    opts = tb._march_options()
    scene = tb._scene()
    cam = jnp.asarray(tb.camera_matrix, jnp.float32)

    # A. dispatch floor
    @jax.jit
    def triv(x, i):
        return x * 1.0001 + i

    x0 = jnp.ones((8, 128))
    report("A trivial jit", lambda i: triv(x0, i))

    # E. ray-gen only (device): build o/d from cam like the frame fn
    npix = W * H

    @jax.jit
    def raygen(cam, si):
        px = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
        py = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
        u = (px + 0.5) / W * 2 - 1
        v = (py + 0.5) / H * 2 - 1
        ndc = jnp.stack([u, v, jnp.ones((H, W))], -1).reshape(-1, 3)
        d = ndc @ cam[:, :3].T
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.broadcast_to(cam[:, 3] + 0.5, d.shape)
        return o + 1e-9 * si, d

    def e_fn(i):
        o, d = raygen(cam, i)
        return o
    report("E ray-gen only", e_fn)

    o, d = raygen(cam, 0)
    o = jax.block_until_ready(o)
    surf = jnp.zeros((npix, 4))
    tsurf = jnp.zeros((npix,))

    from functools import partial

    # C/D. init + finalize only
    @partial(jax.jit, static_argnames=("opts",))
    def init_fin(scene, o, d, surf, tsurf, opts, si):
        st = rm._make_state(scene, o, d, surf, tsurf, opts, si)
        out = rm._finalize(st)
        return out["rgba"] + st["t"][:, None]

    report("C init(skip16)+finalize",
           lambda i: init_fin(scene, o, d, surf, tsurf, opts, i))
    opts0 = dataclasses.replace(opts, init_skip_iters=0)
    report("D init(skip0)+finalize",
           lambda i: init_fin(scene, o, d, surf, tsurf, opts0, i))

    # B. full frame, bench camera (default opts)
    def frame(opts_v):
        def one(i):
            rgba, _ = rm.render_image_device(
                tb.params, scene, np.asarray(cam), W, H, opts_v,
                sample_index=i)
            return rgba
        return one

    report("B full frame bench-cam (advance48)", frame(opts))

    # F. advance_iters variants
    report("F full frame advance12",
           frame(dataclasses.replace(opts, advance_iters=12)))
    # G. chunk 16384 for cross-check
    report("G full frame chunk16384",
           frame(dataclasses.replace(opts, chunk=1 << 14)))
    # H. K=16 steps per round
    report("H full frame K16",
           frame(dataclasses.replace(opts, steps_per_round=16)))


if __name__ == "__main__":
    main()
