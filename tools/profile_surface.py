"""Isolate the has_surface march cost on the real TPU.

The hybrid flash frame costs ~270 ms vs ~98 ms NeRF-only + ~40 ms mesh
pass — the surface-gated march graph carries a ~130 ms penalty. This
times render_frame_buffers with (a) no surface (has_surface=False
graph), (b) an all-zero surface (has_surface graph, no surface content),
(c) the real mesh surface (content cost), interleaved.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/assets/cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from nerf_glasses_tpu.ops import triangles as tri_ops

REPS = 8


def timeit(name, fn, drain, reps=REPS):
    fn()
    drain()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    drain()
    dt = (time.perf_counter() - t0) / reps * 1000.0
    print(f"{name:40s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    snap = "/root/repo/assets/cache/bench_head_v2.msgpack"
    renderer, nerf = bench.make_renderer(snap)
    nerf.bake(256)
    nerf.flash = True
    w, h = renderer.render_width, renderer.render_height

    # real mesh surface buffers (computed once)
    f = renderer.mesh_render_size_factor
    xf, nm = tri_ops.instance_transforms(renderer._mesh_arrays,
                                         renderer._meshes)
    surf_c, surf_t = tri_ops.render_mesh_surface(
        renderer._mesh_arrays, xf, nm, renderer.view_projection_mat,
        w, h, f, renderer.light_pos)
    surf_c = surf_c.reshape(-1, 4)
    surf_t = surf_t.reshape(-1)
    zero_c = jnp.zeros_like(surf_c)
    zero_t = jnp.zeros_like(surf_t)
    print(f"surface coverage: {float((surf_t > 0).mean()):.4f}",
          flush=True)

    legs = [
        ("no surface (has_surface=False)", None, None),
        ("zero surface (has_surface graph)", zero_c, zero_t),
        ("real surface", surf_c, surf_t),
    ]

    out = {}

    def run(c, t):
        nerf.set_surface_buffers(c, t, w, h)
        if c is None:
            nerf.set_surface_buffers(None, None, w, h)
        fb, db = nerf.render_frame_buffers(w, h)
        run.out = fb

    # interleaved rounds
    for rnd in range(3):
        for name, c, t in legs:
            d = timeit(f"[r{rnd}] {name}",
                       lambda c=c, t=t: run(c, t),
                       lambda: float(run.out[0, 0, 3]), reps=REPS)
            out.setdefault(name, []).append(d)

    print({k: round(min(v), 1) for k, v in out.items()}, flush=True)


if __name__ == "__main__":
    main()
