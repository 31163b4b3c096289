"""Per-frame progressive-accumulation cost in the hybrid flash loop.

renderer.render_frame() computes an sRGB-convert+blend over the full
720p buffer into nerf._accum every frame (render_buffer.cu:232-268
parity), though nothing in the repo reads it in the hot loop.
Interleaved A/B of the orbit loop with renderer.progressive_accum
on/off.

RESULT (2026-08-18, v5e): FREE — on 127.0 vs off 128.5 ms/frame, i.e.
inside timing noise. The host-dispatched elementwise chain overlaps the
device-bound march; removing ops that hide in pipeline bubbles buys
nothing. Kept ON by default.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/assets/cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench


def main():
    snap = "/root/repo/assets/cache/bench_head_v2.msgpack"
    if not os.path.exists(snap):
        bench.build_bench_snapshot(snap)
    renderer, nerf = bench.make_renderer(snap)
    nerf.bake(256)
    nerf.flash = True

    for name, on in [("accum ON ", True), ("accum OFF", False)]:
        renderer.progressive_accum = on
        t0 = time.perf_counter()
        bench.time_orbit(renderer, n_frames=2)
        print(f"compiled {name} ({time.perf_counter() - t0:.0f} s)",
              flush=True)

    results = {}
    for rnd in range(4):
        for name, on in [("accum ON ", True), ("accum OFF", False)]:
            renderer.progressive_accum = on
            fps = bench.time_orbit(renderer)
            dt = 1000.0 / fps
            print(f"[r{rnd}] {name} {dt:8.2f} ms/frame ({fps:.2f} fps)",
                  flush=True)
            results.setdefault(name, []).append(dt)
    print({k: round(min(v), 1) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
