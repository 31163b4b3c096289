"""Break down the hybrid frame's mesh-pass cost on the real TPU.

Times (interleaved, chained-on-device, scalar drain):
  - the full tiled mesh pass (binning + raycast + shade, one jit)
  - binning alone (world-transform + bbox projection + argsort pack)
  - the tiled Pallas raycast alone (pre-built lists)
  - shading alone (shade_hits on raycast outputs)
  - downsample_surface
  - the full hybrid frame and the NeRF-only frame for context

Run on the axon TPU:  python tools/profile_mesh.py
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

REPS = 10


def timeit(name, fn, drain, reps=REPS):
    fn()  # warm (compile)
    drain()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    drain()
    dt = (time.perf_counter() - t0) / reps * 1000.0
    print(f"{name:35s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    snap = os.path.join("/root/repo/assets/cache", "bench_head_v2.msgpack")
    if not os.path.exists(snap):
        bench.build_bench_snapshot(snap)
    renderer, nerf = bench.make_renderer(snap)
    nerf.bake(256)
    nerf.flash = True

    w, h = renderer.render_width, renderer.render_height
    f = renderer.mesh_render_size_factor
    wf, hf = w * f, h * f
    mesh = renderer._mesh_arrays
    xf, nm = tri_ops.instance_transforms(mesh, renderer._meshes)
    cam = renderer.view_projection_mat
    light = renderer.light_pos

    print(f"tris={mesh.n_tris} render={wf}x{hf}", flush=True)

    # --- full tiled mesh pass ---
    def full_pass():
        c, d = tri_ops.render_mesh_pass(mesh, xf, nm, cam, wf, hf, light,
                                        device_out=True)
        full_pass.out = (c, d)

    timeit("mesh pass (bin+trace+shade)", full_pass,
           lambda: float(full_pass.out[1][0, 0]))

    def fused_pass():
        c, d = tri_ops.render_mesh_surface(mesh, xf, nm, cam, w, h, f,
                                           light)
        fused_pass.out = (c, d)

    timeit("mesh surface (fused reduce)", fused_pass,
           lambda: float(fused_pass.out[1][0, 0]))

    # --- components ---
    from nerf_glasses_tpu.ops.triangles import TILE_W, TILE_H, _bin_triangles
    wp = ((wf + TILE_W - 1) // TILE_W) * TILE_W
    hp = ((hf + TILE_H - 1) // TILE_H) * TILE_H

    camj = jnp.asarray(cam, jnp.float32)
    xfj = jnp.asarray(xf)
    eye = camj[:, 3]
    cam3_inv = jnp.linalg.inv(camj[:, :3])

    @jax.jit
    def world_tris(xfj):
        rot = xfj[mesh.inst_id, :, :3]
        trans = xfj[mesh.inst_id, :, 3]
        v0 = jnp.einsum("tij,tj->ti", rot, mesh.v0) + trans
        e1 = jnp.einsum("tij,tj->ti", rot, mesh.e1)
        e2 = jnp.einsum("tij,tj->ti", rot, mesh.e2)
        return v0, e1, e2

    v0, e1, e2 = world_tris(xfj)

    @jax.jit
    def binning(v0, e1, e2):
        return _bin_triangles(v0, e1, e2, eye, cam3_inv, wf, hf, wp, hp)

    def bin_run():
        bin_run.out = binning(v0, e1, e2)
    timeit("binning (project+argsort)", bin_run,
           lambda: int(bin_run.out[1][0]))

    lists, counts = bin_run.out
    print(f"tiles={int(counts.shape[0])} nonempty="
          f"{int(np.sum(np.asarray(counts) > 0))} "
          f"mean_count_nonempty="
          f"{float(np.asarray(counts)[np.asarray(counts) > 0].mean()):.0f} "
          f"max={int(np.asarray(counts).max())}", flush=True)

    # rays in tile order
    ntx, nty = wp // TILE_W, hp // TILE_H

    @jax.jit
    def gen_rays(camj):
        px = (jax.lax.broadcasted_iota(jnp.float32, (hp, wp), 1) + 0.5)
        py = (jax.lax.broadcasted_iota(jnp.float32, (hp, wp), 0) + 0.5)
        ndc = jnp.stack([px / wf * 2.0 - 1.0, py / hf * 2.0 - 1.0,
                         jnp.ones((hp, wp))], axis=-1)
        d = ndc @ camj[:, :3].T
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        d_t = (d.reshape(nty, TILE_H, ntx, TILE_W, 3)
               .transpose(0, 2, 1, 3, 4).reshape(-1, 3))
        o_t = jnp.broadcast_to(eye, d_t.shape)
        return o_t, d_t

    def raygen_run():
        raygen_run.out = gen_rays(camj)
    timeit("ray gen (tiled)", raygen_run,
           lambda: float(raygen_run.out[1][0, 0]))
    o_t, d_t = raygen_run.out

    from nerf_glasses_tpu.ops.mesh_pallas import raycast_pallas_tiled

    tri_scalars = jnp.concatenate([v0, e1, e2], axis=1)

    def cast_run():
        cast_run.out = raycast_pallas_tiled(tri_scalars, o_t, d_t,
                                            lists, counts)
    timeit("raycast pallas (tiled)", cast_run,
           lambda: float(cast_run.out[0][0]))
    t, tri, uu, vv = cast_run.out
    print(f"hit_frac={float(np.mean(np.asarray(tri) >= 0)):.4f}", flush=True)

    uv = jnp.stack([uu, vv], axis=-1)
    nmj = jnp.asarray(nm)
    lightj = jnp.asarray(light, jnp.float32)

    @jax.jit
    def shade(t, tri, uv):
        return tri_ops.shade_hits(mesh, o_t, d_t, t, tri, uv, nmj,
                                  lightj, eye)

    def shade_run():
        shade_run.out = shade(t, tri, uv)
    timeit("shade_hits", shade_run, lambda: float(shade_run.out[0, 0]))

    # downsample
    color = jnp.zeros((hf, wf, 4))
    depth = jnp.zeros((hf, wf))

    @jax.jit
    def down(c, d):
        return tri_ops.downsample_surface(c, d, f)

    def down_run():
        down_run.out = down(color, depth)
    timeit("downsample 2x2", down_run, lambda: float(down_run.out[1][0, 0]))

    # --- context: full hybrid frame (flash) ---
    def frame_run():
        renderer.render_frame()
        frame_run.out = renderer._frame_buffer
    timeit("full hybrid frame (flash)", frame_run,
           lambda: float(frame_run.out[0, 0, 3]))

    # NeRF-only (mesh removed)
    renderer._mesh_arrays = None

    def nerf_run():
        renderer.render_frame()
        nerf_run.out = renderer._frame_buffer
    timeit("NeRF-only frame (flash)", nerf_run,
           lambda: float(nerf_run.out[0, 0, 3]))


if __name__ == "__main__":
    main()
