"""Benchmark: hybrid NeRF + glasses render at 720p on one TPU chip.

Mirrors the reference's headline scenario (volume/render.py orbit loop at
1280x720: NeRF head + glasses.gltf mesh at 2x supersampling) on a
procedurally generated head-like NeRF with the reference's full-size
network (L=16, T=2^19, 64-wide MLPs, 128^3x8 occupancy grid).

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "fps", "vs_baseline": fps/30}
vs_baseline is measured against the BASELINE.md target of >= 30 FPS at
720p (the reference repo publishes no absolute numbers).
"""

import json
import os
import sys
import time

import numpy as np

W, H = 1280, 720
N_WARMUP = 2
N_FRAMES = 3
GLASSES = "/root/reference/nerf_mesh_renderer/assets/meshes/glasses/glasses.gltf"


def build_bench_snapshot(path, cfg=None):
    """Head-sized density blob + network weights tuned for realistic
    early termination (opaque interior like a converged capture)."""
    import jax
    import jax.numpy as jnp
    from nerf_glasses_tpu.config import NGPConfig
    from nerf_glasses_tpu.ops.network import init_params

    if cfg is None:
        cfg = NGPConfig.native_fast()
    params = init_params(jax.random.PRNGKey(7), cfg)
    # spatially-varying but consistently high densities, calibrated so a
    # ray inside the blob reaches opacity within ~10-15 samples, like a
    # converged head capture: boost the grid features, then rescale the
    # density output row so the median sigma_raw ~ 6 (sigma ~ e^6)
    params["grid"] = params["grid"] * 5000.0  # U(-0.5, 0.5) features
    d = list(params["density_mlp"])
    w = np.array(d[-1], np.float32)
    w[0, :] = 1.0 / w.shape[1]
    d[-1] = jnp.asarray(w)
    params["density_mlp"] = tuple(d)
    from nerf_glasses_tpu.ops.network import density_raw
    pos = jax.random.uniform(jax.random.PRNGKey(3), (4096, 3),
                             minval=0.3, maxval=0.7)
    raw = np.asarray(density_raw(params, pos, cfg)[:, 0])
    med = float(np.median(np.abs(raw))) or 1.0
    w[0, :] = (6.0 / med) / w.shape[1]
    d[-1] = jnp.asarray(w)
    params["density_mlp"] = tuple(d)

    # head-ish ellipsoid occupancy (~8% of the cube)
    g = np.linspace(0, 1, 128, endpoint=False) + 0.5 / 128
    z, y, x = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt(((x - 0.5) / 0.22) ** 2 + ((y - 0.52) / 0.3) ** 2
                + ((z - 0.5) / 0.25) ** 2)
    grid = (r < 1.0).astype(np.float32)[None] * 0.05

    from nerf_glasses_tpu.io import snapshot as snap_io
    from nerf_glasses_tpu.io.dataset import ImageMetadata, NerfDataset
    from nerf_glasses_tpu.ops.network import pack_params
    from nerf_glasses_tpu.utils.bbox import BoundingBox
    ds = NerfDataset()
    ds.n_images = 1
    ds.xforms = np.eye(3, 4, dtype=np.float32)[None]
    ds.metadata = [ImageMetadata(resolution=(800, 800),
                                 focal_length=(1111.0, 1111.0))]
    ds.paths = ["0.png"]
    ds.render_aabb = BoundingBox([0, 0, 0], [1, 1, 1])
    ds.aabb_scale = cfg.aabb_scale
    aabb = BoundingBox([0, 0, 0], [1, 1, 1])
    snap_io.save_snapshot(path, cfg,
                          pack_params(params, cfg).astype(np.float32),
                          grid, ds, aabb, aabb, np.eye(3, dtype=np.float32))


def main():
    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "assets", "cache")
    os.makedirs(os.path.join(cache, "jaxcache"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(cache, "jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import pynmr as nmr
    snap = os.path.join(cache, "bench_head_v2.msgpack")
    if not os.path.exists(snap):
        build_bench_snapshot(snap)

    renderer = nmr.NerfMeshRenderer(W, H)
    nerf = renderer.load_nerf(snap)
    # tight render aabb around the head, as the reference flow does
    # (render.py:234-235)
    nerf.render_aabb.min = np.array([0.2, 0.15, 0.2], np.float32)
    nerf.render_aabb.max = np.array([0.8, 0.9, 0.8], np.float32)
    if os.path.exists(GLASSES):
        renderer.load_mesh(GLASSES, t=[0.0, 0.1, 0.22],
                           s=[0.25, 0.25, 0.25])

    renderer.orbit(0.4, -0.1, 0)
    renderer.orbit(0, 0, 3.5)  # zoom in: head fills a realistic share

    def drain():
        # force full pipeline completion with a minimal transfer
        return float(np.asarray(renderer._frame_buffer[0, 0, 3]))

    # warmup (first frame compiles; slow through remote-compile tunnels)
    for _ in range(N_WARMUP):
        renderer.frame()
        renderer.orbit(0.01, 0.0, 0)
    drain()

    t0 = time.perf_counter()
    a = 0.0
    for _ in range(N_FRAMES):
        a += 0.03
        renderer.orbit(-np.sin(a * 1.733) / 100, np.cos(a * 1.733) / 200, 0)
        renderer.frame()
    drain()
    dt = time.perf_counter() - t0

    fps = N_FRAMES / dt
    rays_per_sec = fps * W * H
    result = {
        "metric": "hybrid_720p_fps (head NeRF + glasses.gltf, 1 chip)",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 4),
        "extra": {
            "frame_ms": round(1000.0 * dt / N_FRAMES, 2),
            "rays_per_sec": int(rays_per_sec),
            "resolution": f"{W}x{H}",
            "mesh_supersample": 2,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
