"""Benchmark: hybrid NeRF + glasses render at 720p on one TPU chip.

Mirrors the reference's headline scenario (volume/render.py orbit loop at
1280x720: NeRF head + glasses.gltf mesh at 2x supersampling) on a
procedurally generated head-like NeRF.

Three configurations are measured:
  - headline: NGPConfig.native_fast (L=8, F=4, T=2^15) with the
    baked-sigma fast path (Testbed.bake(), ops/bake.py) — the flagship
    TPU render path;
  - the same config unbaked (pure hash+MLP per sample);
  - the reference-compatible NGPConfig() (L=16, F=2, T=2^19 — the tcnn
    default, testbed.cu:57-101) unbaked, i.e. what a real instant-ngp
    snapshot renders at.

Fidelity gates printed alongside fps:
  - psnr_baked_vs_unbaked: the fast path against the exact path, same
    frame (BASELINE.md demands the fast path stay within 0.5 dB);
  - psnr_vs_golden: the unbaked frame against a pinned golden
    (tests/goldens/bench_720p_golden.png, pinned on first validated run)
    so perf changes can't silently change the rendered output.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "fps", "vs_baseline": fps/30, ...}
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
N_FRAMES = 6
GLASSES = "/root/reference/nerf_mesh_renderer/assets/meshes/glasses/glasses.gltf"
GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "tests", "goldens", "bench_720p_golden.png")


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


def make_renderer(snap):
    import pynmr as nmr
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
    return renderer, nerf


def drain(renderer):
    # force full pipeline completion with a minimal transfer
    return float(np.asarray(renderer._frame_buffer[0, 0, 3]))


def time_orbit(renderer, n_frames=N_FRAMES, n_warmup=N_WARMUP):
    """fps over the reference's orbit wobble (render.py:245-258),
    frames chained on device, one scalar drain at the end."""
    for _ in range(n_warmup):
        renderer.frame()
        renderer.orbit(0.01, 0.0, 0)
    drain(renderer)
    t0 = time.perf_counter()
    a = 0.0
    for _ in range(n_frames):
        a += 0.03
        renderer.orbit(-np.sin(a * 1.733) / 100, np.cos(a * 1.733) / 200, 0)
        renderer.frame()
    drain(renderer)
    return n_frames / (time.perf_counter() - t0)


def fidelity_frame(renderer, cam_state=None):
    """Deterministic tonemapped frame (spp reset so the jitter sequence
    is reproducible). cam_state=(OrbitCamera, view_projection_mat)
    restores the starting camera first — time_orbit mutates it, and a
    drifted view must not contaminate the PSNR gates."""
    import copy
    if cam_state is not None:
        renderer.camera = copy.deepcopy(cam_state[0])
        renderer.view_projection_mat = cam_state[1].copy()
    for nerf in renderer._nerfs:
        nerf.reset_accumulation()
    renderer.render_frame()
    return renderer.display_image()[..., :3]


def cam_snapshot(renderer):
    import copy
    return (copy.deepcopy(renderer.camera),
            renderer.view_projection_mat.copy())


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    if mse <= 0:
        return 99.0
    return float(10.0 * np.log10(1.0 / mse))


def main():
    import jax
    quick = "--quick" in sys.argv
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "assets", "cache")
    os.makedirs(os.path.join(cache, "jaxcache"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(cache, "jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    snap = os.path.join(cache, "bench_head_v2.msgpack")
    if not os.path.exists(snap):
        build_bench_snapshot(snap)

    renderer, nerf = make_renderer(snap)
    cam0 = cam_snapshot(renderer)

    # fidelity frames at the fixed starting camera
    frame_unbaked = fidelity_frame(renderer, cam0)
    fps_unbaked = time_orbit(renderer)

    # the baked-sigma fast path: density from the brick-packed grid,
    # the full network only at significant samples
    renderer2, nerf2 = make_renderer(snap)
    nerf2.bake(256)
    frame_baked = fidelity_frame(renderer2, cam0)
    fps_baked = time_orbit(renderer2)
    psnr_bake = psnr(frame_baked, frame_unbaked)

    # flash mode (flagship candidate): coarse-pass ray init + deferred
    # shading on top of the baked grid
    nerf2.flash = True
    frame_flash = fidelity_frame(renderer2, cam0)
    fps_flash = time_orbit(renderer2)
    psnr_flash = psnr(frame_flash, frame_unbaked)
    nerf2.flash = False

    # flash WITHOUT deferred shading: coarse-pass init + vector rounds,
    # color still per-sample via significance compaction
    saved_overrides = dict(nerf2.march_overrides)
    nerf2.march_overrides = {**saved_overrides, "lowres_factor": 8,
                             "advance_iters": 24, "vector_rounds": True,
                             "steps_per_round": 16}
    frame_fsig = fidelity_frame(renderer2, cam0)
    fps_fsig = time_orbit(renderer2)
    psnr_fsig = psnr(frame_fsig, frame_unbaked)
    nerf2.march_overrides = saved_overrides

    # golden gate: pin on first validated run, compare thereafter
    from PIL import Image
    g8 = np.clip(frame_unbaked * 255.0, 0, 255).astype(np.uint8)
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        Image.fromarray(g8).save(GOLDEN)
        psnr_golden = 99.0
    else:
        gold = np.asarray(Image.open(GOLDEN), np.float32) / 255.0
        psnr_golden = psnr(frame_unbaked, gold)

    # reference-compatible config (tcnn default: L=16, F=2, T=2^19),
    # unbaked — what a real instant-ngp snapshot renders at
    fps_ref = None
    if not quick:
        from nerf_glasses_tpu.config import NGPConfig
        snap_ref = os.path.join(cache, "bench_head_ref_v1.msgpack")
        if not os.path.exists(snap_ref):
            build_bench_snapshot(snap_ref, NGPConfig())
        renderer3, _ = make_renderer(snap_ref)
        fps_ref = time_orbit(renderer3, n_frames=3)

    # headline = fastest path whose fidelity vs the exact render holds
    # (35 dB internal gate, well inside BASELINE.md's 0.5 dB budget)
    candidates = [("flash", fps_flash, psnr_flash),
                  ("flash_sigcolor", fps_fsig, psnr_fsig),
                  ("baked", fps_baked, psnr_bake),
                  ("unbaked", fps_unbaked, 99.0)]
    name, fps_head, _ = max(
        (c for c in candidates if c[2] >= 35.0), key=lambda c: c[1])

    result = {
        "metric": f"hybrid_720p_fps (head NeRF + glasses.gltf, 1 chip, "
                  f"{name} path)",
        "value": round(fps_head, 3),
        "unit": "fps",
        "vs_baseline": round(fps_head / 30.0, 4),
        "extra": {
            "frame_ms": round(1000.0 / fps_head, 2),
            "rays_per_sec": int(fps_head * W * H),
            # the BASELINE target hardware is v5e-8; the march is pure
            # ray-DP with zero collectives (parallel/sharding.py,
            # equivalence-tested on an 8-device mesh), so 8 chips scale
            # ~linearly. NAIVE extrapolation — no 8-chip hardware here.
            "fps_v5e8_raydp_extrapolated": round(fps_head * 8.0, 1),
            "fps_unbaked": round(fps_unbaked, 3),
            "fps_baked": round(fps_baked, 3),
            "fps_flash": round(fps_flash, 3),
            "fps_flash_sigcolor": round(fps_fsig, 3),
            "psnr_flash_sigcolor_vs_unbaked_db": round(psnr_fsig, 2),
            "fps_ref_config_L16_T19": (round(fps_ref, 3)
                                       if fps_ref is not None else None),
            "psnr_baked_vs_unbaked_db": round(psnr_bake, 2),
            "psnr_flash_vs_unbaked_db": round(psnr_flash, 2),
            "psnr_vs_golden_db": round(psnr_golden, 2),
            "resolution": f"{W}x{H}",
            "mesh_supersample": 2,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
