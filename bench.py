"""Benchmark: hybrid NeRF + glasses render at 720p on one TPU chip.

Mirrors the reference's headline scenario (volume/render.py orbit loop at
1280x720: NeRF head + glasses.gltf mesh at 2x supersampling).

Legs:
  1. headline (procedural head blob, NGPConfig.native_fast): unbaked /
     baked / flash / flash_sigcolor paths, timed INTERLEAVED over
     multiple rounds (the bench machine's speed varies 1.5-2x between
     runs, so only same-run interleaved comparisons are valid; the
     per-path fps is the best round, and `timing_noise` reports the
     max/min spread of the headline path's rounds).
  2. the reference-compatible NGPConfig() (L=16, F=2, T=2^19 — the tcnn
     default a real instant-ngp snapshot carries, testbed.cu:57-101),
     both unbaked AND bake()+flash (the fast path works for any
     single-cascade config; gated at 35 dB vs its own unbaked frame).
  3. training throughput: steps/sec of the native trainer
     (train_chunk-dispatched) on a synthetic multi-view dataset +
     projected minutes for the reference train.py contract's 10k steps
     (volume/train.py:11-12).
  4. trained content (bench_scene.py): a textured-sphere capture
     rendered by the repo's own mesh renderer, trained by the repo's own
     trainer (cached snapshot), evaluated as PSNR vs HELD-OUT views for
     unbaked and flash, plus hybrid (trained NeRF + glasses mesh) flash
     fps and its PSNR gate vs the unbaked hybrid frame.

Fidelity gates: every fast path must stay within 35 dB of the exact
(unbaked) render of the same frame — well inside BASELINE.md's 0.5 dB
budget; psnr_vs_golden pins the unbaked output against a stored golden.

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
# Flash-path bake: 512^3 sigma bricks render at the same fps as 256^3
# (tools/profile_bakeres.py: 77.6 vs 77.4 ms) while halving the trained-
# scene holdout gap (34.2 -> 38.1 dB, tools/psnr_trained_attrib.py); the
# 16-wide feature grid stays at 256^3 (features vary smoothly; 512^3
# would cost 4.3 GB).
BAKE_RES, FEAT_RES = 512, 256
N_FRAMES = 24         # frames per timing leg (the tunnel's ~77 ms drain
                      # roundtrip amortizes over the leg: 8 frames left
                      # ~10 ms/frame of fetch latency in every number,
                      # 24 leaves ~3 — measured on the stripped-march
                      # floor probe, tools/profile_floor3.py r24 leg:
                      # 57.5 vs 62.6 ms/frame. The drain is a tunnel
                      # artifact, absent on locally-attached TPUs)
N_ROUNDS = 3          # interleaved rounds over all paths
GLASSES = "/root/reference/nerf_mesh_renderer/assets/meshes/glasses/glasses.gltf"
ROOT = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(ROOT, "tests", "goldens", "bench_720p_golden.png")
CACHE = os.path.join(ROOT, "assets", "cache")


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


def make_renderer(snap, load_glasses=True):
    import pynmr as nmr
    renderer = nmr.NerfMeshRenderer(W, H)
    nerf = renderer.load_nerf(snap)
    # tight render aabb around the head, as the reference flow does
    # (render.py:234-235)
    nerf.render_aabb.min = np.array([0.2, 0.15, 0.2], np.float32)
    nerf.render_aabb.max = np.array([0.8, 0.9, 0.8], np.float32)
    if load_glasses and os.path.exists(GLASSES):
        renderer.load_mesh(GLASSES, t=[0.0, 0.1, 0.22],
                           s=[0.25, 0.25, 0.25])
    renderer.orbit(0.4, -0.1, 0)
    renderer.orbit(0, 0, 3.5)  # zoom in: head fills a realistic share
    return renderer, nerf


def drain(renderer):
    # force full pipeline completion with a minimal transfer
    return float(np.asarray(renderer._frame_buffer[0, 0, 3]))


def time_orbit(renderer, n_frames=N_FRAMES, n_warmup=1):
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


FLASH_SIG_OVERRIDES = {"lowres_factor": 8, "advance_iters": 24,
                       "vector_rounds": True, "steps_per_round": 16,
                       "chunk": 1 << 11}


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


def bench_training_throughput():
    """steps/sec of the native trainer on a synthetic capture dataset
    (train_chunk dispatch; the train.py contract is 10k steps)."""
    import bench_scene
    from nerf_glasses_tpu.config import NGPConfig
    from nerf_glasses_tpu.train.trainer import TrainOptions, Trainer

    ds = bench_scene.build_capture_dataset()
    opts = TrainOptions(config=NGPConfig.native_fast())
    tr = Trainer(ds, opts, seed=3)
    tr.train(48)                       # compile + settle
    n = 192
    t0 = time.perf_counter()
    tr.train(n)
    dt = time.perf_counter() - t0
    return n / dt


def bench_trained_scene(quick=False):
    """Trained-content leg -> dict of PSNR/fps metrics (see module doc)."""
    import jax.numpy as jnp

    import bench_scene
    from nerf_glasses_tpu.models.testbed import Testbed

    snap = bench_scene.get_trained_snapshot(CACHE)
    meta = {}
    if os.path.exists(snap + ".json"):
        with open(snap + ".json") as f:
            meta = json.load(f)

    # --- holdout PSNR: NeRF-only renders vs mesh-rendered ground truth
    cams, gts = bench_scene.holdout_ground_truth()
    tb = Testbed()
    tb.load_snapshot(snap)
    tb.background_color = np.array([1.0, 1.0, 1.0, 1.0], np.float32)
    Wc = bench_scene.W

    def render_views(label):
        outs = []
        for cam in cams:
            tb.camera_matrix = np.asarray(cam, np.float32)
            outs.append(tb.render(Wc, Wc, spp=2, linear=False)[..., :3])
        return outs

    unb = render_views("unbaked")
    tb.bake(BAKE_RES, feat_resolution=FEAT_RES)
    tb.flash = True
    fla = render_views("flash")
    tb.flash = False
    tb.unbake()

    psnr_unb = float(np.mean([psnr(a, b) for a, b in zip(unb, gts)]))
    psnr_fla = float(np.mean([psnr(a, b) for a, b in zip(fla, gts)]))
    psnr_fvsu = float(np.mean([psnr(a, b) for a, b in zip(fla, unb)]))

    out = {
        "train_steps": meta.get("steps"),
        "train_contract_s": (round(meta["train_s"], 1)
                             if "train_s" in meta else None),
        "train_final_loss": meta.get("final_loss"),
        "settle_steps": meta.get("settle_steps"),
        "psnr_trained_unbaked_vs_holdout_db": round(psnr_unb, 2),
        "psnr_trained_flash_vs_holdout_db": round(psnr_fla, 2),
        "psnr_trained_flash_vs_unbaked_db": round(psnr_fvsu, 2),
    }
    if quick:
        return out

    # --- hybrid on trained content: trained NeRF + glasses mesh (the
    # paper's product scenario: thin mesh temples occluded by the head)
    renderer, nerf = make_renderer(snap)
    nerf.render_aabb.min = np.array([0.1, 0.1, 0.1], np.float32)
    nerf.render_aabb.max = np.array([0.9, 0.9, 0.9], np.float32)
    # the reference flow cleans stray density clusters before rendering
    # (render.py optional remove_floaties; essential on a real capture)
    renderer.remove_floaties()
    cam0 = cam_snapshot(renderer)
    frame_unb = fidelity_frame(renderer, cam0)
    nerf.bake(BAKE_RES, feat_resolution=FEAT_RES)
    nerf.flash = True
    frame_fla = fidelity_frame(renderer, cam0)
    fps_fla = time_orbit(renderer)
    out["psnr_trained_hybrid_flash_vs_unbaked_db"] = round(
        psnr(frame_fla, frame_unb), 2)
    out["fps_trained_hybrid_flash"] = round(fps_fla, 3)
    return out


def main():
    import jax
    quick = "--quick" in sys.argv
    os.makedirs(os.path.join(CACHE, "jaxcache"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(CACHE, "jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    snap = os.path.join(CACHE, "bench_head_v2.msgpack")
    if not os.path.exists(snap):
        build_bench_snapshot(snap)

    renderer, nerf = make_renderer(snap)
    cam0 = cam_snapshot(renderer)

    renderer2, nerf2 = make_renderer(snap)
    nerf2.bake(BAKE_RES, feat_resolution=FEAT_RES)

    # ----- fidelity frames at the fixed starting camera -----
    frame_unbaked = fidelity_frame(renderer, cam0)
    frame_baked = fidelity_frame(renderer2, cam0)
    psnr_bake = psnr(frame_baked, frame_unbaked)

    nerf2.flash = True
    frame_flash = fidelity_frame(renderer2, cam0)
    psnr_flash = psnr(frame_flash, frame_unbaked)
    nerf2.flash = False

    saved_overrides = dict(nerf2.march_overrides)
    nerf2.march_overrides = {**saved_overrides, **FLASH_SIG_OVERRIDES}
    frame_fsig = fidelity_frame(renderer2, cam0)
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

    # ----- interleaved timing rounds -----
    def set_flash(on):
        nerf2.flash = on

    def set_fsig(on):
        nerf2.march_overrides = (
            {**saved_overrides, **FLASH_SIG_OVERRIDES} if on
            else saved_overrides)

    paths = [
        ("unbaked", renderer, lambda on: None),
        ("baked", renderer2, lambda on: None),
        ("flash", renderer2, set_flash),
        ("flash_sigcolor", renderer2, set_fsig),
    ]
    fps_rounds = {name: [] for name, _, _ in paths}
    for _ in range(1 if quick else N_ROUNDS):
        for name, rend, toggle in paths:
            toggle(True)
            fps_rounds[name].append(time_orbit(rend))
            toggle(False)
    fps = {name: max(v) for name, v in fps_rounds.items()}

    # ----- reference-compatible config (tcnn default L=16 F=2 T=2^19):
    # unbaked AND bake()+flash (the snapshot-compat fast path) -----
    ref = {}
    if not quick:
        from nerf_glasses_tpu.config import NGPConfig
        snap_ref = os.path.join(CACHE, "bench_head_ref_v1.msgpack")
        if not os.path.exists(snap_ref):
            build_bench_snapshot(snap_ref, NGPConfig())
        renderer3, nerf3 = make_renderer(snap_ref)
        cam3 = cam_snapshot(renderer3)
        frame_ref_unb = fidelity_frame(renderer3, cam3)
        nerf3.bake(BAKE_RES, feat_resolution=FEAT_RES)
        nerf3.flash = True
        frame_ref_flash = fidelity_frame(renderer3, cam3)
        psnr_ref_flash = psnr(frame_ref_flash, frame_ref_unb)
        nerf3.flash = False
        fps_ref_unb = []
        fps_ref_flash = []
        for _ in range(2):
            fps_ref_unb.append(time_orbit(renderer3, n_frames=3))
            nerf3.flash = True
            fps_ref_flash.append(time_orbit(renderer3))
            nerf3.flash = False
        ref = {
            "fps_ref_config_L16_T19": round(max(fps_ref_unb), 3),
            "fps_ref_config_flash": round(max(fps_ref_flash), 3),
            "psnr_ref_flash_vs_unbaked_db": round(psnr_ref_flash, 2),
        }

    # ----- training throughput + trained-content legs -----
    train_metrics = {}
    trained_scene = {}
    if not quick:
        sps = bench_training_throughput()
        train_metrics = {
            "train_steps_per_sec": round(sps, 2),
            "train_10k_steps_projected_min": round(10000.0 / sps / 60.0, 2),
        }
        trained_scene = bench_trained_scene()

    # headline = fastest path whose fidelity vs the exact render holds
    # (35 dB internal gate, well inside BASELINE.md's 0.5 dB budget)
    candidates = [("flash", fps["flash"], psnr_flash),
                  ("flash_sigcolor", fps["flash_sigcolor"], psnr_fsig),
                  ("baked", fps["baked"], psnr_bake),
                  ("unbaked", fps["unbaked"], 99.0)]
    name, fps_head, _ = max(
        (c for c in candidates if c[2] >= 35.0), key=lambda c: c[1])
    rounds = fps_rounds[name]
    noise = (max(rounds) / min(rounds)) if len(rounds) > 1 else 1.0

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
            # ray-DP with zero collectives (parallel/sharding.py's
            # render_hybrid_sharded, equivalence-tested on an 8-device
            # mesh), so 8 chips scale ~linearly. NAIVE extrapolation —
            # no 8-chip hardware here.
            "fps_v5e8_raydp_extrapolated": round(fps_head * 8.0, 1),
            "timing_noise_max_over_min": round(noise, 3),
            "timing_rounds": [round(v, 3) for v in rounds],
            "fps_unbaked": round(fps["unbaked"], 3),
            "fps_baked": round(fps["baked"], 3),
            "fps_flash": round(fps["flash"], 3),
            "fps_flash_sigcolor": round(fps["flash_sigcolor"], 3),
            "psnr_baked_vs_unbaked_db": round(psnr_bake, 2),
            "psnr_flash_vs_unbaked_db": round(psnr_flash, 2),
            "psnr_flash_sigcolor_vs_unbaked_db": round(psnr_fsig, 2),
            "psnr_vs_golden_db": round(psnr_golden, 2),
            **ref,
            **train_metrics,
            **{f"trained_scene_{k}" if not k.startswith(("psnr", "fps"))
               else k: v for k, v in trained_scene.items()},
            "resolution": f"{W}x{H}",
            "mesh_supersample": 2,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
