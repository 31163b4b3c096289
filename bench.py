"""Benchmark: hybrid NeRF + glasses render at 720p on one TPU chip.

Mirrors the reference's headline scenario (volume/render.py orbit loop at
1280x720: NeRF head + glasses.gltf mesh at 2x supersampling) — measured
on TRAINED content: a capture rendered by the repo's own mesh renderer,
trained by the repo's own trainer (bench_scene.py), evaluated against
HELD-OUT views. The de-facto reference metric is the live hybrid loop on
a trained capture (volume/render.py:245-261), so that is the headline.

DELIVERY CONTRACT (r4 post-mortem: the bench outgrew its ~30-minute
driver budget and printed nothing before the kill):
  - A full JSON result line is printed (flushed) after EVERY completed
    phase, with "partial": true until the last one. The driver parses
    the LAST line, so even a timeout records the best result so far.
  - The headline phase runs FIRST: the first JSON line lands as soon as
    the trained-hybrid timing finishes (~minutes, not at the end).
  - Each snapshot is baked ONCE (Testbed.adopt_bake shares the tables
    between the holdout gate and the hybrid renderer); baking is
    device-resident end to end (ops/bake.py — the r4 host-side brick
    pack alone cost ~32 s x 4 bakes).
  - Phases run strictly sequentially and release their device arrays
    before the next phase (three 640^3 bakes do not fit HBM together).
  - The trained snapshot ships in-tree (assets/trained/), so a fresh
    checkout performs ZERO training steps before the headline.
  - The wide diagnostic ladder (baked / flash_sigcolor blob legs,
    4-view holdout) runs only under --full; the default run keeps the
    phases that carry recorded claims.

Phases (each ends with an emitted JSON line):
  1. HEADLINE — trained NeRF + glasses.gltf on the fastest path that
     meets the fidelity budget (budget gate below), 720p orbit fps.
  2. procedural blob (NGPConfig.native_fast, weight-hacked opaque
     head): unbaked golden-pinned frame + unbaked/flash fps ladder.
  3. reference-compatible NGPConfig() (L=16, F=2, T=2^19 — the tcnn
     default a real instant-ngp snapshot carries, testbed.cu:57-101):
     unbaked AND bake()+flash fps.
  4. multi-cascade (aabb_scale=4) snapshot: baked-pyramid fast path
     (bake_grids_cascades + deferred shade) with a vs-exact PSNR gate —
     the reference renders any aabb_scale at full speed
     (testbed.cu:1027-1118), so the fast path must cover it too.
  5. training throughput: steps/sec of the native trainer
     (train_chunk-dispatched), with and without transmittance-prefix
     sample compaction, + projected minutes for the reference train.py
     contract's 10k steps (volume/train.py:11-12).

Fidelity gates:
  - BUDGET GATE (decides the headline path): a fast path qualifies only
    if its trained-scene holdout PSNR is within BUDGET_DB (0.5 dB,
    BASELINE.md) of the exact (unbaked) renderer's holdout PSNR —
    measured on held-out views the trainer never saw. Candidate bundles
    are probed in speed order and the FIRST within budget wins (later,
    slower candidates are not rendered); if none qualifies the headline
    falls back to the exact renderer.
  - 35 dB smoke bound: the blob flash path must stay within 35 dB of
    the exact render of the same frame (structural breakage check).
  - psnr_vs_golden pins the unbaked blob output against a stored golden.

Timing note: phases are sequential (not interleaved across phases), so
cross-phase fps ratios carry the bench machine's 1.5-2x run-to-run
drift; `timing_noise_max_over_min` reports the headline leg's own
spread across its N_ROUNDS interleaved rounds.

Prints one JSON line per phase; the LAST line is the result:
  {"metric": ..., "value": fps, "unit": "fps", "vs_baseline": N, ...}
vs_baseline is measured against the BASELINE.md target of >= 30 FPS at
720p (the reference repo publishes no absolute numbers).
"""

import json
import os
import sys
import time

import numpy as np

W, H = 1280, 720
# Flash-path bake: sigma brick resolution is fps-free (tools/
# profile_bakeres.py: 512^3 = 256^3 rate) and drives the trained-scene
# holdout gap; with the r4 log-space bake (exp after trilerp) the
# holdout ladder measured 512: 38.35 dB / 640: 38.51 / 768: 38.57 vs
# 38.81 exact (tools/psnr_trained_attrib.py) — 640^3 sigma (2.1 GB
# bricks) + 384^3 features (1.8 GB bf16) buys 0.20 dB of margin under
# the 0.5 dB budget gate. 512^3 features would cost 4.3 GB.
BAKE_RES, FEAT_RES = 640, 384
MC_BAKE_RES = 256     # per-cascade pyramid resolution for the
                      # aabb_scale=4 leg (3 cascades; gated vs exact)
BUDGET_DB = 0.5       # BASELINE.md: fast path within 0.5 dB of exact
N_FRAMES = 24         # frames per timing leg (the tunnel's ~77 ms drain
                      # roundtrip amortizes over the leg: 8 frames left
                      # ~10 ms/frame of fetch latency in every number,
                      # 24 leaves ~3 — measured on the stripped-march
                      # floor probe, tools/profile_floor3.py r24 leg:
                      # 57.5 vs 62.6 ms/frame. The drain is a tunnel
                      # artifact, absent on locally-attached TPUs)
N_FRAMES_SLOW = 4     # frames per round for the ~1-2 fps unbaked legs
N_ROUNDS = 3          # rounds for the headline leg (noise stat)
N_ROUNDS_AUX = 2      # rounds for the non-headline timed legs
GLASSES = "/root/reference/nerf_mesh_renderer/assets/meshes/glasses/glasses.gltf"
ROOT = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(ROOT, "tests", "goldens", "bench_720p_golden.png")
CACHE = os.path.join(ROOT, "assets", "cache")

# Candidate fast bundles for the trained headline, in speed order.
# Each is (name, flash flag, march_overrides on top of the flash bundle).
#   flash          — deferred color: ONE feature-grid eval per ray at the
#                    dominant sample (fastest; approximation documented
#                    at MarchOptions.deferred_color)
#   flash_featcolor— per-sample color from the baked feature grid: exact
#                    compositing structure, feature-quantization cost
#   baked_sigcolor — per-sample color from the full network, sigma from
#                    the baked bricks (no flash coarse init)
TRAINED_CANDIDATES = [
    ("flash", True, {}),
    ("flash_featcolor", True, {"deferred_color": False, "feat_color": True}),
    ("baked_sigcolor", False, {}),
]

T0 = time.perf_counter()


def emit(result: dict, partial: bool = True):
    """Print the current best-so-far JSON line (the driver parses the
    LAST line — incremental emission is the r4 rc=124 fix)."""
    out = dict(result)
    out["extra"] = dict(out.get("extra", {}))
    out["extra"]["elapsed_s"] = round(time.perf_counter() - T0, 1)
    if partial:
        out["extra"]["partial"] = True
    else:
        out["extra"].pop("partial", None)
    print(json.dumps(out), flush=True)


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
    if cfg.max_cascade > 0:
        # cascaded occupancy: the head in cascade 0 plus an off-cube
        # blob in the top cascade (cascade c spans 0.5 +- 0.5*2^c), so
        # the render marches real outer-cascade content
        n_casc = cfg.max_cascade + 1
        side = float(1 << cfg.max_cascade)
        grid = np.concatenate(
            [grid, np.zeros((n_casc - 1,) + grid.shape[1:], np.float32)])
        px = (x - 0.5) * side + 0.5     # top-cascade local -> raw coords
        py = (y - 0.5) * side + 0.5
        pz = (z - 0.5) * side + 0.5
        rb = np.sqrt((px - 0.5) ** 2 + (py - 0.5) ** 2 + (pz - 2.0) ** 2)
        grid[-1][rb < 0.3] = 0.05

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
    half = 0.5 * cfg.aabb_scale
    ds.render_aabb = BoundingBox([0.5 - half] * 3, [0.5 + half] * 3)
    ds.aabb_scale = cfg.aabb_scale
    aabb = ds.render_aabb
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


def time_leg(renderer, n_frames=N_FRAMES, rounds=N_ROUNDS_AUX):
    """-> (best fps, per-round list)."""
    vals = [time_orbit(renderer, n_frames=n_frames) for _ in range(rounds)]
    return max(vals), vals


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


# ---------------------------------------------------------------------------
# Phase 1: trained content (headline)
# ---------------------------------------------------------------------------

def trained_holdout_and_bundle(n_views: int):
    """Trained-content holdout evaluation + budget-gated bundle pick.

    Renders `n_views` held-out views with the exact renderer, then
    probes TRAINED_CANDIDATES in speed order and picks the FIRST bundle
    whose holdout PSNR is within BUDGET_DB of the exact renderer's —
    slower candidates after a pass are never rendered. -> (metrics
    dict, (name, flash, overrides-or-None), snapshot path, baked
    Testbed to adopt_bake from)."""
    import bench_scene
    from nerf_glasses_tpu.models.testbed import Testbed

    snap = bench_scene.get_trained_snapshot(CACHE)
    meta = {}
    if os.path.exists(snap + ".json"):
        with open(snap + ".json") as f:
            meta = json.load(f)

    cams, gts = bench_scene.holdout_ground_truth()
    cams, gts = cams[:n_views], gts[:n_views]
    tb = Testbed()
    tb.load_snapshot(snap)
    tb.background_color = np.array([1.0, 1.0, 1.0, 1.0], np.float32)
    Wc = bench_scene.W

    def render_views():
        outs = []
        for cam in cams:
            tb.camera_matrix = np.asarray(cam, np.float32)
            outs.append(tb.render(Wc, Wc, spp=2, linear=False)[..., :3])
        return outs

    def mean_psnr(xs, ys):
        return float(np.mean([psnr(a, b) for a, b in zip(xs, ys)]))

    unb = render_views()
    psnr_unb = mean_psnr(unb, gts)

    tb.bake(BAKE_RES, feat_resolution=FEAT_RES)
    saved = dict(tb.march_overrides)
    probed = {}
    picked = None
    for name, flash_on, overrides in TRAINED_CANDIDATES:
        tb.flash = flash_on
        tb.march_overrides = {**saved, **overrides}
        out = render_views()
        probed[name] = {
            "vs_holdout_db": round(mean_psnr(out, gts), 2),
            "vs_unbaked_db": round(mean_psnr(out, unb), 2),
        }
        if probed[name]["vs_holdout_db"] >= psnr_unb - BUDGET_DB:
            picked = (name, flash_on, dict(overrides))
            break                      # speed order: first pass wins
    tb.flash = False
    tb.march_overrides = saved

    if picked is None:
        picked = ("unbaked_exact", False, None)
    name = picked[0]
    psnr_fast = (probed[name]["vs_holdout_db"] if name in probed
                 else round(psnr_unb, 2))
    out = {
        "train_steps": meta.get("steps"),
        "train_contract_s": (round(meta["train_s"], 1)
                             if "train_s" in meta else None),
        "train_final_loss": meta.get("final_loss"),
        "settle_steps": meta.get("settle_steps"),
        "holdout_views": n_views,
        "psnr_trained_unbaked_vs_holdout_db": round(psnr_unb, 2),
        # the headlined fast path's holdout PSNR (budget-gated)
        "psnr_trained_flash_vs_holdout_db": psnr_fast,
        "holdout_budget_db": BUDGET_DB,
        "holdout_budget_met": name != "unbaked_exact",
        "headline_bundle": name,
        "bundle_probes": probed,
    }
    return out, picked, snap, tb


def phase_trained(result, full: bool):
    """Headline phase: budget gate + 720p hybrid fps on trained content.
    Returns the device arrays' owners so the caller can release them."""
    trained_scene, picked, trained_snap, tb = trained_holdout_and_bundle(
        n_views=4 if full else 2)
    bundle_name, bundle_flash, bundle_overrides = picked

    # hybrid on trained content: trained NeRF + glasses mesh (the
    # paper's product scenario: thin mesh temples occluded by the
    # head, volume/render.py:245-261)
    renderer4, nerf4 = make_renderer(trained_snap)
    nerf4.render_aabb.min = np.array([0.1, 0.1, 0.1], np.float32)
    nerf4.render_aabb.max = np.array([0.9, 0.9, 0.9], np.float32)
    # the reference flow cleans stray density clusters before
    # rendering (render.py optional remove_floaties; essential on a
    # real capture)
    renderer4.remove_floaties()
    cam4 = cam_snapshot(renderer4)
    frame4_unb = fidelity_frame(renderer4, cam4)
    if bundle_overrides is not None:
        nerf4.adopt_bake(tb)           # ONE bake per snapshot
        nerf4.flash = bundle_flash
        nerf4.march_overrides = {**nerf4.march_overrides,
                                 **bundle_overrides}
    tb.unbake()
    frame4_fast = fidelity_frame(renderer4, cam4)
    trained_scene["psnr_trained_hybrid_fast_vs_unbaked_db"] = round(
        psnr(frame4_fast, frame4_unb), 2)

    fps_head, rounds = time_leg(renderer4, rounds=N_ROUNDS)
    noise = (max(rounds) / min(rounds)) if len(rounds) > 1 else 1.0

    result.update({
        "metric": (f"hybrid_720p_fps (TRAINED head NeRF + glasses.gltf, "
                   f"1 chip, {bundle_name} path, holdout budget "
                   f"{BUDGET_DB} dB met: "
                   f"{trained_scene['holdout_budget_met']})"),
        "value": round(fps_head, 3),
        "unit": "fps",
        "vs_baseline": round(fps_head / 30.0, 4),
    })
    result["extra"].update({
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
        "fps_trained_hybrid_flash": round(fps_head, 3),
        "trained_hybrid_timing_rounds": [round(v, 3) for v in rounds],
        "resolution": f"{W}x{H}",
        "mesh_supersample": 2,
    })
    for k, v in trained_scene.items():
        key = (k if k.startswith(("psnr", "fps", "holdout", "headline",
                                  "bundle"))
               else f"trained_scene_{k}")
        result["extra"][key] = v
    return renderer4, tb


# ---------------------------------------------------------------------------
# Phase 2: procedural blob ladder
# ---------------------------------------------------------------------------

def phase_blob(result, full: bool, quick: bool):
    os.makedirs(CACHE, exist_ok=True)
    snap = os.path.join(CACHE, "bench_head_v2.msgpack")
    if not os.path.exists(snap):
        build_bench_snapshot(snap)

    renderer, nerf = make_renderer(snap)
    cam0 = cam_snapshot(renderer)
    frame_unbaked = fidelity_frame(renderer, cam0)

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
    result["extra"]["psnr_vs_golden_db"] = round(psnr_golden, 2)

    nerf.bake(BAKE_RES, feat_resolution=FEAT_RES)
    nerf.flash = True
    frame_flash = fidelity_frame(renderer, cam0)
    psnr_flash = psnr(frame_flash, frame_unbaked)
    result["extra"]["psnr_blob_flash_vs_unbaked_db"] = round(psnr_flash, 2)

    fps_flash, _ = time_leg(renderer)
    result["extra"]["fps_blob_flash"] = round(fps_flash, 3)

    if full or quick:
        nerf.flash = False
        frame_baked = fidelity_frame(renderer, cam0)
        result["extra"]["psnr_blob_baked_vs_unbaked_db"] = round(
            psnr(frame_baked, frame_unbaked), 2)
        fps_baked, _ = time_leg(renderer)
        result["extra"]["fps_blob_baked"] = round(fps_baked, 3)

        saved = dict(nerf.march_overrides)
        nerf.march_overrides = {**saved, **FLASH_SIG_OVERRIDES}
        frame_fsig = fidelity_frame(renderer, cam0)
        result["extra"]["psnr_blob_flash_sigcolor_vs_unbaked_db"] = round(
            psnr(frame_fsig, frame_unbaked), 2)
        fps_fsig, _ = time_leg(renderer)
        result["extra"]["fps_blob_flash_sigcolor"] = round(fps_fsig, 3)
        nerf.march_overrides = saved
        nerf.flash = True

    nerf.unbake()
    nerf.flash = False
    fps_unb, _ = time_leg(renderer, n_frames=N_FRAMES_SLOW, rounds=1)
    result["extra"]["fps_blob_unbaked"] = round(fps_unb, 3)

    if quick:
        # --quick headline: fastest blob path within the 35 dB smoke gate
        candidates = [("flash", fps_flash, psnr_flash)]
        if "fps_blob_baked" in result["extra"]:
            candidates += [
                ("baked", result["extra"]["fps_blob_baked"],
                 result["extra"]["psnr_blob_baked_vs_unbaked_db"]),
                ("flash_sigcolor", result["extra"]["fps_blob_flash_sigcolor"],
                 result["extra"]["psnr_blob_flash_sigcolor_vs_unbaked_db"]),
            ]
        candidates.append(("unbaked", fps_unb, 99.0))
        head, fps_head, _ = max(
            (c for c in candidates if c[2] >= 35.0), key=lambda c: c[1])
        result.update({
            "metric": (f"hybrid_720p_fps (blob head NeRF + glasses.gltf, "
                       f"1 chip, {head} path)"),
            "value": round(fps_head, 3),
            "unit": "fps",
            "vs_baseline": round(fps_head / 30.0, 4),
        })
        result["extra"].update({
            "frame_ms": round(1000.0 / fps_head, 2),
            "resolution": f"{W}x{H}",
            "mesh_supersample": 2,
        })
    return renderer


# ---------------------------------------------------------------------------
# Phase 3: reference-compatible config
# ---------------------------------------------------------------------------

def phase_ref_config(result):
    from nerf_glasses_tpu.config import NGPConfig
    snap_ref = os.path.join(CACHE, "bench_head_ref_v1.msgpack")
    if not os.path.exists(snap_ref):
        build_bench_snapshot(snap_ref, NGPConfig())
    renderer3, nerf3 = make_renderer(snap_ref)
    cam3 = cam_snapshot(renderer3)
    frame_ref_unb = fidelity_frame(renderer3, cam3)
    fps_unb, _ = time_leg(renderer3, n_frames=N_FRAMES_SLOW, rounds=1)
    nerf3.bake(BAKE_RES, feat_resolution=FEAT_RES)
    nerf3.flash = True
    frame_ref_flash = fidelity_frame(renderer3, cam3)
    result["extra"]["psnr_ref_flash_vs_unbaked_db"] = round(
        psnr(frame_ref_flash, frame_ref_unb), 2)
    fps_flash, _ = time_leg(renderer3)
    result["extra"]["fps_ref_config_L16_T19"] = round(fps_unb, 3)
    result["extra"]["fps_ref_config_flash"] = round(fps_flash, 3)
    return renderer3


# ---------------------------------------------------------------------------
# Phase 4: multi-cascade snapshot
# ---------------------------------------------------------------------------

def phase_multicascade(result):
    from nerf_glasses_tpu.config import NGPConfig
    snap_mc = os.path.join(CACHE, "bench_head_mc4_v1.msgpack")
    if not os.path.exists(snap_mc):
        build_bench_snapshot(snap_mc, NGPConfig.native_fast(aabb_scale=4))
    renderer5, nerf5 = make_renderer(snap_mc)
    # march the full 4-cube so outer cascades are on the ray path
    nerf5.render_aabb.min = np.array([-1.5] * 3, np.float32)
    nerf5.render_aabb.max = np.array([2.5] * 3, np.float32)
    cam5 = cam_snapshot(renderer5)
    frame_mc_unb = fidelity_frame(renderer5, cam5)
    nerf5.bake(MC_BAKE_RES)
    nerf5.flash = True          # multicascade: baked pyramid +
    frame_mc_fast = fidelity_frame(renderer5, cam5)  # deferred shade
    result["extra"]["psnr_multicascade_fast_vs_unbaked_db"] = round(
        psnr(frame_mc_fast, frame_mc_unb), 2)
    result["extra"]["multicascade_bake_res"] = MC_BAKE_RES
    fps_mc, _ = time_leg(renderer5)
    result["extra"]["fps_multicascade_baked"] = round(fps_mc, 3)
    return renderer5


# ---------------------------------------------------------------------------
# Phase 5: training throughput
# ---------------------------------------------------------------------------

def phase_training(result):
    """steps/sec of the native trainer on the capture dataset
    (train_chunk dispatch; the train.py contract is 10k steps).

    Two regimes, both with the DEFAULT TrainOptions:
      - from scratch (320 settle + 192 timed): the early/carving regime
        every run pays first — comparable with the r3/r4 recorded
        numbers;
      - resumed from the trained snapshot (Trainer.load_snapshot): the
        converged regime where the adaptive compaction gate is open —
        the rate the bulk of a 10k-step contract runs at.
    The 10k projection charges the scratch rate until the gate-opening
    step observed in the resumed probe's gate state (or the whole run
    when compaction is off)."""
    import bench_scene
    from nerf_glasses_tpu.config import NGPConfig
    from nerf_glasses_tpu.train.trainer import TrainOptions, Trainer

    ds = bench_scene.build_capture_dataset()
    opts = TrainOptions(config=NGPConfig.native_fast())
    n = 192

    tr = Trainer(ds, opts, seed=3)
    tr.train(320)                      # compile + settle past warmup
    t0 = time.perf_counter()
    tr.train(n)
    sps = n / (time.perf_counter() - t0)
    result["extra"]["train_steps_per_sec"] = round(sps, 2)

    sps_settled = sps
    if opts.compact_keep_fraction > 0.0:
        tr2 = Trainer(ds, opts, seed=3)
        tr2.load_snapshot(bench_scene.get_trained_snapshot(CACHE))
        tr2.train(64)                  # compile post-gate variant
        t0 = time.perf_counter()
        tr2.train(n)
        sps_settled = n / (time.perf_counter() - t0)
        result["extra"]["train_steps_per_sec_settled"] = round(
            sps_settled, 2)
        result["extra"]["train_compaction_active"] = tr2._compact_ready

    # 10k projection: scratch rate until the adaptive gate opens
    # (measured 768 on this scene, tools/ab_compaction.py r5), settled
    # rate beyond
    gate = 768 if sps_settled != sps else 10000
    proj_s = min(gate, 10000) / sps + max(10000 - gate, 0) / sps_settled
    result["extra"]["train_10k_steps_projected_min"] = round(
        proj_s / 60.0, 2)


# ---------------------------------------------------------------------------

def main():
    import jax
    quick = "--quick" in sys.argv
    full = "--full" in sys.argv
    # Persistent compile cache: the axon tunnel compiles big march
    # graphs in 100-700 s EACH — a cold cache alone can blow the
    # driver's ~30-min bench budget (BENCH_r04 rc=124). The driver runs
    # bench.py in this working tree (BENCH_r0N.json `cmd`), so the
    # gitignored cache dir persists across rounds and the driver run is
    # warm; a fresh clone pays the compiles once, bounded by the
    # incremental emission above. Override with NMR_JAXCACHE.
    cache_dir = os.environ.get(
        "NMR_JAXCACHE", os.path.join(CACHE, "jaxcache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    result = {"metric": "hybrid_720p_fps", "value": 0.0, "unit": "fps",
              "vs_baseline": 0.0, "extra": {}}

    if quick:
        phase_blob(result, full, quick=True)
        emit(result, partial=False)
        return

    # Phase 1: HEADLINE (trained content) — first JSON line lands here
    renderer4, tb = phase_trained(result, full)
    emit(result)
    del renderer4, tb                  # release baked tables (HBM)

    # Phase 2: blob ladder + golden pin
    renderer = phase_blob(result, full, quick=False)
    emit(result)
    del renderer

    # Phase 3: reference-compatible config
    renderer3 = phase_ref_config(result)
    emit(result)
    del renderer3

    # Phase 4: multi-cascade
    renderer5 = phase_multicascade(result)
    emit(result)
    del renderer5

    # Phase 5: training throughput
    phase_training(result)
    emit(result, partial=False)


if __name__ == "__main__":
    main()
