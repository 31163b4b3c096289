"""Trained-content benchmark scene: capture -> train -> evaluate.

The headline bench scene is a weight-hacked procedural blob; fidelity
gates against it are self-referential. This module provides the real
capture-train-render loop the reference product is built around
(volume/train.py + render.py): render views of a textured mesh with the
repo's OWN mesh renderer (ops/triangles.py), train a snapshot with the
repo's OWN trainer (train/trainer.py), and evaluate PSNR against
HELD-OUT views — the metric BASELINE.md means by "within 0.5 dB of the
reference frames" (the reference frames themselves are git-lfs stubs).

The trained snapshot is cached under assets/cache; delete it (or bump
SCENE_VERSION) to retrain.
"""

from __future__ import annotations

import math
import os

import numpy as np

from nerf_glasses_tpu.utils.camera import V_LENGTH_QUIRK, look_to, pack_camera

SCENE_VERSION = 6   # v6: density grid stores optical thickness (the
                    # upstream scale; v5 grids were raw sigma, ~600x
                    # hotter than the 0.01 occupancy threshold expects)
W = H = 400
N_TRAIN = 24
N_HOLDOUT = 4
RADIUS = 1.15       # camera ring radius (mesh world units)
ELEV = 0.18


# ---------------------------------------------------------------------------
# Synthetic capture object: a textured UV sphere "head"
# ---------------------------------------------------------------------------

def _checker_texture(n: int = 64, sq: int = 8) -> np.ndarray:
    """(n, n, 4) float32 linear color: colorful checker (high-frequency
    content so training quality is actually measurable)."""
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    c = ((xx // sq) + (yy // sq)) % 2
    r = np.where(c, 0.85, 0.15) * (0.5 + 0.5 * xx / n)
    g = np.where(c, 0.25, 0.7) * (0.5 + 0.5 * yy / n)
    b = np.where(c, 0.2, 0.9)
    return np.stack([r, g, b, np.ones_like(r)], -1).astype(np.float32)


def make_head_scene(radius: float = 0.24, center=(0.0, 0.03, 0.0),
                    n_lat: int = 48, n_lon: int = 64):
    """UV-sphere GltfScene in mesh-world coordinates (NGP - 0.5)."""
    from nerf_glasses_tpu.io.gltf import (GltfMaterial, GltfMesh, GltfNode,
                                          GltfPrimitive, GltfScene)
    lat = np.linspace(-0.5 * math.pi, 0.5 * math.pi, n_lat)
    lon = np.linspace(0.0, 2.0 * math.pi, n_lon)
    ll, tt = np.meshgrid(lon, lat)                       # (n_lat, n_lon)
    x = np.cos(tt) * np.cos(ll)
    y = np.sin(tt)
    z = np.cos(tt) * np.sin(ll)
    pos = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
    normals = pos.copy()
    pos = pos * radius + np.asarray(center, np.float32)
    # tangent along +longitude
    tx = -np.sin(ll)
    tz = np.cos(ll)
    tan = np.stack([tx, np.zeros_like(tx), tz, np.ones_like(tx)],
                   -1).reshape(-1, 4).astype(np.float32)
    uv = np.stack([ll / (2 * math.pi), tt / math.pi + 0.5],
                  -1).reshape(-1, 2).astype(np.float32)
    idx = []
    for i in range(n_lat - 1):
        for j in range(n_lon - 1):
            a = i * n_lon + j
            b = a + 1
            c = a + n_lon
            d = c + 1
            # outward winding (counter-clockwise seen from outside) so
            # back-face culling keeps the front hemisphere
            idx += [a, c, b, b, c, d]
    indices = np.asarray(idx, np.uint32)

    mat = GltfMaterial(name="head", metallic_factor=0.0,
                       roughness_factor=0.8,
                       base_color_texture=_checker_texture())
    prim = GltfPrimitive(positions=pos, normals=normals, tangents=tan,
                         texcoords=uv, indices=indices, material=mat)
    node = GltfNode()
    node.name = "head"
    node.mesh = GltfMesh(primitives=[prim])
    scene = GltfScene()
    scene.nodes = [node]
    return scene


# ---------------------------------------------------------------------------
# Capture rig
# ---------------------------------------------------------------------------

def capture_cameras(n: int, phase: float = 0.0):
    """-> (packed (n,3,4) mesh-world cams for the mesh pass / NeRF
    render, xforms (n,3,4) NGP-space training matrices, focal px).

    The packed matrix bakes the fov quirk (tan(22.5 rad) column scaling,
    nerf_mesh_renderer.cu:919-939) that camera_rays/the mesh pass expect;
    the training matrix is the plain [right, up, fwd, eye] form
    _gen_rays expects, with the focal that reproduces the same pixel
    grid: fx = W / (2 * v_length)."""
    packed = []
    xforms = []
    look_at = np.array([0.0, 0.03, 0.0], np.float32)
    for i in range(n):
        a = 2.0 * math.pi * i / n + phase
        eye = np.array([RADIUS * math.cos(a), ELEV, RADIUS * math.sin(a)],
                       np.float32)
        right, up, fwd = look_to(eye, look_at - eye, [0.0, 1.0, 0.0])
        packed.append(pack_camera(right, up, fwd, eye, aspect=1.0))
        m = np.zeros((3, 4), np.float32)
        m[:, 0] = right
        m[:, 1] = up
        m[:, 2] = fwd
        m[:, 3] = eye + 0.5           # mesh world -> NGP cube
        xforms.append(m)
    focal = W / (2.0 * V_LENGTH_QUIRK)
    return np.stack(packed), np.stack(xforms), focal


def render_capture_images(scenes, cams_packed):
    """Ground-truth views via the repo's own mesh renderer ->
    list of (H, W, 4) float32 linear premultiplied training targets."""
    from nerf_glasses_tpu.ops import triangles as tri_ops
    from nerf_glasses_tpu.ops.colors import srgb_to_linear
    mesh = tri_ops.build_mesh_arrays(scenes)
    xf, nm = tri_ops.instance_transforms(mesh, scenes)
    out = []
    for cam in cams_packed:
        color, _depth = tri_ops.render_mesh_pass(
            mesh, xf, nm, cam, W, H, light_pos=[1.0, 1.0, 1.0])
        color = np.asarray(color, np.float32)
        lin = np.asarray(srgb_to_linear(color[..., :3]), np.float32)
        out.append(np.concatenate([lin, color[..., 3:]], -1))
    return out


def build_capture_dataset():
    from nerf_glasses_tpu.io.dataset import ImageMetadata, NerfDataset
    from nerf_glasses_tpu.utils.bbox import BoundingBox
    scene = make_head_scene()
    cams, xforms, focal = capture_cameras(N_TRAIN)
    ds = NerfDataset()
    ds.n_images = N_TRAIN
    ds.metadata = [ImageMetadata(resolution=(W, H),
                                 focal_length=(focal, focal),
                                 principal_point=(0.5, 0.5))
                   for _ in range(N_TRAIN)]
    ds.xforms = xforms
    ds.xforms_end = xforms.copy()
    ds.paths = [f"capture_{i}" for i in range(N_TRAIN)]
    ds.images = render_capture_images([scene], cams)
    ds.render_aabb = BoundingBox([0.13, 0.16, 0.13], [0.87, 0.9, 0.87])
    ds.aabb_scale = 1
    return ds


def train_capture_snapshot(path: str, max_steps: int = 4000,
                           target_loss: float = 0.00175,
                           settle_steps: int = 3000,
                           log_every: int = 0):
    """Train the capture with the repo's own trainer and save an
    NGP-format snapshot. Two phases:

    1. contract: train_until(target_loss) — the volume/train.py stop
       criteria; its step count / wall time are the reported training
       metrics.
    2. settle: continue to `settle_steps` total. The photometric loss
       converges long before the density grid does — at the contract
       stop (~500 steps in sRGB space) the occupancy grid is still ~90%
       "fog" (under-trained low density everywhere), which makes the
       flash coarse pass mark nearly every ray and costs ~17x fps.
       Measured decay on this scene: frac(grid>0.01) 0.91 @ 500 steps ->
       0.063 @ 3000 (converged; the opaque content itself is ~6%), with
       holdout PSNR improving 30.1 -> 39.0 dB. Real captures train 10k+
       steps (volume/train.py), so the settled snapshot is the
       representative rendering workload, not the contract-stop one.
    """
    import time

    from nerf_glasses_tpu.config import NGPConfig
    from nerf_glasses_tpu.train.trainer import TrainOptions, Trainer

    ds = build_capture_dataset()
    opts = TrainOptions(config=NGPConfig.native_fast())
    tr = Trainer(ds, opts, seed=3)
    t0 = time.perf_counter()
    tr.train_until(target_loss, max_steps, log_every=log_every)
    dt = time.perf_counter() - t0
    stats = {"steps": tr.step, "train_s": dt, "final_loss": tr.loss}
    if tr.step < settle_steps:
        tr.train(settle_steps - tr.step)
    tr.save_snapshot(path)
    stats.update({"settle_steps": tr.step, "settle_final_loss": tr.loss})
    return stats


def get_trained_snapshot(cache_dir: str):
    """Trained snapshot path. Resolution order:

    1. the COMMITTED copy under assets/trained (shipped in-tree so a
       fresh checkout benches with zero training steps — the reference
       ships its dataset fixture the same way,
       /root/reference/volume/datasets/alice/);
    2. the local cache (train on first use)."""
    committed = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "assets", "trained",
                             f"trained_head_v{SCENE_VERSION}.msgpack")
    if os.path.exists(committed):
        return committed
    path = os.path.join(cache_dir,
                        f"trained_head_v{SCENE_VERSION}.msgpack")
    meta = path + ".json"
    if not os.path.exists(path):
        import json
        os.makedirs(cache_dir, exist_ok=True)
        stats = train_capture_snapshot(path)
        with open(meta, "w") as f:
            json.dump(stats, f)
    return path


def holdout_ground_truth():
    """Held-out views (never trained on): -> (cams_packed, gt_srgb list
    (H, W, 3) over a white background)."""
    from nerf_glasses_tpu.ops.colors import linear_to_srgb
    scene = make_head_scene()
    cams, _, _ = capture_cameras(N_HOLDOUT,
                                 phase=math.pi / N_TRAIN)  # between views
    imgs = render_capture_images([scene], cams)
    gts = []
    for img in imgs:
        lin = img[..., :3] + (1.0 - img[..., 3:])  # over white (linear)
        gts.append(np.asarray(linear_to_srgb(np.clip(lin, 0.0, 1.0)),
                              np.float32))
    return cams, gts
