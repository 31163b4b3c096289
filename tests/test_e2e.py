"""Integrated end-to-end: the complete reference user journey.

train.py flow (disk dataset -> snapshot) then render.py flow (load
snapshot, envmap, landmarks->placement, hybrid orbit frames, floaty
removal) — everything a reference user touches, in one run.
"""

import json
import math
import os

import numpy as np
import pytest

from tests.test_apps import write_disk_dataset
from tests.helpers import write_quad_gltf


@pytest.mark.slow
def test_full_user_journey(tmp_path):
    # ---- 1. train on a disk dataset (train_app flow) -------------------
    from nerf_glasses_tpu.io.dataset import load_transforms_json
    from nerf_glasses_tpu.config import NGPConfig
    from nerf_glasses_tpu.train.trainer import TrainOptions, Trainer

    data_dir = write_disk_dataset(tmp_path, n_images=8)
    ds = load_transforms_json(str(data_dir))
    cfg = NGPConfig(n_levels=8, log2_hashmap_size=13, base_resolution=16,
                    per_level_scale=1.61)
    tr = Trainer(ds, TrainOptions(config=cfg, rays_per_batch=1024,
                                  samples_per_ray=64,
                                  grid_samples_per_update=1 << 15,
                                  compute_dtype="float32"))
    tr.occ_warmup_steps = 64
    tr.train(250)
    assert tr.loss < 0.05
    # the DISK-loaded dataset must reconstruct localized geometry too
    # (guards the loader's camera/image conventions end to end)
    tb0 = tr.to_testbed()
    g = np.linspace(0.05, 0.95, 16)
    pts = np.stack(np.meshgrid(g, g, g, indexing="ij"),
                   -1).reshape(-1, 3).astype(np.float32)
    hot = pts[tb0.density_at(pts) > 5.0]
    assert len(hot) > 20
    assert (np.linalg.norm(hot - 0.5, axis=1) > 0.28).mean() < 0.05
    snap = str(tmp_path / "nerf.msgpack")
    tr.save_snapshot(snap)

    # ---- 2. render.py flow ---------------------------------------------
    import pynmr as nmr
    renderer = nmr.NerfMeshRenderer(48, 36)
    # envmap background
    from PIL import Image
    env = np.full((8, 16, 3), 128, np.uint8)
    Image.fromarray(env).save(tmp_path / "sky.png")
    renderer.envmap(str(tmp_path / "sky.png"))

    nerf = renderer.load_nerf(snap)
    nerf.march_overrides = {"max_rounds": 64, "jitter": False}
    nerf.render_aabb.min = np.array([0.05, 0.05, 0.05], np.float32)
    nerf.render_aabb.max = np.array([1, 1, 1], np.float32)

    # offscreen Testbed.render like render_image() in render.py
    im = nerf.render(48, 36, linear=False)
    assert im.shape == (36, 48, 4) and np.isfinite(im).all()
    # the trained red sphere is visible
    assert (im[..., 0] - im[..., 1]).max() > 0.1

    # glasses placement via the placement math on synthetic landmarks
    from nerf_glasses_tpu.utils.placement import compute_glasses_placement
    lms = [np.array([0.0, 0.02, 0.15]), np.array([0, 0.01, 0.16]),
           np.array([0, 0.0, 0.17]),
           np.array([-0.12, 0.05, 0.0]), np.array([0.12, 0.05, 0.0]),
           np.array([-0.12, 0.02, 0.0]), np.array([0.12, 0.02, 0.0]),
           np.array([-0.06, 0.04, 0.12]), np.array([0.06, 0.04, 0.12])]
    gl = np.array([-0.732, -1.002, -0.057])
    gr = np.array([0.732, -1.002, -0.057])
    t, s, rq = compute_glasses_placement(lms, gl, gr)
    quad = write_quad_gltf(tmp_path / "glasses.gltf")
    mesh = renderer.load_mesh(str(quad), t=t, s=s, r=rq)
    assert mesh is not None

    # orbit render loop (the avg-frame-time loop of render.py)
    a = 0.0
    for _ in range(3):
        a += 0.03
        renderer.orbit(-math.sin(a * 1.733) / 100,
                       math.cos(a * 1.733) / 200, 0)
        assert renderer.frame()
    img = renderer.display_image()
    assert np.isfinite(img).all()
    assert renderer.frame_ms.ema_val > 0

    # ---- 3. floaty removal + density dump round trip -------------------
    renderer.remove_floaties()
    f = str(tmp_path / "grid.bin")
    renderer.dump_density_grid_file(f)
    assert os.path.getsize(f) == 8 * 128 ** 3
    renderer.load_density_grid_file(f)

    # ---- 4. collide settling -------------------------------------------
    node = mesh.nodes[0]
    node.translation = np.array([0.0, 0.35, 0.0], np.float32)
    node.rotation = np.array([0.7071068, 0.7071068, 0, 0], np.float32)
    renderer.collide(np.array([0, -1, 0], np.float32), node)

    # ---- 5. save a frame ------------------------------------------------
    renderer.save_frame(str(tmp_path / "out.png"))
    assert os.path.exists(tmp_path / "out.png")
