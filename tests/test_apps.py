"""App-level parity: train_app flow on a generated on-disk dataset, the
pyngp-style Testbed training surface, envmap background, trajectory
recorder."""

import json
import math
import os

import numpy as np
import pytest

from nerf_glasses_tpu.models.testbed import Testbed
from tests.test_training import (H, W, make_synth_dataset,
                                 render_synth_image, synth_camera)


def write_disk_dataset(tmp_path, n_images=6):
    """Write a transforms.json + PNGs matching the synthetic sphere."""
    from PIL import Image
    from nerf_glasses_tpu.io.dataset import ngp_matrix_to_nerf
    from nerf_glasses_tpu import constants as C

    scale = C.NERF_SCALE
    offset = np.array([0.5, 0.5, 0.5], np.float32)
    fx = 0.9 * W
    frames = []
    for i in range(n_images):
        ngp_m = synth_camera(2 * math.pi * i / n_images)
        nerf_m = ngp_matrix_to_nerf(ngp_m, scale, offset)
        img = render_synth_image(ngp_m, fx, fx, W / 2, H / 2)
        # premultiplied linear -> sRGB byte PNG with alpha
        a = np.clip(img[..., 3:4], 1e-6, 1)
        rgb = np.clip(img[..., :3] / a, 0, 1) ** (1 / 2.2)
        rgba8 = np.concatenate([rgb, img[..., 3:4]], -1)
        arr = (np.clip(rgba8, 0, 1) * 255).astype(np.uint8)
        name = f"im_{i}.png"
        Image.fromarray(arr, "RGBA").save(tmp_path / name)
        m4 = np.eye(4, dtype=np.float32)
        m4[:3, :4] = nerf_m
        frames.append({"file_path": name,
                       "transform_matrix": m4.tolist()})
    doc = {
        "fl_x": fx, "fl_y": fx, "cx": W / 2, "cy": H / 2, "w": W, "h": H,
        "aabb_scale": 1, "scale": scale, "offset": offset.tolist(),
        "frames": frames,
    }
    with open(tmp_path / "transforms.json", "w") as f:
        json.dump(doc, f)
    return tmp_path


def test_transforms_json_roundtrip(tmp_path):
    """Dataset written in nerf space loads back to the same NGP xforms."""
    d = write_disk_dataset(tmp_path)
    from nerf_glasses_tpu.io.dataset import load_transforms_json
    ds = load_transforms_json(str(d))
    assert ds.n_images == 6
    np.testing.assert_allclose(ds.xforms[0], synth_camera(0.0), atol=1e-5)
    assert ds.images[0].shape == (H, W, 4)
    # loaded image approximates the analytic target (color-space roundtrip)
    gt = render_synth_image(synth_camera(0.0), 0.9 * W, 0.9 * W, W / 2, H / 2)
    assert abs(float(ds.images[0][..., 3].mean())
               - float(gt[..., 3].mean())) < 0.01


def test_pyngp_style_training_surface(tmp_path):
    """The reference train.py protocol: load_training_data, shall_train,
    frame() until loss target, save_snapshot (volume/train.py:14-33)."""
    import dataclasses
    d = write_disk_dataset(tmp_path)
    tb = Testbed()
    from nerf_glasses_tpu.config import NGPConfig
    tb.config = NGPConfig(n_levels=4, log2_hashmap_size=11,
                          base_resolution=16, per_level_scale=1.7)
    tb.load_training_data(str(d))
    tb.shall_train = True
    # shrink the per-step cost for CPU
    from nerf_glasses_tpu.train.trainer import TrainOptions, Trainer
    tb._trainer = Trainer(tb.dataset, TrainOptions(
        config=tb.config, rays_per_batch=512, samples_per_ray=32,
        grid_samples_per_update=1 << 12, compute_dtype="float32"))
    tb._trainer.occ_warmup_steps = 1 << 30
    losses = []
    for _ in range(30):
        assert tb.frame()
        losses.append(tb.loss)
    assert tb.training_step == 30
    assert np.isfinite(losses[-1])
    snap = tmp_path / "nerf.msgpack"
    tb.sync_from_trainer()
    tb.save_snapshot(str(snap))
    tb2 = Testbed()
    tb2.load_snapshot(str(snap))
    assert tb2.training_step == 30


def test_envmap_background(tmp_path):
    from PIL import Image
    from nerf_glasses_tpu.models.renderer import NerfMeshRenderer
    from tests.helpers import write_test_snapshot

    # green lat-long envmap
    env = np.zeros((8, 16, 3), np.uint8)
    env[..., 1] = 255
    Image.fromarray(env).save(tmp_path / "env.png")

    snap = tmp_path / "s.msgpack"
    write_test_snapshot(snap)
    r = NerfMeshRenderer(16, 12)
    nerf = r.load_nerf(str(snap))
    nerf.march_overrides = {"max_rounds": 4, "jitter": False}
    r.envmap(str(tmp_path / "env.png"))
    r.frame()
    img = r.display_image()
    # corner pixels (transparent volume) show the green envmap
    assert img[0, 0, 1] > 0.8
    assert img[0, 0, 0] < 0.2


def test_trajectory_recorder(tmp_path):
    from nerf_glasses_tpu.models.renderer import NerfMeshRenderer
    from tests.helpers import write_test_snapshot
    snap = tmp_path / "s.msgpack"
    write_test_snapshot(snap)
    r = NerfMeshRenderer(16, 12)
    nerf = r.load_nerf(str(snap))
    nerf.march_overrides = {"max_rounds": 4, "jitter": False}
    r.record_trajectory(num_images=3, out_dir=str(tmp_path))
    jpgs = [f for f in os.listdir(tmp_path) if f.startswith("trajectory_")]
    xfs = [f for f in os.listdir(tmp_path) if f.startswith("transform_")]
    assert len(jpgs) >= 3 and len(xfs) >= 3
    # transform files parse as nested lists (Eigen json format)
    with open(tmp_path / sorted(xfs)[0]) as f:
        m = json.loads(f.read())
    assert np.asarray(m).shape == (3, 4)
