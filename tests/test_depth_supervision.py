"""Depth supervision: set_training_image(depth_img=...) is stored and the
optional depth loss term places geometry at the supervised distance.

The reference dataset pipeline carries per-pixel depth
(nerf_loader.cu:756-856; python_api.cu:51-69 passes depth_img +
depth_scale through pyngp's set_image). Upstream adds
depth_supervision_lambda * loss(ray_depth, target_depth)."""

import numpy as np
import pytest

from nerf_glasses_tpu.config import NGPConfig
from nerf_glasses_tpu.io.dataset import ImageMetadata, NerfDataset
from nerf_glasses_tpu.train.trainer import (TrainOptions, Trainer,
                                            forward_rays,
                                            prepare_dataset_arrays)
from nerf_glasses_tpu.utils.bbox import BoundingBox

W = H = 32
# supervised depth: a plane deep in the cube (z ~ 0.75; entry is at
# t ~ 0.6), far from where unsupervised single-view training settles
TARGET_T = 1.35


def _frontal_dataset(with_depth):
    """One frontal camera looking +z into the unit cube: color-only
    training is ambiguous along the ray (fog at the AABB entry explains
    every pixel); depth supervision disambiguates."""
    ds = NerfDataset()
    ds.n_images = 1
    fx = fy = 1.2 * W
    ds.metadata = [ImageMetadata(resolution=(W, H), focal_length=(fx, fy),
                                 principal_point=(0.5, 0.5))]
    xf = np.zeros((1, 3, 4), np.float32)
    xf[0, :, :3] = np.eye(3)
    xf[0, :, 3] = [0.5, 0.5, -0.6]
    ds.xforms = xf
    ds.xforms_end = xf.copy()
    ds.paths = ["synth_0"]
    img = np.zeros((H, W, 4), np.float32)
    img[..., 0] = 0.8     # red, opaque
    img[..., 3] = 1.0
    ds.images = [img]
    if with_depth:
        ds.depth_images = [np.full((H, W), TARGET_T, np.float32)]
    ds.render_aabb = BoundingBox([0, 0, 0], [1, 1, 1])
    ds.aabb_scale = 1
    return ds


def _mean_center_depth(tr):
    """Weight-averaged ray depth over the image center, via the training
    forward pass itself."""
    import jax
    import jax.numpy as jnp
    from nerf_glasses_tpu.train.trainer import march_training_samples

    n = 64
    rng = np.random.default_rng(0)
    px = rng.integers(W // 4, 3 * W // 4, n)
    py = rng.integers(H // 4, 3 * H // 4, n)
    data = tr.data
    fx = float(data["fx"][0])
    xd = (px + 0.5 - float(data["cx"][0])) / fx
    yd = (py + 0.5 - float(data["cy"][0])) / fx
    dirs = np.stack([xd, yd, np.ones(n)], -1)
    xf = np.asarray(data["xforms"][0])
    d = dirs @ xf[:, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(xf[:, 3], d.shape)
    samples = march_training_samples(
        tr.state["occ"], jnp.asarray(o, jnp.float32),
        jnp.asarray(d, jnp.float32), jax.random.PRNGKey(3), tr.opts,
        tr.state["aabb_min"], tr.state["aabb_max"],
        tr.opts.config.max_cascade)
    _, acc, depth = forward_rays(
        tr.state["params"], samples, jnp.asarray(o, jnp.float32),
        jnp.asarray(d, jnp.float32), jnp.ones((n, 3)), tr.opts,
        tr.state["aabb_min"], tr.state["aabb_max"])
    acc = np.asarray(acc)
    depth = np.asarray(depth)
    m = acc > 0.2
    assert m.any()
    return float(np.mean(depth[m] / acc[m]))


def _train(with_depth, steps=300):
    cfg = NGPConfig(n_levels=4, log2_hashmap_size=11, base_resolution=4,
                    per_level_scale=2.0)
    opts = TrainOptions(config=cfg, rays_per_batch=512, samples_per_ray=24,
                        compute_dtype="float32", sample_error_map=False,
                        depth_supervision_lambda=(4.0 if with_depth
                                                  else 0.0))
    tr = Trainer(_frontal_dataset(with_depth), opts, seed=7)
    tr.train(steps)
    return tr


def test_depth_images_stored_and_prepared():
    from nerf_glasses_tpu.models.testbed import Testbed
    tb = Testbed()
    tb.create_empty_nerf_dataset(2)
    tb.dataset.scale = 0.5
    img = np.zeros((8, 8, 4), np.float32)
    depth = np.full((8, 8), 2.0, np.float32)
    tb.set_training_image(1, img, depth_img=depth, depth_scale=0.25)
    assert tb.dataset.depth_images[0] is None
    # stored in NGP units: depth * depth_scale * dataset.scale
    np.testing.assert_allclose(tb.dataset.depth_images[1],
                               2.0 * 0.25 * 0.5)
    tb.dataset.images = [img, img]
    data = prepare_dataset_arrays(tb.dataset)
    assert data["depths"].shape == (2, 8, 8)
    np.testing.assert_allclose(np.asarray(data["depths"][0]), 0.0)


@pytest.mark.slow
def test_depth_supervision_places_geometry():
    """Color-only training on a single frontal view settles density
    shallow along the ray (measured t ~ 0.9); depth supervision pulls it
    to the supervised plane (t = 1.35)."""
    d_with = _mean_center_depth(_train(True))
    assert abs(d_with - TARGET_T) < 0.15, d_with

    d_without = _mean_center_depth(_train(False))
    assert abs(d_without - TARGET_T) > 0.25, d_without


def test_transforms_json_depth_loading(tmp_path):
    """frames[].depth_path + integer_depth_scale load into NGP-unit
    depth images (nerf_loader.cu:420-438, 487-488, 631-640)."""
    import json
    from PIL import Image
    from nerf_glasses_tpu.io.dataset import load_transforms_json

    img = np.zeros((8, 8, 4), np.uint8)
    img[..., 3] = 255
    Image.fromarray(img).save(tmp_path / "f0.png")
    depth16 = np.full((8, 8), 1000, np.uint16)
    Image.fromarray(depth16, mode="I;16").save(tmp_path / "d0.png")
    doc = {
        "camera_angle_x": 0.7,
        "w": 8, "h": 8,
        "scale": 0.5,
        "integer_depth_scale": 0.001,
        "frames": [{"file_path": "f0.png", "depth_path": "d0.png",
                    "transform_matrix": np.eye(4).tolist()}],
    }
    (tmp_path / "transforms.json").write_text(json.dumps(doc))
    ds = load_transforms_json(str(tmp_path))
    assert ds.depth_images is not None
    # 1000 * 0.001 * scale(0.5) = 0.5 NGP units
    np.testing.assert_allclose(ds.depth_images[0], 0.5, rtol=1e-6)

    doc["enable_depth_loading"] = False
    (tmp_path / "transforms.json").write_text(json.dumps(doc))
    ds2 = load_transforms_json(str(tmp_path))
    assert ds2.depth_images is None
