"""Shared test fixtures: synthetic snapshots and tiny glTF assets."""

import base64
import json
import os
import struct

import jax
import numpy as np

from nerf_glasses_tpu.config import NGPConfig
from nerf_glasses_tpu.io import snapshot as snap_io
from nerf_glasses_tpu.io.dataset import ImageMetadata, NerfDataset
from nerf_glasses_tpu.ops.network import init_params, pack_params
from nerf_glasses_tpu.utils.bbox import BoundingBox

TEST_CFG = NGPConfig(log2_hashmap_size=15)


def make_sphere_density(radius=0.2, value=0.05, center=(0.5, 0.5, 0.5)):
    """(1, 128, 128, 128) density grid with a solid sphere."""
    g = np.linspace(0, 1, 128, endpoint=False) + 0.5 / 128
    z, y, x = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt((x - center[0]) ** 2 + (y - center[1]) ** 2
                + (z - center[2]) ** 2)
    return (r < radius).astype(np.float32)[None] * value


def write_test_snapshot(path, cfg=TEST_CFG, density_grid=None, seed=0,
                        params=None, render_aabb=None):
    if density_grid is None:
        density_grid = make_sphere_density()
    if params is None:
        params = init_params(jax.random.PRNGKey(seed), cfg)
    blob = pack_params(params, cfg).astype(np.float32)
    ds = NerfDataset()
    ds.n_images = 1
    ds.xforms = np.eye(3, 4, dtype=np.float32)[None]
    ds.metadata = [ImageMetadata(resolution=(800, 800),
                                 focal_length=(1111.0, 1111.0))]
    ds.paths = ["0.png"]
    half = 0.5 * cfg.aabb_scale
    aabb = BoundingBox(np.full(3, 0.5 - half), np.full(3, 0.5 + half))
    if render_aabb is None:
        render_aabb = BoundingBox([0, 0, 0], [1, 1, 1])
    ds.render_aabb = render_aabb
    ds.aabb_scale = cfg.aabb_scale
    snap_io.save_snapshot(str(path), cfg, blob, density_grid, ds, aabb,
                          render_aabb, np.eye(3, dtype=np.float32))
    return params


def opaque_params(cfg=TEST_CFG, sigma_raw=4.6):
    """Params that make the network output constant sigma_raw (density
    ~ exp(sigma_raw)) and rgb_raw = 0 (color 0.5 after logistic):
    grid features all 1 -> density hidden = relu(W0 @ 1s) = 1 each ->
    out0 = sigma_raw."""
    import jax.numpy as jnp
    p = init_params(jax.random.PRNGKey(0), cfg)
    p = jax.tree.map(jnp.zeros_like, p)
    p["grid"] = jnp.ones_like(p["grid"])
    d = list(p["density_mlp"])
    w0 = np.zeros(d[0].shape, np.float32)
    w0[:, :] = 1.0 / cfg.n_pos_features
    d[0] = jnp.asarray(w0)
    wl = np.zeros(d[-1].shape, np.float32)
    wl[0, :] = sigma_raw / cfg.density_neurons
    d[-1] = jnp.asarray(wl)
    p["density_mlp"] = tuple(d)
    return p


def write_quad_gltf(path, size=1.0, z=0.0):
    """Minimal glTF: a unit quad in the XY plane at depth `z`, facing +z
    viewers (CCW when viewed from +z)."""
    s = size / 2
    positions = np.array([[-s, -s, z], [s, -s, z], [s, s, z], [-s, s, z]],
                         np.float32)
    normals = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    indices = np.array([0, 1, 2, 0, 2, 3], np.uint16)

    buf = positions.tobytes() + normals.tobytes() + uvs.tobytes() + indices.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "name": "quad"}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [1.0, 0.0, 0.0, 1.0],
            "metallicFactor": 0.0, "roughnessFactor": 1.0}}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3", "min": positions.min(0).tolist(),
             "max": positions.max(0).tolist()},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4,
             "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 32},
            {"buffer": 0, "byteOffset": 128, "byteLength": 12},
        ],
        "buffers": [{
            "byteLength": len(buf),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(buf).decode(),
        }],
    }
    with open(path, "w") as f:
        json.dump(doc, f)
    return path
