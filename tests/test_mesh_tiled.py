"""Tile-culled Pallas mesh pass must match the XLA brute-force path."""

import numpy as np
import pytest

from nerf_glasses_tpu.io import gltf as gltf_io
from nerf_glasses_tpu.ops import triangles as tri_ops
from tests.helpers import write_quad_gltf


def _scene_with_quads(tmp_path):
    s1 = gltf_io.load(str(write_quad_gltf(tmp_path / "q1.gltf", size=0.8)))
    s1.nodes[0].translation = np.array([0.3, 0.2, 0.0], np.float32)
    s2 = gltf_io.load(str(write_quad_gltf(tmp_path / "q2.gltf", size=0.5)))
    s2.nodes[0].translation = np.array([-0.4, -0.3, 0.5], np.float32)
    return [s1, s2]


def test_tiled_matches_bruteforce(tmp_path, monkeypatch):
    scenes = _scene_with_quads(tmp_path)
    mesh = tri_ops.build_mesh_arrays(scenes)
    xf, nm = tri_ops.instance_transforms(mesh, scenes)
    cam = np.zeros((3, 4), np.float32)
    cam[:, 0] = [0.7, 0, 0]
    cam[:, 1] = [0, 0.6, 0]
    cam[:, 2] = [0, 0, -1]
    cam[:, 3] = [0.05, -0.02, 2.2]

    W, H = 200, 150
    c_ref, d_ref = tri_ops.render_mesh_pass(mesh, xf, nm, cam, W, H,
                                            [1, 1, 1])

    # force the tiled path with interpreter-mode pallas on CPU
    import nerf_glasses_tpu.ops.mesh_pallas as mp
    orig = mp.raycast_pallas_tiled

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(mp, "raycast_pallas_tiled", interp)
    mesh2 = tri_ops.build_mesh_arrays(scenes)
    c_tiled, d_tiled = tri_ops.render_mesh_pass_tiled(mesh2, xf, nm, cam,
                                                      W, H, [1, 1, 1])

    np.testing.assert_allclose(d_tiled, d_ref, atol=1e-4)
    np.testing.assert_allclose(c_tiled, c_ref, atol=1e-4)
    assert (d_ref > 0).any()  # scene actually visible


def test_binning_counts_reasonable(tmp_path):
    import jax.numpy as jnp
    scenes = _scene_with_quads(tmp_path)
    mesh = tri_ops.build_mesh_arrays(scenes)
    xf, nm = tri_ops.instance_transforms(mesh, scenes)
    cam3 = np.diag([0.7, 0.6, -1.0]).astype(np.float32)
    eye = np.array([0.0, 0.0, 2.2], np.float32)
    rot = np.asarray(xf)[np.asarray(mesh.inst_id), :, :3]
    trans = np.asarray(xf)[np.asarray(mesh.inst_id), :, 3]
    v0 = np.einsum("tij,tj->ti", rot, np.asarray(mesh.v0)) + trans
    e1 = np.einsum("tij,tj->ti", rot, np.asarray(mesh.e1))
    e2 = np.einsum("tij,tj->ti", rot, np.asarray(mesh.e2))
    lists, counts = tri_ops._bin_triangles(
        jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
        jnp.asarray(eye), jnp.asarray(np.linalg.inv(cam3)),
        256, 128, 256, 128)
    counts = np.asarray(counts)
    # 2 tiles of 128x64 on 256x128: quads concentrated -> not all tiles
    # carry all 4 triangles
    assert counts.max() <= 4
    assert counts.min() >= 0
    assert counts.sum() > 0
