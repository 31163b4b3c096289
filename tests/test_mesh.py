"""glTF loading + mesh ray-cast + PBR shading tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from nerf_glasses_tpu.io import gltf as gltf_io
from nerf_glasses_tpu.ops import triangles as tri_ops
from tests.helpers import write_quad_gltf

GLASSES = "/root/reference/nerf_mesh_renderer/assets/meshes/glasses/glasses.gltf"


def test_load_quad(tmp_path):
    path = write_quad_gltf(tmp_path / "quad.gltf")
    scene = gltf_io.load(str(path))
    assert len(scene.nodes) == 1
    prim = scene.nodes[0].mesh.primitives[0]
    assert prim.positions.shape == (4, 3)
    assert prim.indices.tolist() == [0, 1, 2, 0, 2, 3]
    np.testing.assert_allclose(prim.material.base_color_factor,
                               [1, 0, 0, 1])
    # generated tangents are unit and orthogonal to the normal
    t = prim.tangents
    assert t.shape == (4, 4)
    np.testing.assert_allclose(np.linalg.norm(t[:, :3], axis=1), 1.0,
                               atol=1e-5)


def test_load_reference_glasses():
    import os
    if not os.path.exists(GLASSES):
        pytest.skip("reference assets unavailable")
    scene = gltf_io.load(GLASSES)
    prim = scene.nodes[0].mesh.primitives[0]
    assert prim.positions.shape == (1864, 3)
    assert prim.indices.shape == (8856,)
    # node TRS from the file
    assert abs(scene.nodes[0].rotation[0] - 0.7071067) < 1e-4  # w
    # texture is a git-lfs stub -> loader degrades to factors
    assert prim.material.base_color_texture is None
    # centroid is finite and inside the bounding box
    c = scene.nodes[0].centroid()
    assert np.isfinite(c).all()


def test_raycast_quad(tmp_path):
    path = write_quad_gltf(tmp_path / "quad.gltf", size=1.0, z=0.0)
    scene = gltf_io.load(str(path))
    mesh = tri_ops.build_mesh_arrays([scene])
    xf, nm = tri_ops.instance_transforms(mesh, [scene])

    cam = np.zeros((3, 4), np.float32)
    cam[:, 0] = [0.5, 0, 0]
    cam[:, 1] = [0, 0.5, 0]
    cam[:, 2] = [0, 0, -1]   # looking down -z
    cam[:, 3] = [0, 0, 2]    # from z=+2
    color, depth = tri_ops.render_mesh_pass(mesh, xf, nm, cam, 64, 64,
                                            light_pos=[1, 1, 1])
    # center pixel hits the quad at depth ~2
    assert depth[32, 32] == pytest.approx(2.0, abs=0.01)
    assert color[32, 32, 3] == 1.0
    assert color[32, 32, 0] > 0.1
    # red base color dominates (green/blue only get achromatic specular)
    assert color[32, 32, 0] > color[32, 32, 1] + 0.1
    assert abs(color[32, 32, 1] - color[32, 32, 2]) < 1e-4
    # corner pixel misses (quad half-size 0.5 < tan coverage at corner)
    assert color[0, 0, 3] == 0.0
    assert depth[0, 0] == 0.0


def test_backface_culling(tmp_path):
    path = write_quad_gltf(tmp_path / "quad.gltf")
    scene = gltf_io.load(str(path))
    mesh = tri_ops.build_mesh_arrays([scene])
    xf, nm = tri_ops.instance_transforms(mesh, [scene])
    cam = np.zeros((3, 4), np.float32)
    cam[:, 0] = [-0.5, 0, 0]
    cam[:, 1] = [0, 0.5, 0]
    cam[:, 2] = [0, 0, 1]    # looking up +z from behind
    cam[:, 3] = [0, 0, -2]
    color, depth = tri_ops.render_mesh_pass(mesh, xf, nm, cam, 16, 16,
                                            light_pos=[1, 1, 1])
    assert color[..., 3].max() == 0.0  # fully culled


def test_instance_transform_moves_mesh(tmp_path):
    path = write_quad_gltf(tmp_path / "quad.gltf")
    scene = gltf_io.load(str(path))
    mesh = tri_ops.build_mesh_arrays([scene])
    cam = np.zeros((3, 4), np.float32)
    cam[:, 0] = [0.5, 0, 0]
    cam[:, 1] = [0, 0.5, 0]
    cam[:, 2] = [0, 0, -1]
    cam[:, 3] = [0, 0, 2]

    xf, nm = tri_ops.instance_transforms(mesh, [scene])
    _, depth0 = tri_ops.render_mesh_pass(mesh, xf, nm, cam, 8, 8, [1, 1, 1])
    # translate the node 1 unit toward the camera; same jitted kernel
    scene.nodes[0].translation = np.array([0, 0, 1.0], np.float32)
    xf, nm = tri_ops.instance_transforms(mesh, [scene])
    _, depth1 = tri_ops.render_mesh_pass(mesh, xf, nm, cam, 8, 8, [1, 1, 1])
    assert depth1[4, 4] == pytest.approx(depth0[4, 4] - 1.0, abs=0.01)


def test_downsample_payload_semantics():
    color = np.zeros((4, 4, 4), np.float32)
    depth = np.zeros((4, 4), np.float32)
    # one 2x2 block with 2 hits
    color[0, 0] = [1, 0, 0, 1]
    color[0, 1] = [0, 1, 0, 1]
    depth[0, 0] = 2.0
    depth[0, 1] = 3.0
    c, d = tri_ops.downsample_surface(color, depth, 2)
    assert c.shape == (2, 2, 4) and d.shape == (2, 2)
    np.testing.assert_allclose(c[0, 0], [0.25, 0.25, 0, 0.5])  # mean
    assert d[0, 0] == 3.0  # max of hit depths
    assert d[1, 1] == 0.0  # all-miss block


def test_rotate_around_axis_keeps_pivot_fixed(tmp_path):
    path = write_quad_gltf(tmp_path / "quad.gltf")
    scene = gltf_io.load(str(path))
    node = scene.nodes[0]
    node.translation = np.array([0.3, -0.2, 0.1], np.float32)
    pivot_local = np.array([0.25, 0.25, 0.0], np.float32)
    xf0 = node.get_transform()
    world_before = xf0[:3, :3] @ pivot_local + xf0[:3, 3]
    node.rotate_around_axis([0, 1, 0], pivot_local, 30.0)
    xf1 = node.get_transform()
    world_after = xf1[:3, :3] @ pivot_local + xf1[:3, 3]
    np.testing.assert_allclose(world_before, world_after, atol=1e-5)


def test_shade_hits_compacted_matches_dense(tmp_path):
    """Compacted shading (hit rays only) must agree with dense shade_hits
    for every ray, hit or miss."""
    path = write_quad_gltf(tmp_path / "quad.gltf", size=1.0, z=0.0)
    scene = gltf_io.load(str(path))
    mesh = tri_ops.build_mesh_arrays([scene])
    xf, nm = tri_ops.instance_transforms(mesh, [scene])

    rng = np.random.default_rng(5)
    n = 256
    o = np.tile(np.array([[0.1, -0.1, 2.0]], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    t, tri, uv = tri_ops._raycast_chunked(
        jnp.asarray(o), jnp.asarray(d), mesh.v0, mesh.e1, mesh.e2,
        chunk=8, cull_backfaces=True)
    assert int(np.sum(np.asarray(tri) >= 0)) > 10  # some hits, some misses
    nmj = jnp.asarray(nm)
    dense = tri_ops.shade_hits(mesh, jnp.asarray(o), jnp.asarray(d), t,
                               tri, uv, nmj, [1, 1, 1], o[0])
    compact = tri_ops.shade_hits_compacted(
        mesh, jnp.asarray(o), jnp.asarray(d), t, tri, uv, nmj,
        [1, 1, 1], o[0], chunk=64)
    np.testing.assert_allclose(np.asarray(compact), np.asarray(dense),
                               atol=1e-5)


def test_render_mesh_surface_matches_manual_downsample(tmp_path):
    path = write_quad_gltf(tmp_path / "quad.gltf", size=1.0, z=0.0)
    scene = gltf_io.load(str(path))
    mesh = tri_ops.build_mesh_arrays([scene])
    xf, nm = tri_ops.instance_transforms(mesh, [scene])
    cam = np.zeros((3, 4), np.float32)
    cam[:, 0] = [0.5, 0, 0]
    cam[:, 1] = [0, 0.5, 0]
    cam[:, 2] = [0, 0, -1]
    cam[:, 3] = [0, 0, 2]
    c2, d2 = tri_ops.render_mesh_pass(mesh, xf, nm, cam, 32, 32,
                                      [1, 1, 1], device_out=True)
    want_c, want_d = tri_ops.downsample_surface(
        jnp.asarray(c2), jnp.asarray(d2), 2)
    got_c, got_d = tri_ops.render_mesh_surface(mesh, xf, nm, cam, 16, 16,
                                               2, [1, 1, 1])
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                               atol=1e-6)
