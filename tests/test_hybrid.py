"""End-to-end: Testbed snapshot rendering, hybrid mesh+NeRF frames,
floaty removal, collide — the BASELINE configs 1-3 in miniature."""

import numpy as np
import pytest

from nerf_glasses_tpu.models.renderer import NerfMeshRenderer
from nerf_glasses_tpu.models.testbed import Testbed
from tests.helpers import TEST_CFG, make_sphere_density, write_quad_gltf, \
    write_test_snapshot

FAST_MARCH = {"max_rounds": 96, "init_skip_iters": 24, "jitter": False}


@pytest.fixture(scope="module")
def snapshot_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("snap") / "nerf.msgpack"
    write_test_snapshot(p)
    return str(p)


def test_testbed_render_nerf_only(snapshot_path):
    """BASELINE config 1: one fixed-pose frame on CPU JAX."""
    tb = Testbed()
    tb.load_snapshot(snapshot_path)
    tb.march_overrides = FAST_MARCH
    img = tb.render(40, 24, spp=1, linear=False)
    assert img.shape == (24, 40, 4)
    assert np.isfinite(img).all()
    assert (img >= 0).all() and (img <= 1).all()
    # center of view shows the density sphere (alpha accumulated)
    assert img[12, 20, 3] > 0.05
    # default camera looks at the cube center from distance 1.5+... — the
    # corner pixels see only background (white)
    assert img[0, 0, 3] == pytest.approx(1.0, abs=1e-5)  # bg alpha fills


def test_testbed_render_deterministic(snapshot_path):
    tb = Testbed()
    tb.load_snapshot(snapshot_path)
    tb.march_overrides = FAST_MARCH
    a = tb.render(16, 12, spp=1)
    b = tb.render(16, 12, spp=1)
    np.testing.assert_array_equal(a, b)


def test_renderer_hybrid_frame(snapshot_path, tmp_path):
    """BASELINE config 2: NeRF + mesh with depth-gated compositing."""
    r = NerfMeshRenderer(32, 24)
    nerf = r.load_nerf(snapshot_path)
    nerf.march_overrides = FAST_MARCH
    quad = write_quad_gltf(tmp_path / "quad.gltf")
    # a quad in front of the sphere (camera at z=2 looking at origin)
    mesh = r.load_mesh(str(quad), t=[0.6, 0.0, 0.8], s=[0.35, 0.35, 0.35])
    assert mesh is not None
    assert r.frame()
    img = r.display_image()
    assert img.shape == (24, 32, 4)
    assert np.isfinite(img).all()

    # pixel at the quad's projected location: occluding red-ish surface.
    # quad at x=0.6 -> NDC x = 0.6/(1.2*tan_quirk) ...; just find the
    # reddest pixel and check it beats the nerf-only render.
    r2 = NerfMeshRenderer(32, 24)
    n2 = r2.load_nerf(snapshot_path)
    n2.march_overrides = FAST_MARCH
    r2.frame()
    img2 = r2.display_image()
    red_excess = (img[..., 0] - img[..., 1]).max()
    red_excess2 = (img2[..., 0] - img2[..., 1]).max()
    assert red_excess > red_excess2 + 0.05


def test_surface_occludes_nerf(snapshot_path, tmp_path):
    """A huge opaque quad in front of everything -> frame is mesh color
    everywhere inside the quad."""
    r = NerfMeshRenderer(16, 12)
    nerf = r.load_nerf(snapshot_path)
    nerf.march_overrides = FAST_MARCH
    quad = write_quad_gltf(tmp_path / "q.gltf")
    r.load_mesh(str(quad), t=[0, 0, 1.2], s=[40, 40, 1])
    r.frame()
    fb = r._frame_buffer
    # all pixels have alpha 1 (opaque surface covers the frustum)
    assert fb[..., 3].min() > 0.99
    # red channel dominates everywhere (the NeRF's random colors average
    # ~0.5 gray; the surface is red with achromatic specular)
    assert (fb[..., 0] >= fb[..., 1]).mean() > 0.95


def test_nerf_occludes_surface(tmp_path):
    """A quad *behind* a dense wall of density: surface barely visible."""
    # dense slab in front half of the cube
    from tests.helpers import opaque_params
    grid = np.zeros((1, 128, 128, 128), np.float32)
    grid[0, 64:96] = 1.0  # z in [0.5, 0.75) occupied
    snap = tmp_path / "slab.msgpack"
    # network tuned for sigma ~ e^4.6 -> the slab is opaque
    write_test_snapshot(snap, density_grid=grid, params=opaque_params())
    r = NerfMeshRenderer(16, 12)
    nerf = r.load_nerf(str(snap))
    nerf.march_overrides = dict(FAST_MARCH)
    quad = write_quad_gltf(tmp_path / "q.gltf")

    # camera at z=2 looks toward -z; slab (NGP z in [0.5,0.75)) sits in
    # renderer world z in [0.0,0.25); put the quad behind it at z=-0.5
    r.load_mesh(str(quad), t=[0, 0, -0.5], s=[40, 40, 1])
    r.frame()
    with_behind = r._frame_buffer.copy()

    # and in front at z = +0.5
    r.clear_meshes()
    r.load_mesh(str(quad), t=[0, 0, 0.5], s=[40, 40, 1])
    r.frame()
    with_front = r._frame_buffer.copy()

    # compare the central pixels (rays through the cube; corner rays miss
    # the cube and legitimately see the quad in both cases)
    c = (slice(4, 8), slice(6, 10))
    red_f = (with_front[..., 0] - with_front[..., 1])[c].mean()
    red_b = (with_behind[..., 0] - with_behind[..., 1])[c].mean()
    assert red_f > red_b + 0.05
    # behind the opaque slab the quad is fully occluded
    assert abs(red_b) < 1e-3


def test_remove_floaties(snapshot_path):
    """BASELINE config 3: density-grid culling keeps the main blob."""
    grid = make_sphere_density(radius=0.2, value=0.05)
    # add a small floaty blob far from the main sphere
    grid += make_sphere_density(radius=0.04, value=0.05, center=(0.1, 0.1, 0.1))
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        snap = os.path.join(td, "s.msgpack")
        write_test_snapshot(snap, density_grid=grid)
        r = NerfMeshRenderer(8, 8)
        nerf = r.load_nerf(snap)
        occ_before = np.asarray(nerf.occ[0]).sum()
        r.remove_floaties()
        occ_after = np.asarray(nerf.occ[0]).sum()
    assert occ_after < occ_before
    # the main sphere survives: its center cell is still set
    assert np.asarray(nerf.occ)[0, 64, 64, 64] == 1
    # the floaty is gone
    assert np.asarray(nerf.occ)[0, 12, 12, 12] == 0


def test_density_grid_dump_load_roundtrip(snapshot_path):
    r = NerfMeshRenderer(8, 8)
    nerf = r.load_nerf(snapshot_path)
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        f = os.path.join(td, "grid.bin")
        r.dump_density_grid_file(f)
        before = np.asarray(nerf.occ).copy()
        assert os.path.getsize(f) == 8 * 128 ** 3
        r.load_density_grid_file(f)
        np.testing.assert_array_equal(np.asarray(nerf.occ), before)


def test_collide_translates_mesh(snapshot_path, tmp_path):
    """Quad above the density sphere settles downward onto it."""
    r = NerfMeshRenderer(8, 8)
    nerf = r.load_nerf(snapshot_path)
    nerf.march_overrides = FAST_MARCH
    quad = write_quad_gltf(tmp_path / "q.gltf")
    # start above the sphere (sphere top at world y ~ 0.2) but inside the
    # render aabb — the reference's collide march also only sees the aabb
    mesh = r.load_mesh(str(quad), t=[0.0, 0.35, 0.0], s=[0.1, 0.1, 0.1],
                       r=[0.7071068, 0.7071068, 0, 0])  # rotate into XZ plane
    node = mesh.nodes[0]
    y0 = float(node.translation[1])
    at_rest = r.collide(np.array([0, -1, 0], np.float32), node)
    # first call: no intersection yet -> translated down toward the sphere
    assert not at_rest
    assert node.translation[1] < y0 - 0.05
    assert node.translation[1] > 0.0  # did not fall through the sphere
