"""Unit tests: colors, morton, occupancy grid, bbox, camera math."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from nerf_glasses_tpu import constants as C
from nerf_glasses_tpu.ops import colors, morton, occupancy
from nerf_glasses_tpu.utils.bbox import BoundingBox, contains_aabb, ray_intersect_aabb
from nerf_glasses_tpu.utils.camera import OrbitCamera, pack_camera, fov_to_focal_length


def test_srgb_roundtrip():
    x = np.linspace(0, 1, 64, dtype=np.float32)
    y = colors.srgb_to_linear(colors.linear_to_srgb(x))
    np.testing.assert_allclose(np.asarray(y), x, atol=2e-3)


def test_srgb_reference_values():
    # spot values from the piecewise definition (ngp_common.cuh:125-147)
    assert abs(float(colors.linear_to_srgb(jnp.float32(0.0)))) < 1e-7
    assert abs(float(colors.linear_to_srgb(jnp.float32(1.0))) - 1.0) < 2e-3
    assert abs(float(colors.srgb_to_linear(jnp.float32(0.04))) - 0.04 / 12.92) < 1e-7


def test_tonemap_identity_background():
    # fully transparent pixel -> pure background (white, sRGB)
    accum = jnp.zeros((4, 4))[None]  # wrong shape guard
    accum = jnp.zeros((2, 2, 4))
    out = colors.tonemap_frame(accum)
    np.testing.assert_allclose(np.asarray(out[..., :3]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[..., 3]), 1.0, atol=1e-5)


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    xyz = rng.integers(0, 128, size=(100, 3)).astype(np.uint32)
    m = morton.morton3d(xyz[:, 0], xyz[:, 1], xyz[:, 2])
    assert np.all(morton.morton3d_invert(m) == xyz[:, 0])
    assert np.all(morton.morton3d_invert(m >> 1) == xyz[:, 1])
    assert np.all(morton.morton3d_invert(m >> 2) == xyz[:, 2])


def test_morton_known_values():
    assert morton.morton3d(1, 0, 0) == 1
    assert morton.morton3d(0, 1, 0) == 2
    assert morton.morton3d(0, 0, 1) == 4
    assert morton.morton3d(3, 3, 3) == 63


def test_morton_linear_conversion_roundtrip():
    rng = np.random.default_rng(1)
    vals = rng.standard_normal((2, 128 ** 3)).astype(np.float32)
    lin = occupancy.morton_cascades_to_linear(vals)
    back = occupancy.linear_cascades_to_morton(lin)
    np.testing.assert_array_equal(back, vals)
    # spot-check one cell: morton code of (x,y,z)=(5,9,77)
    m = int(morton.morton3d(5, 9, 77))
    assert lin[0, 77, 9, 5] == vals[0, m]


def test_occupancy_build_threshold_and_maxpool():
    g = np.zeros((1, 128, 128, 128), np.float32)
    g[0, 10, 20, 30] = 1.0  # one hot cell, mean ~ 0 -> thresh = mean
    occ = occupancy.build_occupancy(jnp.asarray(g), max_cascade=0)
    occ = np.asarray(occ)
    assert occ.shape == (8, 128, 128, 128)
    assert occ[0, 10, 20, 30] == 1
    assert occ[0].sum() == 1
    # mip 1: cell (32+15, 32+10, 32+5) = maxpool of (30..31, 20..21, 10..11)
    assert occ[1, 32 + 5, 32 + 10, 32 + 15] == 1
    assert occ[1].sum() == 1
    # propagates to all mips
    for m in range(2, 8):
        assert occ[m].sum() == 1


def test_occupied_at_matches_reference_indexing():
    g = np.zeros((1, 128, 128, 128), np.float32)
    g[0, 64, 64, 64] = 10.0
    occ = occupancy.build_occupancy(jnp.asarray(g), max_cascade=0)
    # cell [z=64,y=64,x=64] covers pos [0.5, 0.5078125)^3 at mip 0
    pos = jnp.array([[0.503, 0.503, 0.503], [0.49, 0.503, 0.503]])
    mip = jnp.zeros(2, jnp.int32)
    res = np.asarray(occupancy.occupied_at(occ, pos, mip))
    assert res[0] and not res[1]


def test_mip_from_pos():
    max_c = 7
    p = jnp.array([[0.6, 0.5, 0.5],    # |d|=0.1 -> frexp exp=-3 -> mip 0
                   [1.4, 0.5, 0.5],    # |d|=0.9 -> exp 0 -> mip 1
                   [2.5, 0.5, 0.5]])   # |d|=2.0 -> exp 2 -> mip 3
    mips = np.asarray(occupancy.mip_from_pos(p, max_c))
    assert mips.tolist() == [0, 1, 3]


def test_calc_dt_and_advance():
    t = jnp.array([0.5])
    dt = occupancy.calc_dt(t, 0.0)
    assert abs(float(dt[0]) - C.MIN_CONE_STEPSIZE) < 1e-9
    # advancing through an empty voxel moves at least one dt and lands past
    # the voxel boundary
    pos = jnp.array([[0.5, 0.5, 0.5]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    idir = 1.0 / d
    res = jnp.array([128.0])
    t2 = occupancy.advance_to_next_voxel(jnp.array([0.5]), 0.0, pos, d, idir, res)
    assert float(t2[0]) > 0.5
    dist = occupancy.distance_to_next_voxel(pos, d, idir, res)
    assert float(t2[0]) >= 0.5 + float(dist[0]) - 1e-6


def test_bbox_ray_intersect():
    box = BoundingBox([0, 0, 0], [1, 1, 1])
    t = box.ray_intersect([0.5, 0.5, -1.0], [0, 0, 1])
    np.testing.assert_allclose(t, [1.0, 2.0], atol=1e-6)
    t = box.ray_intersect([2.0, 2.0, -1.0], [0, 0, 1])
    assert t[0] == np.finfo(np.float32).max

    tmin, tmax = ray_intersect_aabb(
        jnp.array([[0.5, 0.5, -1.0], [2.0, 2.0, -1.0]]),
        jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]]),
        jnp.zeros(3), jnp.ones(3))
    np.testing.assert_allclose(np.asarray(tmin)[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tmax)[0], 2.0, atol=1e-6)
    assert np.asarray(tmin)[1] == np.finfo(np.float32).max

    inside = contains_aabb(jnp.array([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5]]),
                           jnp.zeros(3), jnp.ones(3))
    assert bool(inside[0]) and not bool(inside[1])


def test_orbit_camera_matches_reference_geometry():
    cam = OrbitCamera()
    # initial azimuth: eye-pivot = (0,0,2) -> atan2(2,0) = pi/2
    cam.orbit(0.0, 0.0, 0.0)
    np.testing.assert_allclose(cam.eye, [0, 0, 2], atol=1e-5)
    cam.orbit(math.pi / 2, 0.0, 0.0)  # azimuth +90deg -> eye at (-2, 0, 0)
    np.testing.assert_allclose(cam.eye, [-2, 0, 0], atol=1e-5)
    # look points at the pivot
    np.testing.assert_allclose(cam.look, [1, 0, 0], atol=1e-5)
    # zoom reduces radius by 10% per unit
    cam.orbit(0.0, 0.0, 1.0)
    np.testing.assert_allclose(np.linalg.norm(cam.eye), 1.8, atol=1e-5)


def test_pack_camera_quirk():
    right = np.array([1, 0, 0], np.float32)
    up = np.array([0, 1, 0], np.float32)
    fwd = np.array([0, 0, -1], np.float32)
    eye = np.array([0, 0, 2], np.float32)
    m = pack_camera(right, up, fwd, eye, aspect=16 / 9)
    v = math.tan(0.5 * 45.0)  # radians quirk (nerf_mesh_renderer.cu:922)
    np.testing.assert_allclose(m[:, 1], [0, v, 0], rtol=1e-6)
    np.testing.assert_allclose(m[:, 0], [v * 16 / 9, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(m[:, 2], fwd, atol=0)
    np.testing.assert_allclose(m[:, 3], eye, atol=0)


def test_fov_to_focal_length():
    assert abs(fov_to_focal_length(1, 45.0) - 0.5 / math.tan(math.radians(22.5))) < 1e-6


def test_stable_partition_ids_matches_naive():
    """Block-decomposed partition == two-cumsum partition, both the
    matmul path (N % 512 == 0) and the fallback (odd N)."""
    import numpy as np
    import jax.numpy as jnp
    from nerf_glasses_tpu.ops.compaction import stable_partition_ids

    rng = np.random.default_rng(7)
    for n, frac in ((2048, 0.3), (4096, 0.0), (1536, 1.0), (1000, 0.4)):
        mask = rng.uniform(size=(n,)) < frac
        perm, n_true = stable_partition_ids(jnp.asarray(mask))
        perm = np.asarray(perm)
        ids = np.arange(n)
        want = np.concatenate([ids[mask], ids[~mask]])
        assert int(n_true) == int(mask.sum())
        assert np.array_equal(perm, want), (n, frac)
