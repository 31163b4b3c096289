"""Multi-cascade (aabb_scale > 1) snapshot fixture, loaded end-to-end
through march_frame's mip path.

The fixture generator emits the exact tcnn offset-table layout (dense
coarse levels, hashed fine levels — grid.h:985-1018) with aabb_scale=4
(3 cascades) and a cascaded density grid; the test drives
load_snapshot -> occupancy build -> Testbed.render so
mip_from_dt / mip_from_pos / multi-cascade occupied_at run in the real
render dispatch (testbed.cu:188-264 semantics).
"""

import numpy as np
import pytest

from nerf_glasses_tpu import constants as C
from nerf_glasses_tpu.config import NGPConfig, _next_multiple
from nerf_glasses_tpu.models.testbed import Testbed

from tests.helpers import opaque_params, write_test_snapshot

CFG4 = NGPConfig(n_levels=8, log2_hashmap_size=13, base_resolution=16,
                 per_level_scale=1.5, aabb_scale=4)


def test_offset_table_matches_tcnn_layout():
    """Hand-compute GridEncodingTemplated's offsets: dense levels use
    next_multiple(res^3, 8) rows until that exceeds 2^T, hashed after."""
    lp = CFG4.level_params()
    offset = 0
    saw_dense = saw_hash = False
    for lvl, (off, size, res) in enumerate(lp):
        assert off == offset
        expect_res = int(np.ceil(2 ** (lvl * np.log2(1.5)) * 16 - 1)) + 1
        assert res == expect_res, (lvl, res, expect_res)
        dense = _next_multiple(res ** 3, 8)
        expect_size = min(dense, 1 << 13)
        assert size == expect_size, (lvl, size, expect_size)
        saw_dense |= size == dense
        saw_hash |= size == (1 << 13) and dense > (1 << 13)
        offset += size
    assert saw_dense and saw_hash   # the fixture covers both layouts


def make_cascaded_grid():
    """Cascade 0: sphere at the cube center. Cascade 2: blob centered at
    (0.5, 0.5, 2.0) — outside the unit cube, reachable only through the
    mip-2 grid (cascade c spans 0.5 +- 0.5*2^c)."""
    grid = np.zeros((3, C.NERF_GRIDSIZE, C.NERF_GRIDSIZE, C.NERF_GRIDSIZE),
                    np.float32)
    g = np.linspace(0, 1, 128, endpoint=False) + 0.5 / 128
    z, y, x = np.meshgrid(g, g, g, indexing="ij")
    # cascade 0 local coords == NGP coords
    r0 = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
    grid[0][r0 < 0.2] = 0.05
    # cascade 2 spans [-1.5, 2.5]: NGP pos p -> local (p + 1.5) / 4
    px, py, pz = x * 4 - 1.5, y * 4 - 1.5, z * 4 - 1.5
    r2 = np.sqrt((px - 0.5) ** 2 + (py - 0.5) ** 2 + (pz - 2.0) ** 2)
    grid[2][r2 < 0.3] = 0.05
    return grid


@pytest.fixture(scope="module")
def tb4(tmp_path_factory):
    from nerf_glasses_tpu.utils.bbox import BoundingBox
    path = tmp_path_factory.mktemp("casc") / "snap4.msgpack"
    write_test_snapshot(path, cfg=CFG4, params=opaque_params(CFG4),
                        density_grid=make_cascaded_grid(),
                        render_aabb=BoundingBox([-1.5] * 3, [2.5] * 3))
    tb = Testbed()
    tb.load_snapshot(str(path))
    tb.march_overrides = {"max_rounds": 64}
    return tb


def test_loads_with_three_cascades(tb4):
    assert tb4.config.aabb_scale == 4
    assert tb4.config.max_cascade == 2
    assert tb4.density_grid.shape[0] == 3
    assert np.allclose(tb4.aabb.min, -1.5) and np.allclose(tb4.aabb.max, 2.5)
    # cone marching is on for multi-cascade scenes (testbed.cu:1115)
    assert tb4._cone_angle == pytest.approx(1.0 / 256.0)


def test_renders_center_sphere_through_mip_path(tb4):
    cam = np.zeros((3, 4), np.float32)
    cam[:, 0] = [0.4, 0, 0]
    cam[:, 1] = [0, -0.4, 0]
    cam[:, 2] = [0, 0, 1]
    cam[:, 3] = [0.0, 0.0, -1.6]    # eye (0.5, 0.5, -1.1) after NGP shift
    tb4.camera_matrix = cam
    img = np.asarray(tb4.render_frame_buffers(48, 48)[0])
    a = img[..., 3]
    assert a.max() > 0.9            # sphere visible
    ys, xs = np.nonzero(a > 0.5)
    assert abs(ys.mean() - 24) < 8 and abs(xs.mean() - 24) < 8

    # depth ~ eye-to-sphere-front distance (1.6 - 0.2 = 1.4)
    d = np.asarray(tb4.render_frame_buffers(48, 48)[1])
    hit_d = d[a > 0.9]
    assert abs(np.median(hit_d) - 1.4) < 0.15, np.median(hit_d)


def test_renders_outer_cascade_blob(tb4):
    """A camera aimed at the cascade-2 blob (center NGP (0.5,0.5,2.0),
    fully outside the unit cube) sees it — rays march through mip>=1
    occupancy the whole way."""
    cam = np.zeros((3, 4), np.float32)
    cam[:, 0] = [0.4, 0, 0]
    cam[:, 1] = [0, -0.4, 0]
    cam[:, 2] = [0, 0, -1]
    cam[:, 3] = [0.0, 0.0, 3.0]     # eye (0.5, 0.5, 3.5), looking -z
    tb4.camera_matrix = cam
    img, depth = tb4.render_frame_buffers(48, 48)
    a = np.asarray(img)[..., 3]
    assert a.max() > 0.9, a.max()
    hit_d = np.asarray(depth)[a > 0.9]
    # blob front face at z = 2.3 -> depth ~ 1.2 from the eye
    assert abs(np.median(hit_d) - 1.2) < 0.2, np.median(hit_d)


def test_mip1_region_empty_is_skipped(tb4):
    """Rays crossing only empty mip-1 space produce nothing (the DDA
    advances through coarse cascades without sampling)."""
    cam = np.zeros((3, 4), np.float32)
    cam[:, 0] = [0.3, 0, 0]
    cam[:, 1] = [0, -0.3, 0]
    cam[:, 2] = [0, 1, 0]           # looking +y: nothing there
    cam[:, 3] = [0.5, -1.4, 0.9]    # eye NGP (1.0, -0.9, 1.4)
    tb4.camera_matrix = cam
    img = np.asarray(tb4.render_frame_buffers(32, 32)[0])
    assert img[..., 3].max() == 0.0


def test_mip_brick_sampler_matches_dense_trilinear():
    """sample_sigma_bricks_mip_soa == per-cascade dense trilinear lookup
    in cascade-local coords (the contract _march_round's multicascade
    baked branch relies on)."""
    import jax.numpy as jnp

    from nerf_glasses_tpu.ops.bake import (pack_sigma_bricks,
                                           sample_baked_sigma,
                                           sample_sigma_bricks_mip_soa)

    rng = np.random.default_rng(5)
    R, n_casc = 16, 3
    grids = [rng.uniform(0, 10, (R, R, R)).astype(np.float32)
             for _ in range(n_casc)]
    packed = jnp.concatenate([pack_sigma_bricks(g) for g in grids], axis=0)

    # raw positions inside each cascade's cube (side 2^c around 0.5)
    pos = rng.uniform(0.05, 0.95, (256, 3)).astype(np.float32)
    mip = rng.integers(0, n_casc, 256).astype(np.int32)
    raw = (pos - 0.5) * (2.0 ** mip[:, None]) + 0.5

    got = np.asarray(sample_sigma_bricks_mip_soa(
        packed, n_casc, jnp.asarray(raw[:, 0]), jnp.asarray(raw[:, 1]),
        jnp.asarray(raw[:, 2]), jnp.asarray(mip)))
    for c in range(n_casc):
        sel = mip == c
        want = np.asarray(sample_baked_sigma(jnp.asarray(grids[c]),
                                             jnp.asarray(pos[sel])))
        np.testing.assert_allclose(got[sel], want, rtol=1e-4, atol=1e-4)


def test_baked_pyramid_render_matches_exact(tb4):
    """bake() on an aabb_scale=4 scene -> baked pyramid + deferred shade
    renders both the cascade-0 sphere and the cascade-2 blob to within a
    PSNR bound of the exact march (VERDICT r3 #3: the fast path must
    cover the full snapshot contract, testbed.cu:1027-1118)."""
    cams = []
    cam = np.zeros((3, 4), np.float32)
    cam[:, 0] = [0.4, 0, 0]
    cam[:, 1] = [0, -0.4, 0]
    cam[:, 2] = [0, 0, 1]
    cam[:, 3] = [0.0, 0.0, -1.6]        # cascade-0 sphere view
    cams.append(cam)
    cam = np.zeros((3, 4), np.float32)
    cam[:, 0] = [0.4, 0, 0]
    cam[:, 1] = [0, -0.4, 0]
    cam[:, 2] = [0, 0, -1]
    cam[:, 3] = [0.0, 0.0, 3.0]         # cascade-2 blob view
    cams.append(cam)

    def render_all():
        out = []
        for c in cams:
            tb4.camera_matrix = c
            out.append(np.asarray(tb4.render_frame_buffers(48, 48)[0]))
        return out

    exact = render_all()
    try:
        tb4.bake(128)
        assert tb4._baked_sigma is not None
        tb4.flash = True                # multicascade: deferred, no flash
        baked = render_all()
    finally:
        tb4.flash = False
        tb4.unbake()
    for e, b in zip(exact, baked):
        assert e[..., 3].max() > 0.9 and b[..., 3].max() > 0.9
        mse = float(np.mean((e - b) ** 2))
        p = 99.0 if mse <= 0 else 10.0 * np.log10(1.0 / mse)
        assert p > 30.0, p
