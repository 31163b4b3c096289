"""Chebyshev distance-grid advance (MarchOptions.dist_advance).

The distance grid must match a scipy chessboard distance-transform
oracle, and distance-stepped marching must produce the same frame as
the mip-jump advance: both advance by multiples of the same dt from
the same start, and both are conservative (only empty lattice points
are skipped), so they settle at the identical first occupied sample.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from nerf_glasses_tpu.ops import occupancy as occ_ops
from nerf_glasses_tpu.ops import raymarch
from tests.test_raymarch import CFG, OPTS, zero_params


def blob_occ(r0=0.22, center=(0.5, 0.55, 0.5)):
    g = (np.arange(128) + 0.5) / 128
    z, y, x = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt((x - center[0]) ** 2 + (y - center[1]) ** 2
                + (z - center[2]) ** 2)
    occ = np.zeros((8, 128, 128, 128), np.uint8)
    occ[:] = (r < r0).astype(np.uint8)[None]
    return occ


def test_dist_grid_matches_chessboard_oracle():
    from scipy.ndimage import distance_transform_cdt

    rng = np.random.default_rng(4)
    occ = np.zeros((8, 128, 128, 128), np.uint8)
    occ[0] = (rng.uniform(size=(128,) * 3) < 0.0005).astype(np.uint8)
    occ[0, 40:44, 60:64, 80:84] = 1     # one solid blob
    cap = 31
    dist = np.asarray(occ_ops.build_dist_grid(jnp.asarray(occ),
                                              max_dist=cap))
    oracle = distance_transform_cdt(occ[0] == 0, metric="chessboard")
    np.testing.assert_array_equal(dist, np.minimum(oracle, cap))


def test_dist_advance_matches_jump_advance_frame():
    params = zero_params()
    occ = blob_occ()
    scene = raymarch.make_scene(occ, np.zeros(3), np.ones(3), np.eye(3),
                                np.zeros(3), np.ones(3))
    scene["dist"] = occ_ops.build_dist_grid(scene["occ"])

    n = 256
    rng = np.random.default_rng(1)
    o = np.tile(np.array([[0.5, 0.5, -1.0]], np.float32), (n, 1))
    o[:, :2] += rng.uniform(-0.4, 0.4, (n, 2)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 2.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    surf = np.zeros((n, 4), np.float32)
    tsurf = np.zeros((n,), np.float32)
    surf[::7] = [0.8, 0.1, 0.1, 1.0]    # exercise park-at-surface
    tsurf[::7] = 1.6

    args = (jnp.asarray(o), jnp.asarray(d), jnp.asarray(surf),
            jnp.asarray(tsurf))
    base = dataclasses.replace(OPTS, chunk=64, rounds_per_epoch=2)
    ref = raymarch.march_frame(params, scene, *args, base)
    out = raymarch.march_frame(
        params, scene, *args, dataclasses.replace(base, dist_advance=True))

    np.testing.assert_allclose(np.asarray(out["rgba"]),
                               np.asarray(ref["rgba"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref["depth"]), atol=1e-5)


def test_dist_advance_flash_render_matches(tmp_path):
    """Full flash render path via the Testbed with dist_advance toggled:
    the scene gains scene["dist"] on bake and the frames must agree."""
    from nerf_glasses_tpu.models.testbed import Testbed
    from tests.helpers import opaque_params, write_test_snapshot

    snap = tmp_path / "s.msgpack"
    write_test_snapshot(snap, params=opaque_params(sigma_raw=6.0))
    tb = Testbed()
    tb.load_snapshot(str(snap))
    tb.bake(64)
    tb.flash = True
    img_ref = np.asarray(tb.render(32, 32, spp=1, linear=True))
    tb.march_overrides = {**tb.march_overrides, "dist_advance": True}
    img_dist = np.asarray(tb.render(32, 32, spp=1, linear=True))
    assert np.isfinite(img_dist).all()
    np.testing.assert_allclose(img_dist, img_ref, atol=1e-4)
