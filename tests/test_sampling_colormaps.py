"""Low-discrepancy sampling + colormap/overlay + dataset-shell parity."""

import numpy as np
import jax.numpy as jnp

from nerf_glasses_tpu.utils import sampling
from nerf_glasses_tpu.ops import colormaps


def test_halton_values():
    # base-2 radical inverse: 1->0.5, 2->0.25, 3->0.75
    np.testing.assert_allclose(sampling.halton(np.array([1, 2, 3]), 2),
                               [0.5, 0.25, 0.75])
    np.testing.assert_allclose(sampling.halton(np.array([1, 2, 3]), 3),
                               [1 / 3, 2 / 3, 1 / 9])


def test_sobol_low_discrepancy():
    pts = sampling.sobol2d(np.arange(1, 257))
    assert pts.shape == (256, 2)
    assert ((pts >= 0) & (pts < 1)).all()
    # stratification: every quadrant gets ~64 of 256 points
    counts = np.histogram2d(pts[:, 0], pts[:, 1], bins=2)[0]
    assert (np.abs(counts - 64) <= 2).all()


def test_pixel_offset_in_unit_square():
    for spp in range(8):
        off = sampling.ld_random_pixel_offset(spp)
        assert ((off >= 0) & (off < 1)).all()


def test_shirley_disk():
    uv = np.random.default_rng(0).uniform(-1, 1, (500, 2))
    d = sampling.square2disk_shirley(uv)
    assert (np.linalg.norm(d, axis=1) <= 1.0 + 1e-9).all()
    h = sampling.cosine_hemisphere(np.random.default_rng(1).uniform(
        0, 1, (500, 2)))
    assert (h[:, 2] >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(h, axis=1), 1.0, atol=1e-6)


def test_turbo_colormap_endpoints():
    lo = np.asarray(colormaps.colormap_turbo(jnp.asarray(0.1)))
    hi = np.asarray(colormaps.colormap_turbo(jnp.asarray(0.9)))
    # turbo goes blue -> red
    assert lo[2] > lo[0]
    assert hi[0] > hi[2]
    # x=0 matches the published polynomial constants
    z = np.asarray(colormaps.colormap_turbo(jnp.asarray(0.0)))
    np.testing.assert_allclose(z, [0.13572138, 0.09140261, 0.10667330],
                               atol=1e-6)


def test_overlay_depth():
    frame = jnp.ones((4, 4, 4)) * 0.5
    depth = jnp.zeros((4, 4)).at[1, 1].set(0.5)
    out = np.asarray(colormaps.overlay_depth(frame, depth))
    assert out.shape == (4, 4, 4)
    # untouched where depth == 0
    np.testing.assert_allclose(out[0, 0, :3], 0.5)
    assert not np.allclose(out[1, 1, :3], 0.5)


def test_empty_dataset_and_set_image():
    from nerf_glasses_tpu.models.testbed import Testbed
    tb = Testbed()
    tb.create_empty_nerf_dataset(2)
    img = np.random.default_rng(0).uniform(0, 1, (8, 10, 4)).astype(np.float32)
    tb.set_training_image(0, img)
    assert tb.dataset.metadata[0].resolution == (10, 8)
    cam = np.eye(4)[:3]
    tb.set_camera_extrinsics(0, cam)
    back = tb.get_camera_extrinsics(0)
    np.testing.assert_allclose(back, cam, atol=1e-6)


def test_direction_converters():
    from nerf_glasses_tpu.io.dataset import (nerf_direction_to_ngp,
                                             nerf_ray_to_ngp)
    d = np.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(nerf_direction_to_ngp(d), [2, 3, 1])
    o2, d2 = nerf_ray_to_ngp([1, 0, 0], d, 0.33, [0.5, 0.5, 0.5])
    np.testing.assert_allclose(o2, [0.5, 0.5, 0.83])
    np.testing.assert_allclose(d2, [2, 3, 1])

def test_renderer_visualize_depth_mode():
    """The hybrid renderer's visualize_depth mode false-colors hit pixels
    (the reference's overlay_depth render-buffer mode)."""
    from nerf_glasses_tpu.models.renderer import NerfMeshRenderer
    from tests.helpers import (TEST_CFG, make_sphere_density, opaque_params,
                               write_test_snapshot)
    import tempfile
    from nerf_glasses_tpu.config import NGPConfig
    cfg = NGPConfig(n_levels=4, log2_hashmap_size=9, base_resolution=4,
                    per_level_scale=2.0)
    path = tempfile.mktemp(suffix=".msgpack")
    write_test_snapshot(path, cfg=cfg, params=opaque_params(cfg),
                        density_grid=make_sphere_density(radius=0.25))
    r = NerfMeshRenderer(48, 36)
    nerf = r.load_nerf(path)
    nerf.march_overrides = {"max_rounds": 16}
    r.orbit(0, 0, 2.0)
    r.frame()
    plain = r.display_image()
    r.visualize_depth = True
    vis = r.display_image()
    depth = np.asarray(r._depth_buffer)
    hit = depth > 0
    assert hit.any()
    # overlaid pixels differ from the plain render; misses are untouched
    assert np.abs(vis[hit] - plain[hit]).max() > 0.05
    assert np.allclose(vis[~hit], plain[~hit])
