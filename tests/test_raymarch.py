"""March-loop tests against analytic volume rendering.

With all-zero MLP weights the network outputs sigma_raw = 0 and
rgb_raw = 0 everywhere, so after activations (exp / logistic) the volume
has constant density 1.0 and constant color 0.5 — Beer-Lambert closed
forms apply: alpha(L) = 1 - exp(-L).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_glasses_tpu import constants as C
from nerf_glasses_tpu.config import NGPConfig
from nerf_glasses_tpu.ops import raymarch
from nerf_glasses_tpu.ops.network import init_params

CFG = NGPConfig(n_levels=4, log2_hashmap_size=7, base_resolution=4,
                per_level_scale=2.0)


def zero_params():
    p = init_params(jax.random.PRNGKey(0), CFG)
    return jax.tree.map(jnp.zeros_like, p)


def make_scene(occ_full=True):
    occ = np.ones((8, 128, 128, 128), np.uint8) if occ_full else \
        np.zeros((8, 128, 128, 128), np.uint8)
    return raymarch.make_scene(
        occ, np.zeros(3), np.ones(3), np.eye(3), np.zeros(3), np.ones(3))


OPTS = raymarch.MarchOptions(config=CFG, jitter=False, compute_dtype="float32")


def straight_rays(n=4, z0=-1.0):
    o = np.tile(np.array([[0.5, 0.5, z0]], np.float32), (n, 1))
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    return jnp.asarray(o), jnp.asarray(d)


def test_constant_density_beer_lambert():
    params = zero_params()
    scene = make_scene(occ_full=True)
    o, d = straight_rays()
    out = raymarch.march_rays(params, scene, o, d,
                              jnp.zeros((4, 4)), jnp.zeros(4), OPTS)
    rgba = np.asarray(out["rgba"])
    # ray crosses the unit cube: optical depth = 1 -> alpha = 1 - e^-1
    expect_a = 1.0 - math.exp(-1.0)
    np.testing.assert_allclose(rgba[:, 3], expect_a, atol=0.01)
    # color = 0.5 premultiplied
    np.testing.assert_allclose(rgba[:, 0], 0.5 * expect_a, atol=0.01)
    # depth: max-weight sample is the first one (weights decay) -> ~t_enter
    depth = np.asarray(out["depth"])
    np.testing.assert_allclose(depth, 1.0, atol=0.02)


def test_empty_space_is_transparent():
    params = zero_params()
    scene = make_scene(occ_full=False)
    o, d = straight_rays()
    out = raymarch.march_rays(params, scene, o, d,
                              jnp.zeros((4, 4)), jnp.zeros(4), OPTS)
    np.testing.assert_allclose(np.asarray(out["rgba"]), 0.0, atol=1e-6)


def test_surface_only_composites_surface():
    """Empty volume + opaque mesh surface -> pixel = surface color."""
    params = zero_params()
    scene = make_scene(occ_full=False)
    o, d = straight_rays()
    surf = jnp.tile(jnp.asarray([[0.9, 0.2, 0.1, 1.0]]), (4, 1))
    t_surf = jnp.full((4,), 1.5)  # inside the cube along the ray
    out = raymarch.march_rays(params, scene, o, d, surf, t_surf, OPTS)
    rgba = np.asarray(out["rgba"])
    np.testing.assert_allclose(rgba, np.asarray(surf), atol=1e-5)


def test_opaque_surface_gates_volume():
    """Dense volume with an opaque surface at t_s: the march must stop at
    the surface and blend it with remaining transmittance
    (testbed.cu:600-607, 886-897)."""
    params = zero_params()
    scene = make_scene(occ_full=True)
    o, d = straight_rays()
    t_s = 1.4  # 0.4 into the cube (entry at t=1)
    surf = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0, 1.0]]), (4, 1))
    out = raymarch.march_rays(params, scene, o, d, surf,
                              jnp.full((4,), t_s), OPTS)
    rgba = np.asarray(out["rgba"])
    a_vol = 1.0 - math.exp(-0.4)
    np.testing.assert_allclose(rgba[:, 3], 1.0, atol=0.01)
    # red channel: volume contributes 0.5*a_vol, surface 1*(1-a_vol)
    np.testing.assert_allclose(rgba[:, 0], 0.5 * a_vol + (1 - a_vol),
                               atol=0.02)
    np.testing.assert_allclose(rgba[:, 1], 0.5 * a_vol, atol=0.02)


def test_partial_surface_blended_in_march():
    """Half-transparent surface: volume continues behind it."""
    params = zero_params()
    scene = make_scene(occ_full=True)
    o, d = straight_rays()
    t_s = 1.4
    surf = jnp.tile(jnp.asarray([[1.0, 1.0, 1.0, 0.5]]), (4, 1))
    out = raymarch.march_rays(params, scene, o, d, surf,
                              jnp.full((4,), t_s), OPTS)
    rgba = np.asarray(out["rgba"])
    # front volume segment
    a1 = 1.0 - math.exp(-0.4)
    # surface contributes 0.5 alpha of remaining T (reference in-march
    # blend adds rgb * alpha * T)
    T1 = 1.0 - a1
    a_after_surf = a1 + 0.5 * T1
    # back volume segment fills most of the rest
    assert rgba[0, 3] > a_after_surf - 0.02
    # alpha window: march blends the surface at a window boundary, so the
    # exact crossing point can differ by up to K*dt from t_s
    assert rgba[0, 3] <= 1.0 + 1e-5


def test_render_image_shapes():
    params = zero_params()
    scene = make_scene(occ_full=True)
    cam = np.array([[1.1, 0.0, 0.0, 0.0],
                    [0.0, 1.1, 0.0, 0.0],
                    [0.0, 0.0, -1.0, 0.0]], np.float32)
    cam[:, 3] = [0.0, 0.0, 2.0]
    fb, depth = raymarch.render_image(params, scene, cam, 32, 24, OPTS,
                                      tile_size=256)
    assert fb.shape == (24, 32, 4) and depth.shape == (24, 32)
    assert np.isfinite(fb).all()
    # central pixel looks at the cube -> nonzero alpha
    assert fb[12, 16, 3] > 0.5


def test_depth_of_field_blurs_off_focus():
    """aperture_size > 0 jitters ray origins on the aperture disk while
    keeping the focus plane sharp (pixel_to_ray, ngp_common.cuh:330-345)."""
    import dataclasses
    from tests.helpers import opaque_params, make_sphere_density
    import jax.numpy as jnp
    from nerf_glasses_tpu.config import NGPConfig
    from nerf_glasses_tpu.ops import raymarch, occupancy as occ_ops
    import numpy as np

    cfg = NGPConfig(n_levels=4, log2_hashmap_size=11, base_resolution=16,
                    per_level_scale=1.5)
    params = opaque_params(cfg)
    grid = make_sphere_density(radius=0.2, value=1.0)
    occ = occ_ops.build_occupancy(jnp.asarray(np.tile(grid, (8, 1, 1, 1))), 0)
    scene = raymarch.make_scene(occ, np.zeros(3), np.ones(3), np.eye(3),
                                np.zeros(3), np.ones(3))
    cam = np.zeros((3, 4), np.float32)
    cam[:, 0] = [0.35, 0, 0]
    cam[:, 1] = [0, 0.35, 0]
    cam[:, 2] = [0, 0, 1]
    cam[:, 3] = [0, 0, -1.0]       # +0.5 shift puts origin at (.5,.5,-.5)

    base = raymarch.MarchOptions(config=cfg, jitter=False, max_rounds=64)
    # snap_centers isolates the aperture jitter from the AA sub-pixel
    # offsets (which also move edge samples)
    sharp, _ = raymarch.render_image_device(params, scene, cam, 32, 32,
                                            base, snap_centers=True)
    # focus plane at the sphere front (~0.8 from origin): stays sharp-ish
    dof = dataclasses.replace(base, aperture_size=0.15, focus_z=0.8)
    blurred, _ = raymarch.render_image_device(params, scene, cam, 32, 32,
                                              dof, snap_centers=True)
    sharp, blurred = np.asarray(sharp), np.asarray(blurred)
    assert np.isfinite(blurred).all()
    # alpha edge between sphere and background softens: count pixels with
    # intermediate alpha
    mid_sharp = ((sharp[..., 3] > 0.1) & (sharp[..., 3] < 0.9)).sum()
    mid_blur = ((blurred[..., 3] > 0.1) & (blurred[..., 3] < 0.9)).sum()
    assert mid_blur > mid_sharp + 5, (mid_sharp, mid_blur)
    # the image is still the same scene (centers agree)
    c = 16
    assert abs(float(sharp[c, c, 3]) - float(blurred[c, c, 3])) < 0.2
