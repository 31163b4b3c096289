"""Misc parity: lens models, Ema meters, pynmr surface, multi-NeRF
combine, spp accumulation."""

import numpy as np
import pytest

from nerf_glasses_tpu.utils import lens
from nerf_glasses_tpu.utils.meters import Ema


def test_latlong_roundtrip():
    rng = np.random.default_rng(0)
    d = rng.standard_normal((100, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    uv = lens.dir_to_latlong(d)
    d2 = lens.latlong_to_dir(uv)
    np.testing.assert_allclose(d, d2, atol=1e-5)


def test_ftheta_center_is_forward():
    params = (0.0, 1.0, 0.0, 0.0, 0.0, 100.0, 100.0)
    d = lens.f_theta_undistortion(np.array([[0.001, 0.0]]), params)
    # tiny offset -> nearly +z
    assert d[0, 2] > 0.99


def test_opencv_undistortion_inverts_distortion():
    k1, k2, p1, p2 = 0.1, -0.02, 0.001, 0.002
    xu = np.array([0.3])
    yu = np.array([-0.2])
    r2 = xu ** 2 + yu ** 2
    radial = 1 + k1 * r2 + k2 * r2 ** 2
    xd = xu * radial + 2 * p1 * xu * yu + p2 * (r2 + 2 * xu ** 2)
    yd = yu * radial + p1 * (r2 + 2 * yu ** 2) + 2 * p2 * xu * yu
    xr, yr = lens.opencv_lens_undistortion(xd, yd, k1, k2, p1, p2)
    np.testing.assert_allclose([xr[0], yr[0]], [xu[0], yu[0]], atol=1e-6)


def test_ema_step_mode():
    e = Ema("step", half_life=1.0)
    e.set(10.0)
    e.update(0.0)
    assert e.val == 0.0
    assert abs(e.ema_val - 5.0) < 1e-9  # decay 0.5 per step


def test_pynmr_surface():
    import pynmr as nmr
    for name in ("NerfMeshRenderer", "Testbed", "BoundingBox", "GltfNode",
                 "GltfScene", "NerfDataset", "free_temporary_memory",
                 "LossType", "NerfActivation", "ColorSpace", "TonemapCurve",
                 "LensMode", "GroundTruthRenderMode", "Vec3"):
        assert hasattr(nmr, name), name
    assert nmr.LossType.SmoothL1 is nmr.LossType.Huber  # legacy alias
    r = nmr.NerfMeshRenderer(8, 6)
    assert r.view_projection_mat.shape == (3, 4)
    # reference camelCase aliases exist
    assert r.loadNerf == r.load_nerf
    assert r.removeFloaties == r.remove_floaties


def test_multi_nerf_depth_combine(tmp_path):
    """Two NeRFs: nearest-depth merge (combineBuffersKernel,
    nerf_mesh_renderer.cu:34-48)."""
    from nerf_glasses_tpu.models.renderer import NerfMeshRenderer
    from tests.helpers import make_sphere_density, write_test_snapshot, \
        opaque_params

    near = tmp_path / "near.msgpack"
    far = tmp_path / "far.msgpack"
    # opaque sphere closer to the camera (z=+0.2 world = 0.7 ngp)
    write_test_snapshot(near, density_grid=make_sphere_density(
        0.15, center=(0.5, 0.5, 0.75)), params=opaque_params())
    write_test_snapshot(far, density_grid=make_sphere_density(
        0.15, center=(0.5, 0.5, 0.25)), params=opaque_params())

    r = NerfMeshRenderer(16, 12)
    n_far = r.load_nerf(str(far))
    n_near = r.load_nerf(str(near))
    for n in (n_far, n_near):
        n.march_overrides = {"max_rounds": 32, "jitter": False}
    r.frame()
    depth = r._depth_buffer
    # center pixel depth comes from the nearer sphere: camera z=2 ->
    # near-sphere front at world z=0.4 -> t ~ 1.6 (vs far sphere t ~ 2.1)
    assert 1.3 < depth[6, 8] < 1.9


def test_spp_accumulation_reduces_jitter_noise(tmp_path):
    from nerf_glasses_tpu.models.testbed import Testbed
    from tests.helpers import write_test_snapshot
    snap = tmp_path / "s.msgpack"
    write_test_snapshot(snap)
    tb = Testbed()
    tb.load_snapshot(str(snap))
    tb.march_overrides = {"max_rounds": 48}
    a = tb.render(12, 8, spp=1)
    b = tb.render(12, 8, spp=2)
    assert a.shape == b.shape == (8, 12, 4)
    assert np.isfinite(b).all()


def test_sharpen_image_unsharp_mask():
    """sharpen_image matches the reference's unsharp kernel
    (nerf_loader.cu:101-121): amplifies a step edge, preserves flats,
    uses flat-index neighbor clamping/wrapping."""
    from nerf_glasses_tpu.io.dataset import sharpen_image
    img = np.zeros((6, 8, 4), np.float32)
    img[:, 4:, :3] = 0.5
    img[..., 3] = 1.0
    out = sharpen_image(img, 0.5)
    # flat interior regions unchanged: (center_w*p - 4p)/(center_w-4) = p
    assert abs(out[3, 1, 0] - 0.0) < 1e-6
    assert abs(out[3, 6, 0] - 0.5) < 1e-6
    # edge pixels overshoot on the bright side, clamp at 0 on the dark
    assert out[3, 4, 0] > 0.5 + 1e-3
    assert out[3, 3, 0] == 0.0
    # amount=0 is the identity
    np.testing.assert_array_equal(sharpen_image(img, 0.0), img)
    # exact kernel check at an interior pixel: (cw*p - l - u - r - d)/(cw-4)
    cw = 4.0 + 1.0 / 0.5
    p, l, u, r, d = (img[3, 4, 0], img[3, 3, 0], img[2, 4, 0],
                     img[3, 5, 0], img[4, 4, 0])
    assert abs(out[3, 4, 0] - max(0.0, (cw * p - l - u - r - d) / (cw - 4))) \
        < 1e-6


def test_testbed_sharpen_applied_on_set_training_image():
    from nerf_glasses_tpu.models.testbed import Testbed
    tb = Testbed()
    tb.create_empty_nerf_dataset(n_images=1)
    img = np.zeros((4, 4, 4), np.float32)
    img[:, 2:, :3] = 1.0
    img[..., 3] = 1.0
    tb.nerf.sharpen = 0.4
    tb.set_training_image(0, img)
    stored = tb.dataset.images[0]
    assert stored[1, 2, 0] > 1.0  # sharpened overshoot


def test_renderer_stats_surface(tmp_path):
    """stats() exposes fps/frame-ms/HBM/per-phase numbers (the headless
    ImGui stats panel, nerf_mesh_renderer.cu:829-874)."""
    import pynmr as nmr
    from tests.helpers import write_test_snapshot
    snap = tmp_path / "s.msgpack"
    write_test_snapshot(snap)
    r = nmr.NerfMeshRenderer(16, 12)
    r.load_nerf(str(snap))
    for n in r._nerfs:
        n.march_overrides = {"max_rounds": 16}
    r.profile = True
    r.frame()
    s = r.stats()
    assert s["frame_count"] == 1 and s["n_nerfs"] == 1
    assert s["frame_ms"] > 0.0
    assert s["nerf_ms"] >= 0.0
    assert set(s) >= {"fps", "hbm_bytes_in_use", "hbm_bytes_limit"}
