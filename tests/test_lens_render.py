"""Render ray-gen features: lens distortion, LD sub-pixel offsets (AA),
rolling shutter, trained distortion grid.

Reference semantics: pixel_to_ray (ngp_common.cuh:277-399), rolling
shutter (testbed.cu:398-406, python_api.cu:113-126).
"""

import numpy as np
import pytest

from nerf_glasses_tpu.config import NGPConfig
from nerf_glasses_tpu.models.testbed import Testbed

from tests.helpers import (make_sphere_density, opaque_params,
                           write_test_snapshot)

CFG = NGPConfig(n_levels=4, log2_hashmap_size=9, base_resolution=4,
                per_level_scale=2.0)


@pytest.fixture(scope="module")
def tb(tmp_path_factory):
    path = tmp_path_factory.mktemp("lens") / "snap.msgpack"
    write_test_snapshot(path, cfg=CFG, params=opaque_params(CFG),
                        density_grid=make_sphere_density(radius=0.25))
    t = Testbed()
    t.load_snapshot(str(path))
    t.scale = 0.75   # zoom in: the sphere fills a good share of the frame
    # jitter off: isolates the sub-pixel ray offsets from the start-t
    # jitter (which also varies with sample_index by design)
    t.march_overrides = {"max_rounds": 32, "jitter": False}
    return t


def _render(tb, **kw):
    return tb.render(64, 48, spp=kw.pop("spp", 1), linear=True)


def test_lens_distortion_flag_changes_output(tb):
    base = _render(tb)
    tb.dataset.metadata[0].lens_mode = "opencv"
    tb.dataset.metadata[0].lens_params = (0.4, 0.1, 0.02, 0.02, 0, 0, 0)
    try:
        tb.nerf.render_with_lens_distortion = True
        distorted = _render(tb)
    finally:
        tb.nerf.render_with_lens_distortion = False
        tb.dataset.metadata[0].lens_mode = "perspective"
        tb.dataset.metadata[0].lens_params = (0.0,) * 7
    assert np.abs(distorted - base).max() > 1e-3


def test_distortion_grid_changes_output(tb):
    base = _render(tb)
    grid = np.zeros((8, 8, 2), np.float32)
    grid[..., 0] = 0.15
    try:
        tb.nerf.render_with_lens_distortion = True
        tb.distortion_map = grid
        shifted = _render(tb)
    finally:
        tb.nerf.render_with_lens_distortion = False
        tb.distortion_map = None
    assert np.abs(shifted - base).max() > 1e-3


def test_snap_to_pixel_centers_disables_offsets(tb):
    tb.snap_to_pixel_centers = True
    try:
        a = np.asarray(tb.render_frame_buffers(64, 48, sample_index=0)[0])
        b = np.asarray(tb.render_frame_buffers(64, 48, sample_index=3)[0])
    finally:
        tb.snap_to_pixel_centers = False
    assert np.array_equal(a, b)
    # with offsets on, samples differ (the AA mechanism is live)
    c = np.asarray(tb.render_frame_buffers(64, 48, sample_index=0)[0])
    d = np.asarray(tb.render_frame_buffers(64, 48, sample_index=3)[0])
    assert np.abs(c - d).max() > 1e-4


def test_spp_accumulation_antialiases(tb):
    """The spp=8 LD-offset average approximates the 3x-supersampled
    ground truth better than a single centered sample on silhouette
    edges (pre-tonemap alpha)."""
    w, h = 64, 48

    def alpha(width, height, spp, snap):
        tb.snap_to_pixel_centers = snap
        try:
            acc = None
            for i in range(spp):
                fb = np.asarray(tb.render_frame_buffers(width, height, i)[0])
                acc = fb if acc is None else acc + fb
            return acc[..., 3] / spp
        finally:
            tb.snap_to_pixel_centers = False

    one = alpha(w, h, 1, snap=True)
    hi = alpha(w * 3, h * 3, 1, snap=True)
    gt = hi.reshape(h, 3, w, 3).mean(axis=(1, 3))
    multi = alpha(w, h, 8, snap=False)
    # evaluate on edge pixels only (where the ground truth is fractional)
    edge = (gt > 0.05) & (gt < 0.95)
    assert edge.sum() > 20
    err_one = np.abs(one[edge] - gt[edge]).mean()
    err_multi = np.abs(multi[edge] - gt[edge]).mean()
    assert err_multi < err_one * 0.7, (err_one, err_multi)


def test_rolling_shutter_interpolates_rows(tb):
    """ray_time = v: buffer rows at v~0 render through the end camera,
    rows at v~1 through the start camera (testbed.cu:400-406)."""
    w, h = 64, 48
    start = np.asarray(tb.camera_matrix, np.float32).copy()
    end = start.copy()
    end[0, 3] += 0.12
    from nerf_glasses_tpu.io.dataset import ngp_matrix_to_nerf
    to_nerf = lambda m: ngp_matrix_to_nerf(
        m, tb.dataset.scale, tb.dataset.offset, tb.dataset.from_mitsuba)

    saved = tb.camera_matrix.copy()
    try:
        tb.camera_matrix = start
        S = _render(tb)
        alpha_s = np.asarray(tb.render_frame_buffers(w, h)[0])[..., 3]
        tb.camera_matrix = end
        E = _render(tb)
        alpha_e = np.asarray(tb.render_frame_buffers(w, h)[0])[..., 3]
    finally:
        tb.camera_matrix = saved
    assert np.abs(S - E).max() > 1e-3   # the shift is visible at all

    # scale the shutter so ray_time sweeps 0 -> 1 exactly across the
    # sphere's row extent: its low rows see the end camera (ray_time 0),
    # its high rows the start camera (ray_time 1)
    rows = np.nonzero((alpha_s + alpha_e).sum(axis=1) > 0.1)[0]
    r0, r1 = int(rows.min()), int(rows.max()) + 1
    span = r1 - r0
    assert span >= 5, span
    v0, v1 = r0 / h, r1 / h
    rs = np.array([-v0 / (v1 - v0), 0.0, 1.0 / (v1 - v0), 0.0], np.float32)
    R = tb.render_with_rolling_shutter(to_nerf(start), to_nerf(end), rs,
                                       w, h, spp=1)
    lo = slice(r0, r0 + max(2, int(0.35 * span)))
    hi = slice(r1 - max(2, int(0.35 * span)), r1)
    err_lo_end = np.abs(R[lo] - E[lo]).mean()
    err_lo_start = np.abs(R[lo] - S[lo]).mean()
    err_hi_start = np.abs(R[hi] - S[hi]).mean()
    err_hi_end = np.abs(R[hi] - E[hi]).mean()
    assert err_lo_end < err_lo_start, (err_lo_end, err_lo_start)
    assert err_hi_start < err_hi_end, (err_hi_start, err_hi_end)

    # start==end degenerates to the plain render
    A = tb.render_with_rolling_shutter(to_nerf(start), to_nerf(start), rs,
                                       w, h, spp=1)
    saved = tb.camera_matrix.copy()
    try:
        tb.camera_matrix = start
        plain = _render(tb)
    finally:
        tb.camera_matrix = saved
    assert np.abs(plain - A).max() < 1e-4
