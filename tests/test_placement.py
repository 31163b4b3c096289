"""Glasses-placement math: triangulation, Kabsch, plane intersection, and
the full synthetic landmark->placement flow (BASELINE config 4 without
MediaPipe)."""

import math

import numpy as np
import pytest

from nerf_glasses_tpu.utils import placement
from nerf_glasses_tpu.utils.camera import OrbitCamera, pack_camera
from nerf_glasses_tpu.utils.quat import quat_to_mat3


def project_to_landmark(cam: np.ndarray, point: np.ndarray):
    """Invert LandmarkRay: world point -> MediaPipe-style (x, y) in [0,1].

    dir = cam[:, :3] @ (2x-1, -2y+1, 1): solve for the ndc that makes the
    ray from cam origin pass through `point`.
    """
    rel = point - cam[:, 3]
    ndc = np.linalg.solve(cam[:, :3], rel)
    ndc = ndc / ndc[2]
    x = (ndc[0] + 1.0) / 2.0
    y = (1.0 - ndc[1]) / 2.0
    return x, y


def test_landmark_ray_roundtrip():
    cam = OrbitCamera()
    cam.orbit(0.7, -0.2, 0)
    m = cam.packed(16 / 9)
    p = np.array([0.1, 0.05, -0.2])
    x, y = project_to_landmark(m, p)
    ray = placement.LandmarkRay(m, x, y)
    # the ray passes through p: distance from p to the ray ~ 0
    ap = p - ray.origin
    t = np.dot(ap, ray.dir) / np.dot(ray.dir, ray.dir)
    closest = ray.origin + t * ray.dir
    np.testing.assert_allclose(closest, p, atol=1e-5)


def test_triangulation_recovers_point():
    gt = np.array([0.07, 0.02, -0.1])
    rays = []
    cam = OrbitCamera()
    for az in (0.0, 0.5, 1.1, 2.0):
        cam2 = OrbitCamera()
        cam2.orbit(az, -0.1, 0)
        m = cam2.packed(16 / 9)
        x, y = project_to_landmark(m, gt)
        rays.append(placement.LandmarkRay(m, x, y))
    rec = placement.closest_point_between_rays(rays)
    np.testing.assert_allclose(rec, gt, atol=1e-4)


def test_kabsch_quaternion():
    from nerf_glasses_tpu.utils.quat import quat_from_axis_angle
    q_gt = quat_from_axis_angle([0, 1, 0], 0.4)
    R = quat_to_mat3(q_gt)
    P = [np.array([1.0, 0, 0]), np.array([0, 0, 1.0]), np.array([0, 1.0, 0])]
    K = [R @ p for p in P]
    q = placement.kabsch_quaternion(P, K)
    np.testing.assert_allclose(np.abs(np.dot(q, q_gt)), 1.0, atol=1e-6)


def test_line_plane_intersection():
    p = placement.line_plane_intersection(
        [0, 0, -1], [0, 0, 1], [0, 0, 0.25], [0, 0, 1.0])
    np.testing.assert_allclose(p, [0, 0, 0.25], atol=1e-9)


def test_align_point_sets_recovers_transform():
    rng = np.random.default_rng(0)
    P = rng.standard_normal((20, 3))
    R = quat_to_mat3(placement.kabsch_quaternion(
        [np.array([1.0, 0, 0])], [np.array([0.8, 0.6, 0])]))
    t = np.array([0.3, -0.1, 0.5])
    K = P @ R.T + t
    T = placement.align_point_sets(P, K)
    # the reference formula (render.py:39-50) yields the transpose-side
    # rotation; verify the convention-free invariants it relies on:
    # orthonormal rotation + exact centroid mapping
    np.testing.assert_allclose(T[:3, :3] @ T[:3, :3].T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(T[:3, :3] @ P.mean(0) + T[:3, 3], K.mean(0),
                               atol=1e-6)
    # and the rotation angle matches the ground truth rotation's angle
    ang = math.acos(np.clip((np.trace(T[:3, :3]) - 1) / 2, -1, 1))
    ang_gt = math.acos(np.clip((np.trace(R) - 1) / 2, -1, 1))
    assert abs(ang - ang_gt) < 1e-6


def test_compute_glasses_placement_geometry():
    """Place synthetic glasses on a synthetic 'face': the computed scale
    must match the temple distance ratio and the translation must be the
    nose landmark (place_glasses, render.py:194-224)."""
    nose = np.array([0.0, 0.1, 0.0])
    lms = [
        nose,                               # 6
        nose + [0, -0.01, 0.01],            # 197
        nose + [0, -0.02, 0.02],            # 195
        np.array([-0.08, 0.12, -0.05]),     # 162 temple L
        np.array([0.08, 0.12, -0.05]),      # 389 temple R
        np.array([-0.085, 0.10, -0.05]),    # 127
        np.array([0.085, 0.10, -0.05]),     # 356
        np.array([-0.04, 0.11, 0.0]),       # 33 eye L
        np.array([0.04, 0.11, 0.0]),        # 263 eye R
    ]
    g_left = np.array([-0.732, -1.002, -0.057])
    g_right = np.array([0.732, -1.002, -0.057])
    t, s, r = placement.compute_glasses_placement(lms, g_left, g_right)
    np.testing.assert_allclose(t, nose, atol=1e-9)
    expected_scale = np.linalg.norm(lms[3] - lms[4]) / np.linalg.norm(
        g_left - g_right)
    np.testing.assert_allclose(s, expected_scale, atol=1e-9)
    assert abs(np.linalg.norm(r) - 1.0) < 1e-6


def test_estimate_face_orientation_identity():
    ref = np.random.default_rng(1).standard_normal((50, 3))
    d_az, d_po = placement.estimate_face_orientation(ref, ref.copy())
    # aligned landmarks -> identity transform -> azimuth atan2(0, 1) = 0
    assert abs(d_az) < 1e-6


def test_find_3d_landmarks_synthetic_flow(tmp_path):
    """Full app flow with an injected landmark provider: ground-truth 3D
    landmarks projected through the live camera must be re-triangulated
    to within a few mm."""
    from nerf_glasses_tpu.apps import render_app
    from nerf_glasses_tpu.models.renderer import NerfMeshRenderer
    from tests.helpers import write_test_snapshot

    snap = tmp_path / "s.msgpack"
    write_test_snapshot(snap)

    # ground-truth "face" landmark positions in renderer world space
    gt = {i: np.zeros(3) for i in range(478)}
    for k, lm_id in enumerate(placement_order()):
        gt[lm_id] = np.array([0.02 * k - 0.08, 0.05, 0.01 * k - 0.04])

    def landmark_fn(renderer, nerf):
        cam = renderer.view_projection_mat
        lms = np.zeros((478, 3), np.float32)
        for lm_id, p in gt.items():
            x, y = project_to_landmark(cam, p)
            lms[lm_id] = [x, y, 0.0]
        return lms

    r = NerfMeshRenderer(32, 24)
    nerf = r.load_nerf(str(snap))
    nerf.march_overrides = {"max_rounds": 4, "jitter": False}
    ref_landmarks = np.random.default_rng(0).standard_normal((478, 3))

    out = render_app.find_3d_landmarks(r, nerf, landmark_fn, ref_landmarks)
    for k, lm_id in enumerate(placement_order()):
        np.testing.assert_allclose(out[k], gt[lm_id], atol=5e-3)


def placement_order():
    return placement.LANDMARK_ORDER
