"""Headless drive of the browser viewer (apps/viewer_app.py) — the
GUI-layer analogue of the reference's GLFW/ImGui window
(nerf_mesh_renderer.cu:499-541,601-893), exercised over HTTP."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import pynmr
from nerf_glasses_tpu.apps import viewer_app
from tests.helpers import write_quad_gltf, write_test_snapshot


@pytest.fixture(scope="module")
def viewer(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("viewer")
    snap = tmp / "s.msgpack"
    write_test_snapshot(snap)
    renderer = pynmr.NerfMeshRenderer(32, 24)
    renderer.load_nerf(str(snap))
    server = viewer_app.make_server(renderer, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, renderer, tmp
    server.shutdown()
    server.server_close()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=60) as r:
        return r.status, r.read()


def _post(base, name, body):
    req = urllib.request.Request(
        base + "/api/" + name, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.read()


def test_page_and_frame(viewer):
    base, _, _ = viewer
    status, body = _get(base, "/")
    assert status == 200 and b"nerf-glasses-tpu viewer" in body
    status, body = _get(base, "/frame.jpg")
    assert status == 200 and body[:2] == b"\xff\xd8"  # JPEG magic


def test_orbit_changes_frame(viewer):
    base, renderer, _ = viewer
    _, before = _get(base, "/frame.jpg")
    cam = renderer.view_projection_mat.copy()
    _post(base, "orbit", {"da": 0.8, "dp": 0.2, "dz": 0.0})
    assert not np.allclose(cam, renderer.view_projection_mat)
    _, after = _get(base, "/frame.jpg")
    assert before != after


def test_stats_panel(viewer):
    base, _, _ = viewer
    status, body = _get(base, "/api/stats")
    s = json.loads(body)
    assert status == 200
    assert {"fps", "frame_ms", "n_nerfs", "frame_count"} <= set(s)
    assert s["n_nerfs"] == 1


def test_mesh_panel_actions(viewer):
    base, renderer, tmp = viewer
    quad = write_quad_gltf(tmp / "q.gltf")
    status, _ = _post(base, "load_mesh",
                      {"path": str(quad), "t": [0, 0, 0.2], "s": [0.3] * 3})
    assert status == 200 and len(renderer._meshes) == 1
    _post(base, "transform", {"mesh": 0, "t": [0.1, 0, 0.2], "yaw_deg": 45})
    node = renderer._meshes[0].nodes[0]
    assert np.allclose(node.translation, [0.1, 0, 0.2])
    assert abs(node.rotation[0] - np.cos(np.deg2rad(22.5))) < 1e-6
    _post(base, "clear", {"what": "meshes"})
    assert len(renderer._meshes) == 0


def test_density_light_and_errors(viewer):
    base, renderer, tmp = viewer
    f = tmp / "grid.bin"
    _post(base, "density", {"op": "dump", "filename": str(f)})
    assert f.exists() and f.stat().st_size > 0
    _post(base, "density", {"op": "load", "filename": str(f)})
    _post(base, "light", {"pos": [0.0, 2.0, 1.0]})
    assert np.allclose(renderer.light_pos, [0, 2, 1])
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "nonsense", {})
    assert e.value.code == 500
