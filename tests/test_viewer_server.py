"""HTTP smoke test for the viewer server (viewer/server.py) — the L4
surface the reference exposes through main.gd + ImGui. Exercises every
endpoint (`/`, `/frame`, `/stats`, `/input`, `/state`, `/basis`,
`/camreset`, `/load`) against a live in-process server on an ephemeral
port."""

import io
import json
import struct
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from godotgaussiansplatting_tpu.engine.rasterizer import Rasterizer
from godotgaussiansplatting_tpu.models.splats import synthetic_scene
from godotgaussiansplatting_tpu.viewer.server import make_server


@pytest.fixture(scope="module")
def server():
    cloud = synthetic_scene(500, seed=11, extent=1.5,
                            scale_range=(0.02, 0.08))
    r = Rasterizer(cloud, texture_size=(96, 64), quality="exact",
                   tile_capacity=512)
    httpd, state = make_server(r, port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    # wait for the render loop to produce a real first frame (the state
    # object starts with an 8x8 placeholder)
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        if _png_dims(state.frame_png) == (96, 64):
            break
        time.sleep(0.1)
    yield base, state
    httpd.shutdown()


def _png_dims(png: bytes):
    if png[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    w, h = struct.unpack(">II", png[16:24])
    return (w, h)


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=30) as resp:
        return resp.status, resp.read(), resp.headers.get("Content-Type")


def _post(base, path, payload):
    data = payload if isinstance(payload, bytes) else json.dumps(
        payload).encode()
    req = urllib.request.Request(base + path, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.status


def test_index_and_frame(server):
    base, _ = server
    code, body, ctype = _get(base, "/")
    assert code == 200 and ctype == "text/html" and b"<html" in body.lower()

    code, body, ctype = _get(base, "/frame")
    assert code == 200 and ctype == "image/png"
    assert _png_dims(body) == (96, 64)


def test_stats_panel(server):
    base, _ = server
    code, body, _ = _get(base, "/stats")
    st = json.loads(body)
    assert code == 200
    # the panel mirrors main.gd:93-119's debug stat block
    assert "FPS" in st["panel"] and "Stage Timings" in st["panel"]
    assert 0.0 <= st["progress"] <= 1.0


def test_input_moves_camera(server):
    base, state = server
    # free-look: RMB held + W pressed should move the camera forward
    p0 = np.asarray(state.ctl.camera.position, np.float32).copy()
    for _ in range(8):
        assert _post(base, "/input", {"keys": {"w": 1}, "rmb": 1,
                                      "dx": 0, "dy": 0}) == 200
        time.sleep(0.02)
    p1 = np.asarray(state.ctl.camera.position, np.float32)
    assert np.linalg.norm(p1 - p0) > 1e-4


def test_ui_state_roundtrip(server):
    base, state = server
    assert _post(base, "/state", {"rscale": 0.5, "heatmap": 1,
                                  "mscale": 2.0, "fov": 90.0}) == 200
    assert abs(state.r.render_scale - 0.5) < 1e-6
    assert state.r.should_enable_heatmap is True
    assert abs(state.r.model_scale - 2.0) < 1e-6
    assert abs(state.fov - 90.0) < 1e-6
    _post(base, "/state", {"rscale": 1.0, "heatmap": 0, "mscale": 1.0,
                           "fov": 75.0})


def test_basis_and_camreset(server):
    base, state = server
    assert _post(base, "/basis", {"op": "override"}) == 200
    _, body, _ = _get(base, "/stats")
    assert json.loads(body)["has_override"] is True
    assert _post(base, "/basis", {"op": "reset"}) == 200
    _, body, _ = _get(base, "/stats")
    assert json.loads(body)["has_override"] is False
    assert _post(base, "/camreset", {}) == 200
    np.testing.assert_allclose(state.ctl.orbit_position, [0, 0, 2.0],
                               atol=1e-5)


def test_unknown_route_404(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base, "/nope")
    assert e.value.code == 404


def test_load_new_model(server):
    base, state = server
    from godotgaussiansplatting_tpu.models.ply import write_ply
    rng = np.random.default_rng(0)
    n = 64
    buf = io.BytesIO()
    write_ply(buf,
              means=rng.normal(size=(n, 3)).astype(np.float32),
              scales_linear=np.full((n, 3), 0.05, np.float32),
              quats_xyzw=np.tile(np.array([0, 0, 0, 1], np.float32), (n, 1)),
              opacities=np.full(n, 0.9, np.float32),
              sh=np.zeros((n, 16, 3), np.float32))
    assert _post(base, "/load", buf.getvalue()) == 200
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline and state.r.num_splats_loaded < n:
        time.sleep(0.1)
    assert state.r.cloud.num_splats == n
