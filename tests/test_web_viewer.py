"""Browser viewer (integrations/web_viewer.py): HTTP contract, MJPEG
stream, fly-cam input, and the HUD widget state machine — all driven
through real HTTP against a live server on a tiny CPU frame."""

import json
import time
import urllib.request

import numpy as np
import pytest

from sunray_tpu.config import RenderConfig


@pytest.fixture(scope="module")
def server():
    from sunray_tpu.integrations.web_viewer import ViewerServer

    cfg = RenderConfig(width=96, height=64, lighting="nee", bounces=2,
                       virtual_bounces=2, denoise_passes=0,
                       enable_taa=False, warmup_frames=1)
    srv = ViewerServer(cfg, port=0)
    srv.start()
    # Wait for the first rendered frame.
    t0 = time.time()
    while srv._frame_index == 0 and time.time() - t0 < 120:
        time.sleep(0.2)
    assert srv._frame_index > 0, "render loop produced no frame"
    yield srv
    srv.stop()


def _get(srv, path):
    return urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}{path}", timeout=30)


def _post(srv, ev):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/input",
        data=json.dumps(ev).encode(), method="POST")
    urllib.request.urlopen(req, timeout=30).read()


def _state(srv):
    return json.loads(_get(srv, "/state").read())


def _wait_frames(srv, n, timeout=120):
    start = srv._frame_index
    t0 = time.time()
    while srv._frame_index < start + n and time.time() - t0 < timeout:
        time.sleep(0.1)
    assert srv._frame_index >= start + n


def test_page_and_state(server):
    page = _get(server, "/").read().decode()
    assert "/stream" in page and "/input" in page
    st = _state(server)
    assert st["frame"] > 0 and len(st["camera"]) == 3
    assert [w["label"] for w in st["widgets"]] == ["SPAWN", "CLEAR",
                                                   "PAUSE"]


def test_mjpeg_stream_delivers_frames(server):
    resp = _get(server, "/stream")
    assert "multipart/x-mixed-replace" in resp.headers["Content-Type"]
    data = b""
    t0 = time.time()
    while data.count(b"--frame") < 2 and time.time() - t0 < 120:
        data += resp.read(4096)
    assert data.count(b"--frame") >= 2
    # JPEG SOI marker present in the payload.
    assert b"\xff\xd8\xff" in data


def test_flycam_input_moves_camera(server):
    st0 = _state(server)
    before = np.asarray(st0["camera"] + st0["yaw_pitch"])
    for _ in range(4):
        _post(server, {"type": "keys", "keys": ["w"], "dx": 30, "dy": 0})
        _wait_frames(server, 1)
    st1 = _state(server)
    after = np.asarray(st1["camera"] + st1["yaw_pitch"])
    # Mouse look moves yaw by ~0.075 rad per post; position moves by
    # move_speed * dt (dt is tiny on fast CPU frames, so yaw is the
    # robust signal).
    assert np.linalg.norm(after - before) > 1e-2


def test_widget_state_machine_and_spawn(server):
    st = _state(server)
    spawn = next(w for w in st["widgets"] if w["label"] == "SPAWN")
    assert spawn["state"] == "idle"
    h = server.cfg.height
    bx, by = 6 + 20, h - 20 + 7          # inside the SPAWN button
    _post(server, {"type": "move", "x": bx, "y": by})
    _wait_frames(server, 1)
    assert next(w for w in _state(server)["widgets"]
                if w["label"] == "SPAWN")["state"] == "hover"
    _post(server, {"type": "down", "x": bx, "y": by})
    _wait_frames(server, 1)
    assert next(w for w in _state(server)["widgets"]
                if w["label"] == "SPAWN")["state"] == "pressed"
    before = _state(server)["instances"]
    _post(server, {"type": "up", "x": bx, "y": by})
    _wait_frames(server, 2)
    st2 = _state(server)
    assert st2["spawned"] == 1
    assert st2["instances"] == before + 1
    # Release OUTSIDE must not click.
    _post(server, {"type": "down", "x": bx, "y": by})
    _post(server, {"type": "up", "x": 0, "y": 0})
    _wait_frames(server, 2)
    assert _state(server)["spawned"] == 1
    # CLEAR despawns.
    cx = 58 + 20
    _post(server, {"type": "down", "x": cx, "y": by})
    _post(server, {"type": "up", "x": cx, "y": by})
    _wait_frames(server, 2)
    assert _state(server)["spawned"] == 0


def test_pause_freezes_clock(server):
    px = 110 + 20
    py = server.cfg.height - 20 + 7
    _post(server, {"type": "down", "x": px, "y": py})
    _post(server, {"type": "up", "x": px, "y": py})
    _wait_frames(server, 1)
    assert _state(server)["paused"] is True
    _post(server, {"type": "down", "x": px, "y": py})
    _post(server, {"type": "up", "x": px, "y": py})
    _wait_frames(server, 1)
    assert _state(server)["paused"] is False
