"""LiveViewer + fly-cam integration tests (examples/window analog).

Covers: the HTTP surface (page / frame / stats / input), fly-cam input
integration (mouse look + WASD), and that posted input actually moves the
rendered camera between frames.
"""

import json
import math
import threading
import urllib.request

import numpy as np
import pytest

from sunray_tpu.config import RenderConfig
from sunray_tpu.integrations.engine import FlyCamera, FlyCameraAdapter
from sunray_tpu.integrations.viewer import LiveViewer
from sunray_tpu.render.renderer import Renderer
from sunray_tpu.scene import cornell_box
from sunray_tpu.scene.manager import SceneManager


def _tiny_renderer():
    r = Renderer(RenderConfig(width=48, height=32, lighting="nee",
                              denoise_passes=0))
    box = cornell_box()
    r._manager = SceneManager.from_scene_buffers(box)
    r.scene = r._manager.build(r._manager.default_instances(box))
    return r


def test_flycam_input_integration():
    cam = FlyCamera(position=np.zeros(3), yaw=0.0, pitch=0.0, move_speed=1.0)
    # yaw=0 faces +z; 'w' for 2 simulated seconds moves +z by 2.
    cam.apply_input(["w"], 0.0, 0.0, dt=2.0)
    np.testing.assert_allclose(cam.position, [0.0, 0.0, 2.0], atol=1e-12)
    # strafe right from +z heading is -x (right = cross(fwd, up) frame).
    cam.apply_input(["d"], 0.0, 0.0, dt=1.0)
    assert cam.position[0] == pytest.approx(-1.0)
    # mouse up (dy<0) pitches up; pitch clamps at 89 deg.
    cam.apply_input([], 0.0, -1e9, dt=0.01)
    assert cam.pitch == pytest.approx(math.radians(89.0))
    c = cam.camera()
    assert np.asarray(c.target)[1] > np.asarray(c.position)[1]


def test_flycam_vertical_and_yaw():
    cam = FlyCamera(position=np.zeros(3), yaw=0.0, pitch=0.0, move_speed=1.0)
    cam.apply_input(["e"], 0.0, 0.0, dt=1.5)   # up
    cam.apply_input(["q"], 0.0, 0.0, dt=0.5)   # down
    assert cam.position[1] == pytest.approx(1.0)
    # mouse right (dx>0) turns right (yaw decreases).
    y0 = cam.yaw
    cam.apply_input([], 100.0, 0.0, dt=0.01)
    assert cam.yaw < y0


def test_live_viewer_http_roundtrip():
    r = _tiny_renderer()
    adapter = FlyCameraAdapter()
    adapter.flycam.position = np.array([1.0, 1.0, 3.4])
    viewer = LiveViewer(r, adapter, port=0, overlay=True)
    positions = []

    orig_extract = adapter.extract

    def extract(t, dt):
        positions.append(adapter.flycam.position.copy())
        return orig_extract(t, dt)

    adapter.extract = extract

    # Post fly-cam input from a "browser" thread while frames render.
    def poke():
        body = json.dumps({"keys": ["w"], "dx": 5.0, "dy": 0.0}).encode()
        req = urllib.request.Request(
            f"{viewer.address}/input", data=body, method="POST")
        urllib.request.urlopen(req, timeout=10).read()

    t = threading.Timer(0.0, poke)
    t.start()
    n = viewer.run(max_frames=6)
    t.join()
    assert n == 6

    page = urllib.request.urlopen(viewer.address + "/", timeout=10).read()
    assert b"pointer-lock" in page or b"requestPointerLock" in page
    jpeg = urllib.request.urlopen(
        viewer.address + "/frame.jpg", timeout=10).read()
    assert jpeg[:2] == b"\xff\xd8"  # JPEG SOI
    stats = json.loads(urllib.request.urlopen(
        viewer.address + "/stats", timeout=10).read())
    assert stats["frame"] == 6
    viewer.stop()

    # The posted 'w' must have moved the camera between some pair of frames.
    deltas = [np.linalg.norm(b - a) for a, b in zip(positions, positions[1:])]
    assert max(deltas) > 0.0
