"""The interactive viewer: HTTP present seam + real event plumbing into
InputSystem/CameraController (the reference's GLFW window + ImGui panel
role, main.cpp:93-144)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from renderengine_tpu.apps.live_viewer import LiveViewer
from renderengine_tpu.core.config import RenderConfig
from renderengine_tpu.scene import procedural


@pytest.fixture
def viewer():
    sc = procedural.cube_scene(width=96, height=64)
    cfg = RenderConfig(width=96, height=64, shadow_extent=32,
                       translucency=False)
    v = LiveViewer(sc, cfg, port=0, target_fps=0.0)
    v.start_server()
    yield v
    v.stop()


def _url(v, path):
    return f"http://127.0.0.1:{v.port}{path}"


class TestLiveViewer:
    def test_page_stream_and_input_roundtrip(self, viewer):
        page = urllib.request.urlopen(_url(viewer, "/"), timeout=5).read()
        assert b"/stream" in page and b"/input" in page

        # queue browser events: orbit drag + scroll zoom
        events = [
            {"t": "button", "b": "right", "d": True},   # RMB-drag orbits
            {"t": "cursor", "x": 10.0, "y": 10.0},
            {"t": "cursor", "x": 40.0, "y": 18.0},
            {"t": "scroll", "dx": 0, "dy": 1},
            {"t": "key", "k": "]", "a": 0},      # exposure up
        ]
        req = urllib.request.Request(_url(viewer, "/input"),
                                     data=json.dumps(events).encode(),
                                     method="POST")
        assert urllib.request.urlopen(req, timeout=5).status == 204

        fov0 = viewer.scene.camera.fov_degrees
        eye0 = np.asarray(viewer.scene.camera.eye).copy()
        exp0 = viewer.scene.camera.exposure

        # stream reader in a thread (blocks until a frame is presented)
        got = {}

        def read_stream():
            r = urllib.request.urlopen(_url(viewer, "/stream"), timeout=30)
            assert r.headers["Content-Type"].startswith(
                "multipart/x-mixed-replace")
            line = r.readline()          # --frame
            assert line.strip() == b"--frame"
            headers = {}
            while True:
                h = r.readline().strip()
                if not h:
                    break
                k, _, val = h.partition(b":")
                headers[k.lower()] = val.strip()
            n = int(headers[b"content-length"])
            got["png"] = r.read(n)

        t = threading.Thread(target=read_stream)
        t.start()

        # drive the render loop a few frames (events drain on-update)
        for _ in range(4):
            assert viewer._update(1 / 60) is True
            viewer.loop.render_one()
        viewer.loop.drain()
        t.join(timeout=30)
        assert not t.is_alive()

        assert got["png"][:8] == b"\x89PNG\r\n\x1a\n"
        # the drag orbited the camera, the scroll zoomed, ']' raised exposure
        assert not np.allclose(np.asarray(viewer.scene.camera.eye), eye0)
        assert viewer.scene.camera.fov_degrees != fov0
        assert viewer.scene.camera.exposure > exp0

        stats = json.loads(urllib.request.urlopen(
            _url(viewer, "/stats"), timeout=5).read())
        assert stats["frame"] >= 4
