"""Smoke test for the browser viewer (the GGUI replacement,
reference scene.py:171-297): serve a real HTTP session on an ephemeral
port, fetch the page and a frame, post input, and assert frames advance.
"""

import json
import threading
import time
import urllib.request

import numpy as np

from voxelrt import Scene


def _get(port, path):
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=10
        ) as r:
            return r.status, r.headers.get("Content-Type"), r.read()
    except urllib.error.HTTPError as e:  # non-2xx still has a status
        return e.code, e.headers.get("Content-Type"), e.read()


def test_viewer_serves_frames_and_input():
    from voxelrt.app.viewer import serve

    scene = Scene(exposure=10, image_res=(64, 48), quiet=True)
    scene.set_floor(-0.05, (1.0, 1.0, 1.0))
    scene.set_voxel((0, 0, 0), 2, (0.9, 0.1, 0.1))
    scene.set_directional_light((1, 1, 1), 0.1, (0.8, 0.8, 0.8))

    port_box = []
    done = threading.Event()

    def run():
        try:
            serve(scene, port=0, spp_per_frame=1, max_frames=60,
                  ready_cb=port_box.append)
        finally:
            done.set()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    deadline = time.time() + 300
    while not port_box and time.time() < deadline:
        time.sleep(0.05)
    assert port_box, "viewer never bound a port"
    port = port_box[0]

    # the landing page
    code, ctype, body = _get(port, "/")
    assert code == 200 and "text/html" in ctype and b"frame.png" in body

    # wait for the first rendered frame (first jit can be slow on CPU)
    png = b""
    while time.time() < deadline:
        code, ctype, png = _get(port, "/frame.png")
        if png:
            break
        time.sleep(0.25)
    assert code == 200 and png[:8] == b"\x89PNG\r\n\x1a\n", "no frame produced"

    # stat reports progress; accumulation advances across frames
    spp = 0
    while time.time() < deadline and not done.is_set():
        spp = json.loads(_get(port, "/stat")[2])["spp"]
        if spp >= 2:
            break
        time.sleep(0.25)
    assert spp >= 2, "accumulation never advanced"

    # input endpoint accepts camera input (orbit + move keys + fov)
    code, _, body = _get(port, "/input?keys=w&dx=0.01&dy=0.0&fov=55")
    assert code == 200 and body == b"ok"

    # unknown path 404s
    code, _, _ = _get(port, "/nope")
    assert code == 404

    done.wait(timeout=300)
    assert done.is_set(), "viewer loop did not terminate at max_frames"
