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


def test_viewer_moving_latency_recorded(tmp_path):
    """Perf-shaped interactive check: a moving-camera stretch must be
    recorded as such (FrameStats moving flag -> HUD), every frame has a
    positive synced render wall, and the half-res moving frames don't cost
    more than still full-res frames (they trace 4x fewer rays; allow 2x
    slack for jit/no-op noise on tiny CPU frames)."""
    from voxelrt.app.viewer import serve

    scene = Scene(exposure=10, image_res=(64, 48), quiet=True)
    scene.set_floor(-0.05, (1.0, 1.0, 1.0))
    scene.set_voxel((0, 0, 0), 2, (0.9, 0.1, 0.1))
    scene.set_directional_light((1, 1, 1), 0.1, (0.8, 0.8, 0.8))

    csv_path = str(tmp_path / "stats.csv")
    port_box = []
    done = threading.Event()

    def run():
        try:
            serve(scene, port=0, spp_per_frame=1, max_frames=40,
                  stats_csv=csv_path, ready_cb=port_box.append)
        finally:
            done.set()

    threading.Thread(target=run, daemon=True).start()
    deadline = time.time() + 300
    while not port_box and time.time() < deadline:
        time.sleep(0.05)
    assert port_box

    # press-and-hold W for a stretch of frames, then release
    _get(port_box[0], "/input?keys=w&dx=0&dy=0")
    saw_moving = False
    while time.time() < deadline and not done.is_set():
        if json.loads(_get(port_box[0], "/stat")[2]).get("moving"):
            saw_moving = True
            break
        time.sleep(0.2)
    _get(port_box[0], "/input?keys=&dx=0&dy=0")
    done.wait(timeout=300)
    assert saw_moving, "moving flag never surfaced in /stat"

    import csv as csv_mod

    with open(csv_path) as fh:
        rows = list(csv_mod.DictReader(fh))
    assert rows, "no stats rows written"
    walls = [float(r["wall_ms"]) for r in rows]
    moving = [float(r["wall_ms"]) for r in rows if r["moving"] == "1"]
    still = [float(r["wall_ms"]) for r in rows if r["moving"] == "0"]
    assert all(wm > 0 for wm in walls)
    assert moving and still
    med = lambda xs: sorted(xs)[len(xs) // 2]
    assert med(moving) <= 2.0 * med(still), (med(moving), med(still))
