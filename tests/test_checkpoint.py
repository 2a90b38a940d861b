"""Checkpoint/resume of progressive renders (SURVEY.md §5 — the reference
has none; its closest analogue is the resettable accumulation state,
renderer/pathtracer.py:664-668). A resumed render must reproduce the
uninterrupted image exactly."""

import os

import numpy as np
import pytest

from voxelrt.app.headless import HeadlessRenderer
from voxelrt.app.testing import make_test_world, tiny_config
from voxelrt.utils.profiling import FrameStats


class _FakeScene:
    """Minimal Scene stand-in for driving HeadlessRenderer directly."""

    def __init__(self, cfg, world):
        from voxelrt.camera import Camera

        self.config = cfg
        self.world = world
        self.camera = Camera()  # default pose (0.4, 0.5, 2.0) → origin
        self._fov = np.radians(50.0)
        light = np.array([1.0, 1.0, 1.0])
        self._light_direction = light / np.linalg.norm(light)
        self._light_cone_cos_theta_max = np.cos(0.05)
        self._light_color = np.array([1.0, 0.95, 0.9])
        self._floor_height = -0.1
        self._floor_color = np.array([0.8, 0.8, 0.85])
        self._floor_material = 1
        self._background_color = np.array([0.2, 0.3, 0.5])


def _renderer(cfg, world, seed=3):
    r = HeadlessRenderer(cfg, _FakeScene(cfg, world), seed=seed, quiet=True)
    r.prepare_data()
    return r


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = tiny_config(image_res=(48, 24))
    world = make_test_world(cfg)
    return cfg, world


def test_kill_and_resume_reproduces_uninterrupted(tmp_path, tiny_setup):
    cfg, world = tiny_setup
    spp, chunk = 24, 6

    img_full = _renderer(cfg, world).render(spp=spp, chunk=chunk)

    # "Killed" run: checkpoint mid-way, throw the renderer away.
    ck = str(tmp_path / "render.npz")
    r1 = _renderer(cfg, world)
    r1.render(spp=12, chunk=chunk, checkpoint_every=chunk,
              checkpoint_path=ck, log_every=10**9)
    # render() only checkpoints *mid-run*; force the final state to disk the
    # way a periodic checkpoint would land at done=12 of a longer run.
    from voxelrt.utils.checkpoint import save_render_state

    save_render_state(ck, r1.state, r1.key, r1._frame, extra={"done": 12})
    del r1

    r2 = _renderer(cfg, world)
    img_resumed = r2.render(spp=spp, chunk=chunk, resume_from=ck)

    np.testing.assert_allclose(img_resumed, img_full, atol=1e-6)


def test_mid_run_checkpoint_is_written_and_loadable(tmp_path, tiny_setup):
    cfg, world = tiny_setup
    ck = str(tmp_path / "mid.npz")
    r = _renderer(cfg, world)
    r.render(spp=18, chunk=6, checkpoint_every=6, checkpoint_path=ck,
             log_every=10**9)
    from voxelrt.render import pipeline
    from voxelrt.utils.checkpoint import load_render_state

    state, key, frame, extra = load_render_state(ck, pipeline.init_state(cfg))
    assert int(extra["done"]) == 12  # last mid-run boundary before spp=18
    assert frame == 12
    assert state.color.shape == (48, 24, 3)
    assert np.isfinite(np.asarray(state.color)).all()


def test_framestats_rows_from_render_and_run_frames(tmp_path, tiny_setup):
    cfg, world = tiny_setup
    csv_path = str(tmp_path / "stats.csv")
    stats = FrameStats(csv_path=csv_path)
    r = _renderer(cfg, world)
    r.render(spp=8, chunk=4, stats=stats, log_every=10**9)
    assert len(stats.rows) == 2
    assert all(row["wall_ms"] > 0 for row in stats.rows)
    # first chunk includes compile time, so only check the field is populated
    assert all(row["mrays_per_s"] >= 0 for row in stats.rows)

    frames = [{"dt": 0.03, "move_keys": ["w"]}, {"dt": 0.03}, {"dt": 0.03}]
    r.run_frames(frames, spp_per_frame=1, stats=stats)
    assert len(stats.rows) == 5
    with open(csv_path) as fh:
        assert len(fh.read().strip().splitlines()) == 6  # header + 5 rows


def test_run_frames_sync_lag_records_every_frame(tiny_setup):
    """sync_lag=1 (double-buffered frame sync) must still record one stats
    row per frame, in dispatch order, with the same moving flags and
    positive wall times as the synchronous path."""
    cfg, world = tiny_setup
    stats = FrameStats(out=open(os.devnull, "w"))
    r = _renderer(cfg, world)
    frames = [{"dt": 0.03, "move_keys": ["w"]}, {"dt": 0.03, "orbit": (0.01, 0.0)},
              {"dt": 0.03}, {"dt": 0.03}]
    img = r.run_frames(frames, spp_per_frame=1, stats=stats, sync_lag=1)
    assert len(stats.rows) == 4
    assert [row["moving"] for row in stats.rows] == [True, True, False, False]
    assert [row["frame"] for row in stats.rows] == sorted(
        row["frame"] for row in stats.rows)
    assert all(row["wall_ms"] > 0 for row in stats.rows)
    assert img is not None and np.isfinite(np.asarray(img)).all()
