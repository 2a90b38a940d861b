"""Scene-statistic auto knobs resolved by prepare_data.

dda_march_unroll='auto' and dda_nee_src_open='auto' both gate on the
sun-openness statistic (fraction of LOD2 cells whose whole NEE cone
provably escapes): open scenes resolve to unroll 3 + src_open on,
enclosed scenes to unroll 2 + src_open off (measured on example6 /
example9, PERF_NOTES round 5). Config built without the app shell must
still trace: march_unroll_of falls back to the open-scene value."""

import numpy as np

from voxelrt.app.headless import HeadlessRenderer
from voxelrt.app.testing import make_test_world, tiny_config
from voxelrt.render.pathtracer import march_unroll_of
from voxelrt.world import VoxelWorld

from test_checkpoint import _FakeScene


def _resolved_cfg(world, **over):
    cfg = tiny_config(use_pallas_dda=True, pallas_interpret=True, **over)
    r = HeadlessRenderer(cfg, _FakeScene(cfg, world), quiet=True)
    r.prepare_data()
    return r.cfg


def test_auto_unroll_open_scene():
    # The sun-open certificate is conservative and needs production grid
    # scale to certify cells (at the 32³ test grid even near-empty worlds
    # read ~0 — the chebyshev margin never opens at an 8³ cell field); a
    # sparse 128³ world reads wide open, like the example6 flagship.
    cfg = tiny_config(grid_res=128, voxel_dx=1.0 / 64.0)
    world = VoxelWorld(cfg.voxel_dx, cfg.grid_res, cfg.voxel_edges)
    ii = np.arange(-8, 8)
    xx, zz = np.meshgrid(ii, ii, indexing="ij")
    idx = np.stack([xx.ravel(), np.full(xx.size, -60), zz.ravel()], -1)
    world.set_voxels(idx, 1, np.array([0.6, 0.6, 0.6]))
    cfg2 = _resolved_cfg(world, grid_res=128, voxel_dx=1.0 / 64.0)
    assert cfg2.dda_march_unroll == 3
    assert cfg2.dda_nee_src_open == "on"


def test_auto_unroll_enclosed_scene():
    # A closed box: no cell's sun cone escapes.
    cfg = tiny_config()
    world = VoxelWorld(cfg.voxel_dx, cfg.grid_res, cfg.voxel_edges)
    n = cfg.grid_res
    r = n // 2 - 1
    ii = np.arange(-r, r)
    xx, yy = np.meshgrid(ii, ii, indexing="ij")
    flat = np.stack([xx.ravel(), yy.ravel()], -1)
    col = np.array([0.7, 0.7, 0.7])
    for axis, lo, hi in ((2, -r, r - 1), (1, -r, r - 1), (0, -r, r - 1)):
        for v in (lo, hi):
            idx = np.insert(flat, axis, v, axis=1)
            world.set_voxels(idx, 1, col)
    cfg2 = _resolved_cfg(world)
    assert cfg2.dda_march_unroll == 2
    assert cfg2.dda_nee_src_open == "off"


def test_explicit_unroll_respected():
    cfg = tiny_config()
    cfg2 = _resolved_cfg(make_test_world(cfg), dda_march_unroll=2)
    assert cfg2.dda_march_unroll == 2


def test_unroll_fallback_without_shell():
    # Direct RenderConfig construction (tools, oracle tests) never runs
    # prepare_data; the trace-time fallback must yield an int.
    assert march_unroll_of(tiny_config()) == 3
    assert march_unroll_of(tiny_config(dda_march_unroll=1)) == 1
