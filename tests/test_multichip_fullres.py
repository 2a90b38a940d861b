"""Full-resolution multi-chip parity (VERDICT r3 item 6).

The 64x32 multichip tests prove layout/equality at smoke scale; this one
runs the GSPMD full progressive step at the flagship 1280x720 on the
8-virtual-device host mesh and requires the dp-sharded image to equal the
single-device image. Communication volume / per-device HLO numbers live in
PARALLEL.md (tools/multichip_report.py).
"""

import re

import numpy as np
import jax
import pytest

from voxelrt.app.testing import (
    make_params,
    make_scene_data,
    production_test_config,
    tiny_config,
)
from voxelrt.parallel import sharding
from voxelrt.render import pipeline


def test_gspmd_fullres_matches_single_device():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 host devices (tests/conftest.py sets the flag)")

    cfg = tiny_config(image_res=(1280, 720), grid_res=128)
    scene = make_scene_data(cfg)
    params = make_params(cfg)
    key = jax.random.PRNGKey(3)

    s1 = pipeline.accumulate_n(cfg, scene, params, pipeline.init_state(cfg),
                               key, False, 1.0, 1)
    mesh8 = sharding.make_mesh(devs[:8], dp=8, sp=1)
    s8 = sharding.sharded_accumulate_n(
        cfg, scene, params, pipeline.init_state(cfg), key, False, 1.0, 1,
        mesh8,
    )
    c1 = np.asarray(s1.color)
    c8 = np.asarray(jax.device_get(s8.color))
    np.testing.assert_allclose(c8, c1, rtol=2e-5, atol=2e-5)
    assert np.isfinite(c8).all()
    # the scene is lit and the full frame is covered
    assert c8.mean() > 1e-3


def test_gspmd_production_path_matches_single_device():
    """Sharded == single-device on the PRODUCTION render path (VERDICT r4
    weak #3): Pallas traversal kernel (interpret mode), queued wavefront +
    in-kernel NEE, physical sky + clouds. Small shapes — interpret-mode
    tracing is ~1000x slower than the real kernel; the full-res sharding
    layout is proven by the portable-path test above, this one proves the
    REAL kernel + sky pipeline under GSPMD."""
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 host devices (tests/conftest.py sets the flag)")

    cfg = production_test_config(image_res=(64, 32))
    scene = make_scene_data(cfg)
    params = make_params(cfg)
    key = jax.random.PRNGKey(5)

    s1 = pipeline.accumulate_n(cfg, scene, params, pipeline.init_state(cfg),
                               key, False, 1.0, 1)
    mesh8 = sharding.make_mesh(devs[:8], dp=8, sp=1)
    s8 = sharding.sharded_accumulate_n(
        cfg, scene, params, pipeline.init_state(cfg), key, False, 1.0, 1,
        mesh8,
    )
    c1 = np.asarray(s1.color)
    c8 = np.asarray(jax.device_get(s8.color))
    np.testing.assert_allclose(c8, c1, rtol=2e-5, atol=2e-5)
    assert np.isfinite(c8).all()
    assert c8.mean() > 1e-3


def test_moving_frame_replicated_policy_zero_collectives():
    """Moving frames run REPLICATED under sharded_accumulate_n (PARALLEL.md:
    the dp-sharded moving step exchanged 833 MB of history tables per step;
    the replicated policy exchanges nothing per frame). Lower the moving
    step through the shipped policy and assert the optimized HLO contains
    no collectives."""
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 host devices (tests/conftest.py sets the flag)")

    cfg = tiny_config(image_res=(128, 64), grid_res=64)
    scene = make_scene_data(cfg)
    params = make_params(cfg)
    mesh8 = sharding.make_mesh(devs[:8], dp=8, sp=1)
    state = sharding.replicate(pipeline.init_state(cfg), mesh8)
    scene_r = sharding.replicate(scene, mesh8)
    params_r = sharding.replicate(params, mesh8)
    hlo = pipeline.accumulate_n.lower(
        cfg, scene_r, params_r, state, jax.random.PRNGKey(0), True, 0.5, 1
    ).compile().as_text()
    pat = re.compile(
        r"= \S+ (all-reduce|all-gather|reduce-scatter|collective-permute|"
        r"all-to-all)\(")
    colls = pat.findall(hlo)
    assert colls == [], f"moving step should be collective-free: {colls}"
