"""Renderer integration tests: accumulation statistics, ReSTIR smoke,
temporal filters, multi-chip parity (SURVEY.md §4b/c)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxelrt.app.testing import make_params, make_scene_data, tiny_config
from voxelrt.render import pipeline
from voxelrt.render.pathtracer import trace_sample


def _pixel_grid(cfg):
    w, h = cfg.image_res
    u = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[:, None], (w, h))
    v = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[None, :], (w, h))
    return u.reshape(-1), v.reshape(-1)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    return cfg, make_scene_data(cfg), make_params(cfg)


def test_trace_sample_finite(setup):
    cfg, scene, params = setup
    u, v = _pixel_grid(cfg)
    out = trace_sample(cfg, scene, params, jax.random.PRNGKey(0), u, v,
                       False, 1.0)
    from voxelrt.ops import v3

    for k in ("diffuse", "specular"):
        arr = np.asarray(v3.stack(out[k]))
        assert np.isfinite(arr).all(), k
        assert (arr >= 0).all(), k
    assert np.asarray(v3.stack(out["diffuse"])).mean() > 1e-4  # scene is lit


def test_accumulation_reduces_variance(setup):
    cfg, scene, params = setup
    state = pipeline.init_state(cfg)
    key = jax.random.PRNGKey(1)
    s1 = pipeline.accumulate_n(cfg, scene, params, state, key, False, 1.0, 1)
    c1 = np.asarray(s1.color)
    s16 = pipeline.accumulate_n(cfg, scene, params, s1, key, False, 1.0, 15)
    c16 = np.asarray(s16.color)
    assert int(np.asarray(s16.spp)) == 16
    # Noise (pixel-to-pixel variation of a flat region) must shrink.
    # Use total variation against a blurred version as a proxy.
    def tv(img):
        return np.abs(np.diff(img, axis=0)).mean() + np.abs(
            np.diff(img, axis=1)
        ).mean()

    assert tv(c16) < tv(c1) * 0.9
    # Means should agree (unbiased accumulation).
    assert abs(c16.mean() - c1.mean()) < 0.25 * max(c1.mean(), 1e-3)


def test_reset_framebuffer(setup):
    cfg, scene, params = setup
    state = pipeline.init_state(cfg)
    state = pipeline.accumulate_n(cfg, scene, params, state,
                                  jax.random.PRNGKey(2), False, 1.0, 2)
    state = pipeline.reset_framebuffer(state)
    assert int(np.asarray(state.spp)) == 0
    assert float(np.abs(np.asarray(state.history)).sum()) == 0.0


def test_restir_pipeline_runs():
    cfg = dataclasses.replace(tiny_config(), use_restir_pt=True,
                              restir_taps=4, restir_radius=4.0)
    scene = make_scene_data(cfg)
    params = make_params(cfg)
    state = pipeline.init_state(cfg)
    state = pipeline.accumulate_n(cfg, scene, params, state,
                                  jax.random.PRNGKey(3), False, 1.0, 2)
    c = np.asarray(state.color)
    assert np.isfinite(c).all()
    assert c.mean() > 1e-4


def test_restir_matches_plain_mean():
    """ReSTIR resampling must be (approximately) unbiased: the mean image
    over many samples must match the plain path tracer. Measured residual
    on this scene: ~1.0% (converged across 48 → 192 samples — the spatial
    GRIS's defensive pairwise-MIS approximation, renderer/pathtracer.py:
    815-989), so 5% here is a real regression gate, not a smoke check."""
    cfg0 = tiny_config(image_res=(32, 16))
    cfg1 = dataclasses.replace(cfg0, use_restir_pt=True, restir_taps=4,
                               restir_radius=3.0)
    scene = make_scene_data(cfg0)
    params = make_params(cfg0)
    n = 96
    means = []
    for cfg in (cfg0, cfg1):
        state = pipeline.init_state(cfg)
        state = pipeline.accumulate_n(cfg, scene, params, state,
                                      jax.random.PRNGKey(4), False, 1.0, n)
        means.append(np.asarray(state.color).mean())
    assert means[1] == pytest.approx(means[0], rel=0.05), means


def test_moving_camera_variant_runs(setup):
    cfg, scene, params = setup
    state = pipeline.init_state(cfg)
    state = pipeline.accumulate_n(cfg, scene, params, state,
                                  jax.random.PRNGKey(5), True, 0.5, 2)
    c = np.asarray(state.color)
    assert np.isfinite(c).all()
    aw = int(cfg.image_res[0] * 0.5)
    assert np.asarray(state.history)[:aw].sum() != 0.0


def test_fetch_image_ldr(setup):
    cfg, scene, params = setup
    state = pipeline.init_state(cfg)
    state = pipeline.accumulate_n(cfg, scene, params, state,
                                  jax.random.PRNGKey(6), False, 1.0, 1)
    img = np.asarray(pipeline.fetch_image(cfg, state, jnp.float32(3.0), 1.0))
    assert img.shape == (cfg.image_res[0], cfg.image_res[1], 3)
    assert (img >= 0).all() and (img <= 1).all()


def test_multichip_dryrun():
    import __graft_entry__

    try:
        n = len(jax.devices("cpu"))
    except Exception:
        n = len(jax.devices())
    __graft_entry__.dryrun_multichip(min(n, 8))


def test_graft_entry_lowers():
    """entry() must stay jittable — the driver compile-checks it every
    round (it silently rotted once when the shading path moved to SoA V3
    and the epilogue stopped returning plain arrays)."""
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    jax.jit(fn).lower(*args)


def test_multichip_matches_single_device():
    """Sharded plain-average render must equal the single-device render."""
    from voxelrt.parallel import sharding

    cfg = tiny_config(image_res=(64, 32))
    scene = make_scene_data(cfg)
    params = make_params(cfg)
    key = jax.random.PRNGKey(7)

    try:
        devs = jax.devices("cpu")
    except Exception:
        devs = jax.devices()
    mesh1 = sharding.make_mesh(devs[:1], dp=1, sp=1)
    img1 = np.asarray(jax.device_get(
        sharding.parallel_render(cfg, scene, params, key, 4, mesh1)
    ))
    if len(devs) >= 4:
        mesh4 = sharding.make_mesh(devs[:4], dp=2, sp=2)
        img4 = np.asarray(jax.device_get(
            sharding.parallel_render(cfg, scene, params, key, 4, mesh4)
        ))
        # same pixel shards, same per-sp keys: sp partition changes sample
        # keys, so compare statistically
        assert np.isfinite(img4).all()
        assert abs(img4.mean() - img1.mean()) < 0.2 * max(img1.mean(), 1e-3)


def test_multichip_dp_only_exact():
    """A dp-only (sp=1) sharding re-partitions pixels WITHOUT changing any
    sample keys, so both multi-chip paths must reproduce the single-device
    image essentially exactly — a partitioning bug that shifts pixels or
    double-counts rows fails here."""
    from voxelrt.parallel import sharding
    from voxelrt.render import pipeline

    cfg = tiny_config(image_res=(64, 32))
    scene = make_scene_data(cfg)
    params = make_params(cfg)
    key = jax.random.PRNGKey(11)
    devs = jax.devices("cpu")
    if len(devs) < 8:
        import pytest

        pytest.skip("needs 8 host devices (tests/conftest.py sets the flag)")

    mesh1 = sharding.make_mesh(devs[:1], dp=1, sp=1)
    mesh8 = sharding.make_mesh(devs[:8], dp=8, sp=1)

    # explicit shard_map path
    img1 = np.asarray(jax.device_get(
        sharding.parallel_render(cfg, scene, params, key, 4, mesh1)
    ))
    img8 = np.asarray(jax.device_get(
        sharding.parallel_render(cfg, scene, params, key, 4, mesh8)
    ))
    np.testing.assert_allclose(img8, img1, rtol=2e-5, atol=2e-5)

    # full GSPMD accumulate step (render + temporal pipeline)
    s1 = pipeline.accumulate_n(
        cfg, scene, params, pipeline.init_state(cfg), key, False, 1.0, 2
    )
    s8 = sharding.sharded_accumulate_n(
        cfg, scene, params, pipeline.init_state(cfg), key, False, 1.0, 2,
        mesh8,
    )
    np.testing.assert_allclose(
        np.asarray(jax.device_get(s8.color)),
        np.asarray(jax.device_get(s1.color)),
        rtol=3e-5, atol=3e-5,
    )
