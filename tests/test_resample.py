"""The fused Pallas motion-resample kernel (ops/resample.py) vs the XLA
gather formulation it replaces (temporal._bilinear + _history_filter) — same
taps, same gates, same anti-ringing clamp, within bf16 source quantization.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from voxelrt.config import RenderConfig
from voxelrt.ops import packing
from voxelrt.render.temporal import _moving_taps
from voxelrt.camera import perspective_matrix


class _Params:
    proj_inv = jnp.asarray(np.linalg.inv(np.asarray(
        perspective_matrix(0.9, 16 / 9, 0.01, 10.0))))


def _setup(seed, w=64, h=48, scale=0.5):
    rng = np.random.default_rng(seed)
    aw, ah = int(w * scale), int(h * scale)
    state_color = np.zeros((w, h, 3), np.float32)
    state_color[:aw, :ah] = rng.random((aw, ah, 3)).astype(np.float32) * 4.0
    history = np.zeros((w, h, 4), np.float32)
    history[:aw, :ah] = rng.random((aw, ah, 4)).astype(np.float32) * 3.0
    history[..., 3] = np.round(history[..., 3] * 10)
    n = rng.normal(size=(w, h, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    prev_normals = np.asarray(packing.encode_unit_vector_3x16(jnp.asarray(n)))
    prev_depth = rng.random((w, h)).astype(np.float32) * 0.9 + 0.05
    spec_depth = rng.random((w, h)).astype(np.float32) * 5.0
    gbuffer = dict(prev_depth=jnp.asarray(prev_depth),
                   prev_normals=jnp.asarray(prev_normals))
    # reprojected uv: mostly in-bounds with some off-screen
    rp = rng.random((w, h, 3)).astype(np.float32) * 1.3 - 0.15
    tx = np.stack(np.meshgrid(
        (np.arange(w) + 0.5) / (w * scale),
        (np.arange(h) + 0.5) / (h * scale), indexing="ij"), -1
    ).astype(np.float32)
    center_n = n
    center_depth = rng.random((w, h)).astype(np.float32) * 3.0
    return (jnp.asarray(state_color), jnp.asarray(history), gbuffer,
            jnp.asarray(tx), jnp.asarray(rp), jnp.asarray(center_depth),
            jnp.asarray(center_n), jnp.asarray(spec_depth))


def _run(mode, filt, gate_depth, extra_on, seed=5):
    cfg = RenderConfig(image_res=(64, 48), use_pallas_dda=True,
                       pallas_interpret=True, motion_resample=mode,
                       motion_filter=filt)
    (color, history, gbuffer, tx, rp, cd, cn, sd) = _setup(seed)
    return _moving_taps(cfg, _Params, color, history, gbuffer, tx, rp,
                        cd, cn, 0.5, gate_depth=gate_depth,
                        extra=(sd if extra_on else None))


def _close_enough(a, b, rtol, atol, label, max_frac=0.01):
    """allclose, tolerating a small fraction of outliers: bf16-quantized
    normals can flip the 0.642 dot gate for taps sitting exactly on the
    threshold, which swings that pixel by a whole tap weight."""
    a = np.asarray(a)
    b = np.asarray(b)
    bad = ~np.isclose(a, b, rtol=rtol, atol=atol)
    frac = bad.mean()
    assert frac <= max_frac, f"{label}: {frac:.2%} outside tolerance"


def test_pallas_resample_matches_xla_bilinear():
    for filt in ("bilinear", "catmullrom"):
        for gate_depth, extra_on in ((True, False), (False, True)):
            cur_p, ws_p, hist_p, ex_p = _run("pallas", filt, gate_depth,
                                             extra_on)
            cur_x, ws_x, hist_x, ex_x = _run("xla", filt, gate_depth,
                                             extra_on)
            label = f"{filt} gate={gate_depth} extra={extra_on}"
            # bf16-packed sources ⇒ ~0.4% relative tolerance, ≤1% of pixels
            # allowed to differ by a gate flip at the decision threshold
            _close_enough(ws_p, ws_x, 1e-5, 1e-3, label + " w_sum")
            _close_enough(cur_p, cur_x, 0.01, 0.02, label + " current")
            _close_enough(hist_p, hist_x, 0.01, 0.03, label + " hist")
            if extra_on:
                _close_enough(ex_p, ex_x, 0.01, 0.05, label + " extra")
