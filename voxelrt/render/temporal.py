"""Temporal accumulation and filtering (renderer/pathtracer.py:993-1303).

Progressive accumulation lives in per-pixel history buffers blended with
1/history.w (exponential average capped at ``max_accum_frames``). While the
camera moves, history is reprojected through the previous view/proj matrices
with a Catmull-Rom 4×4 tap filter gated on depth/normal agreement; specular
history reprojects the *virtual reflection point* instead of the primary hit
(renderer/pathtracer.py:1242-1303).

`camera_is_moving` and `render_scale` are trace-time static here (two
compiled variants) — the reference flips 0-D fields (scene.py:209-228), but
the static split lets XLA drop the gather-heavy reprojection path entirely
for the common static-camera case.

The prepass 4×4 neighborhood statistics are window reductions (the taps at
offsets [-1, 2]², renderer/pathtracer.py:1040-1066) — no gathers needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from voxelrt.ops import packing
from voxelrt.ops.sampling import is_vec_zero, mix
from voxelrt.ops.transforms import (
    delinearize_depth,
    linearize_depth,
    screen_to_view,
    view_to_screen,
    view_to_world,
)


def _window_sum(img, active_w, active_h):
    """Sum over the 4×4 window at offsets [-1, 2]² with zero padding,
    restricted to the active (render-scaled) region."""
    x = img[:active_w, :active_h]
    if x.ndim == 2:
        x = x[..., None]
    s = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(4, 4, 1),
        window_strides=(1, 1, 1),
        padding=((1, 2), (1, 2), (0, 0)),
    )
    return s


def temporal_prepass(cfg, color, color_spec, refl_depth, render_scale):
    """renderer/pathtracer.py:1020-1075 — returns (color, color_spec,
    spec_mean, spec_stdev, refl_depth) with NaN scrubbing applied."""
    w, h = cfg.image_res
    aw = max(int(w * render_scale), 1)
    ah = max(int(h * render_scale), 1)

    ones = jnp.ones((aw, ah), jnp.float32)
    wsum = _window_sum(ones, aw, ah)  # (aw, ah, 1) tap counts
    mean = _window_sum(color_spec, aw, ah) / wsum
    mean_sqr = _window_sum(color_spec[:aw, :ah] ** 2, aw, ah) / wsum
    spec_mean = mean
    spec_stdev = jnp.sqrt(jnp.maximum(mean_sqr - mean * mean, 0.0))

    rd = refl_depth[:aw, :ah]
    valid = (rd != 0.0).astype(jnp.float32)
    rd_sum = _window_sum(rd * valid, aw, ah)[..., 0]
    rd_cnt = _window_sum(valid, aw, ah)[..., 0]
    rd_new = jnp.where(rd_cnt > 0.01, rd_sum / jnp.maximum(rd_cnt, 1e-20), 0.0)

    def scrub(c):
        bad = jnp.any(~jnp.isfinite(c) | (c < 0.0), axis=-1, keepdims=True)
        return jnp.where(bad, 0.0, c)

    color = color.at[:aw, :ah].set(scrub(color[:aw, :ah]))
    color_spec = color_spec.at[:aw, :ah].set(scrub(color_spec[:aw, :ah]))
    refl_depth = refl_depth.at[:aw, :ah].set(rd_new)

    sm = jnp.zeros((w, h, 3), jnp.float32).at[:aw, :ah].set(spec_mean)
    ss = jnp.zeros((w, h, 3), jnp.float32).at[:aw, :ah].set(spec_stdev)
    return color, color_spec, sm, ss, refl_depth


def _gather2d(img, xi, yi, bx=None, by=None):
    """img[(W,H) or (W,H,C)][xi, yi], indices clamped to [0, bx) × [0, by)
    (defaults to the array dims). During render scaling callers clamp to the
    ACTIVE region so edge taps never read the stale out-of-area remainder of
    the full-res buffer."""
    w, h = img.shape[0], img.shape[1]
    xi = jnp.clip(xi, 0, (w if bx is None else bx) - 1)
    yi = jnp.clip(yi, 0, (h if by is None else by) - 1)
    flat = img.reshape((w * h,) + img.shape[2:])
    return jnp.take(flat, xi * h + yi, axis=0, mode="clip")


def _catmullrom(x):
    """renderer/pathtracer.py:1002-1014."""
    x2 = x * x
    x3 = x2 * x
    f1 = 1.5 * x3 - 2.5 * x2 + 1.0
    f2 = -0.5 * x3 + 2.5 * x2 - 4.0 * x + 2.0
    return jnp.where(x < 1.0, f1, jnp.where(x < 2.0, f2, 0.0))


def reproject(world_pos, prev_view, prev_proj):
    """renderer/pathtracer.py:993-1000."""
    from voxelrt.ops.transforms import world_to_view

    return view_to_screen(world_to_view(world_pos, prev_view), prev_proj)


def _history_filter(cfg, history, prev_depth, prev_normals, uv, center_depth,
                    center_normal, proj_inv, render_scale, moving,
                    gate_depth=True, extra=None):
    """Reprojected history fetch with validity gating
    (renderer/pathtracer.py:1092-1183). ``extra`` optionally filters a second
    scalar buffer (specular reflection depth history) alongside.
    Returns (w_sum, filtered_color4, filtered_extra).

    Tap kernel: the reference uses a Catmull-Rom 4×4; on TPU each tap is a
    full-image XLA gather (~0.1 G elem/s, PERF_NOTES.md), so the default
    ``cfg.motion_filter='bilinear'`` uses the 2×2 footprint — motion-phase
    history only (the history cap is 50 and resets on stop, so converged
    stills are identical). Set 'catmullrom' for exact reference filtering."""
    w, h = cfg.image_res
    ires_x = int(w * render_scale)
    ires_y = int(h * render_scale)
    fcoord_x = uv[..., 0] * ires_x - 0.5
    fcoord_y = uv[..., 1] * ires_y - 0.5
    ix = jnp.floor(fcoord_x).astype(jnp.int32)
    iy = jnp.floor(fcoord_y).astype(jnp.int32)
    fx = fcoord_x - ix
    fy = fcoord_y - iy

    if cfg.motion_filter == "bilinear":
        tap_range = range(0, 2)
        tap_w = (lambda o: jnp.maximum(1.0 - jnp.abs(o - fx), 0.0),
                 lambda o: jnp.maximum(1.0 - jnp.abs(o - fy), 0.0))
    else:
        tap_range = range(-1, 3)
        tap_w = (lambda o: _catmullrom(jnp.abs(o - fx)),
                 lambda o: _catmullrom(jnp.abs(o - fy)))

    col_sum = jnp.zeros(uv.shape[:-1] + (4,), jnp.float32)
    col_min = jnp.full(uv.shape[:-1] + (4,), 999999.0, jnp.float32)
    col_max = jnp.zeros(uv.shape[:-1] + (4,), jnp.float32)
    d_sum = jnp.zeros(uv.shape[:-1], jnp.float32)
    d_min = jnp.full(uv.shape[:-1], 999999.0, jnp.float32)
    d_max = jnp.zeros(uv.shape[:-1], jnp.float32)
    w_sum = jnp.zeros(uv.shape[:-1], jnp.float32)

    for ox in tap_range:
        for oy in tap_range:
            tx = ix + ox
            ty = iy + oy
            in_bounds = (tx >= 0) & (tx < ires_x) & (ty >= 0) & (ty < ires_y)
            wgt = tap_w[0](ox) * tap_w[1](oy)
            if moving:
                tap_normal = packing.decode_unit_vector_3x16(
                    _gather2d(prev_normals, tx, ty, ires_x, ires_y)
                )
                ok_n = jnp.sum(center_normal * tap_normal, axis=-1) > 0.642
                wgt = wgt * ok_n.astype(jnp.float32)
                if gate_depth:
                    tap_depth = linearize_depth(
                        _gather2d(prev_depth, tx, ty, ires_x, ires_y),
                        proj_inv,
                    )
                    ok_d = (
                        jnp.abs(tap_depth - center_depth)
                        / jnp.maximum(jnp.abs(center_depth), 1e-20)
                    ) < 0.05
                    wgt = wgt * ok_d.astype(jnp.float32)
            wgt = wgt * in_bounds.astype(jnp.float32)

            col = _gather2d(history, tx, ty, ires_x, ires_y)
            col_min = jnp.where(in_bounds[..., None], jnp.minimum(col_min, col),
                                col_min)
            col_max = jnp.where(in_bounds[..., None], jnp.maximum(col_max, col),
                                col_max)
            col_sum = col_sum + col * wgt[..., None]
            if extra is not None:
                ex = _gather2d(extra, tx, ty, ires_x, ires_y)
                d_min = jnp.where(in_bounds, jnp.minimum(d_min, ex), d_min)
                d_max = jnp.where(in_bounds, jnp.maximum(d_max, ex), d_max)
                d_sum = d_sum + ex * wgt
            w_sum = w_sum + wgt

    safe_w = jnp.where(jnp.abs(w_sum) < 1e-20, 1e-20, w_sum)
    col = col_sum / safe_w[..., None]
    # anti-ringing (renderer/pathtracer.py:1130, 1181-1183)
    col = jnp.maximum(
        jnp.clip(col, col_min, col_max), jnp.asarray([0.0, 0.0, 0.0, 1.0])
    )
    if extra is not None:
        ex = jnp.clip(d_sum / safe_w, d_min, d_max)
        return w_sum, col, ex
    return w_sum, col, None


def _moving_taps(cfg, params, state_color, history, gbuffer, texcoord, rp,
                 center_depth, center_n, render_scale, gate_depth,
                 extra=None):
    """Motion-phase resampling: current-color bilinear + gated history taps.

    Dispatches to the fused Pallas kernel (ops/resample.py) when enabled and
    the active-res source tables fit VMEM; otherwise to the XLA gather path
    (_bilinear + _history_filter). Returns (current, w_sum, hist, extra_f).
    """
    w, h = cfg.image_res
    aw = max(int(w * render_scale), 1)
    ah = max(int(h * render_scale), 1)
    use_pallas = (
        cfg.use_pallas_dda and cfg.motion_resample == "pallas"
        and aw * ah <= 530_000
    )
    if not use_pallas:
        current = _bilinear(state_color, texcoord, aw, ah)
        w_sum, hist, extra_f = _history_filter(
            cfg, history, gbuffer["prev_depth"], gbuffer["prev_normals"],
            rp[..., 0:2], center_depth, center_n, params.proj_inv,
            render_scale, moving=True, gate_depth=gate_depth, extra=extra,
        )
        return current, w_sum, hist, extra_f

    from voxelrt.ops import resample as rs

    cur = state_color[:aw, :ah].reshape(-1, 3)
    cur_packed = jnp.stack([
        rs.pack2_bf16(cur[:, 0], cur[:, 1]),
        rs.pack2_bf16(cur[:, 2], jnp.zeros_like(cur[:, 2])),
    ])
    hsrc = history[:aw, :ah].reshape(-1, 4)
    hist_packed = jnp.stack([
        rs.pack2_bf16(hsrc[:, 0], hsrc[:, 1]),
        rs.pack2_bf16(hsrc[:, 2], hsrc[:, 3]),
    ])
    pnsrc = gbuffer["prev_normals"][:aw, :ah].astype(jnp.float32)
    pn_packed = rs.pack2_bf16(
        pnsrc[..., 0].reshape(-1), pnsrc[..., 1].reshape(-1)
    )
    pd_lin = None
    if gate_depth:
        pd_lin = linearize_depth(
            gbuffer["prev_depth"][:aw, :ah], params.proj_inv
        ).reshape(-1)
    ex = extra[:aw, :ah].reshape(-1) if extra is not None else None

    fxc = (texcoord[..., 0] * aw - 0.5).reshape(-1)
    fyc = (texcoord[..., 1] * ah - 0.5).reshape(-1)
    fxh = (rp[..., 0] * aw - 0.5).reshape(-1)
    fyh = (rp[..., 1] * ah - 0.5).reshape(-1)
    current, w_sum, hist, extra_f = rs.temporal_taps(
        cur_packed, hist_packed, pn_packed, pd_lin, ex,
        fxc, fyc, fxh, fyh, center_depth.reshape(-1),
        center_n.reshape(-1, 3),
        ires_x=aw, ires_y=ah,
        catmullrom=cfg.motion_filter != "bilinear",
        gate_depth=gate_depth, interpret=cfg.pallas_interpret,
    )
    current = current.reshape(w, h, 3)
    w_sum = w_sum.reshape(w, h)
    hist = hist.reshape(w, h, 4)
    if extra_f is not None:
        extra_f = extra_f.reshape(w, h)
    return current, w_sum, hist, extra_f


def _bilinear(img, uv, ires_x, ires_y):
    """renderer/pathtracer.py:1077-1090."""
    fx = uv[..., 0] * ires_x - 0.5
    fy = uv[..., 1] * ires_y - 0.5
    ix = jnp.floor(fx).astype(jnp.int32)
    iy = jnp.floor(fy).astype(jnp.int32)
    f_x = (fx - ix)[..., None]
    f_y = (fy - iy)[..., None]
    bl = _gather2d(img, ix, iy, ires_x, ires_y)
    br = _gather2d(img, ix + 1, iy, ires_x, ires_y)
    tl = _gather2d(img, ix, iy + 1, ires_x, ires_y)
    tr = _gather2d(img, ix + 1, iy + 1, ires_x, ires_y)
    return mix(mix(bl, br, f_x), mix(tl, tr, f_x), f_y)


def _pixel_texcoords(cfg, render_scale):
    w, h = cfg.image_res
    ui = jnp.arange(w, dtype=jnp.float32)[:, None]
    vj = jnp.arange(h, dtype=jnp.float32)[None, :]
    tx = (jnp.broadcast_to(ui, (w, h)) + 0.5) / (w * render_scale)
    ty = (jnp.broadcast_to(vj, (w, h)) + 0.5) / (h * render_scale)
    return jnp.stack([tx, ty], axis=-1)


def temporal_filter(cfg, params, state_color, history, gbuffer,
                    render_scale, moving, sample_weight: float = 1.0):
    """Diffuse temporal filter (renderer/pathtracer.py:1185-1230).
    Returns (new_color, new_history). ``sample_weight`` is the number of
    fresh path samples averaged into ``state_color`` this frame (>1 when the
    renderer batches samples per temporal step); the history weight advances
    by it so the accumulation stays an exact running mean."""
    w, h = cfg.image_res
    texcoord = _pixel_texcoords(cfg, render_scale)
    center_nonlin = gbuffer["depth"]
    center_depth = linearize_depth(center_nonlin, params.proj_inv)
    center_n = packing.decode_unit_vector_3x16(gbuffer["normals"])
    center_x1 = view_to_world(
        screen_to_view(texcoord, center_nonlin, params.proj_inv), params.view_inv
    )
    skip = is_vec_zero(center_x1)

    ires_x = int(w * render_scale)
    ires_y = int(h * render_scale)
    if moving:
        rp = reproject(center_x1, params.prev_view, params.prev_proj)
        current, w_sum, hist, _ = _moving_taps(
            cfg, params, state_color, history, gbuffer, texcoord, rp,
            linearize_depth(rp[..., 2], params.proj_inv), center_n,
            render_scale, gate_depth=True,
        )
    else:
        current = state_color
        w_sum = jnp.ones((w, h), jnp.float32)
        hist = history

    has_hist = w_sum > 1e-3
    new_w = jnp.minimum(hist[..., 3] + sample_weight, params.max_accum_frames)
    blended = mix(hist[..., 0:3], current[..., 0:3],
                  (sample_weight / new_w)[..., None])
    hist_out = jnp.where(
        has_hist[..., None],
        jnp.concatenate([blended, new_w[..., None]], axis=-1),
        jnp.concatenate(
            [current[..., 0:3], jnp.full((w, h, 1), sample_weight)], axis=-1
        ),
    )

    out_color = hist_out[..., 0:3]
    if moving:
        # re-modulate albedo (renderer/pathtracer.py:1223-1228)
        _, albedo = packing.decode_material_word(gbuffer["mat_id"])
        base_col = albedo  # decode overrides base_col with stored albedo
        out_color = out_color * base_col

    new_history = jnp.where(skip[..., None], history, hist_out)
    new_color = jnp.where(skip[..., None], state_color, out_color)
    return new_color, new_history


def temporal_filter_specular(cfg, params, color, color_spec, history_spec,
                             history_spec_depth, gbuffer, render_scale, moving,
                             sample_weight: float = 1.0):
    """Specular temporal filter (renderer/pathtracer.py:1242-1303).
    Returns (color_with_specular, new_history_spec, new_history_spec_depth)."""
    w, h = cfg.image_res
    texcoord = _pixel_texcoords(cfg, render_scale)
    center_nonlin = gbuffer["depth"]
    center_n = packing.decode_unit_vector_3x16(gbuffer["normals"])
    center_x1 = view_to_world(
        screen_to_view(texcoord, center_nonlin, params.proj_inv), params.view_inv
    )
    center_refl_depth = gbuffer["depth_reflection"]
    skip = is_vec_zero(center_x1)

    ires_x = int(w * render_scale)
    ires_y = int(h * render_scale)
    if moving:
        refl_nonlin = delinearize_depth(center_refl_depth, params.proj)
        refl_pos = view_to_world(
            screen_to_view(texcoord, refl_nonlin, params.proj_inv), params.view_inv
        )
        rp_src = jnp.where(
            (center_refl_depth != 0.0)[..., None], refl_pos, center_x1
        )
        rp = reproject(rp_src, params.prev_view, params.prev_proj)
        current, w_sum, hist, hist_depth = _moving_taps(
            cfg, params, color_spec, history_spec, gbuffer, texcoord, rp,
            linearize_depth(rp[..., 2], params.proj_inv), center_n,
            render_scale, gate_depth=False, extra=history_spec_depth,
        )
    else:
        current = color_spec
        w_sum = jnp.ones((w, h), jnp.float32)
        hist = history_spec
        hist_depth = history_spec_depth

    has_hist = w_sum > 1e-3
    new_w = jnp.minimum(hist[..., 3] + sample_weight, params.max_accum_frames)
    blended = mix(hist[..., 0:3], current[..., 0:3],
                  (sample_weight / new_w)[..., None])
    hist_out = jnp.where(
        has_hist[..., None],
        jnp.concatenate([blended, new_w[..., None]], axis=-1),
        jnp.concatenate(
            [current[..., 0:3], jnp.full((w, h, 1), sample_weight)], axis=-1
        ),
    )
    depth_out = jnp.where(
        has_hist,
        mix(hist_depth, center_refl_depth, sample_weight / new_w),
        center_refl_depth,
    )

    new_history = jnp.where(skip[..., None], history_spec, hist_out)
    new_depth = jnp.where(skip, history_spec_depth, depth_out)
    new_color = jnp.where(
        skip[..., None], color, color + hist_out[..., 0:3]
    )
    return new_color, new_history, new_depth
