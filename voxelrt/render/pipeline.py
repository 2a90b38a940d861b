"""Renderer: buffer state + the jitted progressive accumulate step.

Functional counterpart of the reference's ``Renderer`` class
(renderer/pathtracer.py:27-1334): all mutable GPU state (color/history
buffers, G-buffer, matrices) lives in an explicit :class:`RenderState`
pytree; ``accumulate`` is a pure jitted step mirroring
renderer/pathtracer.py:1310-1319 (render → [spatial GRIS] → temporal
prepass → temporal filter → specular temporal filter).

The reference's two-level 16×8 tiled buffer layout (pathtracer.py:71-81) is
a GPU divergence optimization with no TPU analogue — buffers here are plain
(W, H, C) arrays and XLA picks layouts.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from voxelrt.ops.tonemap import render_to_image
from voxelrt.ops.v3 import V3
from voxelrt.render import temporal
from voxelrt.render.pathtracer import RenderParams, SceneData, trace_sample


class RenderState(NamedTuple):
    """All frame-persistent buffers (renderer/pathtracer.py:39-133)."""

    color: jax.Array  # (W, H, 3) diffuse+final radiance
    color_spec: jax.Array  # (W, H, 3)
    history: jax.Array  # (W, H, 4)
    history_spec: jax.Array  # (W, H, 4)
    history_spec_depth: jax.Array  # (W, H)
    gbuff_normals: jax.Array  # (W, H, 2) f16 octahedral
    gbuff_depth: jax.Array  # (W, H)
    gbuff_depth_reflection: jax.Array  # (W, H)
    gbuff_position: jax.Array  # (W, H, 3)
    gbuff_mat_id: jax.Array  # (W, H) u32
    gbuff_prev_depth: jax.Array  # (W, H)
    gbuff_prev_normals: jax.Array  # (W, H, 2) f16
    reservoirs: Any  # ReSTIR storage (None when disabled)
    spp: jax.Array  # () i32
    frame: jax.Array  # () i32


def init_state(cfg) -> RenderState:
    w, h = cfg.image_res
    f = jnp.zeros
    reservoirs = None
    if cfg.use_restir_pt:
        from voxelrt.render.restir import init_reservoir_storage

        reservoirs = init_reservoir_storage(cfg)
    return RenderState(
        color=f((w, h, 3), jnp.float32),
        color_spec=f((w, h, 3), jnp.float32),
        history=f((w, h, 4), jnp.float32),
        history_spec=f((w, h, 4), jnp.float32),
        history_spec_depth=f((w, h), jnp.float32),
        gbuff_normals=f((w, h, 2), jnp.float16),
        gbuff_depth=f((w, h), jnp.float32),
        gbuff_depth_reflection=f((w, h), jnp.float32),
        gbuff_position=f((w, h, 3), jnp.float32),
        gbuff_mat_id=f((w, h), jnp.uint32),
        gbuff_prev_depth=f((w, h), jnp.float32),
        gbuff_prev_normals=f((w, h, 2), jnp.float16),
        reservoirs=reservoirs,
        spp=jnp.int32(0),
        frame=jnp.int32(0),
    )


def reset_framebuffer(state: RenderState) -> RenderState:
    """renderer/pathtracer.py:664-668."""
    return state._replace(
        history=jnp.zeros_like(state.history),
        history_spec=jnp.zeros_like(state.history_spec),
        history_spec_depth=jnp.zeros_like(state.history_spec_depth),
        spp=jnp.int32(0),
    )


TILE_W, TILE_H = 16, 8  # the reference's interleave (pathtracer.py:71-81)


def _use_tiles(w, h):
    return w % TILE_W == 0 and h % TILE_H == 0


def _pixel_grid(w, h):
    """Flattened pixel coordinates in 16×8-tile order when divisible.

    The reference tiles its buffers 16×8 to cut warp divergence
    (renderer/pathtracer.py:71-81); here the same interleave makes each
    1024-ray traversal block a tight screen tile, which keeps the Pallas
    kernel's table-scan fetches range-limited.
    """
    if _use_tiles(w, h):
        tx = jnp.arange(w // TILE_W)
        ty = jnp.arange(h // TILE_H)
        i = jnp.arange(TILE_W)
        j = jnp.arange(TILE_H)
        u = (tx[:, None, None, None] * TILE_W + i[None, None, :, None])
        v = (ty[None, :, None, None] * TILE_H + j[None, None, None, :])
        shape = (w // TILE_W, h // TILE_H, TILE_W, TILE_H)
        u = jnp.broadcast_to(u, shape).reshape(-1).astype(jnp.float32)
        v = jnp.broadcast_to(v, shape).reshape(-1).astype(jnp.float32)
        return u, v
    u = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[:, None], (w, h))
    v = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[None, :], (w, h))
    return u.reshape(-1), v.reshape(-1)


def _pixel_uv_from_index(w, h, pix):
    """u, v pixel coordinates for flat pixel ids in _pixel_grid order —
    pure arithmetic on the index array. Used by the batched wavefront so
    per-sample constants fuse into their consumers instead of being
    materialized k·n-wide (XLA lowers tile/repeat/broadcast-reshape of
    7M-lane arrays as k dynamic-update-slices each; measured 7.1 ms/spp
    across ~10 such arrays before this)."""
    if _use_tiles(w, h):
        tiles_y = h // TILE_H
        per_tx = tiles_y * TILE_W * TILE_H
        tx = pix // per_tx
        r = pix - tx * per_tx
        per_ty = TILE_W * TILE_H
        ty = r // per_ty
        r2 = r - ty * per_ty
        i = r2 // TILE_H
        j = r2 - i * TILE_H
        u = (tx * TILE_W + i).astype(jnp.float32)
        v = (ty * TILE_H + j).astype(jnp.float32)
        return u, v
    u = (pix // h).astype(jnp.float32)
    v = (pix - (pix // h) * h).astype(jnp.float32)
    return u, v


def _untile(w, h, x):
    """Inverse of the tile ordering: (N, ...) -> (W, H, ...)."""
    rest = x.shape[1:]
    if _use_tiles(w, h):
        x = x.reshape((w // TILE_W, h // TILE_H, TILE_W, TILE_H) + rest)
        x = jnp.swapaxes(x, 1, 2)
        return x.reshape((w, h) + rest)
    return x.reshape((w, h) + rest)


def wavefront_constants(cfg, render_scale):
    """Ray-index-derived per-launch constants (pixel grid, sample-of-ray,
    wavefront pixel uv). Pure functions of (cfg, render_scale) — callers
    that loop launches (accumulate_n) compute them ONCE outside the loop:
    XLA otherwise rematerializes the iota chains every launch, writing
    14.7M-lane arrays through strided relayouts (~0.5 ms/spp measured)."""
    w, h = cfg.image_res
    aw = max(int(w * render_scale), 1)
    ah = max(int(h * render_scale), 1)
    u, v = _pixel_grid(aw, ah)
    k = max(1, cfg.samples_per_launch)
    if k == 1:
        return (u, v, None, None, None)
    n = u.shape[0]
    ridx = jnp.arange(k * n, dtype=jnp.int32)
    s_of_ray = ridx // n
    pix = ridx - s_of_ray * n
    uu, vv = _pixel_uv_from_index(aw, ah, pix)
    return (u, v, s_of_ray, uu, vv)


def accumulate(cfg, scene: SceneData, params: RenderParams,
               state: RenderState, key, camera_is_moving: bool,
               render_scale: float, wf=None,
               trace_fn=None) -> RenderState:
    """One progressive frame for every pixel (renderer/pathtracer.py:1310-1319).

    Traces ``cfg.samples_per_launch`` fresh path samples (the reference
    traces exactly one per frame), averages them, and advances the temporal
    accumulation by that weight — amortizing the G-buffer/temporal/XLA-glue
    cost across samples without changing the converged image.

    ``trace_fn``: optional replacement for :func:`trace_sample` with the
    same signature — parallel.sharding substitutes a shard_map-wrapped
    trace so the Pallas traversal kernel (an opaque custom call the GSPMD
    partitioner can only all-gather around) runs shard-local over the mesh
    while the (gather-based, partitioner-friendly) temporal pipeline stays
    GSPMD. Per-lane trace outputs are identical either way.

    Static args: cfg, camera_is_moving, render_scale.
    """
    tracef = trace_fn or trace_sample
    w, h = cfg.image_res
    # TPU-first render scaling: trace ONLY the active-res wavefront and
    # embed the results into the top-left of the full-res buffers. The
    # reference instead masks out-of-area GPU threads
    # (renderer/pathtracer.py:289-291), which its early-out warps make
    # free; on TPU every masked lane still pays the elementwise glue (RNG,
    # BSDF, G-buffer) — 4× waste at render_scale 0.5. Pixel ids (and so the
    # per-pixel RNG streams) are unchanged, so in-area pixels are bitwise
    # identical to the masked formulation.
    aw = max(int(w * render_scale), 1)
    ah = max(int(h * render_scale), 1)
    scaled = (aw, ah) != (w, h)
    k_samples = max(1, cfg.samples_per_launch)
    if wf is None:
        wf = wavefront_constants(cfg, render_scale)
    u, v = wf[0], wf[1]
    if cfg.use_restir_pt:
        # The GRIS pass consumes one reservoir per sample.
        assert k_samples == 1, "samples_per_launch must be 1 with ReSTIR-PT"
    if k_samples == 1:
        out = tracef(cfg, scene, params, key, u, v,
                     camera_is_moving, render_scale)
    else:
        # Batched wavefront: all k samples' rays traced as ONE SoA wavefront
        # (k·n rays) so the sorted traversal dispatches see k× the ray
        # density — dead lanes compact into whole dead blocks and per-block
        # fetch working sets tighten. Each sample slice draws exactly the
        # randoms it would draw traced alone (same per-sample keys as the
        # sequential formulation this replaces), so the converged image is
        # unchanged; only the f32 summation order differs.
        n = u.shape[0]
        skeys = jnp.stack(
            [key] + [jax.random.fold_in(key, 7000 + i)
                     for i in range(1, k_samples)]
        )

        # Per-sample constants are DERIVED per ray from the flat ray index
        # (pixel coords arithmetically via _pixel_uv_from_index, per-sample
        # rows via a k-way select chain) — everything fuses into the first
        # consumer. Materialized expansions (tile/repeat AND
        # broadcast+reshape) all lower to k dynamic-update-slices per
        # array on TPU: measured 7.1 ms/spp across the ~10 expanded
        # arrays. Values (and so images) are bitwise identical.
        s_of_ray, uu, vv = wf[2:5]

        def per_sample_rows(tbl):
            """(k, m) table -> (k*n, m): row s_of_ray per ray, as a
            k-way select chain (fusable; no gather, no expansion)."""
            cols = []
            for c in range(tbl.shape[1]):
                acc = jnp.broadcast_to(tbl[0, c], s_of_ray.shape)
                for r_ in range(1, tbl.shape[0]):
                    acc = jnp.where(s_of_ray == r_, tbl[r_, c], acc)
                cols.append(acc)
            return jnp.stack(cols, axis=-1)

        sample_keys = per_sample_rows(skeys)
        jitter_u = None
        if not camera_is_moving:
            ju = jax.vmap(
                lambda k_: jax.random.uniform(jax.random.fold_in(k_, 417), (2,))
            )(skeys)
            jrows = per_sample_rows(ju)
            jitter_u = (jrows[:, 0], jrows[:, 1])
        out = tracef(
            cfg, scene, params, key,
            uu, vv,
            camera_is_moving, render_scale,
            sample_keys=sample_keys, jitter_u=jitter_u,
        )
        # Sample mean as a sum of STATIC 1-D slices, not
        # reshape(k, n, 3).mean(0): the 2-D (k, n) shape was the only one
        # in the program, and XLA's reshape motion propagated it backward
        # through the whole epilogue — ~117 flat wavefront arrays each got
        # re-laid-out T(1024)->(1,k,n)T(8,128) by a per-sample slice loop
        # (measured 7.1 ms/spp of dynamic-update-slice time). Static
        # tile-aligned slices keep every array 1-D.
        def sample_mean(x):
            acc = x[:n]
            for s in range(1, k_samples):
                acc = acc + x[s * n:(s + 1) * n]
            return acc / k_samples

        diffuse = jax.tree.map(sample_mean, out["diffuse"])
        specular = jax.tree.map(sample_mean, out["specular"])
        # G-buffer and ReSTIR-adjacent outputs come from sample 0's slice
        # (the reference keeps the last frame's G-buffer; any one sample's
        # is equally valid — they share the camera).
        out = jax.tree.map(lambda a: a[:n], out)
        out["diffuse"] = diffuse
        out["specular"] = specular

    def img(x, ch=None):
        del ch
        if isinstance(x, V3):
            # SoA wavefront colors/positions -> packed (W, H, 3) images
            # (per-launch boundary; image buffers stay packed for the
            # temporal filters).
            return jnp.stack([img(x.x), img(x.y), img(x.z)], axis=-1)
        if isinstance(x, tuple):  # octahedral normal component pair
            return jnp.stack([img(c) for c in x], axis=-1)
        a = _untile(aw, ah, x)
        if not scaled:
            return a
        return jnp.zeros((w, h) + a.shape[2:], a.dtype).at[:aw, :ah].set(a)

    if scaled:
        # Out-of-area pixels keep their previous buffers (the reference's
        # is_outside_render_area contract).
        inside = (jnp.arange(w)[:, None] < aw) & (jnp.arange(h)[None, :] < ah)
        inside = inside & img(out["inside"])
    else:
        inside = img(out["inside"])
    sel = lambda new, old: jnp.where(
        inside[..., None] if new.ndim == 3 else inside, new, old
    )

    color = sel(img(out["diffuse"], 3), state.color)
    color_spec = sel(img(out["specular"], 3), state.color_spec)
    gbuffer = dict(
        normals=sel(img(out["gbuff_normals"], 2), state.gbuff_normals),
        depth=sel(img(out["gbuff_depth"]), state.gbuff_depth),
        depth_reflection=sel(img(out["gbuff_depth_reflection"]),
                             state.gbuff_depth_reflection),
        position=sel(img(out["gbuff_position"], 3), state.gbuff_position),
        mat_id=sel(img(out["gbuff_mat_id"]), state.gbuff_mat_id),
        prev_depth=state.gbuff_prev_depth,
        prev_normals=state.gbuff_prev_normals,
    )

    reservoirs = state.reservoirs
    if cfg.use_restir_pt:
        from voxelrt.render.restir import spatial_gris

        reservoir_img = {k: img(v) for k, v in out["reservoir"].items()}
        color, color_spec, reservoirs = spatial_gris(
            cfg, scene, params, reservoir_img, color, color_spec, gbuffer,
            state.frame, jax.random.fold_in(key, 7777),
            camera_is_moving, render_scale,
        )

    color, color_spec, spec_mean, spec_stdev, refl_depth = (
        temporal.temporal_prepass(
            cfg, color, color_spec, gbuffer["depth_reflection"], render_scale
        )
    )
    gbuffer["depth_reflection"] = refl_depth

    color, history = temporal.temporal_filter(
        cfg, params, color, state.history, gbuffer, render_scale,
        camera_is_moving, sample_weight=float(k_samples),
    )
    color, history_spec, history_spec_depth = temporal.temporal_filter_specular(
        cfg, params, color, color_spec, state.history_spec,
        state.history_spec_depth, gbuffer, render_scale, camera_is_moving,
        sample_weight=float(k_samples),
    )

    return RenderState(
        color=color,
        color_spec=color_spec,
        history=history,
        history_spec=history_spec,
        history_spec_depth=history_spec_depth,
        gbuff_normals=gbuffer["normals"],
        gbuff_depth=gbuffer["depth"],
        gbuff_depth_reflection=gbuffer["depth_reflection"],
        gbuff_position=gbuffer["position"],
        gbuff_mat_id=gbuffer["mat_id"],
        gbuff_prev_depth=gbuffer["depth"],
        gbuff_prev_normals=gbuffer["normals"],
        reservoirs=reservoirs,
        spp=state.spp + k_samples,
        frame=state.frame + 1,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "camera_is_moving", "render_scale", "n_samples",
                     "trace_fn"),
    donate_argnames=("state",),
)
def accumulate_n(cfg, scene, params, state, key, camera_is_moving,
                 render_scale, n_samples: int, trace_fn=None):
    """Accumulate ``n_samples`` path samples inside one jitted call —
    amortizes the per-dispatch overhead (34 ms on the tunneled TPU,
    PERF_NOTES.md). Runs ceil(n_samples / samples_per_launch) frames."""
    k = max(1, cfg.samples_per_launch)
    n_frames = -(-n_samples // k)
    # Hoist the iota-derived wavefront constants out of the launch loop
    # (closed-over arrays become loop invariants instead of per-launch
    # rematerialized relayout writes).
    wf = wavefront_constants(cfg, render_scale)

    def step(i, st):
        return accumulate(cfg, scene, params, st, jax.random.fold_in(key, i),
                          camera_is_moving, render_scale, wf=wf,
                          trace_fn=trace_fn)

    return jax.lax.fori_loop(0, n_frames, step, state)


@functools.partial(jax.jit, static_argnames=("cfg", "render_scale"))
def fetch_image(cfg, state: RenderState, exposure, render_scale):
    """Tonemapped LDR image (renderer/pathtracer.py:1321-1323, 634-662)."""
    return render_to_image(state.color, cfg, exposure, render_scale)
