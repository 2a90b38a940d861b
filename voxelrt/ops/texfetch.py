"""Pallas bilinear texture fetch (TPU) — the skybox sampling hot path.

XLA's gather runs ~0.1 G rows/s on TPU, which made the reference-style
bilinear skybox reads (renderer/atmos.py:94-131) the single most expensive
part of a frame (~87 ms per 1M-ray fetch, tools/ablations). This kernel keeps
the texture resident in VMEM as bf16-packed u32 words and serves each (8,128)
ray block's 4 bilinear corners with a distinct-slab min-reduce loop — blocks
whose texel footprints are tight (screen-tile escapes, sun-cone NEE
directions, or texel-sorted wavefronts) touch only a handful of slabs.

Packing: texel t -> word[2t] = bf16(r) << 16 | bf16(g), word[2t+1] =
bf16(b) << 16. bf16 (≈0.4% relative precision) is ample for the smooth sky
maps; the reference itself keeps its transmittance LUT in f16
(renderer/atmos.py:64).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
BLOCK = SUBLANES * LANES


def pack_rgb_bf16(img: np.ndarray) -> np.ndarray:
    """f32 (..., 3) image -> flat u32[2 * n_texels] (round-to-nearest-even),
    padded to a multiple of 1024 words."""
    flat = np.asarray(img, np.float32).reshape(-1, 3)
    bits = flat.view(np.uint32)
    rne = ((bits >> 16) & 1) + np.uint32(0x7FFF)
    b16 = (bits + rne) >> 16
    w0 = (b16[:, 0] << 16) | b16[:, 1]
    w1 = b16[:, 2] << 16
    words = np.stack([w0, w1], axis=1).reshape(-1).astype(np.uint32)
    pad = (-len(words)) % 1024
    if pad:
        words = np.concatenate([words, np.zeros(pad, np.uint32)])
    return words


def _gather_1024(table_slab, word_idx):
    lane = word_idx & 127
    sub = (word_idx >> 7) & 7
    out = jnp.zeros_like(word_idx)
    for k in range(8):
        row = jnp.broadcast_to(table_slab[k : k + 1, :], (8, 128))
        g = jnp.take_along_axis(row, lane, axis=1)
        out = jnp.where(sub == k, g, out)
    return out


def _bilinear_kernel(fx_ref, fy_ref, tab_ref, r_ref, g_ref, b_ref, *, res):
    fx = fx_ref[0]
    fy = fy_ref[0]
    # NaN/garbage guards: clamp instead of poisoning indices; callers mask
    # the results of lanes they do not care about.
    fx = jnp.clip(jnp.where(jnp.isfinite(fx), fx, 0.0), -1.0e6, 1.0e6)
    fy = jnp.clip(jnp.where(jnp.isfinite(fy), fy, 0.0), -1.0e6, 1.0e6)
    ix = jnp.floor(fx)
    iy = jnp.floor(fy)
    gx = fx - ix
    gy = fy - iy
    ixi = ix.astype(jnp.int32)
    iyi = iy.astype(jnp.int32)
    BIGI = jnp.int32(0x7FFFFFFF)

    acc_r = jnp.zeros(fx.shape, jnp.float32)
    acc_g = jnp.zeros(fx.shape, jnp.float32)
    acc_b = jnp.zeros(fx.shape, jnp.float32)
    ones = jnp.ones(fx.shape, jnp.int32)

    for cx, cy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        wx = gx if cx else 1.0 - gx
        wy = gy if cy else 1.0 - gy
        w = wx * wy
        ax = jnp.mod(ixi + cx, res)
        ay = jnp.mod(iyi + cy, res)
        wid = (ax * res + ay) * 2
        slab = wid >> 10

        def cond(c):
            return c[3] != BIGI

        def body(c):
            r, g, b, sid, remaining = c
            wanted = (remaining != 0) & (slab == sid)
            w0 = _gather_1024(tab_ref[pl.ds(sid * 8, 8), :], wid & 1023)
            w1 = _gather_1024(tab_ref[pl.ds(sid * 8, 8), :], (wid & 1023) + 1)
            fr = pltpu.bitcast(w0 & jnp.int32(-65536), jnp.float32)
            fg = pltpu.bitcast(w0 << 16, jnp.float32)
            fb = pltpu.bitcast(w1 & jnp.int32(-65536), jnp.float32)
            r = jnp.where(wanted, fr, r)
            g = jnp.where(wanted, fg, g)
            b = jnp.where(wanted, fb, b)
            remaining = remaining & ~wanted.astype(jnp.int32)
            nsid = jnp.min(jnp.where(remaining != 0, slab, BIGI))
            return r, g, b, nsid, remaining

        z = jnp.zeros(fx.shape, jnp.float32)
        sid0 = jnp.min(slab)
        r, g, b, _, _ = jax.lax.while_loop(
            cond, body, (z, z, z, sid0, ones)
        )
        acc_r = acc_r + w * r
        acc_g = acc_g + w * g
        acc_b = acc_b + w * b

    r_ref[0] = acc_r
    g_ref[0] = acc_g
    b_ref[0] = acc_b


@functools.partial(jax.jit, static_argnames=("res", "interpret"))
def bilinear_fetch_packed(packed_words, fx, fy, res: int,
                          interpret: bool = False):
    """Bilinear wraparound fetch of an rgb texture packed by pack_rgb_bf16.

    fx/fy: (N,) texel-space coordinates (uv*res - 0.5). Returns (N, 3) f32.
    """
    n = fx.shape[0]
    pad = (-n) % BLOCK
    npad = n + pad
    fxp = jnp.pad(fx, (0, pad)).reshape(-1, SUBLANES, LANES)
    fyp = jnp.pad(fy, (0, pad)).reshape(-1, SUBLANES, LANES)
    nb = npad // BLOCK

    ray_spec = pl.BlockSpec((1, SUBLANES, LANES), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    tab = packed_words.reshape(-1, LANES).astype(jnp.int32)
    tab_spec = pl.BlockSpec((tab.shape[0], LANES), lambda b: (0, 0),
                            memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((nb, SUBLANES, LANES), jnp.float32)
                  for _ in range(3)]
    outs = pl.pallas_call(
        functools.partial(_bilinear_kernel, res=res),
        grid=(nb,),
        in_specs=[ray_spec, ray_spec, tab_spec],
        out_specs=[ray_spec] * 3,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(fxp, fyp, tab)
    r, g, b = [x.reshape(npad)[:n] for x in outs]
    return jnp.stack([r, g, b], axis=-1)


def _point_kernel(wid_ref, tab_ref, w0_ref, w1_ref):
    """One-texel fetch: returns the two packed table words verbatim.

    Same distinct-slab min-reduce loop as _bilinear_kernel but a single
    corner — the stochastic-bilinear path picks the corner host-side, so
    the kernel does ~4x fewer slab rounds and its outputs are the exact
    bf16-packed texel words (lossless through the unroute sort)."""
    wid = wid_ref[0]
    slab = wid >> 10
    BIGI = jnp.int32(0x7FFFFFFF)
    ones = jnp.ones(wid.shape, jnp.int32)
    z = jnp.zeros(wid.shape, jnp.int32)

    def cond(c):
        return c[2] != BIGI

    def body(c):
        w0, w1, sid, remaining = c
        wanted = (remaining != 0) & (slab == sid)
        g0 = _gather_1024(tab_ref[pl.ds(sid * 8, 8), :], wid & 1023)
        g1 = _gather_1024(tab_ref[pl.ds(sid * 8, 8), :], (wid & 1023) + 1)
        w0 = jnp.where(wanted, g0, w0)
        w1 = jnp.where(wanted, g1, w1)
        remaining = remaining & ~wanted.astype(jnp.int32)
        nsid = jnp.min(jnp.where(remaining != 0, slab, BIGI))
        return w0, w1, nsid, remaining

    w0, w1, _, _ = jax.lax.while_loop(cond, body, (z, z, jnp.min(slab), ones))
    w0_ref[0] = w0
    w1_ref[0] = w1


@functools.partial(jax.jit, static_argnames=("interpret",))
def point_fetch_words(packed_words, texel_word_idx, interpret: bool = False):
    """Fetch word pairs (w0, w1) = packed rgb of one texel per lane.

    texel_word_idx: (N,) i32 EVEN word index (2 * texel id), pre-wrapped
    and finite-guarded by the caller. Returns two (N,) i32 arrays holding
    the packed words exactly as stored (decode with unpack_words_rgb)."""
    n = texel_word_idx.shape[0]
    pad = (-n) % BLOCK
    npad = n + pad
    widp = jnp.pad(texel_word_idx, (0, pad)).reshape(-1, SUBLANES, LANES)
    nb = npad // BLOCK

    ray_spec = pl.BlockSpec((1, SUBLANES, LANES), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    tab = packed_words.reshape(-1, LANES).astype(jnp.int32)
    tab_spec = pl.BlockSpec((tab.shape[0], LANES), lambda b: (0, 0),
                            memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((nb, SUBLANES, LANES), jnp.int32)
                  for _ in range(2)]
    outs = pl.pallas_call(
        _point_kernel,
        grid=(nb,),
        in_specs=[ray_spec, tab_spec],
        out_specs=[ray_spec] * 2,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(widp, tab)
    return [x.reshape(npad)[:n] for x in outs]


def unpack_words_rgb(w0, w1):
    """Decode pack_rgb_bf16 word pairs back to (N, 3) f32."""
    r, g, b = unpack_words_rgb_soa(w0, w1)
    return jnp.stack([r, g, b], axis=-1)


def unpack_words_rgb_soa(w0, w1):
    """Decode pack_rgb_bf16 word pairs to (r, g, b) component arrays."""
    w0 = w0.astype(jnp.int32)
    w1 = w1.astype(jnp.int32)
    r = jax.lax.bitcast_convert_type(w0 & jnp.int32(-65536), jnp.float32)
    g = jax.lax.bitcast_convert_type(w0 << 16, jnp.float32)
    b = jax.lax.bitcast_convert_type(w1 & jnp.int32(-65536), jnp.float32)
    return r, g, b


def bilinear_fetch_sorted(packed_words, fx, fy, res: int,
                          interpret: bool = False):
    """bilinear_fetch_packed with a texel-id sort route/unroute so scattered
    direction sets (bounce-ray escapes) still give each kernel block a tight
    slab footprint. Costs two 1M-element lax.sorts ≈ 3 ms."""
    n = fx.shape[0]
    ix = jnp.clip(jnp.floor(fx), 0.0, float(res - 1)).astype(jnp.int32)
    iy = jnp.clip(jnp.floor(fy), 0.0, float(res - 1)).astype(jnp.int32)
    key = ix * res + iy
    key = jnp.where(jnp.isfinite(fx) & jnp.isfinite(fy), key,
                    jnp.int32(0x7FFFFFFF))
    idx = jnp.arange(n, dtype=jnp.int32)
    _, sidx, sfx, sfy = jax.lax.sort([key, idx, fx, fy], num_keys=1,
                                     is_stable=False)
    rgb = bilinear_fetch_packed(packed_words, sfx, sfy, res,
                                interpret=interpret)
    _, r, g, b = jax.lax.sort(
        [sidx, rgb[:, 0], rgb[:, 1], rgb[:, 2]], num_keys=1, is_stable=False
    )
    return jnp.stack([r, g, b], axis=-1)
