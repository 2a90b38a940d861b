"""Pallas temporal-resample kernel — the camera-motion reprojection hot path.

While the camera moves, every output pixel fetches a 2×2 (bilinear) or 4×4
(Catmull-Rom) history neighborhood plus validity-gate buffers through the
previous frame's matrices (renderer/pathtracer.py:1077-1183). As XLA
gathers, that is ~30 full-image index fetches per frame at ~0.1 G rows/s —
the dominant moving-frame cost (PERF_NOTES.md). This kernel keeps the
ACTIVE-RES source buffers resident in VMEM as bf16-packed u32 words and
serves each (8,128) output block's taps with distinct-slab min-reduce loops
(the same machinery as the traversal kernel's color fetch): a block of 1024
row-major output pixels reprojects to a footprint of a few source columns =
a handful of 1024-word slabs.

One call fuses, per pass (diffuse or specular):
  * the current-color bilinear upsample (renderer/pathtracer.py:1077-1090),
  * the gated history tap filter with anti-ringing clamp
    (renderer/pathtracer.py:1092-1183) — normal gate, optional depth gate,
    optional extra scalar buffer (specular reflection depth).

bf16 packing (≈0.4% relative) is ample here: these buffers only shape the
TRANSIENT motion-phase image — the history weight caps at 50 while moving
and accumulation restarts on stop, so converged stills never see them.
Depth buffers stay f32 (the 5% relative gate compares them directly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
BLOCK = SUBLANES * LANES

# VMEM budget gate: texels per source table above which callers must fall
# back to the XLA gather path (6 tables of one u32 word per texel plus
# block buffers must fit in ~16 MB VMEM). 530K covers 1080p motion at
# render-scale 0.5 (960×540 = 518K texels ⇒ ~12.5 MB of tables — verified
# to compile and run on v5e).
MAX_TEXELS = 530_000


def _bf16_bits(x):
    """f32 -> bf16 bits (round-to-nearest-even), as i32 in [0, 0xFFFF]."""
    b = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    rne = ((b >> 16) & 1) + jnp.int32(0x7FFF)
    return ((b + rne) >> 16) & 0xFFFF


def pack2_bf16(a, b):
    """Two f32 planes -> one u32 plane: bf16(a) << 16 | bf16(b)."""
    return (_bf16_bits(a) << 16) | _bf16_bits(b)


def _unpack_hi(w):
    return pltpu.bitcast(w & jnp.int32(-65536), jnp.float32)


def _unpack_lo(w):
    return pltpu.bitcast(w << 16, jnp.float32)


def _catmullrom(x):
    """renderer/pathtracer.py:1002-1014."""
    x2 = x * x
    x3 = x2 * x
    f1 = 1.5 * x3 - 2.5 * x2 + 1.0
    f2 = -0.5 * x3 + 2.5 * x2 - 4.0 * x + 2.0
    return jnp.where(x < 1.0, f1, jnp.where(x < 2.0, f2, 0.0))


def _gather_1024(table_slab, word_idx):
    lane = word_idx & 127
    sub = (word_idx >> 7) & 7
    out = jnp.zeros_like(word_idx)
    for k in range(8):
        row = jnp.broadcast_to(table_slab[k : k + 1, :], word_idx.shape)
        g = jnp.take_along_axis(row, lane, axis=1)
        out = jnp.where(sub == k, g, out)
    return out


def _gather_tables(refs, idx):
    """Gather the same texel index from several VMEM tables with ONE
    distinct-slab min-reduce loop (shared per-slab bookkeeping)."""
    BIGI = jnp.int32(0x7FFFFFFF)
    slab = idx >> 10

    def cond(c):
        return c[0] != BIGI

    def body(c):
        sid, remaining, outs = c
        wanted = (remaining != 0) & (slab == sid)
        new = []
        for ref, out in zip(refs, outs):
            g = _gather_1024(ref[pl.ds(sid * 8, 8), :], idx & 1023)
            new.append(jnp.where(wanted, g, out))
        remaining = remaining & ~wanted.astype(jnp.int32)
        nsid = jnp.min(jnp.where(remaining != 0, slab, BIGI))
        return nsid, remaining, tuple(new)

    z = tuple(jnp.zeros_like(idx) for _ in refs)
    sid0 = jnp.min(slab)
    _, _, outs = jax.lax.while_loop(
        cond, body, (sid0, jnp.ones_like(idx), z)
    )
    return outs


def _decode_oct(w):
    """Octahedral normal from a pack2_bf16(e0, e1) word
    (ops/packing.decode_unit_vector_3x16, renderer/math_utils.py:209-215)."""
    ex = _unpack_hi(w) * 2.0 - 1.0
    ey = _unpack_lo(w) * 2.0 - 1.0
    z = 1.0 - jnp.abs(ex) - jnp.abs(ey)
    t = jnp.maximum(-z, 0.0)
    x = ex + jnp.where(ex >= 0.0, -t, t)
    y = ey + jnp.where(ey >= 0.0, -t, t)
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-20))
    return x * inv, y * inv, z * inv


def _taps_kernel(fxc_ref, fyc_ref, fxh_ref, fyh_ref, cd_ref,
                 cn0_ref, cn1_ref, cn2_ref,
                 cur0_ref, cur1_ref, h0_ref, h1_ref, pn_ref, pd_ref, ex_ref,
                 ocr_ref, ocg_ref, ocb_ref,
                 hr_ref, hg_ref, hb_ref, hw_ref, ws_ref, exf_ref,
                 *, ires_x, ires_y, stride, catmullrom, gate_depth,
                 with_extra):
    # --- current-color bilinear (renderer/pathtracer.py:1077-1090) ----------
    fxc = fxc_ref[0]
    fyc = fyc_ref[0]
    ixc = jnp.floor(fxc)
    iyc = jnp.floor(fyc)
    gx = fxc - ixc
    gy = fyc - iyc
    ixi = ixc.astype(jnp.int32)
    iyi = iyc.astype(jnp.int32)
    acc = [jnp.zeros(fxc.shape, jnp.float32) for _ in range(3)]
    for cx, cy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        wx = gx if cx else 1.0 - gx
        wy = gy if cy else 1.0 - gy
        w = wx * wy
        ax = jnp.clip(ixi + cx, 0, ires_x - 1)
        ay = jnp.clip(iyi + cy, 0, ires_y - 1)
        c0, c1 = _gather_tables((cur0_ref, cur1_ref), ax * stride + ay)
        acc[0] = acc[0] + w * _unpack_hi(c0)
        acc[1] = acc[1] + w * _unpack_lo(c0)
        acc[2] = acc[2] + w * _unpack_hi(c1)
    ocr_ref[0], ocg_ref[0], ocb_ref[0] = acc

    # --- gated history taps (renderer/pathtracer.py:1092-1183) --------------
    fxh = fxh_ref[0]
    fyh = fyh_ref[0]
    # reprojection can land anywhere (incl. NaN for sky); keep indices sane —
    # out-of-bounds taps get zero weight below.
    fxh = jnp.clip(jnp.where(jnp.isfinite(fxh), fxh, -9.0), -9.0, 1.0e6)
    fyh = jnp.clip(jnp.where(jnp.isfinite(fyh), fyh, -9.0), -9.0, 1.0e6)
    ix = jnp.floor(fxh).astype(jnp.int32)
    iy = jnp.floor(fyh).astype(jnp.int32)
    fx = fxh - ix.astype(jnp.float32)
    fy = fyh - iy.astype(jnp.float32)
    cd = cd_ref[0]
    cn0, cn1, cn2 = cn0_ref[0], cn1_ref[0], cn2_ref[0]

    BIGF = jnp.float32(999999.0)
    col_sum = [jnp.zeros(fxh.shape, jnp.float32) for _ in range(4)]
    col_min = [jnp.full(fxh.shape, BIGF) for _ in range(4)]
    col_max = [jnp.zeros(fxh.shape, jnp.float32) for _ in range(4)]
    e_sum = jnp.zeros(fxh.shape, jnp.float32)
    e_min = jnp.full(fxh.shape, BIGF)
    e_max = jnp.zeros(fxh.shape, jnp.float32)
    w_sum = jnp.zeros(fxh.shape, jnp.float32)

    # Precompute all tap indices/base weights, then serve every tap from ONE
    # distinct-slab loop over the union footprint (a 4×4 Catmull-Rom block
    # would otherwise pay 16 separate min-reduce loops; the union is only
    # ~4-5 slabs since the taps span a 5×5 source neighborhood).
    taps = range(-1, 3) if catmullrom else range(0, 2)
    refs = [h0_ref, h1_ref, pn_ref]
    if gate_depth:
        refs.append(pd_ref)
    if with_extra:
        refs.append(ex_ref)
    tap_idx = []
    tap_inb = []
    tap_w = []
    for ox in taps:
        if catmullrom:
            wgx = _catmullrom(jnp.abs(ox - fx))
        else:
            wgx = jnp.maximum(1.0 - jnp.abs(ox - fx), 0.0)
        for oy in taps:
            if catmullrom:
                wgt = wgx * _catmullrom(jnp.abs(oy - fy))
            else:
                wgt = wgx * jnp.maximum(1.0 - jnp.abs(oy - fy), 0.0)
            tx = ix + ox
            ty = iy + oy
            inb = (tx >= 0) & (tx < ires_x) & (ty >= 0) & (ty < ires_y)
            cx_ = jnp.clip(tx, 0, ires_x - 1)
            cy_ = jnp.clip(ty, 0, ires_y - 1)
            tap_idx.append(cx_ * stride + cy_)
            tap_inb.append(inb)
            tap_w.append(wgt)

    n_taps = len(tap_idx)
    BIGI = jnp.int32(0x7FFFFFFF)
    tap_slab = [idx >> 10 for idx in tap_idx]

    def scond(c):
        return c[0] != BIGI

    def sbody(c):
        sid, rem, acc = c
        acc = list(acc)
        new_rem = []
        ai = 0
        for t in range(n_taps):
            wanted = (rem[t] != 0) & (tap_slab[t] == sid)
            for ref in refs:
                g = _gather_1024(ref[pl.ds(sid * 8, 8), :],
                                 tap_idx[t] & 1023)
                acc[ai] = jnp.where(wanted, g, acc[ai])
                ai += 1
            new_rem.append(rem[t] & ~wanted.astype(jnp.int32))
        pend = [jnp.where(new_rem[t] != 0, tap_slab[t], BIGI)
                for t in range(n_taps)]
        m = pend[0]
        for p in pend[1:]:
            m = jnp.minimum(m, p)
        return jnp.min(m), tuple(new_rem), tuple(acc)

    z = jnp.zeros(fxh.shape, jnp.int32)
    ones = jnp.ones(fxh.shape, jnp.int32)
    m0 = tap_slab[0]
    for p in tap_slab[1:]:
        m0 = jnp.minimum(m0, p)
    _, _, acc = jax.lax.while_loop(
        scond, sbody,
        (jnp.min(m0), tuple(ones for _ in range(n_taps)),
         tuple(z for _ in range(n_taps * len(refs)))),
    )

    nref = len(refs)
    for t in range(n_taps):
        got = acc[t * nref : (t + 1) * nref]
        h0, h1, pn = got[0], got[1], got[2]
        k = 3
        if gate_depth:
            tap_lin = pltpu.bitcast(got[k], jnp.float32)
            k += 1
        if with_extra:
            ex = pltpu.bitcast(got[k], jnp.float32)
        wgt = tap_w[t]
        inb = tap_inb[t]

        nx, ny, nz = _decode_oct(pn)
        ok_n = (cn0 * nx + cn1 * ny + cn2 * nz) > 0.642
        wgt = wgt * ok_n.astype(jnp.float32)
        if gate_depth:
            ok_d = (jnp.abs(tap_lin - cd)
                    / jnp.maximum(jnp.abs(cd), 1e-20)) < 0.05
            wgt = wgt * ok_d.astype(jnp.float32)
        wgt = wgt * inb.astype(jnp.float32)

        c = (_unpack_hi(h0), _unpack_lo(h0),
             _unpack_hi(h1), _unpack_lo(h1))
        for i in range(4):
            col_min[i] = jnp.where(inb, jnp.minimum(col_min[i], c[i]),
                                   col_min[i])
            col_max[i] = jnp.where(inb, jnp.maximum(col_max[i], c[i]),
                                   col_max[i])
            col_sum[i] = col_sum[i] + c[i] * wgt
        if with_extra:
            e_min = jnp.where(inb, jnp.minimum(e_min, ex), e_min)
            e_max = jnp.where(inb, jnp.maximum(e_max, ex), e_max)
            e_sum = e_sum + ex * wgt
        w_sum = w_sum + wgt

    safe_w = jnp.where(jnp.abs(w_sum) < 1e-20, 1e-20, w_sum)
    floor = (0.0, 0.0, 0.0, 1.0)
    out_refs = (hr_ref, hg_ref, hb_ref, hw_ref)
    for i in range(4):
        v = jnp.clip(col_sum[i] / safe_w, col_min[i], col_max[i])
        out_refs[i][0] = jnp.maximum(v, floor[i])
    ws_ref[0] = w_sum
    if with_extra:
        exf_ref[0] = jnp.clip(e_sum / safe_w, e_min, e_max)
    else:
        exf_ref[0] = jnp.zeros(fxh.shape, jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("ires_x", "ires_y", "catmullrom", "gate_depth",
                     "interpret"),
)
def temporal_taps(cur_packed, hist_packed, pn_packed, pd_lin, extra,
                  fxc, fyc, fxh, fyh, center_depth, center_normal,
                  ires_x: int, ires_y: int, catmullrom: bool,
                  gate_depth: bool, interpret: bool = False):
    """Fused motion-phase resample (see module docstring).

    Source tables (flat, active-res row-major, one u32/ f32 word per texel):
      cur_packed:  (2, n) u32 — pack2(curR, curG), pack2(curB, 0)
      hist_packed: (2, n) u32 — pack2(histR, histG), pack2(histB, histW)
      pn_packed:   (n,) u32 — pack2(oct_e0, oct_e1) of the prev normals
      pd_lin:      (n,) f32 linearized prev depth (or None)
      extra:       (n,) f32 (or None) — specular reflection-depth history
    Per-output-pixel (flat (m,)): fxc/fyc current-tap coords, fxh/fyh
    reprojected history coords, center_depth (linear), center_normal (m, 3).
    Returns (current_rgb (m,3), w_sum (m,), hist_rgba (m,4), extra_f (m,)).
    """
    m = fxc.shape[0]
    pad = (-m) % BLOCK
    mp = m + pad
    nb = mp // BLOCK

    def blk(x):
        return jnp.pad(x, (0, pad)).reshape(nb, SUBLANES, LANES)

    with_extra = extra is not None

    def tab(x):
        x = x.astype(jnp.int32) if x.dtype != jnp.float32 else \
            jax.lax.bitcast_convert_type(x, jnp.int32)
        p = (-x.shape[0]) % 1024
        return jnp.pad(x, (0, p)).reshape(-1, LANES)

    cur0 = tab(cur_packed[0])
    cur1 = tab(cur_packed[1])
    h0 = tab(hist_packed[0])
    h1 = tab(hist_packed[1])
    pn = tab(pn_packed)
    pd = tab(pd_lin) if gate_depth else jnp.zeros((8, LANES), jnp.int32)
    ex = tab(extra) if with_extra else jnp.zeros((8, LANES), jnp.int32)

    ray_spec = pl.BlockSpec((1, SUBLANES, LANES), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def tspec(t):
        return pl.BlockSpec((t.shape[0], LANES), lambda b: (0, 0),
                            memory_space=pltpu.VMEM)

    ins = [blk(fxc), blk(fyc), blk(fxh), blk(fyh), blk(center_depth),
           blk(center_normal[:, 0]), blk(center_normal[:, 1]),
           blk(center_normal[:, 2])]
    tables = [cur0, cur1, h0, h1, pn, pd, ex]
    out_shapes = [jax.ShapeDtypeStruct((nb, SUBLANES, LANES), jnp.float32)
                  for _ in range(9)]

    outs = pl.pallas_call(
        functools.partial(
            _taps_kernel, ires_x=ires_x, ires_y=ires_y, stride=ires_y,
            catmullrom=catmullrom, gate_depth=gate_depth,
            with_extra=with_extra,
        ),
        grid=(nb,),
        in_specs=[ray_spec] * 8 + [tspec(t) for t in tables],
        out_specs=[ray_spec] * 9,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*ins, *tables)

    ocr, ocg, ocb, hr, hg, hb, hw, ws, exf = [
        x.reshape(mp)[:m] for x in outs
    ]
    current = jnp.stack([ocr, ocg, ocb], axis=-1)
    hist = jnp.stack([hr, hg, hb, hw], axis=-1)
    return current, ws, hist, (exf if with_extra else None)
