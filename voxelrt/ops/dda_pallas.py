"""Production TPU traversal kernel (Pallas/Mosaic).

Same traversal semantics as voxelrt.ops.dda (itself derived from
renderer/raytracer.py:72-155) but engineered for the TPU memory system —
XLA's native gather runs at ~0.1 G/s, 300× too slow for the DDA inner loop
(PERF_NOTES.md). Design (v5):

  * the whole march runs inside one kernel; rays processed in (rows, 128)
    lock-step blocks, occupancy tables resident in VMEM;
  * empty space is crossed with a 4-bit chebyshev DISTANCE FIELD over 8³
    cells (ops.accel.dist3_words): a value d ≥ 1 certifies the radius-(d-1)
    cell box empty, so one iteration advances the ray to that box's exit —
    replacing the reference's LOD3..LOD6 pyramid descent/ascent
    (renderer/raytracer.py:110-147) with a single query + skip;
  * LOD2 occupancy (one bit per 4³ cell, 1024 u32 words at 128³) is gathered
    with the "roll trick": 8 × (static row broadcast → lane shuffle →
    select) ≈ 1 cycle/vreg lane shuffle;
  * voxel masks are RANK-COMPRESSED (ops.accel): only MIXED (partially
    occupied) cells store a 64-bit mask, indexed by a prefix-popcount rank.
    Real scenes have only a few thousand mixed cells, so a mask fetch is one
    short FULL static scan over ceil(n_mixed/128) vreg rows — no dynamic
    sublane slices, no per-group scalar reductions (the v4 morton-grouped
    scan machinery measured ~65% of sorted-bounce kernel time and scaled
    with wavefront incoherence; the static scan's cost is scene-static);
  * fully-SOLID cells (all 64 voxels set — interiors, ground slabs) are a
    bit table: the fetch overrides their mask with all-ones, so the in-cell
    DDA hits the entry voxel at step 0 and no compressed-table row is spent
    on them (example6: 3600 of 6297 occupied cells are solid);
  * on entering an occupied 4³ cell the ray RESOLVES THE WHOLE CELL in
    registers in that same iteration: an unrolled ≤10-step single-voxel DDA
    over the fetched mask (pure ALU, no memory);
  * fetch rounds are adaptively deferred so rays reaching occupied cells on
    adjacent iterations share one scan;
  * shadow rays run in ``any_hit`` mode: no normal tracking, no color fetch;
  * the hit color fetch reads a MORTON-rank-compressed color table (occupied
    cells only, ordered by morton code so a 3-D-local hit set maps to few
    slabs) with a min-reduce slab scan (once per trace, not per iteration).

Outputs match ops.dda.raytrace: (distance, ipos, normal, iters) plus the hit
voxel's packed color word (so shading needs no separate gather).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voxelrt.ops.accel import PallasTables
from voxelrt.ops.v3 import V3

LANES = 128
SUBLANES = 8
BLOCK_RAYS = SUBLANES * LANES  # rays per grid step
CELL_RESOLVE_STEPS = 9  # max voxel advances crossing a 4³ cell (3 per axis)


def _gather_1024(table_slab, word_idx, slab_rows=8):
    """Gather u32 words from a (slab_rows, 128) vreg slab by absolute word
    index [0, slab_rows*128) — the roll trick. word_idx: (rows, 128) i32."""
    lane = word_idx & 127
    sub = (word_idx >> 7) & (slab_rows - 1)
    out = jnp.zeros_like(word_idx)
    for k in range(slab_rows):
        row = jnp.broadcast_to(table_slab[k : k + 1, :], word_idx.shape)
        g = jnp.take_along_axis(row, lane, axis=1)
        out = jnp.where(sub == k, g, out) if slab_rows > 1 else g
    return out


def _part1by2(v):
    """Spread low bits 3 apart (valid for v < 256)."""
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _morton3(x, y, z):
    return _part1by2(x) | (_part1by2(y) << 1) | (_part1by2(z) << 2)


def _popcount32(v):
    """Branch-free 32-bit popcount (Mosaic-safe: shifts are arithmetic on
    i32 but every shift is masked)."""
    v = v - ((v >> 1) & 0x55555555)
    v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
    v = (v + (v >> 4)) & 0x0F0F0F0F
    return ((v * 0x01010101) >> 24) & 63


def _gather_words(table_ref, word_idx, n_words):
    """Gather u32 words from a small VMEM table by absolute index
    [0, n_words); costs ceil(n_words/128) lane-shuffle rounds."""
    rounds = -(-n_words // LANES)
    lane = word_idx & 127
    row_id = word_idx >> 7
    out = jnp.zeros_like(word_idx)
    for k in range(rounds):
        row = jnp.broadcast_to(table_ref[k : k + 1, :], word_idx.shape)
        g = jnp.take_along_axis(row, lane, axis=1)
        out = jnp.where(row_id == k, g, out) if rounds > 1 else g
    return out


def _gather_words2(ref_a, ref_b, word_idx, n_words):
    """Gather the same index from two parallel tables in one scan (shares
    the lane/row index math and the per-row select mask)."""
    rounds = -(-n_words // LANES)
    lane = word_idx & 127
    row_id = word_idx >> 7
    out_a = jnp.zeros_like(word_idx)
    out_b = jnp.zeros_like(word_idx)
    for k in range(rounds):
        row_a = jnp.broadcast_to(ref_a[k : k + 1, :], word_idx.shape)
        row_b = jnp.broadcast_to(ref_b[k : k + 1, :], word_idx.shape)
        ga = jnp.take_along_axis(row_a, lane, axis=1)
        gb = jnp.take_along_axis(row_b, lane, axis=1)
        if rounds > 1:
            sel = row_id == k
            out_a = jnp.where(sel, ga, out_a)
            out_b = jnp.where(sel, gb, out_b)
        else:
            out_a, out_b = ga, gb
    return out_a, out_b


def _fetch_hit_colors(px, py, pz, hit_flag, occm_ref, occb_ref, colors_ref,
                      pal_ref, n_lod2_words, use_palette):
    """Hit color fetch: morton-rank index + min-reduce DISTINCT-slab loop
    (hit cells are tile-local + MORTON-rank-compressed — compression only
    shrinks morton distances, so a 3-D-local hit set is a handful of slabs);
    the min doubles as the done test (BIGI ⇒ no lanes remain) so each slab
    costs ONE vector reduction. Returns (color_words, n_slabs)."""
    mcell = _morton3(px >> 2, py >> 2, pz >> 2)
    mw = mcell >> 5
    mb = mcell & 31
    wm, occb = _gather_words2(occm_ref, occb_ref, mw, n_lod2_words)
    occ_rank = occb + _popcount32(wm & ((1 << mb) - 1))
    local = ((pz & 3) * 4 + (py & 3)) * 4 + (px & 3)
    if use_palette:
        # Palette mode: cell stride 22 words of 3×10-bit indices.
        # local // 3 == (local * 171) >> 9 exactly for local < 510.
        word_idx = occ_rank * 22 + ((local * 171) >> 9)
    else:
        word_idx = occ_rank * 64 + local
    hit = hit_flag != 0
    slab_id = word_idx >> 10  # one (8,128) slab = 16 cells' colors
    BIGI = jnp.int32(0x7FFFFFFF)

    def ccond(c):
        return c[1] != BIGI

    def cbody(c):
        col, sid, remaining, ns = c
        # Serve TWO adjacent slabs per iteration: hit sets are morton-rank
        # local, so the next distinct slab is very often sid+1 — one extra
        # (unconditional) gather is cheaper than another loop trip's
        # scalar min-reduce + control overhead.
        wanted = (remaining != 0) & (slab_id == sid)
        gv = _gather_1024(colors_ref[pl.ds(sid * 8, 8), :],
                          word_idx & 1023)
        col = jnp.where(wanted, gv, col)
        wanted2 = (remaining != 0) & (slab_id == sid + 1)
        # clamp the slice for the last slab (no lane has slab_id there)
        s2 = jnp.minimum(sid * 8 + 8, colors_ref.shape[0] - 8)
        gv2 = _gather_1024(colors_ref[pl.ds(s2, 8), :], word_idx & 1023)
        col = jnp.where(wanted2, gv2, col)
        remaining = remaining & ~(wanted | wanted2).astype(jnp.int32)
        nsid = jnp.min(jnp.where(remaining != 0, slab_id, BIGI))
        return col, nsid, remaining, ns + 1

    sid0 = jnp.min(jnp.where(hit, slab_id, BIGI))
    col, _, _, nslab = jax.lax.while_loop(
        ccond, cbody,
        (jnp.zeros(px.shape, jnp.int32), sid0, hit.astype(jnp.int32),
         jnp.int32(0)),
    )
    if use_palette:
        # Decode the 10-bit index and resolve it through the one-slab
        # palette (fixed 8 gather rounds, no loop).
        slot = local - 3 * ((local * 171) >> 9)
        pidx = (col >> (10 * slot)) & 1023
        pv = _gather_1024(pal_ref[pl.ds(0, 8), :], pidx)
        col = jnp.where(hit, pv, 0)
    return col, nslab


def _traverse_kernel(*refs, grid_res, max_advances, fetch_colors, any_hit,
                     use_sun_open, n_lod2_words, n_dist3_words, n_mixed_rows,
                     use_palette=False,
                     use_xslab=True, fetch_cadence=2,
                     resolve_steps=CELL_RESOLVE_STEPS,
                     static_trange=None,
                     queue_depth=1, refill_every=4, nee_mode=False,
                     march_unroll=1, sun_mode="all",
                     slow_after=48, debug_totals=False,
                     nee_src_open=False):
    C = queue_depth
    queued = C > 1 or nee_mode
    if static_trange is None:
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
         tmin_ref, tmax_ref) = refs[:8]
        base_rays = 8
        ray_refs = (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    tmin_ref, tmax_ref)
    else:
        # tmin/tmax are launch constants (queued dispatches with an alive
        # bitmask: the caller's wavefront mask lives in amask, padding
        # lanes are dead by construction) — no per-ray arrays, two fewer
        # queue fields in VMEM and in every refill select-chain.
        assert queued
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref) = refs[:6]
        tmin_ref = tmax_ref = None
        base_rays = 6
        ray_refs = (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref)
        st_tmin = jnp.float32(static_trange[0])
        st_tmax = jnp.float32(static_trange[1])
    if nee_mode:
        # In-kernel NEE (see raytrace_pallas docstring): per-ray cone
        # uniforms + the floor-surface alternative hit distance (grid
        # units; inf = no floor), plus an SMEM row of launch scalars
        # [L, X, Y, cone_cos, eps_grid, shadow_tmin] (the constant sun
        # frame, so the cone sample is pure per-lane ALU).
        u1_ref, u2_ref, alt_ref, nee_ref = refs[base_rays:base_rays + 4]
        base_rays += 4
    if queued:
        # Per-slot ALIVE bitmask (bit k = queue entry k is a live input
        # ray): refill rounds jump straight to the next set bit, so dead
        # entries (terminated paths at later bounce depths, padding) cost
        # ZERO march iterations instead of refill_every each. Outputs for
        # skipped entries are pre-initialized to the canonical miss below.
        amask_ref = refs[base_rays]
        base_rays += 1
    tbl0 = base_rays
    (lod2_ref, solid_ref, dist3_ref, rankb_ref, occm_ref,
     occb_ref, mlo_ref, mhi_ref, colors_ref, pal_ref,
     sun_ref) = refs[tbl0 : tbl0 + 11]
    if queued:
        # Queued mode writes PACKED per-chunk outputs (t, word, af, col);
        # the wrapper unpacks in XLA.
        assert not debug_totals
        t_ref, word_ref, af_ref, col_ref = refs[tbl0 + 11 :]
    else:
        (t_ref, ix_ref, iy_ref, iz_ref,
         nx_ref, ny_ref, nz_ref, it_ref, col_ref, act_ref) = refs[tbl0 + 11 :]
    res = grid_res
    r2 = res // 4
    r3 = res // 8
    fres = float(res)
    BIG = jnp.float32(3.0e38)
    eps = jnp.float32(1e-6)

    # Loop-carried per-ray state is PACKED into three vector arrays (t,
    # word, af) instead of eleven: at block_rows=24 the unpacked carries
    # alone were ~33 vregs, forcing VMEM spills every iteration.
    #   word = (px+1) | (py+1)<<8 | (pz+1)<<16 | (nx+1)<<24 | (ny+1)<<26
    #          | (nz+1)<<28        (positions span [-1, res]; res <= 254)
    #   af   = adv | active<<16 | hit<<17 | exh<<18
    assert res <= 254, res

    def pack_word(px_, py_, pz_, nx_, ny_, nz_):
        return (
            (px_ + 1) | ((py_ + 1) << 8) | ((pz_ + 1) << 16)
            | ((nx_.astype(jnp.int32) + 1) << 24)
            | ((ny_.astype(jnp.int32) + 1) << 26)
            | ((nz_.astype(jnp.int32) + 1) << 28)
        )

    def unpack_word(word):
        px_ = (word & 255) - 1
        py_ = ((word >> 8) & 255) - 1
        pz_ = ((word >> 16) & 255) - 1
        nx_ = (((word >> 24) & 3) - 1).astype(jnp.float32)
        ny_ = (((word >> 26) & 3) - 1).astype(jnp.float32)
        nz_ = (((word >> 28) & 3) - 1).astype(jnp.float32)
        return px_, py_, pz_, nx_, ny_, nz_

    def init_rays(ox, oy, oz, dx, dy, dz, tmin, tmax, rs_act=None):
        """Ray/AABB clip + entry state (raytracer.py:81-101, IEEE form).
        Returns (t, word, af, far, inv_x, inv_y, inv_z); dead rays carry
        ipos = -1 in the packed word."""
        inv_x = 1.0 / jnp.maximum(jnp.abs(dx), 1e-20)
        inv_y = 1.0 / jnp.maximum(jnp.abs(dy), 1e-20)
        inv_z = 1.0 / jnp.maximum(jnp.abs(dz), 1e-20)
        sx = jnp.sign(dx)
        sy = jnp.sign(dy)
        sz = jnp.sign(dz)

        def slab(o, d, inv, s):
            a = (0.0 - o) * jnp.where(d == 0.0, 0.0, inv) * jnp.where(s < 0, -1.0, 1.0)
            b = (fres - o) * jnp.where(d == 0.0, 0.0, inv) * jnp.where(s < 0, -1.0, 1.0)
            lo = jnp.minimum(a, b)
            hi = jnp.maximum(a, b)
            deg = d == 0.0
            lo = jnp.where(deg, -BIG, lo)
            hi = jnp.where(deg, BIG, hi)
            out = deg & ((o < 0.0) | (o > fres))
            return lo, hi, out

        lx, hx, ox_out = slab(ox, dx, inv_x, sx)
        ly, hy, oy_out = slab(oy, dy, inv_y, sy)
        lz, hz, oz_out = slab(oz, dz, inv_z, sz)
        near = jnp.maximum(jnp.maximum(lx, ly), lz)
        far_box = jnp.minimum(jnp.minimum(hx, hy), hz)
        intersect = (near <= far_box) & ~(ox_out | oy_out | oz_out)

        alive0 = intersect & (tmin < far_box) & (tmax > near)
        if rs_act is not None:
            alive0 = alive0 & (rs_act != 0)
        t0 = jnp.maximum(near, tmin)
        px0 = jnp.clip(jnp.floor(ox + dx * (t0 + eps)), 0.0, fres - 1.0)
        py0 = jnp.clip(jnp.floor(oy + dy * (t0 + eps)), 0.0, fres - 1.0)
        pz0 = jnp.clip(jnp.floor(oz + dz * (t0 + eps)), 0.0, fres - 1.0)
        far = jnp.minimum(tmax, far_box) - eps

        if any_hit:
            nx0 = ny0 = nz0 = jnp.zeros(px0.shape, jnp.float32)
        else:
            # boundary-voxel initial normal (raytracer.py:98-101)
            idx_ = jnp.abs(ox + dx * (t0 + eps) - fres * 0.5)
            idy_ = jnp.abs(oy + dy * (t0 + eps) - fres * 0.5)
            idz_ = jnp.abs(oz + dz * (t0 + eps) - fres * 0.5)
            mx = jnp.maximum(jnp.maximum(idx_, idy_), idz_)
            nx0 = jnp.where(alive0, (idx_ == mx).astype(jnp.float32), 0.0)
            ny0 = jnp.where(alive0, (idy_ == mx).astype(jnp.float32), 0.0)
            nz0 = jnp.where(alive0, (idz_ == mx).astype(jnp.float32), 0.0)

        word = pack_word(
            jnp.where(alive0, px0.astype(jnp.int32), -1),
            jnp.where(alive0, py0.astype(jnp.int32), -1),
            jnp.where(alive0, pz0.astype(jnp.int32), -1),
            nx0, ny0, nz0,
        )
        t = jnp.where(alive0, t0, BIG)
        af = alive0.astype(jnp.int32) << 16
        return t, word, af, far, inv_x, inv_y, inv_z

    if queued:
        def load_chunk(cursor, defaults):
            """Select-chain load of the ray fields at per-slot chunk index
            ``cursor`` (static unroll over C); slots whose cursor matches no
            k keep their ``defaults``."""
            outs = list(defaults)
            for k in range(C):
                selk = cursor == k
                outs = [jnp.where(selk, r[0, k], o)
                        for r, o in zip(ray_refs, outs)]
            return outs

        def load_chunk_one(ref, cursor):
            """Select-chain load of ONE field at per-slot chunk ``cursor``."""
            out = jnp.zeros(ref.shape[2:], ref.dtype)
            for k in range(C):
                out = jnp.where(cursor == k, ref[0, k], out)
            return out

        def next_alive(cur):
            """Index of the lowest alive queue entry ABOVE ``cur`` (the
            per-slot amask bit scan); 32 when none remain. cur ∈ [-1, 32]."""
            am = amask_ref[0]
            sh = cur + 1
            msk = jnp.where(sh >= 32, 0,
                            jnp.int32(-1) << jnp.minimum(sh, 31))
            a = am & msk
            return _popcount32((a & (0 - a)) - 1)

        # Pre-initialize the packed outputs to the canonical miss (t = inf,
        # ipos = -1, inactive/no-hit/nee-invisible): entries the alive scan
        # skips are never written by a refill round. Also covers rays the
        # iteration cap would abandon (previously undefined output).
        DEADW = jnp.int32(0x15000000)  # pack_word(-1,-1,-1, 0,0,0)
        rshape = ox_ref.shape[2:]
        for k in range(C):
            t_ref[0, k] = jnp.full(rshape, BIG, jnp.float32)
            word_ref[0, k] = jnp.full(rshape, DEADW, jnp.int32)
            af_ref[0, k] = jnp.zeros(rshape, jnp.int32)

        zf = jnp.zeros(ox_ref.shape[2:], jnp.float32)
        cursor0 = next_alive(jnp.full(ox_ref.shape[2:], -1, jnp.int32))
        f = load_chunk(cursor0, [zf] * len(ray_refs))
        if static_trange is None:
            ox0, oy0, oz0, dx0, dy0, dz0, tmin0, tmax0 = f
        else:
            ox0, oy0, oz0, dx0, dy0, dz0 = f
            tmin0 = jnp.full(ox0.shape, st_tmin)
            tmax0 = jnp.full(ox0.shape, st_tmax)
    else:
        ox0, oy0, oz0 = ox_ref[0], oy_ref[0], oz_ref[0]
        dx0, dy0, dz0 = dx_ref[0], dy_ref[0], dz_ref[0]
        tmin0 = tmin_ref[0]
        tmax0 = tmax_ref[0]

    rs_act = None
    if queued:
        # Slots with no alive queue entry at all start drained.
        rs_act = (cursor0 < C).astype(jnp.int32)
    t_i, word_i, af_i, far0, inv_x0, inv_y0, inv_z0 = init_rays(
        ox0, oy0, oz0, dx0, dy0, dz0, tmin0, tmax0, rs_act=rs_act)
    alive0 = (af_i >> 16) != 0

    state = dict(
        t=t_i,
        word=word_i,
        af=af_i,
        total=jnp.int32(0),
        # 0/1 at entry: keeps the loop alive without asserting "some ray
        # is at an occupied cell" — rays that start at one stall a single
        # iteration until the first carried reduce flags the fetch.
        n_live=jnp.minimum(jnp.sum((af_i >> 16) & 1), 1),
        n_fetch=jnp.int32(0),
        n_grp=jnp.int32(0),
    )
    if queued:
        state.update(
            ox=ox0, oy=oy0, oz=oz0, dx=dx0, dy=dy0, dz=dz0,
            ivx=inv_x0, ivy=inv_y0, ivz=inv_z0, far=far0,
            cursor=cursor0,
            n_undone=jnp.max((cursor0 < C).astype(jnp.int32)),
        )

    # Each iteration is an advance, a cell resolve, or a (deferral) stall;
    # stalls alternate with fetches so total ≤ ~2× work iterations. Each
    # queue entry may run a primary AND a shadow trace in nee_mode.
    max_total = (2 * max_advances + 64) * C * (2 if nee_mode else 1)

    def cond(s):
        # n_live is the live count at the START of the previous body run (one
        # packed reduce there); a block does at most one extra masked-out
        # iteration compared to an exact end-of-body liveness check. Queued
        # blocks also keep running while any slot has queue entries left
        # (n_undone, updated at refill rounds).
        go = s["n_live"] > 0
        if queued:
            go = go | (s["n_undone"] > 0)
        return go & (s["total"] < max_total)

    def body(s):
        if queued:
            # Per-slot ray fields live in the loop carry (each lane slot
            # cycles through its queue of C rays).
            ox, oy, oz = s["ox"], s["oy"], s["oz"]
            dx, dy, dz = s["dx"], s["dy"], s["dz"]
            inv_x, inv_y, inv_z = s["ivx"], s["ivy"], s["ivz"]
            far = s["far"]
        else:
            ox, oy, oz, dx, dy, dz = ox0, oy0, oz0, dx0, dy0, dz0
            inv_x, inv_y, inv_z = inv_x0, inv_y0, inv_z0
            far = far0
        sx = jnp.sign(dx)
        sy = jnp.sign(dy)
        sz = jnp.sign(dz)
        t = s["t"]
        px, py, pz, s_nx, s_ny, s_nz = unpack_word(s["word"])
        s_adv = s["af"] & 0xFFFF
        active = (s["af"] & (1 << 16)) != 0
        s_hit = (s["af"] >> 17) & 1
        s_exh = (s["af"] >> 18) & 1
        s_phase = ((s["af"] >> 19) & 1) if nee_mode else None

        # A ray that stepped outside the grid has left the volume — the
        # far-clip float comparison alone can miss the exit face by an ulp,
        # which would alias the out-of-range cell onto another cell's bits
        # (a latent bug the reference shares via unchecked field reads).
        inb = (
            (px >= 0) & (px < res) & (py >= 0) & (py < res)
            & (pz >= 0) & (pz < res)
        )
        miss = active & ((t > far) | ~inb)
        live = active & ~miss

        cell = ((pz >> 2) * r2 + (py >> 2)) * r2 + (px >> 2)
        cw = cell >> 5
        cb = cell & 31
        ow = cw
        ob = cb
        if use_sun_open or (nee_mode and sun_mode == "all"):
            # Sun-shadow mode: a ray standing in a SUN-OPEN cell provably
            # escapes (ops.accel.build_sun_open_bits certifies the whole NEE
            # cone from anywhere in the cell) — retire it as a miss now.
            # Sharing the LOD2 scan makes the check nearly free. In nee_mode
            # only the shadow-phase lanes may take the early-out.
            # ``sun_mode``: 'all' checks every advance, 'half' only the
            # unrolled segments (halving the dual-gather cost; retirement
            # delayed ≤1 advance, outputs identical), 'off' disables the
            # early-out (pure A/B knob — shadow rays march to escape).
            w2, wsun = _gather_words2(lod2_ref, sun_ref, ow, n_lod2_words)
            sun_esc = ((wsun >> ob) & 1) != 0
            if nee_mode:
                sun_esc = sun_esc & (s_phase != 0)
            miss = miss | (live & inb & sun_esc)
            live = active & ~miss
            occ2 = ((w2 >> ob) & 1) != 0
        else:
            w2 = _gather_words(lod2_ref, ow, n_lod2_words)
            occ2 = ((w2 >> ob) & 1) != 0
        at_occ = live & occ2

        # ONE packed max-reduce answers both questions (scalar-producing
        # reductions cost ~130 ns): 0 ⇒ no live rays (loop can stop),
        # 2 ⇒ some live ray is at an occupied cell (a fetch is wanted).
        # Both consumers read the PREVIOUS iteration's value from the loop
        # carry (n_live) so the reduce→branch dependency is off the
        # critical path: a ray at an occupied cell can only STALL, so
        # serving it one iteration later is the same deferral the fetch
        # cadence already performs — per-ray outputs are bitwise identical.
        m = jnp.max(live.astype(jnp.int32) + at_occ.astype(jnp.int32))
        do_fetch = (s["n_live"] >= 2) & (
            (s["total"] % fetch_cadence == 0) | (s["total"] >= slow_after)
        )

        # --- fetch + whole-cell resolve for rays at occupied cells --------
        # Deferred batching: fetch rounds run every ``fetch_cadence``-th
        # iteration so rays arriving at occupied cells on adjacent iterations
        # share one scan; waiting rays simply stall (they cannot advance
        # while occupied). The mask table holds MIXED cells only, indexed by
        # prefix-popcount rank; solid cells read an implicit all-ones mask.
        def fetch_and_resolve():
            ws, base = _gather_words2(solid_ref, rankb_ref, cw,
                                      n_lod2_words)
            solid_here = ((ws >> cb) & 1) != 0
            below = (w2 & ~ws) & ((1 << cb) - 1)
            rank = base + _popcount32(below)
            mask_lo, mask_hi = _gather_words2(
                mlo_ref, mhi_ref, rank, n_mixed_rows * LANES
            )
            mask_lo = jnp.where(solid_here, jnp.int32(-1), mask_lo)
            mask_hi = jnp.where(solid_here, jnp.int32(-1), mask_hi)

            # In-register single-voxel DDA across a fetched 4³ cell: the
            # entry voxel is tested, then ≤resolve_steps watertight unit
            # advances (9 = the longest monotone voxel path through a 4³
            # box) — all lanes run the unroll; non-resolving lanes are
            # masked out. The resolve is RESUMABLE: a ray still inside the
            # cell after the unroll stays at its current voxel, re-enters
            # at_occ next iteration and continues from a fresh mask fetch,
            # so shorter unrolls trade rare re-fetches for a cheaper
            # every-fetch step count.
            def cell_dda(moving, mask_lo, mask_hi, rt, rpx, rpy, rpz,
                         rnx, rny, rnz, rhit, steps):
                cbx = ((rpx >> 2) << 2)
                cby = ((rpy >> 2) << 2)
                cbz = ((rpz >> 2) << 2)
                # Incremental Amanatides–Woo accumulators: per-axis
                # absolute t of the NEXT voxel-face crossing,
                # initialized once per fetch and advanced by the
                # (unit-cell) tDelta = inv each step — ~half the
                # per-step ALU of recomputing from t each step (the
                # reference's form, raytracer.py:124-147). Accumulation
                # changes hit distances only at the ulp level over the
                # ≤10 in-cell steps; the portable-DDA equivalence tests
                # compare at 1e-2.
                fx0 = ox + dx * rt - rpx.astype(jnp.float32)
                fy0 = oy + dy * rt - rpy.astype(jnp.float32)
                fz0 = oz + dz * rt - rpz.astype(jnp.float32)
                tmx = jnp.where(
                    dx == 0.0, BIG,
                    rt + jnp.where(dx > 0.0, 1.0 - fx0, fx0) * inv_x)
                tmy = jnp.where(
                    dy == 0.0, BIG,
                    rt + jnp.where(dy > 0.0, 1.0 - fy0, fy0) * inv_y)
                tmz = jnp.where(
                    dz == 0.0, BIG,
                    rt + jnp.where(dz > 0.0, 1.0 - fz0, fz0) * inv_z)
                for step in range(resolve_steps + 1):
                    local = ((rpz & 3) * 4 + (rpy & 3)) * 4 + (rpx & 3)
                    mword = jnp.where(local < 32, mask_lo, mask_hi)
                    occ0 = ((mword >> (local & 31)) & 1) != 0
                    hit_now = moving & occ0 & (rt <= far)
                    rhit = rhit | hit_now
                    moving = moving & ~hit_now & (rt <= far)
                    if step == resolve_steps:
                        break
                    # unit-cell watertight advance (cs = 1 ⇒ the
                    # reconstructed in-cell coordinate is always 0:
                    # new voxel = p + exit axis)
                    mint_abs = jnp.maximum(
                        jnp.minimum(jnp.minimum(tmx, tmy), tmz), rt)
                    ax = tmx == mint_abs
                    ay = tmy == mint_abs
                    az = tmz == mint_abs
                    anx = ax.astype(jnp.float32) * sx
                    any_ = ay.astype(jnp.float32) * sy
                    anz = az.astype(jnp.float32) * sz
                    npx = rpx + anx.astype(jnp.int32)
                    npy = rpy + any_.astype(jnp.int32)
                    npz = rpz + anz.astype(jnp.int32)
                    rt = jnp.where(moving, mint_abs, rt)
                    tmx = jnp.where(moving & ax, tmx + inv_x, tmx)
                    tmy = jnp.where(moving & ay, tmy + inv_y, tmy)
                    tmz = jnp.where(moving & az, tmz + inv_z, tmz)
                    rpx = jnp.where(moving, npx, rpx)
                    rpy = jnp.where(moving, npy, rpy)
                    rpz = jnp.where(moving, npz, rpz)
                    if not any_hit:
                        rnx = jnp.where(moving, anx, rnx)
                        rny = jnp.where(moving, any_, rny)
                        rnz = jnp.where(moving, anz, rnz)
                    steps = steps + moving.astype(jnp.int32)
                    exited = (
                        ((rpx >> 2) << 2 != cbx) | ((rpy >> 2) << 2 != cby)
                        | ((rpz >> 2) << 2 != cbz)
                    )
                    moving = moving & ~exited
                return rt, rpx, rpy, rpz, rnx, rny, rnz, rhit, steps

            rt, rpx, rpy, rpz, rnx, rny, rnz, rhit, steps = cell_dda(
                at_occ, mask_lo, mask_hi, t, px, py, pz,
                s_nx, s_ny, s_nz,
                jnp.zeros(px.shape, jnp.bool_),
                jnp.zeros(px.shape, jnp.int32))
            return rt, rpx, rpy, rpz, rnx, rny, rnz, \
                rhit.astype(jnp.int32), steps

        t1, px1, py1, pz1, nx1, ny1, nz1, hit1, steps1 = jax.lax.cond(
            do_fetch,
            fetch_and_resolve,
            lambda: (t, px, py, pz, s_nx, s_ny, s_nz,
                     jnp.zeros_like(px), jnp.zeros_like(px)),
        )

        # --- empty-space march (distance-field skip) -----------------------
        def march_candidates(t_, px_, py_, pz_, w2_):
            """Watertight advance to the farther of the valid skip boxes:
            candidate A (dist3 cube / current cell) or B (the free LOD2
            X-slab). Returns (nat, nap*, an*). Pure function of
            (position, t) so extra ``march_unroll`` segments replay it."""
            c3x, c3y, c3z = px_ >> 3, py_ >> 3, pz_ >> 3
            c3 = (c3z * r3 + c3y) * r3 + c3x
            w3 = _gather_words(dist3_ref, c3 >> 3, n_dist3_words)
            d3 = (w3 >> ((c3 & 7) * 4)) & 15

            # Candidate A: distance-field cube (radius d3-1 of 8³ blocks),
            # or the current 4³ cell when d3 == 0.
            skip = d3 >= 1
            rad = (d3 - 1).astype(jnp.int32)
            loxA = jnp.where(skip, (c3x - rad) << 3, (px_ >> 2) << 2).astype(jnp.float32)
            loyA = jnp.where(skip, (c3y - rad) << 3, (py_ >> 2) << 2).astype(jnp.float32)
            lozA = jnp.where(skip, (c3z - rad) << 3, (pz_ >> 2) << 2).astype(jnp.float32)
            extA = jnp.where(skip, (2 * rad + 1) << 3, 4).astype(jnp.float32)

            def box_exit(lox_, loy_, loz_, extx_, exty_, extz_):
                # watertight advance to the box exit (raytracer.py:124-147)
                fx = ox + dx * t_ - lox_
                fy = oy + dy * t_ - loy_
                fz = oz + dz * t_ - loz_
                dxx = jnp.where(dx > 0.0, extx_ - fx, fx)
                dyy = jnp.where(dy > 0.0, exty_ - fy, fy)
                dzz = jnp.where(dz > 0.0, extz_ - fz, fz)
                txx = jnp.where(dx == 0.0, BIG, dxx * inv_x)
                tyy = jnp.where(dy == 0.0, BIG, dyy * inv_y)
                tzz = jnp.where(dz == 0.0, BIG, dzz * inv_z)
                mint = jnp.maximum(
                    jnp.minimum(jnp.minimum(txx, tyy), tzz), 0.0)
                return fx, fy, fz, txx, tyy, tzz, mint

            fxA, fyA, fzA, txxA, tyyA, tzzA, mintA = box_exit(
                loxA, loyA, lozA, extA, extA, extA)
            if use_xslab:
                # Candidate B: the occupancy word already gathered for the
                # occupancy test covers full X-rows of cells (soundness
                # asserted in raytrace_pallas); w2 == 0 certifies that
                # whole slab empty. Free long-range skip for X-dominant
                # rays — no extra gather.
                validB = w2_ == 0
                extyB = jnp.float32(4.0)
                loyB = ((py_ >> 2) << 2).astype(jnp.float32)
                lozB = ((pz_ >> 2) << 2).astype(jnp.float32)
                fxB, fyB, fzB, txxB, tyyB, tzzB, mintB = box_exit(
                    jnp.float32(0.0), loyB, lozB, fres, extyB,
                    jnp.float32(4.0))

                # Both boxes contain the current position, so the ray may
                # jump to whichever exit is farther.
                useB = validB & (mintB > mintA)
                lox = jnp.where(useB, 0.0, loxA)
                loy = jnp.where(useB, loyB, loyA)
                loz = jnp.where(useB, lozB, lozA)
                extx = jnp.where(useB, fres, extA)
                exty = jnp.where(useB, extyB, extA)
                extz = jnp.where(useB, 4.0, extA)
                fx = jnp.where(useB, fxB, fxA)
                fy = jnp.where(useB, fyB, fyA)
                fz = jnp.where(useB, fzB, fzA)
                txx = jnp.where(useB, txxB, txxA)
                tyy = jnp.where(useB, tyyB, tyyA)
                tzz = jnp.where(useB, tzzB, tzzA)
                mint = jnp.where(useB, mintB, mintA)
            else:
                lox, loy, loz = loxA, loyA, lozA
                extx = exty = extz = extA
                fx, fy, fz = fxA, fyA, fzA
                txx, tyy, tzz = txxA, tyyA, tzzA
                mint = mintA
            ex = jnp.clip(jnp.floor(fx + mint * dx), 0.0, extx - 1.0)
            ey = jnp.clip(jnp.floor(fy + mint * dy), 0.0, exty - 1.0)
            ez = jnp.clip(jnp.floor(fz + mint * dz), 0.0, extz - 1.0)
            anx = (txx == mint).astype(jnp.float32) * sx
            any_ = (tyy == mint).astype(jnp.float32) * sy
            anz = (tzz == mint).astype(jnp.float32) * sz
            napx = (lox + ex + anx).astype(jnp.int32)
            napy = (loy + ey + any_).astype(jnp.int32)
            napz = (loz + ez + anz).astype(jnp.int32)
            return t_ + mint, napx, napy, napz, anx, any_, anz

        nat, napx, napy, napz, anx, any_, anz = march_candidates(
            t, px, py, pz, w2)

        march = live & ~occ2

        o_t = jnp.where(miss, BIG, jnp.where(march, nat, t1))
        o_px = jnp.where(march, napx, px1)
        o_py = jnp.where(march, napy, py1)
        o_pz = jnp.where(march, napz, pz1)
        if any_hit:
            o_nx, o_ny, o_nz = s_nx, s_ny, s_nz
        else:
            o_nx = jnp.where(march, anx, nx1)
            o_ny = jnp.where(march, any_, ny1)
            o_nz = jnp.where(march, anz, nz1)
        o_adv = s_adv + march.astype(jnp.int32) + steps1
        o_hit = s_hit | hit1
        exhausted = live & (o_adv >= max_advances)
        o_exh = s_exh | (exhausted & (hit1 == 0)).astype(jnp.int32)
        o_act = live & (hit1 == 0) & ~exhausted

        # Extra march-only segments (``march_unroll`` > 1): advance the
        # marching rays again with fresh occupancy gathers, amortizing the
        # per-iteration fixed cost (scalar reduce, pack/unpack, fetch-branch
        # dispatch, refill select-chains) over several grid steps. Rays at
        # occupied cells stall until the next fetch round — same economics
        # as the fetch_cadence deferral, so per-ray results are bitwise
        # identical to the rolled loop.
        for _u in range(march_unroll - 1):
            inb_u = (
                (o_px >= 0) & (o_px < res) & (o_py >= 0) & (o_py < res)
                & (o_pz >= 0) & (o_pz < res)
            )
            miss_u = o_act & ((o_t > far) | ~inb_u)
            live_u = o_act & ~miss_u
            cell_u = ((o_pz >> 2) * r2 + (o_py >> 2)) * r2 + (o_px >> 2)
            ow_u = cell_u >> 5
            ob_u = cell_u & 31
            if use_sun_open or (nee_mode and sun_mode != "off"):
                w2_u, wsun_u = _gather_words2(lod2_ref, sun_ref, ow_u,
                                              n_lod2_words)
                sun_esc_u = ((wsun_u >> ob_u) & 1) != 0
                if nee_mode:
                    sun_esc_u = sun_esc_u & (s_phase != 0)
                miss_u = miss_u | (live_u & inb_u & sun_esc_u)
                live_u = o_act & ~miss_u
            else:
                w2_u = _gather_words(lod2_ref, ow_u, n_lod2_words)
            occ2_u = ((w2_u >> ob_u) & 1) != 0
            march_u = live_u & ~occ2_u
            nat_u, napx_u, napy_u, napz_u, anx_u, any_u, anz_u = \
                march_candidates(o_t, o_px, o_py, o_pz, w2_u)
            o_t = jnp.where(miss_u, BIG, jnp.where(march_u, nat_u, o_t))
            o_px = jnp.where(march_u, napx_u, o_px)
            o_py = jnp.where(march_u, napy_u, o_py)
            o_pz = jnp.where(march_u, napz_u, o_pz)
            if not any_hit:
                o_nx = jnp.where(march_u, anx_u, o_nx)
                o_ny = jnp.where(march_u, any_u, o_ny)
                o_nz = jnp.where(march_u, anz_u, o_nz)
            o_adv = o_adv + march_u.astype(jnp.int32)
            exhausted_u = live_u & (o_adv >= max_advances)
            o_exh = o_exh | exhausted_u.astype(jnp.int32)
            o_act = live_u & ~exhausted_u

        out = dict(s)
        out["t"] = o_t
        out["word"] = pack_word(o_px, o_py, o_pz, o_nx, o_ny, o_nz)
        out["n_live"] = m
        out["n_fetch"] = s["n_fetch"] + do_fetch.astype(jnp.int32)
        out["af"] = (
            o_adv | (o_act.astype(jnp.int32) << 16) | (o_hit << 17)
            | (o_exh << 18)
        )
        if nee_mode:
            out["af"] = out["af"] | (s_phase << 19)  # phase flips at refill
        out["total"] = s["total"] + 1

        if queued:
            # --- refill round (every ``refill_every`` iterations) ----------
            # Retired slots (ray finished, chunk index still < C) write
            # their packed result to their chunk's output row, then load the
            # next ray from the slot's queue and re-run the entry init. The
            # whole round is a static select-chain over C — no gathers.
            # In nee_mode a retired PRIMARY ray with a surface (voxel hit or
            # a closer floor crossing) first CONVERTS in place into its NEE
            # shadow ray (phase 1, same queue slot); a retired SHADOW ray
            # or-s its visibility verdict into the already-written output af
            # and then advances the queue.
            do_ref = (s["total"] % refill_every) == (refill_every - 1)
            retired = (((out["af"] >> 16) & 1) == 0) & (s["cursor"] < C)
            if nee_mode:
                o_phase = (out["af"] >> 19) & 1
                prim_ret = retired & (o_phase == 0)
                shad_ret = retired & (o_phase != 0)
            else:
                prim_ret = retired
            out_t = out["t"]
            out_word = out["word"]
            out_af = out["af"]

            if nee_mode:
                def nee_conv_data():
                    """Conversion decision + the in-place shadow ray. Called
                    only inside the do_ref-gated closures so the ~60-op cone
                    build never runs on non-refill iterations."""
                    _, _, _, hnx, hny, hnz = unpack_word(out_word)
                    o_hit2 = (out_af >> 17) & 1
                    # flip the hit normal toward the ray (raytracer.py:151-153)
                    flip2 = (dx * hnx + dy * hny + dz * hnz) > 0.0
                    hnx_ = jnp.where(flip2, -hnx, hnx)
                    hny_ = jnp.where(flip2, -hny, hny)
                    hnz_ = jnp.where(flip2, -hnz, hnz)
                    alt = load_chunk_one(alt_ref, s["cursor"])
                    have_vox = (o_hit2 != 0) & (out_t < BIG)
                    use_alt = jnp.isfinite(alt) & (alt < jnp.where(
                        have_vox, out_t, BIG))
                    surf = prim_ret & (have_vox | use_alt)
                    # floor normal (0, ±1): (0,1,0) flipped toward the ray
                    fny = jnp.where(dy > 0.0, -1.0, 1.0)
                    snx = jnp.where(use_alt, 0.0, hnx_)
                    sny = jnp.where(use_alt, fny, hny_)
                    snz = jnp.where(use_alt, 0.0, hnz_)
                    st = jnp.where(use_alt, alt, out_t)
                    epsg = nee_ref[10]
                    spx = ox + dx * st + snx * epsg
                    spy = oy + dy * st + sny * epsg
                    spz = oz + dz * st + snz * epsg
                    # cone sample around the constant sun frame (exactly
                    # ops.sampling.sample_cone_oriented on the precomputed
                    # basis)
                    uu1 = load_chunk_one(u1_ref, s["cursor"])
                    uu2 = load_chunk_one(u2_ref, s["cursor"])
                    cos_t = (1.0 - uu1) + uu1 * nee_ref[9]
                    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
                    phi = jnp.float32(2.0 * np.pi) * uu2
                    cphi = jnp.cos(phi) * sin_t
                    sphi = jnp.sin(phi) * sin_t
                    ldx = (cphi * nee_ref[3] + sphi * nee_ref[6]
                           + cos_t * nee_ref[0])
                    ldy = (cphi * nee_ref[4] + sphi * nee_ref[7]
                           + cos_t * nee_ref[1])
                    ldz = (cphi * nee_ref[5] + sphi * nee_ref[8]
                           + cos_t * nee_ref[2])
                    ndl = ldx * snx + ldy * sny + ldz * snz
                    # conservative margin: the caller recomputes ndl in XLA
                    # and masks visibility with its own exact ndl > 0;
                    # tracing a few extra borderline rays here is harmless,
                    # missing one is not
                    conv = surf & (ndl > -1e-3)
                    return conv, (spx, spy, spz), (ldx, ldy, ldz)

                def nee_instant(conv, sp, ld):
                    """Conversion-time sun-open early-out (``nee_src_open``):
                    replicate init_rays' AABB clip + entry cell for the
                    would-be shadow ray and test the sun certificate there.
                    A set bit certifies the WHOLE NEE cone escapes from
                    anywhere in that cell (ops.accel.build_sun_open_bits),
                    so the march could only ever end 'visible'; an AABB miss
                    is 'visible' by the same contract (escape = lit). Both
                    verdicts are written at this refill and the slot
                    advances straight to its next queued ray instead of
                    marching the shadow for refill_every+ iterations. Runs
                    only on refill rounds (one extra sun gather amortized
                    over refill_every × march_unroll advances)."""
                    _, word_s, af_s, _, _, _, _ = init_rays(
                        *sp, *ld,
                        jnp.full(sp[0].shape, nee_ref[11]),
                        jnp.full(sp[0].shape, jnp.float32(3.0e38)))
                    alive_s = (af_s & (1 << 16)) != 0
                    pxs, pys, pzs, _, _, _ = unpack_word(word_s)
                    cell_s = ((pzs >> 2) * r2 + (pys >> 2)) * r2 + (pxs >> 2)
                    oi = jnp.where(alive_s, cell_s, 0)
                    wsun_s = _gather_words(sun_ref, oi >> 5, n_lod2_words)
                    open_s = ((wsun_s >> (oi & 31)) & 1) != 0
                    return conv & (~alive_s | open_s)

            def do_refill():
                # One region both WRITES the retired results to their chunk
                # rows and computes the refilled loop carry: the conversion
                # decision (``nee_conv_data``) and the instant sun-open
                # verdict (``nee_instant``) are computed ONCE — the previous
                # two-region form (a pl.when for the writes plus a lax.cond
                # for the carry) duplicated both per refill round, and
                # Mosaic does not CSE across control-flow regions.
                cur = s["cursor"]
                if nee_mode:
                    conv0, (spx, spy, spz), (ldx, ldy, ldz) = nee_conv_data()
                    if nee_src_open:
                        inst = nee_instant(conv0, (spx, spy, spz),
                                           (ldx, ldy, ldz))
                        # instantly-verdicted shadows never load: the slot
                        # advances to its next queued ray at this refill.
                        conv = conv0 & ~inst
                        novis = prim_ret & (~conv0 | inst)
                        mark = jnp.where(inst, (1 << 20) | (1 << 21),
                                         1 << 20)
                    else:
                        conv = conv0
                        novis = prim_ret & ~conv0
                        mark = jnp.full(conv0.shape, 1 << 20, jnp.int32)
                    # shadow verdict: visible ⇔ escaped (no hit, no budget
                    # exhaustion — matching the two-dispatch formulation
                    # where a finite distance means occluded)
                    vis = ((((out_af >> 17) & 1) == 0)
                           & (((out_af >> 18) & 1) == 0)).astype(jnp.int32)
                    nee_bits = (1 << 20) | (vis << 21)
                    # Single af chain: primaries SET their packed result
                    # (novis ⊆ prim_ret additionally ORs its nee mark);
                    # retired shadows OR their verdict into the already-
                    # written word.
                    or_val = jnp.where(shad_ret, nee_bits,
                                       jnp.where(novis, mark, 0))
                    do_or = shad_ret | novis
                    for k in range(C):
                        selk = prim_ret & (cur == k)
                        t_ref[0, k] = jnp.where(selk, out_t, t_ref[0, k])
                        word_ref[0, k] = jnp.where(selk, out_word,
                                                   word_ref[0, k])
                        af_ref[0, k] = (
                            jnp.where(selk, out_af, af_ref[0, k])
                            | jnp.where(do_or & (cur == k), or_val, 0)
                        )
                    advance = (prim_ret & ~conv) | shad_ret
                else:
                    for k in range(C):
                        selk = prim_ret & (cur == k)
                        t_ref[0, k] = jnp.where(selk, out_t, t_ref[0, k])
                        word_ref[0, k] = jnp.where(selk, out_word,
                                                   word_ref[0, k])
                        af_ref[0, k] = jnp.where(selk, out_af, af_ref[0, k])
                    advance = prim_ret
                ncur = jnp.where(advance, next_alive(s["cursor"]),
                                 s["cursor"])
                loadable = advance & (ncur < C)
                if static_trange is None:
                    cur_fields = (ox, oy, oz, dx, dy, dz,
                                  jnp.zeros_like(ox), jnp.zeros_like(ox))
                    nf = load_chunk(jnp.where(loadable, ncur, -1), cur_fields)
                    nox, noy, noz, ndx, ndy, ndz, ntmin, ntmax = nf
                else:
                    cur_fields = (ox, oy, oz, dx, dy, dz)
                    nf = load_chunk(jnp.where(loadable, ncur, -1), cur_fields)
                    nox, noy, noz, ndx, ndy, ndz = nf
                    ntmin = jnp.full(nox.shape, st_tmin)
                    ntmax = jnp.full(nox.shape, st_tmax)
                if nee_mode:
                    # converting lanes load the in-place shadow ray instead
                    nox = jnp.where(conv, spx, nox)
                    noy = jnp.where(conv, spy, noy)
                    noz = jnp.where(conv, spz, noz)
                    ndx = jnp.where(conv, ldx, ndx)
                    ndy = jnp.where(conv, ldy, ndy)
                    ndz = jnp.where(conv, ldz, ndz)
                    ntmin = jnp.where(conv, nee_ref[11], ntmin)
                    ntmax = jnp.where(conv, jnp.float32(3.0e38), ntmax)
                ti, wordi, afi, fari, ivxi, ivyi, ivzi = init_rays(
                    nox, noy, noz, ndx, ndy, ndz, ntmin, ntmax)
                sel = (loadable | conv) if nee_mode else loadable
                if nee_mode:
                    afi = afi | (conv.astype(jnp.int32) << 19)

                def mrg(new, old):
                    return jnp.where(sel, new, old)

                undone = ncur < C
                if nee_mode:
                    undone = undone | conv
                n_undone = jnp.max(undone.astype(jnp.int32))
                return (
                    mrg(ti, out_t), mrg(wordi, out_word), mrg(afi, out_af),
                    mrg(fari, far),
                    mrg(nox, ox), mrg(noy, oy), mrg(noz, oz),
                    mrg(ndx, dx), mrg(ndy, dy), mrg(ndz, dz),
                    mrg(ivxi, inv_x), mrg(ivyi, inv_y), mrg(ivzi, inv_z),
                    ncur, n_undone,
                )

            def no_refill():
                return (out_t, out_word, out_af, far, ox, oy, oz, dx, dy, dz,
                        inv_x, inv_y, inv_z, s["cursor"], s["n_undone"])

            (out["t"], out["word"], out["af"], out["far"],
             out["ox"], out["oy"], out["oz"],
             out["dx"], out["dy"], out["dz"],
             out["ivx"], out["ivy"], out["ivz"],
             out["cursor"], out["n_undone"]) = jax.lax.cond(
                do_ref, do_refill, no_refill)
            # (Freshly loaded rays need no n_live fix: slots with queue
            # entries keep n_undone > 0, which alone keeps cond true.)
        return out

    s = jax.lax.while_loop(cond, body, state)

    if queued:
        # All per-ray results were already written to their chunk rows by
        # the refill rounds; read them back for the color pass (the wrapper
        # unpacks word/af in XLA). The color pass runs PER CHUNK: a chunk's
        # hit set spans ~half the color slabs already, so a merged pass
        # over all C chunks scans nearly every slab on C×-wider arrays
        # (measured 2.4× slower than C narrow passes).
        if fetch_colors:
            for k in range(C):
                wk = word_ref[0, k]
                afk = af_ref[0, k]
                hitk = (afk >> 17) & 1
                col_ref[0, k] = jnp.zeros(wk.shape, jnp.int32)

                # Chunks with no hit anywhere in the block skip the fetch's
                # fixed cost (morton/rank gathers) entirely — common at
                # later bounce depths, where the alive scan leaves high
                # queue chunks empty.
                @pl.when(jnp.max(hitk) > 0)
                def _fetch_chunk(k=k, wk=wk, hitk=hitk):
                    pxk = (wk & 255) - 1
                    pyk = ((wk >> 8) & 255) - 1
                    pzk = ((wk >> 16) & 255) - 1
                    col_ref[0, k] = _fetch_hit_colors(
                        pxk, pyk, pzk, hitk,
                        occm_ref, occb_ref, colors_ref, pal_ref,
                        n_lod2_words, use_palette)[0]
        else:
            col_ref[0] = jnp.zeros(col_ref.shape[1:], jnp.int32)
        return

    f_px, f_py, f_pz, f_nx, f_ny, f_nz = unpack_word(s["word"])
    f_adv = s["af"] & 0xFFFF
    f_active = (s["af"] >> 16) & 1
    f_hit = (s["af"] >> 17) & 1
    f_exh = (s["af"] >> 18) & 1

    if any_hit:
        nx = ny = nz = jnp.zeros(f_nx.shape, jnp.float32)
    else:
        # normal flip toward the ray (raytracer.py:151-153)
        ndot = dx0 * f_nx + dy0 * f_ny + dz0 * f_nz
        flip = ndot > 0.0
        nx = jnp.where(flip, -f_nx, f_nx)
        ny = jnp.where(flip, -f_ny, f_ny)
        nz = jnp.where(flip, -f_nz, f_nz)

    t_ref[0] = jnp.where(s["t"] >= BIG, jnp.float32(np.inf), s["t"])
    ix_ref[0] = f_px
    iy_ref[0] = f_py
    iz_ref[0] = f_pz
    nx_ref[0] = nx
    ny_ref[0] = ny
    nz_ref[0] = nz
    # Unfinished rays (advance budget or iteration cap hit before a
    # hit/miss verdict); callers treat them as misses.
    act_ref[0] = f_active | f_exh

    # --- hit color fetch (skipped for shadow rays) --------------------------
    n_color_slabs = 0
    if fetch_colors:
        col, n_color_slabs = _fetch_hit_colors(
            f_px, f_py, f_pz, f_hit, occm_ref, occb_ref, colors_ref,
            pal_ref, n_lod2_words, use_palette)
        col_ref[0] = col
    else:
        col_ref[0] = jnp.zeros(f_px.shape, jnp.int32)

    if debug_totals:
        it_ref[0] = jnp.broadcast_to(
            s["total"] + (s["n_fetch"] << 10) + (n_color_slabs << 20),
            f_adv.shape,
        )
    else:
        it_ref[0] = f_adv


class PallasTraceResult(NamedTuple):
    distance: jax.Array
    ipos: jax.Array  # (N, 3)
    normal: jax.Array  # (N, 3)
    iters: jax.Array
    color_word: jax.Array  # u32 packed r|g<<8|b<<16|mat<<24 (0 unless hit)
    active: jax.Array  # i32: 1 = unfinished (advance budget hit)
    nee_visible: jax.Array | None = None  # in-kernel NEE verdict (nee=...)


@functools.partial(
    jax.jit,
    static_argnames=("grid_res", "max_advances", "fetch_colors", "any_hit",
                     "interpret", "fetch_cadence", "debug_totals",
                     "block_rows", "use_sun_open", "use_xslab",
                     "resolve_steps",
                     "queue_depth", "refill_every", "march_unroll",
                     "sun_mode", "nee_src_open"),
)
def raytrace_pallas(tables: PallasTables, origin, direction, ray_min_t,
                    ray_max_t, grid_res: int, max_advances: int = 512,
                    fetch_colors: bool = True, any_hit: bool = False,
                    interpret: bool = False, fetch_cadence: int = 2,
                    debug_totals: bool = False,
                    block_rows: int = SUBLANES,
                    use_sun_open: bool = False, use_xslab: bool = True,
                    resolve_steps: int = CELL_RESOLVE_STEPS,
                    queue_depth: int = 1, refill_every: int = 4,
                    march_unroll: int = 1, sun_mode: str = "all",
                    nee_src_open: bool = False,
                    nee=None, alive=None) -> PallasTraceResult:
    """Trace rays in grid space [0, res)³ with the Pallas kernel.

    origin/direction: (N, 3) f32; N is padded to a multiple of the block
    size. ``any_hit=True`` (shadow rays) skips normal tracking and color
    fetch; only hit/miss (finite vs inf distance) is meaningful in the
    result.

    ``block_rows``: sublane rows of rays marched per grid step (a multiple
    of 8). The kernel's per-iteration work is a serial dependency chain of
    vector ops, so one (8, 128) row leaves the VPU mostly idle on latency;
    marching R independent rows per block interleaves R chains (ILP) at the
    cost of straggler coupling (a block runs until its worst ray finishes).

    ``nee``: optional IN-KERNEL NEXT-EVENT ESTIMATION. A dict with per-ray
    cone uniforms ``u`` (N, 2), the floor-surface alternative hit distance
    ``alt_t`` (N,) in grid units (inf = none; when closer than the voxel
    hit, the shadow ray starts from the floor crossing instead), the
    normalized constant sun frame ``light_dir``/``tangent``/``bitangent``
    (3,) each, and scalars ``cone_cos``, ``eps_grid`` (surface offset) and
    ``shadow_tmin``. When a primary ray retires with a surface, the kernel
    converts it IN PLACE into its sun-cone shadow ray (sharing the queue
    slot and VMEM working set) and reports the verdict in
    ``result.nee_visible`` (1 = the cone sample reaches the sky; floor
    occlusion of the shadow ray itself is the caller's cheap closed-form
    check). Replaces the separate any-hit shadow dispatch per depth.
    Requires closest-hit mode (not any_hit/debug).

    ``queue_depth`` C > 1 enables the QUEUED WAVEFRONT: each (row, lane)
    slot holds a queue of C rays and reloads in place the moment its
    current ray retires (checked every ``refill_every`` iterations), so a
    lock-step block's cost amortizes to ~C × mean ray length + one tail
    instead of C × worst-ray length. Measured motivation (example6 bounce
    wavefront): mean 10.7 advances/ray vs 82.6 block max — ~8× lock-step
    pacing waste. Incompatible with debug_totals.

    ``alive``: optional (N,) bool/int — rays the caller wants traced (its
    wavefront mask). Queued dispatches pack it into a per-slot bitmask and
    the refill scan JUMPS over dead entries, so terminated paths at later
    bounce depths cost zero march iterations (previously refill_every
    each; a fully dead block exits without iterating). Skipped lanes
    return the canonical miss: distance=inf, ipos=-1, normal=0, iters=0,
    color=0, active=0, nee_visible=0 — callers must (and do) mask by
    their own wavefront liveness, which `tmax = where(mask, inf, 0)`
    already implies. Ignored on non-queued dispatches.
    """
    soa = isinstance(origin, V3)
    n = origin.shape[0]
    assert block_rows % SUBLANES == 0, block_rows
    # Candidate-B soundness: one LOD2 word must span a full X-row of cells.
    assert 32 % (grid_res // 4) == 0, grid_res
    # adv occupies 16 bits of the packed per-ray loop state.
    assert max_advances + CELL_RESOLVE_STEPS < (1 << 16), max_advances
    nee_mode = nee is not None
    if nee_mode:
        assert not any_hit and fetch_colors and not use_sun_open
        assert not debug_totals
    queued = queue_depth > 1 or nee_mode
    if queued:
        assert not debug_totals
        # the per-slot alive bitmask packs one bit per queue entry
        assert queue_depth <= 32, queue_depth
    block_rays = block_rows * LANES * (queue_depth if queued else 1)
    pad = (-n) % block_rays
    npad = n + pad

    def prep(x):
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        return x

    if soa:
        o0, o1, o2 = prep(origin.x), prep(origin.y), prep(origin.z)
        d0, d1, d2 = prep(direction.x), prep(direction.y), prep(direction.z)
    else:
        o = prep(origin)
        d = prep(direction)
        o0, o1, o2 = o[:, 0], o[:, 1], o[:, 2]
        d0, d1, d2 = d[:, 0], d[:, 1], d[:, 2]
    # Scalar tmin/tmax on a queued dispatch become LAUNCH CONSTANTS: no
    # per-ray arrays, two fewer queue fields in VMEM and in every refill
    # select-chain. Dead wavefront lanes are covered by the alive bitmask
    # (and padding lanes by its zero-padding), so the caller's tmax
    # masking is redundant there — outputs are bitwise identical.
    static_trange = None
    if (queued
            and isinstance(ray_min_t, (int, float, np.floating))
            and isinstance(ray_max_t, (int, float, np.floating))):
        static_trange = (float(ray_min_t), float(ray_max_t))
    if static_trange is None:
        tmin = prep(jnp.broadcast_to(jnp.asarray(ray_min_t, jnp.float32),
                                     (n,)))
        tmax = prep(jnp.broadcast_to(jnp.asarray(ray_max_t, jnp.float32),
                                     (n,)))
    nb = npad // block_rays

    if queued:
        def blk(x):
            return x.reshape(nb, queue_depth, block_rows, LANES)

        ray_spec = pl.BlockSpec((1, queue_depth, block_rows, LANES),
                                lambda b: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        def blk(x):
            return x.reshape(nb, block_rows, LANES)

        ray_spec = pl.BlockSpec((1, block_rows, LANES), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)

    ins = [blk(o0), blk(o1), blk(o2),
           blk(d0), blk(d1), blk(d2)]
    if static_trange is None:
        ins += [blk(tmin), blk(tmax)]
    n_ray_ins = len(ins)
    if nee_mode:
        u = nee["u"]
        u0, u1 = (u[0], u[1]) if isinstance(u, tuple) else (u[:, 0], u[:, 1])
        ins += [blk(prep(u0.astype(jnp.float32))),
                blk(prep(u1.astype(jnp.float32))),
                blk(prep(nee["alt_t"].astype(jnp.float32)))]
        n_ray_ins += 3
        nee_scalars = jnp.concatenate([
            jnp.asarray(nee["light_dir"], jnp.float32).reshape(3),
            jnp.asarray(nee["tangent"], jnp.float32).reshape(3),
            jnp.asarray(nee["bitangent"], jnp.float32).reshape(3),
            jnp.asarray([nee["cone_cos"]], jnp.float32).reshape(1),
            jnp.asarray([nee["eps_grid"]], jnp.float32).reshape(1),
            jnp.asarray([nee["shadow_tmin"]], jnp.float32).reshape(1),
        ])
    if queued:
        # Per-slot alive bitmask (bit k = queue entry k is live). Padding
        # lanes are dead by construction; with no caller mask every real
        # ray is marked alive (bit-identical to the pre-mask kernel).
        if alive is None:
            al = jnp.ones((n,), jnp.int32)
        else:
            al = alive.astype(jnp.int32)
        alb = prep(al).reshape(nb, queue_depth, block_rows, LANES)
        shifts = jnp.arange(queue_depth, dtype=jnp.int32).reshape(
            1, queue_depth, 1, 1)
        amask_ins = [jnp.sum(alb << shifts, axis=1).astype(jnp.int32)]
        amask_specs = [pl.BlockSpec((1, block_rows, LANES),
                                    lambda b: (b, 0, 0),
                                    memory_space=pltpu.VMEM)]
    else:
        amask_ins = []
        amask_specs = []
    def table_spec(rows):
        return pl.BlockSpec((rows, LANES), lambda b: (0, 0),
                            memory_space=pltpu.VMEM)

    assert march_unroll >= 1, march_unroll

    r2 = grid_res // 4
    r3 = grid_res // 8
    n_lod2_words = (r2 * r2 * r2 + 31) // 32
    n_dist3_words = (r3 * r3 * r3 + 7) // 8

    lod2 = tables.lod2_words.reshape(-1, LANES).astype(jnp.int32)
    solid = tables.solid_words.reshape(-1, LANES).astype(jnp.int32)
    dist3 = tables.dist3_words.reshape(-1, LANES).astype(jnp.int32)
    rankb = tables.rank_base.reshape(-1, LANES).astype(jnp.int32)
    occm = tables.occ_morton.reshape(-1, LANES).astype(jnp.int32)
    occb = tables.occ_rank_base.reshape(-1, LANES).astype(jnp.int32)
    mlo = tables.mixed_lo.reshape(-1, LANES).astype(jnp.int32)
    mhi = tables.mixed_hi.reshape(-1, LANES).astype(jnp.int32)
    colors = tables.cell_colors.reshape(-1, LANES).astype(jnp.int32)
    # Palette mode is keyed off the (static) palette table shape: ≤1024
    # distinct scene colors ⇒ cell_colors holds packed 10-bit indices.
    use_palette = tables.palette_words.size > 0
    pal = (tables.palette_words.reshape(-1, LANES).astype(jnp.int32)
           if use_palette else jnp.zeros((SUBLANES, LANES), jnp.int32))
    sun = tables.sun_open_words.reshape(-1, LANES).astype(jnp.int32)
    n_mixed_rows = mlo.shape[0]

    if queued:
        out_shapes = [
            jax.ShapeDtypeStruct((nb, queue_depth, block_rows, LANES), dt)
            for dt in (jnp.float32, jnp.int32, jnp.int32, jnp.int32)
        ]
        n_out = 4
    else:
        out_shapes = [jax.ShapeDtypeStruct((nb, block_rows, LANES), dt)
                      for dt in (jnp.float32, jnp.int32, jnp.int32, jnp.int32,
                                 jnp.float32, jnp.float32, jnp.float32,
                                 jnp.int32, jnp.int32, jnp.int32)]
        n_out = 10

    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    kernel = functools.partial(
        _traverse_kernel, grid_res=grid_res, max_advances=max_advances,
        fetch_colors=fetch_colors, any_hit=any_hit,
        use_sun_open=use_sun_open,
        n_lod2_words=n_lod2_words, n_dist3_words=n_dist3_words,
        n_mixed_rows=n_mixed_rows, use_palette=use_palette,
        use_xslab=use_xslab, fetch_cadence=fetch_cadence,
        resolve_steps=resolve_steps, static_trange=static_trange,
        queue_depth=queue_depth, refill_every=refill_every,
        nee_mode=nee_mode, march_unroll=march_unroll, sun_mode=sun_mode,
        debug_totals=debug_totals,
        nee_src_open=nee_src_open and nee_mode,
    )

    nee_ins = [nee_scalars] if nee_mode else []
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[ray_spec] * n_ray_ins
        + ([smem_spec] if nee_mode else [])
        + amask_specs + [
            table_spec(lod2.shape[0]), table_spec(solid.shape[0]),
            table_spec(dist3.shape[0]), table_spec(rankb.shape[0]),
            table_spec(occm.shape[0]), table_spec(occb.shape[0]),
            table_spec(mlo.shape[0]), table_spec(mhi.shape[0]),
            table_spec(colors.shape[0]), table_spec(pal.shape[0]),
            table_spec(sun.shape[0]),
        ],
        out_specs=[ray_spec] * n_out,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*ins, *nee_ins, *amask_ins, lod2, solid, dist3, rankb, occm,
      occb, mlo, mhi, colors, pal, sun)

    def pack3(x, y, z):
        """Vector outputs follow the input layout: V3 in -> V3 out."""
        if soa:
            return V3(x, y, z)
        return jnp.stack([x, y, z], axis=-1)

    if queued:
        # Unpack the per-chunk packed outputs in XLA (cheap elementwise).
        t, word, af, col = [x.reshape(npad)[:n] for x in outs]
        t = jnp.where(t >= jnp.float32(3.0e38), jnp.float32(np.inf), t)
        ix = (word & 255) - 1
        iy = ((word >> 8) & 255) - 1
        iz = ((word >> 16) & 255) - 1
        it = af & 0xFFFF
        act = ((af >> 16) & 1) | ((af >> 18) & 1)
        nee_vis = ((af >> 21) & 1) if nee_mode else None
        if any_hit:
            zero = jnp.zeros((n,), jnp.float32)
            normal = pack3(zero, zero, zero)
        else:
            nx = (((word >> 24) & 3) - 1).astype(jnp.float32)
            ny = (((word >> 26) & 3) - 1).astype(jnp.float32)
            nz = (((word >> 28) & 3) - 1).astype(jnp.float32)
            # normal flip toward the ray (raytracer.py:151-153)
            dd0 = direction.x if soa else direction[:, 0]
            dd1 = direction.y if soa else direction[:, 1]
            dd2 = direction.z if soa else direction[:, 2]
            flip = dd0 * nx + dd1 * ny + dd2 * nz > 0.0
            normal = pack3(jnp.where(flip, -nx, nx),
                           jnp.where(flip, -ny, ny),
                           jnp.where(flip, -nz, nz))
        return PallasTraceResult(
            distance=t,
            ipos=pack3(ix, iy, iz),
            normal=normal,
            iters=it,
            color_word=col.astype(jnp.uint32),
            active=act,
            nee_visible=nee_vis,
        )

    t, ix, iy, iz, nx, ny, nz, it, col, act = [
        x.reshape(npad)[:n] for x in outs
    ]
    return PallasTraceResult(
        distance=t,
        ipos=pack3(ix, iy, iz),
        normal=pack3(nx, ny, nz),
        iters=it,
        color_word=col.astype(jnp.uint32),
        active=act,
    )
