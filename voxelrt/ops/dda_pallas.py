"""Production TPU traversal kernel (Pallas/Mosaic).

Same traversal semantics as voxelrt.ops.dda (itself derived from
renderer/raytracer.py:72-155) but engineered for the TPU memory system —
XLA's native gather runs at ~0.1 G/s, 300× too slow for the DDA inner loop
(PERF_NOTES.md). Design:

  * the whole march runs inside one kernel; rays processed in (8·S, 128)
    lock-step blocks, occupancy tables resident in VMEM;
  * LOD2 occupancy (one bit per 4³ cell, 1024 u32 words at 128³) is gathered
    with the "roll trick": 8 × (static row slice → broadcast → lane shuffle
    → select) ≈ 1 cycle/vreg lane shuffle;
  * LOD3 (128 words) is a single broadcast + lane shuffle;
  * each ray caches the 64-bit voxel mask of its current 4³ cell in two
    registers; marching inside the cell is pure ALU (no memory);
  * mask fetches (on entering a new occupied cell) and the hit color fetch
    run as range-limited scans over the VMEM tables, skipping vreg groups no
    ray in the block needs — coherent blocks touch only a few groups;
  * shadow rays skip the color fetch entirely.

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

LANES = 128
SUBLANES = 8
BLOCK_RAYS = SUBLANES * LANES  # rays per grid step


def _gather_1024(table_slab, word_idx):
    """Gather u32 words from a (8, 128) vreg slab by absolute word index
    [0, 1024) — the roll trick. word_idx: (8, 128) i32."""
    lane = word_idx & 127
    sub = (word_idx >> 7) & 7
    out = jnp.zeros_like(word_idx)
    for k in range(8):
        row = jnp.broadcast_to(table_slab[k : k + 1, :], (8, 128))
        g = jnp.take_along_axis(row, lane, axis=1)
        out = jnp.where(sub == k, g, out)
    return out


def _part1by2(v):
    """Spread low bits 3 apart (valid for v < 256)."""
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _morton3(x, y, z):
    return _part1by2(x) | (_part1by2(y) << 1) | (_part1by2(z) << 2)


def _gather_row(row128, word_idx):
    """Gather from a (1, 128) row broadcast across sublanes; idx in [0, 128)."""
    row = jnp.broadcast_to(row128, (8, 128))
    return jnp.take_along_axis(row, word_idx & 127, axis=1)


def _traverse_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                     tmin_ref, tmax_ref,
                     lod2_ref, lod3_ref, masks_ref, colors_ref,
                     t_ref, ix_ref, iy_ref, iz_ref,
                     nx_ref, ny_ref, nz_ref, it_ref, col_ref,
                     *, grid_res, max_advances, fetch_colors):
    res = grid_res
    r2 = res // 4
    r3 = res // 8
    fres = float(res)
    BIG = jnp.float32(3.0e38)

    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    tmin = tmin_ref[0]
    tmax = tmax_ref[0]

    lod2 = lod2_ref[:]  # (8, 128)

    inv_x = 1.0 / jnp.maximum(jnp.abs(dx), 1e-20)
    inv_y = 1.0 / jnp.maximum(jnp.abs(dy), 1e-20)
    inv_z = 1.0 / jnp.maximum(jnp.abs(dz), 1e-20)
    sx = jnp.sign(dx)
    sy = jnp.sign(dy)
    sz = jnp.sign(dz)

    # ray/AABB clip (raytracer.py:81-93, IEEE form)
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
    t0 = jnp.maximum(near, tmin)
    eps = jnp.float32(1e-6)
    px0 = jnp.clip(jnp.floor(ox + dx * (t0 + eps)), 0.0, fres - 1.0)
    py0 = jnp.clip(jnp.floor(oy + dy * (t0 + eps)), 0.0, fres - 1.0)
    pz0 = jnp.clip(jnp.floor(oz + dz * (t0 + eps)), 0.0, fres - 1.0)
    far = jnp.minimum(tmax, far_box) - eps

    # boundary-voxel initial normal (raytracer.py:98-101)
    idx_ = jnp.abs(ox + dx * (t0 + eps) - fres * 0.5)
    idy_ = jnp.abs(oy + dy * (t0 + eps) - fres * 0.5)
    idz_ = jnp.abs(oz + dz * (t0 + eps) - fres * 0.5)
    mx = jnp.maximum(jnp.maximum(idx_, idy_), idz_)
    nx0 = (idx_ == mx).astype(jnp.float32)
    ny0 = (idy_ == mx).astype(jnp.float32)
    nz0 = (idz_ == mx).astype(jnp.float32)

    state = dict(
        t=jnp.where(alive0, t0, BIG),
        px=px0.astype(jnp.int32), py=py0.astype(jnp.int32),
        pz=pz0.astype(jnp.int32),
        lod=jnp.full(px0.shape, 2, jnp.int32),
        nx=jnp.where(alive0, nx0, 0.0), ny=jnp.where(alive0, ny0, 0.0),
        nz=jnp.where(alive0, nz0, 0.0),
        active=alive0.astype(jnp.int32),
        hit=jnp.zeros(px0.shape, jnp.int32),
        adv=jnp.zeros(px0.shape, jnp.int32),
        mask_lo=jnp.zeros(px0.shape, jnp.int32),
        mask_hi=jnp.zeros(px0.shape, jnp.int32),
        mask_cell=jnp.full(px0.shape, -1, jnp.int32),
        total=jnp.int32(0),
    )

    max_total = 3 * max_advances + 64

    def cond(s):
        return jnp.any(s["active"] != 0) & (s["total"] < max_total)

    def body(s):
        t = s["t"]
        px, py, pz = s["px"], s["py"], s["pz"]
        lod = s["lod"]
        active = s["active"] != 0

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
        c3 = ((pz >> 3) * r3 + (py >> 3)) * r3 + (px >> 3)

        w2 = _gather_1024(lod2, cell >> 5)
        occ2 = ((w2 >> (cell & 31)) & 1) != 0
        w3 = _gather_row(lod3_ref[0:1, :], c3 >> 5)
        occ3 = ((w3 >> (c3 & 31)) & 1) != 0
        local = ((pz & 3) * 4 + (py & 3)) * 4 + (px & 3)
        mword = jnp.where(local < 32, s["mask_lo"], s["mask_hi"])
        occ0 = ((mword >> (local & 31)) & 1) != 0

        at0 = lod == 0
        at2 = lod == 2
        at3 = lod == 3
        occ = (at0 & occ0) | (at2 & occ2) | (at3 & occ3)

        hit_now = live & at0 & occ
        cached = s["mask_cell"] == cell
        descend3 = live & at3 & occ  # lod 3 -> 2, no fetch needed
        need_fetch = live & at2 & occ & ~cached
        descend2 = live & at2 & occ & cached  # reuse cached mask
        advance = live & ~occ

        # --- fetch cell masks for rays entering a new occupied cell -------
        # Deferred batching: fetch rounds run every other iteration so rays
        # arriving at occupied cells on adjacent iterations share one scan;
        # waiting rays simply stall (they are on an occupied cell, so they
        # cannot advance).
        grp = cell >> 9  # 512 cells per (8,128) slab of mask words
        n_grps = masks_ref.shape[0] // 8
        gmin = jnp.min(jnp.where(need_fetch, grp, n_grps - 1))
        gmax = jnp.max(jnp.where(need_fetch, grp, 0))
        # Adaptive deferral: fetch immediately when a sizable share of live
        # lanes is waiting (coherent wavefronts), else batch every 2nd iter.
        cnt_f = jnp.sum(need_fetch.astype(jnp.int32))
        cnt_a = jnp.sum(live.astype(jnp.int32))
        do_fetch = (cnt_f > 0) & (
            (4 * cnt_f >= cnt_a) | ((s["total"] & 1) == 0)
        )

        mask_lo, mask_hi = s["mask_lo"], s["mask_hi"]
        widx = (2 * cell) & 1023  # lo word index within the group slab

        def fetch_group(g, carry):
            lo, hi = carry
            wanted = need_fetch & (grp == g)
            slab_ = masks_ref[pl.ds(g * 8, 8), :]
            glo = _gather_1024(slab_, widx)
            ghi = _gather_1024(slab_, widx + 1)
            return (jnp.where(wanted, glo, lo), jnp.where(wanted, ghi, hi))

        mask_lo, mask_hi = jax.lax.cond(
            do_fetch,
            lambda: jax.lax.fori_loop(gmin, gmax + 1, fetch_group,
                                      (mask_lo, mask_hi)),
            lambda: (mask_lo, mask_hi),
        )
        fetched = need_fetch & do_fetch
        mask_cell = jnp.where(fetched, cell, s["mask_cell"])

        # --- watertight advance (raytracer.py:124-147) ---------------------
        cs_i = jnp.int32(1) << jnp.where(at0, 0, jnp.where(at2, 2, 3))
        cs = cs_i.astype(jnp.float32)
        bx = (px >> jnp.where(at0, 0, jnp.where(at2, 2, 3))).astype(jnp.float32) * cs
        by = (py >> jnp.where(at0, 0, jnp.where(at2, 2, 3))).astype(jnp.float32) * cs
        bz = (pz >> jnp.where(at0, 0, jnp.where(at2, 2, 3))).astype(jnp.float32) * cs
        fx = ox + dx * t - bx
        fy = oy + dy * t - by
        fz = oz + dz * t - bz
        dxx = jnp.where(dx > 0.0, cs - fx, fx)
        dyy = jnp.where(dy > 0.0, cs - fy, fy)
        dzz = jnp.where(dz > 0.0, cs - fz, fz)
        txx = jnp.where(dx == 0.0, BIG, dxx * inv_x)
        tyy = jnp.where(dy == 0.0, BIG, dyy * inv_y)
        tzz = jnp.where(dz == 0.0, BIG, dzz * inv_z)
        mint = jnp.minimum(jnp.minimum(txx, tyy), tzz)
        ex = jnp.clip(jnp.floor(fx + mint * dx), 0.0, cs - 1.0)
        ey = jnp.clip(jnp.floor(fy + mint * dy), 0.0, cs - 1.0)
        ez = jnp.clip(jnp.floor(fz + mint * dz), 0.0, cs - 1.0)
        anx = (txx == mint).astype(jnp.float32) * sx
        any_ = (tyy == mint).astype(jnp.float32) * sy
        anz = (tzz == mint).astype(jnp.float32) * sz
        napx = (bx + ex + anx).astype(jnp.int32)
        napy = (by + ey + any_).astype(jnp.int32)
        napz = (bz + ez + anz).astype(jnp.int32)
        nat = t + mint

        # post-advance lod: stay in-cell while the cached mask still covers
        # the new position; otherwise coarsen one level (0->2, 2->3, 3->3).
        ncell = ((napz >> 2) * r2 + (napy >> 2)) * r2 + (napx >> 2)
        same_cell = ncell == mask_cell
        adv_lod = jnp.where(
            at0 & same_cell, 0,
            jnp.where(at0, 2, 3),
        )

        out = dict(s)
        out["t"] = jnp.where(miss, BIG, jnp.where(advance, nat, t))
        out["px"] = jnp.where(advance, napx, px)
        out["py"] = jnp.where(advance, napy, py)
        out["pz"] = jnp.where(advance, napz, pz)
        out["lod"] = jnp.where(
            advance, adv_lod,
            jnp.where(descend3, 2, jnp.where(fetched | descend2, 0, lod)),
        )
        out["nx"] = jnp.where(advance, anx, s["nx"])
        out["ny"] = jnp.where(advance, any_, s["ny"])
        out["nz"] = jnp.where(advance, anz, s["nz"])
        out["adv"] = s["adv"] + advance.astype(jnp.int32)
        exhausted = advance & (out["adv"] >= max_advances)
        out["hit"] = s["hit"] | hit_now.astype(jnp.int32)
        out["active"] = (live & ~hit_now & ~exhausted).astype(jnp.int32)
        out["mask_lo"] = mask_lo
        out["mask_hi"] = mask_hi
        out["mask_cell"] = mask_cell
        out["total"] = s["total"] + 1
        return out

    s = jax.lax.while_loop(cond, body, state)

    # normal flip toward the ray (raytracer.py:151-153)
    ndot = dx * s["nx"] + dy * s["ny"] + dz * s["nz"]
    flip = ndot > 0.0
    nx = jnp.where(flip, -s["nx"], s["nx"])
    ny = jnp.where(flip, -s["ny"], s["ny"])
    nz = jnp.where(flip, -s["nz"], s["nz"])

    t_ref[0] = jnp.where(s["t"] >= BIG, jnp.float32(np.inf), s["t"])
    ix_ref[0] = jnp.where(alive0, s["px"], -1)
    iy_ref[0] = jnp.where(alive0, s["py"], -1)
    iz_ref[0] = jnp.where(alive0, s["pz"], -1)
    nx_ref[0] = nx
    ny_ref[0] = ny
    nz_ref[0] = nz
    it_ref[0] = s["adv"]

    # --- hit color fetch (skipped for shadow rays) --------------------------
    if fetch_colors:
        px, py, pz = s["px"], s["py"], s["pz"]
        cell = ((pz >> 2) * r2 + (py >> 2)) * r2 + (px >> 2)
        local = ((pz & 3) * 4 + (py & 3)) * 4 + (px & 3)
        word_idx = cell * 64 + local
        hit = s["hit"] != 0
        grp = word_idx >> 13  # 8192 words (one (8,128)-slab group of 8) each
        n_grps = colors_ref.shape[0] // 64
        gmin = jnp.min(jnp.where(hit, grp, n_grps - 1))
        gmax = jnp.max(jnp.where(hit, grp, 0))
        col = jnp.zeros(px.shape, jnp.int32)

        def cgroup(g, col):
            wanted = hit & (grp == g)
            for k in range(8):  # 8 slabs of 1024 words per group
                slab_ = colors_ref[pl.ds(g * 64 + k * 8, 8), :]
                sub_wanted = wanted & (((word_idx >> 10) & 7) == k)
                gv = _gather_1024(slab_, word_idx & 1023)
                col = jnp.where(sub_wanted, gv, col)
            return col

        col = jax.lax.cond(
            jnp.any(hit),
            lambda: jax.lax.fori_loop(gmin, gmax + 1, cgroup, col),
            lambda: col,
        )
        col_ref[0] = col
    else:
        col_ref[0] = jnp.zeros(s["px"].shape, jnp.int32)


class PallasTraceResult(NamedTuple):
    distance: jax.Array
    ipos: jax.Array  # (N, 3)
    normal: jax.Array  # (N, 3)
    iters: jax.Array
    color_word: jax.Array  # u32 packed r|g<<8|b<<16|mat<<24 (0 unless hit)


@functools.partial(
    jax.jit,
    static_argnames=("grid_res", "max_advances", "fetch_colors", "interpret"),
)
def raytrace_pallas(tables: PallasTables, origin, direction, ray_min_t,
                    ray_max_t, grid_res: int, max_advances: int = 512,
                    fetch_colors: bool = True,
                    interpret: bool = False) -> PallasTraceResult:
    """Trace rays in grid space [0, res)³ with the Pallas kernel.

    origin/direction: (N, 3) f32; N is padded to a multiple of 1024.
    """
    n = origin.shape[0]
    pad = (-n) % BLOCK_RAYS
    npad = n + pad

    def prep(x):
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        return x

    o = prep(origin)
    d = prep(direction)
    tmin = prep(jnp.broadcast_to(jnp.asarray(ray_min_t, jnp.float32), (n,)))
    tmax = prep(jnp.broadcast_to(jnp.asarray(ray_max_t, jnp.float32), (n,)))
    nb = npad // BLOCK_RAYS

    def blk(x):
        return x.reshape(nb, SUBLANES, LANES)

    ins = [blk(o[:, 0]), blk(o[:, 1]), blk(o[:, 2]),
           blk(d[:, 0]), blk(d[:, 1]), blk(d[:, 2]),
           blk(tmin), blk(tmax)]

    ray_spec = pl.BlockSpec((1, SUBLANES, LANES), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def table_spec(rows):
        return pl.BlockSpec((rows, LANES), lambda b: (0, 0),
                            memory_space=pltpu.VMEM)

    lod2 = tables.lod2_words.reshape(-1, LANES).astype(jnp.int32)
    lod3 = tables.lod3_words.reshape(-1, LANES).astype(jnp.int32)
    masks = tables.cell_masks.reshape(-1, LANES).astype(jnp.int32)
    colors = tables.cell_colors.reshape(-1, LANES).astype(jnp.int32)

    out_shapes = [jax.ShapeDtypeStruct((nb, SUBLANES, LANES), dt)
                  for dt in (jnp.float32, jnp.int32, jnp.int32, jnp.int32,
                             jnp.float32, jnp.float32, jnp.float32,
                             jnp.int32, jnp.int32)]

    kernel = functools.partial(
        _traverse_kernel, grid_res=grid_res, max_advances=max_advances,
        fetch_colors=fetch_colors,
    )

    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[ray_spec] * 8 + [
            table_spec(lod2.shape[0]), table_spec(lod3.shape[0]),
            table_spec(masks.shape[0]), table_spec(colors.shape[0]),
        ],
        out_specs=[ray_spec] * 9,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*ins, lod2, lod3, masks, colors)

    t, ix, iy, iz, nx, ny, nz, it, col = [x.reshape(npad)[:n] for x in outs]
    return PallasTraceResult(
        distance=t,
        ipos=jnp.stack([ix, iy, iz], axis=-1),
        normal=jnp.stack([nx, ny, nz], axis=-1),
        iters=it,
        color_word=col.astype(jnp.uint32),
    )
