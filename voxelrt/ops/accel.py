"""Acceleration-structure builders for the Pallas traversal kernel.

v5 layout (rank-compressed; for grid_res = 128 — general powers of two up to
128 supported):

  * lod2_words    u32[res³/64/32]  one bit per 4³ cell, cell id z-major
                                   ((cz*R2 + cy)*R2 + cx, R2 = res/4)
  * solid_words   u32[same]        bit set when the cell's 64 voxels are ALL
                                   occupied — the kernel hits such a cell at
                                   its entry voxel with no mask fetch.
  * dist3_words   u32[res³/512/8]  4-bit chebyshev distance field over 8³
                                   cells (R3 = res/8): nibble = 0 when the
                                   cell contains any voxel, else the
                                   chebyshev distance (in 8³-cell units) to
                                   the nearest occupied cell, capped at 15.
                                   A value d ≥ 1 certifies the box of radius
                                   d-1 cells around the query cell empty, so
                                   the traversal kernel can skip straight to
                                   the box boundary — replacing the
                                   reference's LOD3..LOD6 pyramid walk
                                   (renderer/raytracer.py:9-15,110-118) with
                                   a single query per march step.
  * rank_base     u32[n lod2 words] number of MIXED (occupied, not solid)
                                   cells with id below each 32-cell word —
                                   rank(c) = rank_base[c>>5] +
                                   popcount(mixed_word & below-bits). Indexes
                                   the compressed mask tables.
  * mixed_lo/hi   u32[n_mixed]     64-bit voxel occupancy of each MIXED cell,
                                   rank order, local bit = (vz*4+vy)*4+vx.
                                   Real scenes have only a few thousand mixed
                                   cells (example6: 2697 of 32768), so a mask
                                   fetch is a short FULL static scan over
                                   ceil(n_mixed/128) vreg rows — no dynamic
                                   slices, no per-group reductions (the v4
                                   grouped-scan machinery measured ~65% of
                                   sorted-bounce kernel time, PERF_NOTES.md).
  * occ_morton    u32[n lod2 words] occupancy bits in MORTON cell-id order
                                   (bit i of word w = cell with morton code
                                   w*32+i occupied).
  * occ_rank_base u32[n lod2 words] prefix ranks over OCCUPIED cells in
                                   MORTON order — indexes the compressed
                                   color table.
  * cell_colors   u32[n_occ*64]    packed voxel words (r|g<<8|b<<16|mat<<24)
                                   of OCCUPIED cells only, MORTON-rank
                                   cell-major so a hit fetch is one lane
                                   read at occ_rank*64 + local (v4 stored
                                   all 128³ voxels = 8 MB VMEM; example6
                                   compresses 2 M voxel words → 403 K).
                                   Morton rank order matters: compressing in
                                   z-major rank order scattered a block's
                                   hit colors across ~100 distinct (8,128)
                                   slabs (measured, tools/trace_bench.py
                                   --debug); the morton curve keeps a
                                   3-D-local hit set in a handful.

All tables are built host-side in numpy once per scene (the reference
rebuilds its texture + pyramid per prepare_data, renderer/voxel_world.py:89).
Table shapes depend on the scene's occupancy, so the traversal kernel
re-specializes per scene (one extra compile per scene, amortized over the
progressive render).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

try:
    import jax
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jax = jnp = None

DIST_CAP = 15  # 4-bit nibble maximum


class PallasTables(NamedTuple):
    lod2_words: "jax.Array"  # u32 (n2w,) z-major cell bit order
    solid_words: "jax.Array"  # u32 (n2w,) bit = cell fully occupied
    dist3_words: "jax.Array"  # u32 (n3w,) packed 4-bit chebyshev distances
    rank_base: "jax.Array"  # u32 (n2w,) mixed-cell prefix ranks
    occ_morton: "jax.Array"  # u32 (n2w,) occupancy bits, morton cell order
    occ_rank_base: "jax.Array"  # u32 (n2w,) occupied prefix ranks, morton
    mixed_lo: "jax.Array"  # u32 (n_mixed padded,) rank order, bits 0-31
    mixed_hi: "jax.Array"  # u32 (n_mixed padded,) rank order, bits 32-63
    cell_colors: "jax.Array"  # u32 (n_occ*64 padded,) morton-rank cell-major
    grid_res: int


def _pack_bits(bits: np.ndarray) -> np.ndarray:
    bits = bits.astype(np.uint8).reshape(-1)
    pad = (-len(bits)) % 32
    if pad:
        bits = np.concatenate([bits, np.zeros(pad, np.uint8)])
    w = bits.reshape(-1, 32).astype(np.uint32)
    return (w << np.arange(32, dtype=np.uint32)).sum(
        axis=1, dtype=np.uint32
    )


def _pack_nibbles(vals: np.ndarray) -> np.ndarray:
    vals = vals.astype(np.uint32).reshape(-1)
    pad = (-len(vals)) % 8
    if pad:
        vals = np.concatenate([vals, np.full(pad, DIST_CAP, np.uint32)])
    w = vals.reshape(-1, 8)
    return (w << (4 * np.arange(8, dtype=np.uint32))).sum(
        axis=1, dtype=np.uint32
    )


def _pad_to(arr: np.ndarray, multiple: int) -> np.ndarray:
    n = max(len(arr), 1)  # at least one lane row even for empty tables
    pad = (-n) % multiple + (n - len(arr))
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, arr.dtype)])
    return arr


def _part1by2(v: np.ndarray) -> np.ndarray:
    """Spread the low 10 bits of v 3 apart (Morton interleave helper)."""
    v = v.astype(np.uint32) & 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton3_np(x, y, z):
    return _part1by2(x) | (_part1by2(y) << 1) | (_part1by2(z) << 2)


def chebyshev_distance_field(occ: np.ndarray, cap: int = DIST_CAP) -> np.ndarray:
    """d[c] = 0 where occ, else chebyshev distance to nearest occupied cell,
    capped. Built by iterated 3³ dilation (the grid is at most 16³ cells)."""
    d = np.full(occ.shape, cap, np.uint8)
    cur = occ.astype(bool)
    d[cur] = 0
    for k in range(1, cap):
        if cur.all() or not cur.any():
            break
        p = np.pad(cur, 1, constant_values=False)
        dil = np.zeros_like(cur)
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    dil |= p[
                        dz : dz + occ.shape[0],
                        dy : dy + occ.shape[1],
                        dx : dx + occ.shape[2],
                    ]
        newly = dil & ~cur
        d[newly] = k
        cur = dil
    return d


def build_pallas_tables(material_xyz: np.ndarray, color_words_zyx: np.ndarray,
                        grid_res: int) -> PallasTables:
    """material_xyz: int8 [x][y][z]; color_words_zyx: u32 flat z-major
    ((z*res + y)*res + x) packed voxel words (world.device_arrays)."""
    res = grid_res
    r2 = res // 4
    occ = (material_xyz != 0).transpose(2, 1, 0)  # [z][y][x]

    # cells z-major: [cz, cy, cx, 64 local bits]
    cells = (
        occ.reshape(r2, 4, r2, 4, r2, 4)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(r2 * r2 * r2, 64)
    )
    colors = (
        color_words_zyx.reshape(r2, 4, r2, 4, r2, 4)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(r2 * r2 * r2, 64)
    )
    occupied = cells.any(axis=1)
    solid = cells.all(axis=1)
    mixed = occupied & ~solid
    lod2 = _pack_bits(occupied)  # z-major bit order (march query)
    solid_w = _pack_bits(solid)

    # Prefix ranks per 32-cell word (exclusive cumulative counts).
    n_words = len(lod2)

    def prefix_ranks(flags: np.ndarray) -> np.ndarray:
        per_word = _pad_to(flags.astype(np.uint32), 32).reshape(-1, 32)
        return np.concatenate(
            [[0], np.cumsum(per_word.sum(axis=1))[:-1]]
        ).astype(np.uint32)[:n_words]

    rank_base = prefix_ranks(mixed)

    # Compressed mask table: MIXED cells only, rank (= z-major id) order.
    mixed_words = _pack_bits(cells[mixed]).reshape(-1, 2) if mixed.any() else \
        np.zeros((0, 2), np.uint32)
    mixed_lo = mixed_words[:, 0].copy() if len(mixed_words) else \
        np.zeros(0, np.uint32)
    mixed_hi = mixed_words[:, 1].copy() if len(mixed_words) else \
        np.zeros(0, np.uint32)

    # Compressed color table: OCCUPIED cells in MORTON rank order (morton
    # code is a bijection on the power-of-two cube, so scatter by code).
    cz_, cy_, cx_ = np.indices((r2, r2, r2), dtype=np.uint32)
    code = morton3_np(cx_, cy_, cz_).reshape(-1)  # z-major id -> morton code
    occ_m = np.zeros_like(occupied)
    occ_m[code] = occupied
    colors_m = np.zeros_like(colors)
    colors_m[code] = colors
    occ_morton = _pack_bits(occ_m)
    occ_rank_base = prefix_ranks(occ_m)
    colors_occ = colors_m[occ_m].reshape(-1)

    r3 = res // 8
    occ3 = (
        occ.reshape(r3, 8, r3, 8, r3, 8)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(r3, r3, r3, 512)
        .any(axis=-1)
    )
    dist3 = _pack_nibbles(chebyshev_distance_field(occ3))

    return PallasTables(
        lod2_words=jnp.asarray(_pad_to(lod2, 128)),
        solid_words=jnp.asarray(_pad_to(solid_w, 128)),
        dist3_words=jnp.asarray(_pad_to(dist3, 128)),
        rank_base=jnp.asarray(_pad_to(rank_base, 128)),
        occ_morton=jnp.asarray(_pad_to(occ_morton, 128)),
        occ_rank_base=jnp.asarray(_pad_to(occ_rank_base, 128)),
        mixed_lo=jnp.asarray(_pad_to(mixed_lo, 128)),
        mixed_hi=jnp.asarray(_pad_to(mixed_hi, 128)),
        cell_colors=jnp.asarray(_pad_to(colors_occ, 1024)),
        grid_res=res,
    )
