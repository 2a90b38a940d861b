"""Acceleration-structure builders for the Pallas traversal kernel.

Layouts (for grid_res = 128; general powers of two supported):
  * lod2_words   u32[1024]        one bit per 4³ cell, cell id z-major
                                  ((cz*R2 + cy)*R2 + cx, R2 = res/4)
  * dist3_words  u32[res³/512/8]  4-bit chebyshev distance field over 8³
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
  * cell_masks   u32[n_cells, 2]  64-bit voxel occupancy per 4³ cell,
                                  local bit = (vz*4 + vy)*4 + vx
  * cell_colors  u32[n_cells, 64] packed voxel words (r|g<<8|b<<16|mat<<24)
                                  cell-major so a hit fetch is one lane read

All tables are built host-side in numpy once per scene (the reference
rebuilds its texture + pyramid per prepare_data, renderer/voxel_world.py:89).
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
    dist3_words: "jax.Array"  # u32 (n3w,) packed 4-bit chebyshev distances
    cell_masks_lo: "jax.Array"  # u32 (n_cells,) MORTON cell order, bits 0-31
    cell_masks_hi: "jax.Array"  # u32 (n_cells,) MORTON cell order, bits 32-63
    cell_colors: "jax.Array"  # u32 (n_cells*64,) MORTON cell-major
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
    pad = (-len(arr)) % multiple
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
    ((z*res + y)*res + x) packed voxel words (world.device_arrays).

    Cell ids are z-major ((cz*r2 + cy)*r2 + cx); a Morton ordering was
    measured slower overall (the id computation outweighs the tighter scan
    ranges — see PERF_NOTES.md)."""
    res = grid_res
    r2 = res // 4
    occ = (material_xyz != 0).transpose(2, 1, 0)  # [z][y][x]

    # cells z-major first: [cz, cy, cx, 64 local bits]
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
    lod2 = _pack_bits(cells.any(axis=1))  # z-major bit order (march query)

    # Mask/color tables are MORTON-ordered: the traversal kernel's fetch
    # scans are range-limited over slab groups, and the morton curve turns a
    # block's 3-D-local working set into a short 1-D id range (a 16³-voxel
    # neighbourhood = one contiguous 64-cell run) where the z-major order
    # spreads it across many groups.
    cz, cy, cx = np.indices((r2, r2, r2), dtype=np.uint32)
    code = morton3_np(cx, cy, cz).reshape(-1)
    inv = np.empty_like(code)
    inv[code] = np.arange(len(code), dtype=np.uint32)
    cells_m = cells[inv]
    colors_m = colors[inv]
    words = _pack_bits(cells_m).reshape(-1, 2)
    masks_lo, masks_hi = words[:, 0].copy(), words[:, 1].copy()

    r3 = res // 8
    occ3 = (
        occ.reshape(r3, 8, r3, 8, r3, 8)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(r3, r3, r3, 512)
        .any(axis=-1)
    )
    dist3 = _pack_nibbles(chebyshev_distance_field(occ3))

    return PallasTables(
        lod2_words=jnp.asarray(_pad_to(lod2, 1024)),
        dist3_words=jnp.asarray(_pad_to(dist3, 128)),
        cell_masks_lo=jnp.asarray(_pad_to(masks_lo, 1024)),
        cell_masks_hi=jnp.asarray(_pad_to(masks_hi, 1024)),
        cell_colors=jnp.asarray(_pad_to(colors_m.reshape(-1), 1024)),
        grid_res=res,
    )
