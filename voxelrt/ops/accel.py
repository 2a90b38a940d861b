"""Acceleration-structure builders for the Pallas traversal kernel.

Layouts (for grid_res = 128; general powers of two supported):
  * lod2_words  u32[1024]        one bit per 4³ cell, cell id z-major
                                 ((cz*R2 + cy)*R2 + cx, R2 = res/4)
  * lod3_words  u32[res³/512/32] one bit per 8³ cell
  * cell_masks  u32[n_cells, 2]  64-bit voxel occupancy per 4³ cell,
                                 local bit = (vz*4 + vy)*4 + vx
  * cell_colors u32[n_cells, 64] packed voxel words (r|g<<8|b<<16|mat<<24)
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


class PallasTables(NamedTuple):
    lod2_words: "jax.Array"  # u32 (n2w,)
    lod3_words: "jax.Array"  # u32 (n3w,)
    cell_masks: "jax.Array"  # u32 (n_cells*2,) flattened, padded to 1024
    cell_colors: "jax.Array"  # u32 (n_cells*64,) padded to 1024
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
    cell_masks = _pack_bits(cells)  # 2 words per cell
    lod2 = _pack_bits(cells.any(axis=1))

    r3 = res // 8
    occ3 = (
        occ.reshape(r3, 8, r3, 8, r3, 8)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(r3 * r3 * r3, 512)
        .any(axis=1)
    )
    lod3 = _pack_bits(occ3)

    return PallasTables(
        lod2_words=jnp.asarray(_pad_to(lod2, 1024)),
        lod3_words=jnp.asarray(_pad_to(lod3, 128)),
        cell_masks=jnp.asarray(_pad_to(cell_masks, 1024)),
        cell_colors=jnp.asarray(_pad_to(colors.reshape(-1), 1024)),
        grid_res=res,
    )
