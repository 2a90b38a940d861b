"""Hierarchical-DDA voxel traversal (vectorized over ray batches).

TPU-native re-derivation of renderer/raytracer.py:72-155. The reference runs
one divergent thread per ray with a nested descend-while inside an advance
loop; here every ray advances in lock-step through a single
``lax.while_loop`` whose body performs exactly ONE occupancy query per
iteration — either a descend (occupied, lod > 0 → lod-1) or a watertight
integer advance to the next cell boundary (empty). This restructuring issues
the same total number of occupancy queries as the reference's nested loops
while keeping the body uniform for SIMD execution.

Semantics intentionally preserved from the reference:
  * advance-iteration cap of 512 (renderer/raytracer.py:103) — rays that
    exhaust it return their current (finite!) distance, not a miss;
  * the boundary-voxel initial normal (renderer/raytracer.py:98-101);
  * the final normal flip toward the ray (renderer/raytracer.py:151-153).

This module is the *portable* implementation (runs on CPU for tests and any
backend). The production TPU path is `voxelrt.ops.dda_pallas`, selected via
``voxelrt.ops.registry``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from voxelrt.ops.sampling import EPS, INF, ray_aabb_intersection


class OccupancyPyramid(NamedTuple):
    """Packed occupancy bitfield + static geometry (see voxelrt.world)."""

    words: jax.Array  # u32[(sum lod cells + 31)//32]
    grid_res: int
    n_lods: int

    @property
    def bases(self) -> np.ndarray:
        sizes = [(self.grid_res >> i) ** 3 for i in range(self.n_lods)]
        return np.concatenate([[0], np.cumsum(sizes)]).astype(np.int32)


def query_occupancy(pyr: OccupancyPyramid, ipos, lod):
    """renderer/raytracer.py:40-44 — test the bit for cell ``ipos`` at ``lod``.

    ipos: (..., 3) int32 cell coords at that lod; lod: (...,) int32.
    """
    bases = pyr.bases
    res = pyr.grid_res
    # base + (z*r + y)*r + x with r = res >> lod; static unroll over lods so
    # no gather is needed for the per-lod base/res.
    flat = jnp.zeros(lod.shape, dtype=jnp.int32)
    for k in range(pyr.n_lods):
        r = res >> k
        f_k = int(bases[k]) + (ipos[..., 2] * r + ipos[..., 1]) * r + ipos[..., 0]
        flat = jnp.where(lod == k, f_k, flat)
    word = jnp.take(pyr.words, flat >> 5, axis=0, mode="clip")
    bit = (word >> (flat & 31).astype(jnp.uint32)) & jnp.uint32(1)
    return bit != 0


class TraceResult(NamedTuple):
    distance: jax.Array  # (N,) f32, grid units; inf on miss
    ipos: jax.Array  # (N, 3) i32 LOD-0 cell index ((-1,-1,-1) on miss)
    normal: jax.Array  # (N, 3) f32 face normal, flipped toward the ray
    iters: jax.Array  # (N,) i32 advance count


@functools.partial(jax.jit, static_argnames=("grid_res", "n_lods", "max_advances"))
def _raytrace_impl(words, origin, direction, ray_min_t, ray_max_t,
                   grid_res, n_lods, max_advances):
    pyr = OccupancyPyramid(words, grid_res, n_lods)
    res_f = float(grid_res)

    bbox_intersect, bbox_near, bbox_far = ray_aabb_intersection(
        jnp.zeros(3, jnp.float32), jnp.full(3, res_f, jnp.float32),
        origin, direction,
    )

    alive0 = bbox_intersect & (ray_min_t < bbox_far) & (ray_max_t > bbox_near)
    t0 = jnp.maximum(bbox_near, ray_min_t)
    initial_p = origin + direction * (t0 + EPS)[..., None]
    ipos0 = jnp.clip(jnp.floor(initial_p), 0.0, res_f - 1.0).astype(jnp.int32)
    # Clamp so a zero component gives a huge-but-finite step time instead of
    # 0 * inf = NaN on exact cell boundaries.
    inv_dir = 1.0 / jnp.maximum(jnp.abs(direction), 1e-20)
    far = jnp.minimum(ray_max_t, bbox_far) - EPS

    # Boundary-voxel initial normal (raytracer.py:98-101).
    initial_dist = jnp.abs(initial_p - res_f * 0.5)
    max_dist = jnp.max(initial_dist, axis=-1, keepdims=True)
    normal0 = (initial_dist == max_dist).astype(jnp.float32)

    n = origin.shape[0]
    sign_d = jnp.sign(direction)

    # Initial carries derive from varying inputs so the loop is usable
    # under shard_map (constants would mismatch the varying outputs).
    zero_i = (t0 * 0.0).astype(jnp.int32)
    state = dict(
        t=jnp.where(alive0, t0, jnp.float32(INF)),
        ipos=jnp.where(alive0[..., None], ipos0, -1),
        lod=zero_i,
        normal=jnp.where(alive0[..., None], normal0, 0.0),
        active=alive0,
        hit=alive0 & ~alive0,
        advances=zero_i,
        total=jnp.int32(0),
    )

    # Total iteration bound: each advance can be followed by at most one lod
    # increment, so descends over a whole ray never exceed advances + n_lods.
    max_total = 2 * max_advances + n_lods + 2

    def cond(s):
        return jnp.any(s["active"]) & (s["total"] < max_total)

    def body(s):
        active = s["active"]
        t = s["t"]
        ipos0_ = s["ipos"]
        lod = s["lod"]

        # Miss when past the far clip (raytracer.py:104-106) or outside the
        # grid (the far-clip float comparison can miss the exit face by an
        # ulp and alias an out-of-range index onto another cell's bits — a
        # latent bug the reference shares via unchecked field reads).
        inb = jnp.all((ipos0_ >= 0) & (ipos0_ < grid_res), axis=-1)
        miss = active & ((t > far) | ~inb)

        cell = ipos0_ >> lod[..., None]
        occ = query_occupancy(pyr, jnp.maximum(cell, 0), lod)

        live = active & ~miss
        hit_now = live & occ & (lod == 0)
        descend = live & occ & (lod > 0)
        advance = live & ~occ

        # --- advance to the nearest boundary of the current-lod cell
        # (raytracer.py:124-147), watertight via integer reconstruction.
        cell_size = (jnp.int32(1) << lod).astype(jnp.float32)[..., None]
        cell_base = (cell).astype(jnp.float32) * cell_size
        voxel_pos = origin + direction * t[..., None]
        frac = voxel_pos - cell_base
        dist = jnp.where(direction > 0.0, cell_size - frac, frac)
        # An axis the ray does not move along can never be the crossing axis
        # (the reference reaches the same outcome via 0 * inf NaN luck).
        t_axes = jnp.where(direction == 0.0, jnp.float32(INF), dist * inv_dir)
        min_t = jnp.min(t_axes, axis=-1)
        edge = jnp.clip(
            jnp.floor(frac + min_t[..., None] * direction), 0.0, cell_size - 1.0
        )
        adv_normal = (t_axes == min_t[..., None]).astype(jnp.float32) * sign_d
        adv_ipos = (cell_base + edge + adv_normal).astype(jnp.int32)
        adv_t = t + min_t
        adv_lod = jnp.minimum(n_lods - 1, lod + 1)

        s = dict(s)
        s["t"] = jnp.where(miss, jnp.float32(INF), jnp.where(advance, adv_t, t))
        s["ipos"] = jnp.where(advance[..., None], adv_ipos, ipos0_)
        s["lod"] = jnp.where(descend, lod - 1, jnp.where(advance, adv_lod, lod))
        s["normal"] = jnp.where(advance[..., None], adv_normal, s["normal"])
        s["advances"] = s["advances"] + advance.astype(jnp.int32)
        exhausted = advance & (s["advances"] >= max_advances)
        s["hit"] = s["hit"] | hit_now
        s["active"] = active & ~miss & ~hit_now & ~exhausted
        s["total"] = s["total"] + 1
        return s

    s = jax.lax.while_loop(cond, body, state)

    normal = s["normal"]
    flip = jnp.sum(direction * normal, axis=-1) > 0.0
    normal = jnp.where(flip[..., None], -normal, normal)
    return TraceResult(s["t"], s["ipos"], normal, s["advances"])


def raytrace(pyr: OccupancyPyramid, origin, direction, ray_min_t, ray_max_t,
             max_advances: int = 512) -> TraceResult:
    """Trace rays against the occupancy pyramid in grid space [0, res)³.

    origin/direction: (N, 3) f32; min/max t: (N,) or scalar f32.
    """
    n = origin.shape[0]
    ray_min_t = jnp.broadcast_to(jnp.asarray(ray_min_t, jnp.float32), (n,))
    ray_max_t = jnp.broadcast_to(jnp.asarray(ray_max_t, jnp.float32), (n,))
    return _raytrace_impl(
        pyr.words, origin, direction, ray_min_t, ray_max_t,
        pyr.grid_res, pyr.n_lods, max_advances,
    )
