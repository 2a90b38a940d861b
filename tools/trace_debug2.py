"""Per-block iteration/fetch diagnostics on RENDERER-SHAPED loads for a real
example scene, including the sorted-routing order the renderer actually
dispatches (render/pathtracer._trace_voxels_sorted). Decomposes block cost:

  total   — kernel while_loop trip count (advance / resolve / stall rounds)
  fetch   — mask-fetch rounds (each scans distinct morton groups)
  grpscan — total distinct-group scans across fetch rounds (the gather cost)

Usage: python tools/trace_debug2.py [--scene example6]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="example6")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import tools.trace_bench as tb
    from voxelrt.ops.accel import build_pallas_tables
    from voxelrt.ops.dda_pallas import _morton3, raytrace_pallas

    rng = np.random.default_rng(0)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as bench_mod

    sc = bench_mod.build_scene(args.scene, (320, 180))
    world = sc.world
    arrays = world.device_arrays()
    res = world.grid_res
    tables = build_pallas_tables(
        world.material, np.asarray(arrays["voxels"]), res
    )
    print(f"scene {args.scene}: {int((world.material != 0).sum())} voxels")

    w, h = 1280, 720
    inv = 1.0 / sc.config.voxel_dx
    off = sc.config.grid_offset
    eye = np.asarray(sc.camera.position, np.float32) * inv - off
    target = np.asarray(sc.camera.look_at, np.float32) * inv - off
    fwd = target - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    uu, vv = tb.tile_order(w, h)
    px = (uu + 0.5) / w - 0.5
    py = (vv + 0.5) / h - 0.5
    d_pri = (fwd[None] + (0.9 * px)[:, None] * right[None]
             + (0.9 * py * h / w)[:, None] * up[None]).astype(np.float32)
    d_pri /= np.linalg.norm(d_pri, axis=1, keepdims=True)
    o_pri = np.broadcast_to(eye, d_pri.shape).astype(np.float32).copy()
    m = d_pri.shape[0]

    r = raytrace_pallas(tables, jnp.asarray(o_pri), jnp.asarray(d_pri),
                        1e-6, jnp.inf, res)
    t = np.asarray(jax.device_get(r.distance)).copy()
    nrm = np.asarray(jax.device_get(r.normal)).copy()
    hitm = np.isfinite(t)
    print(f"primary hit fraction {hitm.mean():.2f}")
    tt = np.where(hitm, t, 0.0)
    hp = o_pri + d_pri * tt[:, None] + nrm * 1e-3
    fill = np.where(hitm)[0][rng.integers(0, hitm.sum(), m)]
    hp[~hitm] = hp[fill[~hitm]]
    nrm[~hitm] = nrm[fill[~hitm]]
    zs = rng.random(m).astype(np.float32)
    phi = rng.random(m).astype(np.float32) * 2 * np.pi
    local = np.stack([np.cos(phi) * np.sqrt(1 - zs),
                      np.sin(phi) * np.sqrt(1 - zs), np.sqrt(zs)], -1)
    tang = np.cross(nrm, [0.123, 0.91, 0.31])
    tang /= np.maximum(np.linalg.norm(tang, axis=1, keepdims=True), 1e-9)
    bit = np.cross(nrm, tang)
    d_bnc = local[:, 0:1] * tang + local[:, 1:2] * bit + local[:, 2:3] * nrm
    d_bnc = (d_bnc / np.linalg.norm(d_bnc, axis=1, keepdims=True)).astype(np.float32)

    sun = np.array([0.45, 0.8, 0.4], np.float32); sun /= np.linalg.norm(sun)
    d_sh = sun[None] + rng.normal(0, 0.03, (m, 3))
    d_sh = (d_sh / np.linalg.norm(d_sh, axis=1, keepdims=True)).astype(np.float32)

    def route(o, d, mask):
        """The renderer's sort key (pathtracer._trace_voxels_sorted)."""
        r2 = res // 4
        cx = np.clip(o[:, 0].astype(np.int32) >> 2, 0, r2 - 1)
        cy = np.clip(o[:, 1].astype(np.int32) >> 2, 0, r2 - 1)
        cz = np.clip(o[:, 2].astype(np.int32) >> 2, 0, r2 - 1)
        octant = ((d[:, 0] > 0) + 2 * (d[:, 1] > 0) + 4 * (d[:, 2] > 0))
        key = (np.asarray(_morton3(cx, cy, cz)) << 3) | octant
        key = np.where(mask, key, 0x7FFFFFFF)
        order = np.argsort(key, kind="stable")
        return o[order], d[order], mask[order]

    def report(name, o, d, mask=None):
        tmax = np.where(mask, np.inf, 0.0).astype(np.float32) if mask is not None \
            else jnp.inf
        rr = raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6,
                             jnp.asarray(tmax) if mask is not None else jnp.inf,
                             res)
        adv = np.asarray(jax.device_get(rr.iters))
        rt = raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6,
                             jnp.asarray(tmax) if mask is not None else jnp.inf,
                             res, debug_totals=True)
        packed = np.asarray(jax.device_get(rt.iters)).reshape(-1, 1024)[:, 0]
        tot = packed & 1023
        nfetch = (packed >> 10) & 1023
        ngrp = packed >> 20
        hit = np.isfinite(np.asarray(jax.device_get(rr.distance)))
        print(
            f"{name:18s} adv mean {adv.mean():5.1f}  blk-total mean {tot.mean():5.1f} "
            f"p99 {np.percentile(tot, 99):4.0f} max {tot.max():4d}  "
            f"fetch/blk {nfetch.mean():5.1f} grpscan/blk {ngrp.mean():5.1f}  "
            f"hit% {hit.mean() * 100:3.0f}"
        )

    report("primary", o_pri, d_pri)
    report("bounce_unsorted", hp.astype(np.float32), d_bnc)
    o_s, d_s, m_s = route(hp.astype(np.float32), d_bnc, hitm)
    report("bounce_sorted", o_s, d_s, m_s)
    o_s, d_s, m_s = route(hp.astype(np.float32), d_sh, hitm)
    report("shadow_sorted", o_s, d_s, m_s)


if __name__ == "__main__":
    main()
