"""Iteration/fetch-count diagnostics for the traversal kernel on the
renderer-shaped ray sets of tools/trace_bench.py."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import tools.trace_bench as tb

    from voxelrt.ops.accel import build_pallas_tables
    from voxelrt.ops.dda_pallas import raytrace_pallas

    res = 128
    rng = np.random.default_rng(0)
    mat = tb.build_scene(res, rng)
    colors = rng.integers(0, 1 << 24, res**3, dtype=np.uint32) | (
        np.uint32(1) << 24
    )
    tables = build_pallas_tables(mat, colors, res)

    w, h = 1280, 720
    eye = np.array([-res * 0.6, res * 0.9, -res * 0.5], np.float32)
    fwd = np.array([res / 2, res * 0.45, res / 2], np.float32) - eye
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

    for name, o, d in [
        ("primary", o_pri, d_pri),
        ("bounce", hp.astype(np.float32), d_bnc),
        ("shadow", hp.astype(np.float32), d_sh),
    ]:
        rr = raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6,
                             jnp.inf, res)
        adv = np.asarray(jax.device_get(rr.iters))
        rt = raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6,
                             jnp.inf, res, debug_totals=True)
        packed = np.asarray(jax.device_get(rt.iters)).reshape(-1, 1024)[:, 0]
        tot = packed & 1023
        nfetch = (packed >> 10) & 1023
        ngrp = packed >> 20
        hit = np.isfinite(np.asarray(jax.device_get(rr.distance)))
        print(
            f"{name}: adv mean {adv.mean():.1f} p99 {np.percentile(adv,99):.0f} "
            f"max {adv.max()}  blk-total mean {tot.mean():.1f} "
            f"p99 {np.percentile(tot,99):.0f} max {tot.max()}  "
            f"fetch/blk {nfetch.mean():.1f} grpscan/blk {ngrp.mean():.1f}  "
            f"hit% {hit.mean()*100:.0f}"
        )


if __name__ == "__main__":
    main()
