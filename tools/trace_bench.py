"""Traversal-kernel microbenchmark: Mrays/s on renderer-shaped ray loads.

Ray sets mirror what render/pipeline.py actually dispatches (16×8 screen-tile
ray order, BLOCK_RAYS consecutive rays = one 128×64-pixel macro tile):
  * primary  — camera rays, tile order
  * bounce   — cosine-hemisphere rays from the primary hit points
  * shadow   — sun-cone rays from the primary hit points (any-hit mode)
  * random   — uniform origins/directions (pathological stress case)

Methodology per PERF_NOTES.md: the tunneled TPU's block_until_ready does not
synchronize and every dispatch carries ~34 ms fixed overhead, so the kernel
runs R times inside ONE jitted fori_loop (inputs perturbed per iteration to
defeat CSE) and timing forces a device_get of a reduction. Rates are slopes:
(t(R2) - t(R1)) / (R2 - R1).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def tile_order(w, h, tw=16, th=8):
    """Pixel index permutation matching render/pipeline._pixel_grid."""
    u = np.arange(w)
    v = np.arange(h)
    uu = (u[:, None] // tw) * tw
    tx, ty = np.meshgrid(np.arange(w // tw), np.arange(h // th), indexing="ij")
    i, j = np.meshgrid(np.arange(tw), np.arange(th), indexing="ij")
    uu = (tx[:, :, None, None] * tw + i[None, None, :, :]).reshape(-1)
    vv = (ty[:, :, None, None] * th + j[None, None, :, :]).reshape(-1)
    return uu, vv


def build_scene(res, rng):
    mat = np.zeros((res, res, res), np.int8)
    mat[:, 62:64, :] = 1  # floor slab
    for _ in range(40):
        x, z = rng.integers(4, res - 12, 2)
        w, d_ = rng.integers(3, 9, 2)
        h = rng.integers(4, 40)
        mat[x : x + w, 64 : 64 + h, z : z + d_] = 1
    return mat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--scene", default=None,
                    help="load an examples/ scene (e.g. example6) instead of the synthetic one")
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--cadence", type=int, nargs="*", default=[2])
    ap.add_argument("--rows", type=int, default=8,
                    help="block_rows: sublane rows of rays per kernel block")
    ap.add_argument("--sorted", action="store_true")
    ap.add_argument("--debug", action="store_true",
                    help="per-block traversal profile (debug_totals kernel): "
                         "while-loop iterations, fetch rounds, distinct mask "
                         "groups scanned — run on the ray classes instead of "
                         "timing them")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--queue", type=int, default=1,
                    help="queue_depth: rays per lane slot (queued wavefront)")
    ap.add_argument("--refill", type=int, default=4,
                    help="refill cadence for the queued wavefront")
    ap.add_argument("--unroll", type=int, default=1,
                    help="march_unroll: grid advances per loop iteration")
    ap.add_argument("--resolve-steps", type=int, default=9,
                    help="in-cell DDA unroll length (resumable; 9 = whole "
                         "cell in one fetch)")
    ap.add_argument("--noxslab", action="store_true",
                    help="disable the candidate-B X-slab skip (A/B its "
                         "per-iteration cost)")
    ap.add_argument("--sun", action="store_true",
                    help="bake the sun-open table and bench shadow rays "
                         "with the use_sun_open early-out")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    import jax
    import jax.numpy as jnp

    from voxelrt.ops.accel import build_pallas_tables
    from voxelrt.ops.dda_pallas import raytrace_pallas

    res = args.res
    rng = np.random.default_rng(0)
    if args.scene:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))))
        import bench as bench_mod

        sc = bench_mod.build_scene(args.scene, (320, 180))
        world = sc.world
        arrays = world.device_arrays()
        mat = world.material
        res = world.grid_res
        tables = build_pallas_tables(mat, np.asarray(arrays["voxels"]), res)
        print(f"scene {args.scene}: {int((mat != 0).sum())} voxels")
    else:
        mat = build_scene(res, rng)
        colors = rng.integers(0, 1 << 24, res**3, dtype=np.uint32) | (
            np.uint32(1) << 24
        )
        tables = build_pallas_tables(mat, colors, res)

    # primary rays: 1280×720-style camera, tile order
    w, h = 1280, 720
    if args.scene:
        # scene camera pose, world → grid units (pathtracer world_to_voxel)
        inv = 1.0 / sc.config.voxel_dx
        off = sc.config.grid_offset
        eye = (np.asarray(sc.camera.position, np.float32) * inv - off)
        target = (np.asarray(sc.camera.look_at, np.float32) * inv - off)
        fwd = target - eye
    else:
        eye = np.array([-res * 0.6, res * 0.9, -res * 0.5], np.float32)
        fwd = np.array([res / 2, res * 0.45, res / 2], np.float32) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    uu, vv = tile_order(w, h)
    px = (uu + 0.5) / w - 0.5
    py = (vv + 0.5) / h - 0.5
    d_pri = (
        fwd[None] + (0.9 * px)[:, None] * right[None] + (0.9 * py * h / w)[:, None] * up[None]
    ).astype(np.float32)
    d_pri /= np.linalg.norm(d_pri, axis=1, keepdims=True)
    o_pri = np.broadcast_to(eye, d_pri.shape).astype(np.float32).copy()
    m = d_pri.shape[0]

    r = raytrace_pallas(tables, jnp.asarray(o_pri), jnp.asarray(d_pri),
                        1e-6, jnp.inf, res)
    t = np.asarray(jax.device_get(r.distance)).copy()
    nrm = np.asarray(jax.device_get(r.normal)).copy()
    hitm = np.isfinite(t)
    print(f"primary hit fraction: {hitm.mean():.2f}")
    # bounce origins: hit point + eps*normal; misses re-use a neighbor hit
    tt = np.where(hitm, t, 0.0)
    hp = o_pri + d_pri * tt[:, None] + nrm * 1e-3
    fill = np.where(hitm)[0][
        rng.integers(0, hitm.sum(), m)
    ]
    hp[~hitm] = hp[fill[~hitm]]
    nrm[~hitm] = nrm[fill[~hitm]]

    # cosine-hemisphere bounce dirs around the normal
    zs = rng.random(m).astype(np.float32)
    phi = rng.random(m).astype(np.float32) * 2 * np.pi
    sq = np.sqrt(zs)
    local = np.stack(
        [np.cos(phi) * np.sqrt(1 - zs), np.sin(phi) * np.sqrt(1 - zs), sq], -1
    )
    tang = np.cross(nrm, [0.123, 0.91, 0.31]); tang /= np.maximum(
        np.linalg.norm(tang, axis=1, keepdims=True), 1e-9)
    bit = np.cross(nrm, tang)
    d_bnc = (local[:, 0:1] * tang + local[:, 1:2] * bit + local[:, 2:3] * nrm)
    # missed-primary rows have nrm = 0 -> zero-length d_bnc; keep them
    # finite (they are masked out of the bounce set below)
    d_bnc = (d_bnc / np.maximum(
        np.linalg.norm(d_bnc, axis=1, keepdims=True), 1e-9)).astype(np.float32)

    if args.scene and args.sun:
        sun = np.asarray(sc._light_direction, np.float32)
        cone_cos = float(sc._light_cone_cos_theta_max)
    else:
        sun = np.array([0.45, 0.8, 0.4], np.float32)
        cone_cos = float(np.cos(0.06 * 0.5))
    sun /= np.linalg.norm(sun)
    # cone-sampled sun dirs (must stay inside the cone for --sun soundness)
    ct = 1.0 - rng.random(m) * (1.0 - cone_cos)
    st = np.sqrt(np.maximum(0.0, 1.0 - ct**2))
    ph = rng.random(m) * 2 * np.pi
    t1_ = np.cross(sun, [0.123, 0.91, 0.31]); t1_ /= np.linalg.norm(t1_)
    t2_ = np.cross(sun, t1_)
    d_sh = (ct[:, None] * sun + (st * np.cos(ph))[:, None] * t1_
            + (st * np.sin(ph))[:, None] * t2_)
    d_sh = (d_sh / np.linalg.norm(d_sh, axis=1, keepdims=True)).astype(np.float32)
    if args.sun:
        from voxelrt.ops.accel import add_sun_open_table

        tables = add_sun_open_table(tables, mat, sun, cone_cos)
        nb_open = int(np.unpackbits(
            np.asarray(tables.sun_open_words).view(np.uint8)).sum())
        print(f"sun-open cells: {nb_open}")

    o_rnd = rng.uniform(2, res - 2, (m, 3)).astype(np.float32)
    d_rnd = rng.normal(size=(m, 3)).astype(np.float32)
    d_rnd /= np.linalg.norm(d_rnd, axis=1, keepdims=True)

    def bench(name, o, d, any_hit, cadence=2, colors=None, sun_open=False):
        o = jnp.asarray(o)
        d = jnp.asarray(d)
        fetch_c = (not any_hit) if colors is None else colors

        @functools.partial(jax.jit, static_argnames=("reps",))
        def run(o, d, reps: int):
            def body(i, acc):
                oo = o.at[:, 1].add(i.astype(jnp.float32) * 1e-5)
                r = raytrace_pallas(
                    tables, oo, d, 1e-6, jnp.inf, res,
                    fetch_colors=fetch_c, any_hit=any_hit,
                    use_sun_open=sun_open,
                    use_xslab=not args.noxslab,
                    resolve_steps=args.resolve_steps,
                    queue_depth=args.queue, refill_every=args.refill,
                    march_unroll=args.unroll,
                    fetch_cadence=cadence, interpret=args.interpret,
                    block_rows=args.rows,
                )
                return acc + jnp.sum(jnp.isfinite(r.distance)) + jnp.sum(r.iters)

            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

        r1, r2 = (1, 3) if args.interpret else (2, 10)
        _ = int(jax.device_get(run(o, d, r1)))
        _ = int(jax.device_get(run(o, d, r2)))
        t0 = time.perf_counter()
        v1 = int(jax.device_get(run(o, d, r1)))
        t1 = time.perf_counter()
        v2 = int(jax.device_get(run(o, d, r2)))
        t2 = time.perf_counter()
        dt = (t2 - t1) - (t1 - t0)
        rate = m * (r2 - r1) / dt / 1e6 if dt > 0 else float("nan")
        print(f"{name:16s} {rate:9.1f} Mrays/s   (checksum {v2})", flush=True)
        return rate

    # sorted-path variant: realistic alive mask (primary hits), routed via
    # pathtracer._trace_voxels_sorted
    def bench_sorted(name, o, d, any_hit, mask):
        from voxelrt.config import RenderConfig
        from voxelrt.render.pathtracer import _trace_voxels_sorted

        cfg = RenderConfig(grid_res=res, use_pallas_dda=True,
                           dda_block_rows=args.rows)
        o = jnp.asarray(o); d = jnp.asarray(d)
        mk = jnp.asarray(mask)

        @functools.partial(jax.jit, static_argnames=("reps",))
        def run(o, d, reps: int):
            def body(i, acc):
                oo = o.at[:, 1].add(i.astype(jnp.float32) * 1e-5)
                r = _trace_voxels_sorted(cfg, tables, oo, d, 1e-6, mk, any_hit)
                return acc + jnp.sum(jnp.isfinite(r.distance)) + jnp.sum(r.iters)
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

        r1, r2 = 2, 10
        _ = int(jax.device_get(run(o, d, r1)))
        _ = int(jax.device_get(run(o, d, r2)))
        t0 = time.perf_counter(); int(jax.device_get(run(o, d, r1)))
        t1 = time.perf_counter(); int(jax.device_get(run(o, d, r2)))
        t2 = time.perf_counter()
        dt = (t2 - t1) - (t1 - t0)
        rate = m * (r2 - r1) / dt / 1e6 if dt > 0 else float("nan")
        print(f"{name:16s} {rate:9.1f} Mrays/s (incl dead lanes)", flush=True)
        return rate

    if args.debug:
        from voxelrt.ops.dda_pallas import _morton3 as morton3

        def debug(name, o, d, any_hit, sort=False):
            o = np.asarray(o); d = np.asarray(d)
            if sort:
                cx = np.clip(o[:, 0].astype(np.int32) >> 2, 0, res // 4 - 1)
                cy = np.clip(o[:, 1].astype(np.int32) >> 2, 0, res // 4 - 1)
                cz = np.clip(o[:, 2].astype(np.int32) >> 2, 0, res // 4 - 1)
                oct_ = ((d[:, 0] > 0) + 2 * (d[:, 1] > 0)
                        + 4 * (d[:, 2] > 0)).astype(np.int32)
                key = (np.asarray(jax.device_get(
                    morton3(jnp.asarray(cx), jnp.asarray(cy),
                            jnp.asarray(cz)))) << 3) | oct_
                order = np.argsort(key, kind="stable")
                o, d = o[order], d[order]
            r = raytrace_pallas(
                tables, jnp.asarray(o), jnp.asarray(d), 1e-6, jnp.inf, res,
                fetch_colors=not any_hit, any_hit=any_hit,
                interpret=args.interpret, block_rows=args.rows,
                debug_totals=True,
            )
            enc = np.asarray(jax.device_get(r.iters))
            blocks = enc.reshape(-1, args.rows * 128)[:, 0]
            total = blocks & 1023
            nfetch = (blocks >> 10) & 1023
            nslab = blocks >> 20
            def q(x):
                return (f"mean {x.mean():7.1f}  p50 {np.percentile(x, 50):5.0f}"
                        f"  p90 {np.percentile(x, 90):5.0f}  max {x.max():5.0f}")
            print(f"{name}: {len(blocks)} blocks")
            print(f"  loop iters   {q(total)}")
            print(f"  fetch rounds {q(nfetch)}")
            print(f"  color slabs  {q(nslab)}")

        debug("primary (tile order)", o_pri, d_pri, False)
        debug("bounce (tile order)", hp, d_bnc, False)
        debug("bounce (morton-sorted)", hp, d_bnc, False, sort=True)
        debug("shadow anyhit (morton-sorted)", hp, d_sh, True, sort=True)
        debug("random", o_rnd, d_rnd, False)
        return

    results = {}
    if args.sorted:
        bench_sorted("bounce_sorted", hp.astype(np.float32), d_bnc, False, hitm)
        bench_sorted("shadow_sorted", hp.astype(np.float32), d_sh, True, hitm)
        bench_sorted("bounce_sort_all", hp.astype(np.float32), d_bnc, False,
                     np.ones(m, bool))
    for cad in args.cadence:
        print(f"--- fetch_cadence={cad}")
        results["primary"] = bench("primary", o_pri, d_pri, False, cad)
        results["bounce"] = bench("bounce", hp.astype(np.float32), d_bnc, False, cad)
        results["bounce_nocol"] = bench("bounce_nocol", hp.astype(np.float32),
                                        d_bnc, False, cad, colors=False)
        results["shadow_anyhit"] = bench("shadow_anyhit", hp.astype(np.float32), d_sh, True, cad)
        if args.sun:
            results["shadow_sun"] = bench(
                "shadow_sun", hp.astype(np.float32), d_sh, True, cad,
                sun_open=True)
        results["random"] = bench("random", o_rnd, d_rnd, False, cad)
        print({k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
