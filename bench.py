"""Benchmark harness: wall-clock to 512 spp at 1280×720 (BASELINE.md target:
< 10 s on one v5e chip for the example6 scene).

Prints ONE JSON line: {"metric": ..., "value": ..., "unit": ...,
"vs_baseline": ...} where vs_baseline = target(10 s) / measured — values
above 1.0 beat the target.

Notes:
  * On the tunneled TPU platform `block_until_ready` does not synchronize
    (PERF_NOTES.md); timing forces a device_get of a reduction.
  * By default the time to 512 spp is measured from a shorter run
    (--measure-spp) and scaled; pass --full to run all 512.
  * --scene example6 uses the flagship physical-sky scene; its one-time sky
    precompute is cached to disk and reported separately (the reference
    likewise excludes its 64-frame sky precompute from its per-1024-sample
    timer, scene.py:199-278).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def build_scene(name, res):
    import importlib
    import os

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "examples"))
    sys.argv = ["bench"]
    mod = importlib.import_module(name if name != "main" else "main")
    scene = mod.scene
    scene.config = scene.config.__class__(
        **{**scene.config.__dict__, "image_res": res}
    )
    if hasattr(mod, "initialize_voxels"):
        mod.initialize_voxels()
    elif hasattr(mod, "initialize"):
        mod.initialize()
        if hasattr(mod, "draw"):
            mod.draw()
    # Repeat calls get the module-cached Scene: drop any renderer built
    # under a previous caller's config (it is cached on first use and would
    # silently ignore config changes made after it materialized).
    scene._renderer = None
    return scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="example6",
                    help="example scene module (the BASELINE north star is example6)")
    ap.add_argument("--res", default="1280x720")
    ap.add_argument("--spp", type=int, default=512, help="target spp")
    ap.add_argument("--measure-spp", type=int, default=64)
    ap.add_argument("--full", action="store_true",
                    help="actually run all --spp samples")
    ap.add_argument("--out", default=None, help="optionally write the PNG")
    ap.add_argument("--cfg", nargs="*", default=[],
                    help="config overrides, e.g. sort_rays=False max_ray_depth=2")
    args = ap.parse_args()

    w, h = (int(x) for x in args.res.split("x"))

    import jax

    import voxelrt  # noqa: F401

    t_setup0 = time.perf_counter()
    scene = build_scene(args.scene, (w, h))
    import ast

    # Benchmark default: batch 16 samples per temporal frame (headless
    # progressive rendering; interactive sessions keep 1 for latency).
    # Post-SoA sweep: 43.6/38.6/37.95/38.9 ms/spp at spl 4/8/16/32.
    over = {"samples_per_launch": 16}
    for kv in args.cfg:
        k, v = kv.split("=", 1)
        try:
            over[k] = ast.literal_eval(v)
        except ValueError:
            over[k] = v
    scene.config = scene.config.__class__(
        **{**scene.config.__dict__, **over}
    )
    r = scene.renderer
    r.prepare_data()
    setup_s = time.perf_counter() - t_setup0

    from voxelrt.render import pipeline

    params = r._params(max_accum_frames=999999999.0)

    def sync():
        np.asarray(jax.device_get(r.state.color[0, 0]))

    n_measured = args.spp if args.full else min(args.measure_spp, args.spp)
    if n_measured < 64:
        # A single small timed dispatch carries residual overhead on the
        # tunneled chip (a depth-1 config measured 32.5 ms/spp at a 32-spp
        # window vs 12.6 real at 64+, PERF_NOTES round 3) — flag it.
        print("WARNING: measurement window < 64 spp overstates per-spp "
              "time; prefer --spp >= 64 or --full", file=sys.stderr)
    # 64 spp per dispatch: the per-dispatch overhead on the tunneled TPU is
    # ~26 ms (tools/chunk_scaling.py — 78.6/76.7/75.4/75.3 ms/spp at chunk
    # 8/16/64/128), amortized away by chunk 64. Matches headless.render's
    # default chunk (samples_per_launch * 8).
    chunk = min(64, n_measured)

    # Warmup / compile — must use the SAME static chunk size as the timed
    # loop (accumulate_n specializes on n).
    t0 = time.perf_counter()
    r.state = pipeline.accumulate_n(r.cfg, r.scene_data, params, r.state,
                                    jax.random.fold_in(r.key, 0), False, 1.0,
                                    chunk)
    sync()
    compile_s = time.perf_counter() - t0

    done = 0
    t0 = time.perf_counter()
    while done < n_measured:
        n = min(chunk, n_measured - done)
        r.state = pipeline.accumulate_n(
            r.cfg, r.scene_data, params, r.state,
            jax.random.fold_in(r.key, 1 + done), False, 1.0, n,
        )
        done += n
    sync()
    measured_s = time.perf_counter() - t0
    per_spp = measured_s / n_measured
    time_to_target = per_spp * args.spp

    # Auto-full: when the extrapolated total is short anyway, keep running
    # to the target spp so the recorded number is measured, not projected
    # (VERDICT r3: "record full-run benches only").
    full_run = args.full
    if not full_run and done < args.spp and time_to_target < 25.0:
        while done < args.spp:
            n = min(chunk, args.spp - done)
            r.state = pipeline.accumulate_n(
                r.cfg, r.scene_data, params, r.state,
                jax.random.fold_in(r.key, 1 + done), False, 1.0, n,
            )
            done += n
        sync()
        measured_s = time.perf_counter() - t0
        per_spp = measured_s / done
        time_to_target = measured_s
        n_measured = done
        full_run = True

    # Ray throughput: primary+NEE shadow rays per sample ≈ bounded estimate;
    # report conservative primary-only Mrays/s as auxiliary info.
    mrays = (w * h * args.spp / time_to_target) / 1e6

    if args.out:
        from voxelrt.utils.image import write_png

        write_png(args.out, r.fetch_image())

    info = dict(
        scene=args.scene,
        res=args.res,
        setup_s=round(setup_s, 3),
        compile_s=round(compile_s, 3),
        measured_spp=n_measured,
        per_spp_ms=round(per_spp * 1e3, 3),
        primary_mrays_per_s=round(mrays, 2),
        extrapolated=not full_run,
        backend=jax.devices()[0].platform,
    )
    print(json.dumps(info), file=sys.stderr)
    print(json.dumps({
        "metric": f"time_to_{args.spp}spp_{h}p",
        "value": round(time_to_target, 3),
        "unit": "s",
        "vs_baseline": round(10.0 / time_to_target, 4),
    }))


if __name__ == "__main__":
    main()
