"""Interactive-equivalent benchmark: animated camera path (BASELINE.json
config 5 — "ReSTIR reservoir-resampled direct lighting + blue-noise sampling
over an animated camera path").

Runs a scripted orbit+dolly path through an example scene with the
reference's motion policy active (render_scale 0.5, 50-frame accumulation
cap while moving — scene.py:209-228), optionally with ReSTIR-PT spatial
reuse enabled, and reports ms/frame.

    python tools/camera_path_bench.py [--scene example1] [--frames 24]
                                      [--restir] [--res 640x360]
"""

from __future__ import annotations

import argparse
import dataclasses
import importlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "examples")
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="example1")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--res", default="640x360")
    ap.add_argument("--restir", action="store_true")
    ap.add_argument("--out", default=None, help="write the final frame PNG")
    ap.add_argument("--cfg", nargs="*", default=[],
                    help="config overrides, e.g. motion_filter=catmullrom")
    ap.add_argument("--pipelined", action="store_true",
                    help="throughput mode: enqueue frames asynchronously and "
                         "sync once per phase (a real viewer fetches frames "
                         "out of band, so the per-frame device round-trip in "
                         "the default latency mode is tunnel overhead, not "
                         "render cost)")
    ap.add_argument("--sync-lag", type=int, default=0,
                    help="double-buffered latency mode: sync frame i-N "
                         "after dispatching frame i (display one frame "
                         "behind); wall_ms becomes time between frame "
                         "completions")
    args = ap.parse_args()
    w, h = (int(x) for x in args.res.split("x"))

    sys.argv = ["bench"]
    mod = importlib.import_module(args.scene)
    if hasattr(mod, "initialize_voxels"):
        mod.initialize_voxels()
    else:
        mod.initialize()
        if hasattr(mod, "draw"):
            mod.draw()
    scene = mod.scene
    scene.quiet = True
    import ast

    over = {}
    for kv in args.cfg:
        k_, v_ = kv.split("=", 1)
        try:
            over[k_] = ast.literal_eval(v_)
        except ValueError:
            over[k_] = v_
    scene.config = dataclasses.replace(
        scene.config, image_res=(w, h), use_restir_pt=args.restir, **over
    )

    if args.pipelined:
        # Throughput mode: each accumulate_n enqueues asynchronously (JAX
        # dispatch is async; state buffers chain on-device), so a viewer
        # that fetches frames out of band runs at COMPUTE throughput, not
        # at the per-frame host round-trip latency the default mode
        # measures (~34 ms fixed on this tunneled platform, PERF_NOTES.md).
        # One scalar sync per phase; the phase-transition framebuffer
        # reset between the split run_frames calls is elided (it is a
        # cheap zero-fill; per-frame FLOPs are identical either way).
        from voxelrt.utils.profiling import sync

        mv = {"orbit": (0.01, 0.002), "move_keys": ["w"], "dt": 0.02}
        st = {"dt": 0.02}
        scene.run_frames([mv] * 3 + [st] * 3, spp_per_frame=1,
                         fetch_final=False)  # compile both phases
        sync(scene.renderer.state.color)
        t0 = time.perf_counter()
        scene.run_frames([dict(mv)] * args.frames, spp_per_frame=1,
                         fetch_final=False)
        sync(scene.renderer.state.color)
        t1 = time.perf_counter()
        n_still = max(4, args.frames // 4)
        scene.run_frames([dict(st)] * n_still, spp_per_frame=1,
                         fetch_final=False)
        sync(scene.renderer.state.color)
        t2 = time.perf_counter()
        print(json.dumps({
            "metric": "camera_path_throughput_ms_per_frame",
            "value": round((t1 - t0) / args.frames * 1e3, 2),
            "unit": "ms",
            "still_ms_per_frame": round((t2 - t1) / n_still * 1e3, 2),
            "restir": args.restir,
            "res": args.res,
            "frames": args.frames + n_still,
        }))
        return

    # Orbit + dolly path, then hold still to accumulate.
    frames = []
    for i in range(args.frames):
        frames.append({"orbit": (0.01, 0.002), "move_keys": ["w"],
                       "dt": 0.02})
    frames += [{"dt": 0.02}] * max(4, args.frames // 4)

    # FrameStats (single-element sync per frame) rather than an on_frame
    # image callback: fetch_image device_gets the full frame through the
    # tunnel (~2.6 MB at 720p ≈ 500+ ms), which would swamp the render time
    # being measured. The viewer's real per-frame fetch cost is a display
    # transport property, not a renderer one.
    from voxelrt.utils.profiling import FrameStats

    stats = FrameStats(out=open(os.devnull, "w"))
    img = scene.run_frames(frames, spp_per_frame=1, stats=stats,
                           sync_lag=args.sync_lag)
    times = [row["wall_ms"] / 1e3 for row in stats.rows]
    if args.out:
        from voxelrt.utils.image import write_png

        write_png(args.out, img)

    # Skip the first frames of each phase (compile).
    moving = sorted(times[2:args.frames])
    still = sorted(times[args.frames + 2:])
    med = lambda xs: xs[len(xs) // 2] * 1e3 if xs else float("nan")
    print(json.dumps({
        "metric": "camera_path_ms_per_frame",
        "value": round(med(moving), 2),
        "unit": "ms",
        "still_ms_per_frame": round(med(still), 2),
        "restir": args.restir,
        "res": args.res,
        "frames": len(times),
        "sync_lag": args.sync_lag,
        "final_mean": float(np.asarray(img).mean()),
    }))


if __name__ == "__main__":
    main()
