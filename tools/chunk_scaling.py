"""Measure per-dispatch overhead: time accumulate_n at several chunk sizes.

If per-spp wall time falls as the chunk (samples per jit dispatch) grows,
the frame is dominated by per-dispatch overhead (host->tunnel->TPU launch +
argument plumbing on the experimental 'axon' platform), not device compute —
which changes where perf work should go.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="example6")
    ap.add_argument("--res", default="1280x720")
    ap.add_argument("--chunks", type=int, nargs="*", default=[8, 16, 64, 128])
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import numpy as np

    from bench import build_scene
    from voxelrt.render import pipeline

    w, h = (int(x) for x in args.res.split("x"))
    scene = build_scene(args.scene, (w, h))
    scene.config = scene.config.__class__(
        **{**scene.config.__dict__, "samples_per_launch": 8}
    )
    r = scene.renderer
    r.prepare_data()
    params = r._params(max_accum_frames=999999999.0)

    def sync():
        np.asarray(jax.device_get(r.state.color[0, 0]))

    print(f"{'chunk':>6} {'compile_s':>10} {'per_spp_ms':>11}")
    for chunk in args.chunks:
        t0 = time.perf_counter()
        r.state = pipeline.accumulate_n(
            r.cfg, r.scene_data, params, r.state,
            jax.random.fold_in(r.key, chunk), False, 1.0, chunk,
        )
        sync()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(args.reps):
            r.state = pipeline.accumulate_n(
                r.cfg, r.scene_data, params, r.state,
                jax.random.fold_in(r.key, 100 + chunk + i), False, 1.0, chunk,
            )
        sync()
        dt = time.perf_counter() - t0
        print(f"{chunk:>6} {compile_s:>10.1f} {dt / (args.reps * chunk) * 1e3:>11.2f}")


if __name__ == "__main__":
    main()
