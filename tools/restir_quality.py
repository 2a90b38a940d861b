"""ReSTIR-PT low-spp quality measurement (the feature's purpose: better
images from 1-4 samples than plain path tracing, renderer/pathtracer.py:
815-989). Renders a scene converged (restir OFF, many spp), then compares
low-spp renders with ReSTIR on vs off against it by tonemapped-image RMSE.

Run on the TPU:  python tools/restir_quality.py --scene example1
"""

import argparse
import dataclasses
import json
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="example1")
    ap.add_argument("--res", default="1280x720")
    ap.add_argument("--ref-spp", type=int, default=256)
    ap.add_argument("--spp", type=int, nargs="*", default=[1, 2, 4])
    args = ap.parse_args()
    w, h = (int(x) for x in args.res.split("x"))

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    def render(restir, spp, seed=0):
        scene = bench.build_scene(args.scene, (w, h))
        # bench.build_scene returns the module-cached Scene on repeat calls;
        # drop its cached renderer so every render is a fresh accumulation
        # under the CURRENT config.
        scene._renderer = None
        # explicit on BOTH paths: the module-cached scene's config keeps
        # the previous render's value otherwise
        # candidates use 1 sample/launch on BOTH paths (a launch renders
        # a full samples_per_launch batch, so 8 would silently round a
        # 1-spp request up to 8); the converged reference batches by 8.
        over = dict(use_restir_pt=restir,
                    samples_per_launch=8 if spp >= 8 else 1)
        scene.config = dataclasses.replace(scene.config, **over)
        if seed:
            import jax

            scene.renderer.key = jax.random.PRNGKey(seed)
        return np.asarray(scene.finish(spp=spp, save=False))

    # The reference render uses an INDEPENDENT seed: with a shared seed the
    # low-spp candidates are correlated with the reference's first launches
    # (they share sample streams), which deflates their RMSE.
    ref = render(False, args.ref_spp, seed=9876)
    rows = []
    import time

    for spp in args.spp:
        render(False, spp)  # warm the jit for this config (time render only)
        t0 = time.perf_counter()
        off = render(False, spp)
        t_off = time.perf_counter() - t0
        render(True, spp)
        t0 = time.perf_counter()
        on = render(True, spp)
        t_on = time.perf_counter() - t0
        r_off = float(np.sqrt(np.mean((off - ref) ** 2)))
        r_on = float(np.sqrt(np.mean((on - ref) ** 2)))
        # Quality per second: how much plain-PT RMSE the same wall buys vs
        # what ReSTIR delivers. RMSE ~ 1/sqrt(spp) ~ 1/sqrt(wall), so
        # plain at ReSTIR's wall would reach r_off*sqrt(t_off/t_on); the
        # ratio of that to r_on is the honest equal-time quality gain.
        eq_time_gain = r_off * np.sqrt(t_off / max(t_on, 1e-9)) / max(r_on, 1e-9)
        rows.append(dict(spp=spp, rmse_plain=round(r_off, 4),
                         rmse_restir=round(r_on, 4),
                         gain=round(r_off / max(r_on, 1e-9), 3),
                         wall_plain_s=round(t_off, 2),
                         wall_restir_s=round(t_on, 2),
                         equal_time_gain=round(float(eq_time_gain), 3)))
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps(dict(scene=args.scene, res=args.res,
                          ref_spp=args.ref_spp, rows=rows)))


if __name__ == "__main__":
    main()
