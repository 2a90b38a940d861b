"""Pose-match a reference render (demo2.jpg) and report RMSE/PSNR.

The reference repo ships no harness and taichi is not installable in this
container (zero egress), so parity is measured against the repo's own
committed renders (README.md:3-9: demo2.jpg is `python3 example6.py`). The
camera pose of those interactive screenshots is unrecorded; this tool
grid-searches an orbit (azimuth, elevation, distance, fov) around the scene
center, scores each render against the downscaled reference, refines, and
reports final error metrics at the best pose.

Caveats recorded in the output: the reference image is JPEG (lossy), its
example6 foliage is placed with `ti.random()` so leaf-level geometry cannot
match any reimplementation, and the screenshot pose/fov are approximate.

Usage: python tools/pose_match.py [--spp 64] [--res 318] [--out /tmp/pose]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def downscale(img, w, h):
    """Box-filter downscale via PIL."""
    from PIL import Image

    pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    return np.asarray(pil.resize((w, h), Image.LANCZOS)).astype(np.float32) / 255.0


def score(img, ref, gain_fit=True):
    """RMSE after an optional scalar gain fit (absorbs exposure/tonemap
    differences between the JPEG screenshot and our PNG pipeline)."""
    a = img.reshape(-1, 3)
    b = ref.reshape(-1, 3)
    g = 1.0
    if gain_fit:
        g = float((a * b).sum() / max((a * a).sum(), 1e-9))
        g = min(max(g, 0.5), 2.0)
    return float(np.sqrt(np.mean((a * g - b) ** 2))), g


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference/demo2.jpg")
    ap.add_argument("--scene", default="example6")
    ap.add_argument("--res", type=int, default=318, help="search render width")
    ap.add_argument("--spp", type=int, default=64, help="final render spp")
    ap.add_argument("--search-spp", type=int, default=8)
    ap.add_argument("--out", default="/tmp/pose_match")
    ap.add_argument("--dists", default="2.2,3.0,3.8",
                    help="stage-1 orbit distances")
    ap.add_argument("--els", default="10,20,30",
                    help="stage-1 elevations (deg)")
    ap.add_argument("--no-sky", action="store_true",
                    help="disable the physical sky (demo.jpg's older config)")
    ap.add_argument("--background", default=None,
                    help="r,g,b background color override")
    args = ap.parse_args()

    from PIL import Image

    ref_full = np.asarray(Image.open(args.ref)).astype(np.float32) / 255.0
    rh, rw = ref_full.shape[:2]
    aspect = rw / rh
    sw = args.res
    sh = int(round(sw / aspect))
    # (H, W, 3) rows -> the renderer's (W, H, 3) v-up convention
    ref_small = downscale(ref_full, sw, sh)[::-1].transpose(1, 0, 2).copy()

    import jax

    import bench as bench_mod
    from voxelrt.render import pipeline

    scene = bench_mod.build_scene(args.scene, (sw, sh))
    if args.no_sky:
        scene.set_use_physical_sky(False)
        scene.set_use_clouds(False)
    if args.background:
        scene.set_background_color(tuple(
            float(x) for x in args.background.split(",")))
    r = scene.renderer
    r.prepare_data()

    center = np.array([0.0, -0.2, 0.0], np.float32)

    def render(az, el, dist, fov_deg, spp):
        azr, elr = np.radians(az), np.radians(el)
        pos = center + dist * np.array(
            [np.cos(elr) * np.sin(azr), np.sin(elr), np.cos(elr) * np.cos(azr)],
            np.float32,
        )
        scene.camera.set_pose(pos, center)
        scene._fov = np.radians(fov_deg)
        r.state = pipeline.init_state(r.cfg)
        params = r._params(max_accum_frames=1e9)
        r.state = pipeline.accumulate_n(
            r.cfg, r.scene_data, params, r.state, jax.random.fold_in(r.key, 5),
            False, 1.0, spp,
        )
        return np.asarray(jax.device_get(r.fetch_image()))

    t0 = time.perf_counter()
    best = (1e9, None)
    for az in range(0, 360, 15):
        for el in tuple(float(x) for x in args.els.split(",")):
            for dist in tuple(float(x) for x in args.dists.split(",")):
                img = render(az, el, dist, 50.0, args.search_spp)
                s, g = score(img, ref_small)
                if s < best[0]:
                    best = (s, (az, el, dist, 50.0, g))
                    print(f"  best so far: rmse={s:.4f} az={az} el={el} "
                          f"dist={dist} ({time.perf_counter()-t0:.0f}s)",
                          flush=True)
    print("stage1:", best)

    for rnd in range(2):
        az0, el0, d0, fov0, _ = best[1]
        for az in (az0 - 8, az0 - 4, az0, az0 + 4, az0 + 8):
            for el in (el0 - 4, el0, el0 + 4):
                for dist in (d0 - 0.3, d0, d0 + 0.3):
                    for fov in (40.0, 45.0, 50.0, 55.0):
                        img = render(az, el, dist, fov, args.search_spp)
                        s, g = score(img, ref_small)
                        if s < best[0]:
                            best = (s, (float(az), float(el), float(dist),
                                        fov, g))
        print("refine:", best, flush=True)

    az, el, dist, fov, gain = best[1]
    final = render(az, el, dist, fov, args.spp)
    rmse, g = score(final, ref_small)
    mse = rmse**2
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    # sky-only metric (top of frame is pure sky+clouds, independent of the
    # ti.random() foliage geometry); v-up ⇒ top = high v indices
    sky = slice(sh - sh // 5, sh)
    sky_rmse, _ = score(final[:, sky], ref_small[:, sky], gain_fit=False)

    os.makedirs(args.out, exist_ok=True)
    from voxelrt.utils.image import write_png

    write_png(os.path.join(args.out, "ours.png"), final)
    write_png(os.path.join(args.out, "ref.png"), ref_small)
    result = dict(
        ref=args.ref, scene=args.scene, pose=dict(
            azimuth_deg=az, elevation_deg=el, distance=dist, fov_deg=fov,
            look_at=[float(x) for x in center],
        ),
        gain=g, rmse=rmse, psnr_db=float(psnr), sky_rmse=sky_rmse,
        res=[sw, sh], spp=args.spp,
    )
    print(json.dumps(result, indent=2))
    with open(os.path.join(args.out, "result.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
