"""Shared CLI plumbing for the example scenes.

Each example mirrors its reference counterpart (example1..10.py, main.py):
same Scene parameters, same geometry generation logic (ported from the
user-authored @ti.kernel bodies to vectorized numpy), same materials. Run
any example with:

    python examples/exampleN.py [--spp 64] [--res 1280x720] [--out path.png]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(scene, name, argv=None, default_spp=64):
    ap = argparse.ArgumentParser(description=f"voxelrt example: {name}")
    ap.add_argument("--spp", type=int, default=default_spp)
    ap.add_argument("--res", type=str, default=None,
                    help="WxH (default from scene config)")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)
    out = args.out or os.path.join("screenshot", f"{name}.png")
    return scene.finish(spp=args.spp, out_path=out)


def make_scene(argv=None, **scene_kwargs):
    """Build a Scene honoring a --res override before construction."""
    from voxelrt import Scene

    res = None
    argv = argv if argv is not None else sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--res" and i + 1 < len(argv):
            res = argv[i + 1]
        elif a.startswith("--res="):
            res = a.split("=", 1)[1]
    if res:
        w, h = res.lower().split("x")
        scene_kwargs["image_res"] = (int(w), int(h))
    return Scene(**scene_kwargs)


def grid3(x0, x1, y0, y1, z0, z1):
    """Integer lattice of an ndrange box -> (N, 3) array."""
    ii, jj, kk = np.meshgrid(
        np.arange(x0, x1), np.arange(y0, y1), np.arange(z0, z1), indexing="ij"
    )
    return np.stack([ii.ravel(), jj.ravel(), kk.ravel()], axis=-1)


def grid2(x0, x1, y0, y1):
    ii, jj = np.meshgrid(np.arange(x0, x1), np.arange(y0, y1), indexing="ij")
    return np.stack([ii.ravel(), jj.ravel()], axis=-1)
