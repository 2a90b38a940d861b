"""Capture a device-op time profile of the progressive render step.

Runs bench.py's scene setup, warms the jitted accumulate, then records a
jax.profiler trace around a few launches and prints the top HLO ops by
self time — the measurement tool behind the frame-decomposition rows in
PERF_NOTES.md (what the reference gets from Taichi's scoped profiler,
/root/reference/scene.py:296).

Usage: python tools/profile_frame.py [--scene example6] [--res 1280x720]
           [--launches 4] [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="example6")
    ap.add_argument("--res", default="1280x720")
    ap.add_argument("--launches", type=int, default=4)
    ap.add_argument("--spl", type=int, default=8,
                    help="samples_per_launch (bench.py uses 8)")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default="/tmp/voxelrt_profile")
    ap.add_argument("--cfg", nargs="*", default=[],
                    help="RenderConfig overrides, key=value (ast literals)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_scene
    from voxelrt.render import pipeline

    w, h = (int(x) for x in args.res.split("x"))
    scene = build_scene(args.scene, (w, h))
    import ast

    over = {"samples_per_launch": args.spl}
    for kv in args.cfg:
        k, v = kv.split("=", 1)
        try:
            over[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            over[k] = v
    scene.config = scene.config.__class__(
        **{**scene.config.__dict__, **over}
    )
    r = scene.renderer
    r.prepare_data()
    params = r._params(max_accum_frames=999999999.0)
    n = r.cfg.samples_per_launch

    def launch():
        r.state = pipeline.accumulate_n(
            r.cfg, r.scene_data, params, r.state,
            jax.random.fold_in(r.key, r._frame), False, 1.0, n,
        )
        r._frame += n

    launch()  # compile
    np.asarray(jax.device_get(r.state.spp))

    with jax.profiler.trace(args.logdir):
        for _ in range(args.launches):
            launch()
        np.asarray(jax.device_get(jnp.sum(r.state.color)))

    paths = sorted(glob.glob(os.path.join(args.logdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        print("no xplane.pb produced — device tracing unsupported here?")
        return
    path = paths[-1]
    print(f"trace: {path}")
    report_top_ops(path, args.top)


def report_top_ops(xplane_path: str, top: int):
    """Aggregate device-op self times out of an xplane proto."""
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplane_path], "framework_op_stats", {})
    import gzip
    import json

    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    try:
        tables = json.loads(data)
    except json.JSONDecodeError:
        print(data[:2000])
        return
    # framework_op_stats returns a list of tables; the first is by-op.
    rows = []
    tbl = tables[0] if isinstance(tables, list) else tables
    cols = [c["label"] if isinstance(c, dict) else c for c in tbl.get("cols", [])]
    for rrow in tbl.get("rows", []):
        vals = [c.get("v") for c in rrow.get("c", [])]
        rows.append(dict(zip(cols, vals)))
    if not rows:
        print(json.dumps(tables)[:2000])
        return

    rows = [r_ for r_ in rows if r_.get("Host/device") == "Device"]
    rows.sort(key=lambda r: -float(r.get("Total self-time (us)") or 0))
    print(f"{'self_us':>12}  {'avg_us':>10}  {'occ':>6}  type / op")
    for r_ in rows[:top]:
        self_us = float(r_.get("Total self-time (us)") or 0)
        occ = float(r_.get("#Occurrences") or 1)
        name = str(r_.get("Operation Name") or "?")
        typ = str(r_.get("Operation Type") or "?")
        print(f"{self_us:12.0f}  {self_us/max(occ,1):10.1f}  {occ:6.0f}  "
              f"{typ[:20]} {name[:100]}")


if __name__ == "__main__":
    main()
