"""Observability: structured per-frame stats + profiling hooks (SURVEY.md §5).

The reference's telemetry is print-based (wall-clock per 1024 samples,
scene.py:274-278; camera pose prints). Here:

  * :class:`FrameStats` — per-frame structured records (spp, wall ms,
    rays/s estimate) emitted to stdout or CSV.
  * :func:`trace` — context manager wrapping ``jax.profiler`` traces for
    xprof, plus wall-clock timing that works on the tunneled TPU platform
    (where block_until_ready does not synchronize — PERF_NOTES.md).
"""

from __future__ import annotations

import contextlib
import csv
import sys
import time


class FrameStats:
    def __init__(self, out=None, csv_path=None):
        self.out = out if out is not None else sys.stdout
        self.rows = []
        self.csv_path = csv_path
        self._csv = None
        self._fh = None
        if csv_path:
            self._fh = open(csv_path, "w", newline="")
            self._csv = csv.writer(self._fh)
            self._csv.writerow(["frame", "spp", "wall_ms", "mrays_per_s",
                                "moving"])
            self._fh.flush()

    def record(self, frame, spp, wall_ms, n_rays=None, quiet=False,
               moving=False):
        mrays = (n_rays / wall_ms / 1e3) if (n_rays and wall_ms) else 0.0
        row = dict(frame=frame, spp=spp, wall_ms=round(wall_ms, 3),
                   mrays_per_s=round(mrays, 2), moving=bool(moving))
        self.rows.append(row)
        if self._csv:
            self._csv.writerow([frame, spp, row["wall_ms"],
                                row["mrays_per_s"], int(row["moving"])])
            self._fh.flush()
        if not quiet:
            print(f"[frame {frame}] spp={spp} {wall_ms:.1f} ms "
                  f"({mrays:.1f} Mrays/s)", file=self.out)
        return row


def sync(x):
    """Force completion (device_get of a tiny slice) — block_until_ready is
    a no-op on the tunneled axon platform."""
    import jax
    import numpy as np

    leaf = jax.tree.leaves(x)[0]
    return np.asarray(jax.device_get(leaf.ravel()[0]))


@contextlib.contextmanager
def trace(label="voxelrt", log_dir=None):
    """jax.profiler trace (when log_dir given) + wall clock."""
    import jax

    t0 = time.perf_counter()
    if log_dir:
        with jax.profiler.trace(log_dir):
            yield
    else:
        yield
    dt = time.perf_counter() - t0
    print(f"[trace] {label}: {dt * 1e3:.1f} ms", file=sys.stderr)
