"""Re-seed the shipped XLA compile cache (data/xlacache/) for cold start.

The repo ships the flagship pipeline's compiled executables the same way it
ships the flagship skybox (data/skycache/): a cold machine then pays cache
DESERIALIZATION instead of a cold remote-server compile (~400 s measured in
round 3). Any change to the traversal kernel's static signature invalidates
the entries, so this tool must be re-run after the last kernel change of a
session:

    python tools/seed_xlacache.py

It renders the flagship benchmark config once against a FRESH cache
directory (so only the entries that config actually needs are produced —
stale variants would only slow deserialization on cold machines), then
replaces data/xlacache/ with the result.
"""

import os
import shutil
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    fresh = tempfile.mkdtemp(prefix="voxelrt_xla_seed_")
    env = dict(os.environ, VOXELRT_XLA_CACHE=fresh)
    # The flagship bench path compiles exactly the production pipeline
    # (64-spp accumulate chunks + fetch + setup helpers). 1 spp measured is
    # enough — compilation, not sampling, is the product here.
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py"), "--spp", "64",
         "--measure-spp", "64", "--full"],
        env=env, cwd=ROOT,
    )
    if proc.returncode != 0:
        raise SystemExit(f"bench failed (rc={proc.returncode}); cache not reseeded")
    entries = [f for f in os.listdir(fresh) if f.endswith("-cache")]
    if not entries:
        raise SystemExit("no cache entries produced; is the persistent cache enabled?")
    dst = os.path.join(ROOT, "data", "xlacache")
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)
    total = 0
    for f in entries:
        shutil.copy(os.path.join(fresh, f), dst)
        total += os.path.getsize(os.path.join(dst, f))
    print(f"seeded {len(entries)} entries, {total / 1e6:.1f} MB -> {dst}")
    shutil.rmtree(fresh, ignore_errors=True)


if __name__ == "__main__":
    main()
