"""Micro-benchmark: the deferred-sky UNROUTE step — 3-column lax.sort vs
scatter-based inverse permutation (sky/atmos.py routes escape fetches by a
texel-key sort and must restore ray order afterwards; the route/unroute
sorts measured 4.45 ms/spp of the 31 ms/spp flagship frame, round 5
profiler). The unroute input is (sidx = the route sort's permutation of
iota, payload words); candidates:

  A. lax.sort([sidx, w0, w1])           (the shipped form)
  B. out.at[sidx].set(w)                (one scatter per payload)
  C. inv = zeros.at[sidx].set(iota); out = w[inv]  (scatter + gathers)

Run on the real chip: python tools/unroute_micro.py [--n 14745600]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1280 * 720 * 16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    n = args.n
    rng = np.random.default_rng(0)
    sidx = rng.permutation(n).astype(np.int32)
    w0 = rng.integers(0, 1 << 31, n, dtype=np.int32)
    w1 = rng.integers(0, 1 << 31, n, dtype=np.int32)
    sidx, w0, w1 = jnp.asarray(sidx), jnp.asarray(w0), jnp.asarray(w1)

    @jax.jit
    def unroute_sort(sidx, w0, w1):
        _, a, b = jax.lax.sort([sidx, w0, w1], num_keys=1, is_stable=False)
        return a, b

    @jax.jit
    def unroute_scatter(sidx, w0, w1):
        z = jnp.zeros((n,), jnp.int32)
        a = z.at[sidx].set(w0, unique_indices=True, mode="promise_in_bounds")
        b = z.at[sidx].set(w1, unique_indices=True, mode="promise_in_bounds")
        return a, b

    @jax.jit
    def unroute_invgather(sidx, w0, w1):
        inv = jnp.zeros((n,), jnp.int32).at[sidx].set(
            jnp.arange(n, dtype=jnp.int32), unique_indices=True,
            mode="promise_in_bounds")
        return jnp.take(w0, inv, axis=0), jnp.take(w1, inv, axis=0)

    @jax.jit
    def route_sort(key, idx):
        return jax.lax.sort([key, idx], num_keys=1, is_stable=False)

    def timeit(name, fn, *xs):
        r = fn(*xs)
        np.asarray(jax.device_get(r[0] if isinstance(r, tuple) else r))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            r = fn(*xs)
            np.asarray(jax.device_get(r[0] if isinstance(r, tuple) else r))
            ts.append(time.perf_counter() - t0)
        print(f"{name:18s} {min(ts)*1e3:8.2f} ms")
        return r

    a0 = timeit("unroute_sort", unroute_sort, sidx, w0, w1)
    a1 = timeit("unroute_scatter", unroute_scatter, sidx, w0, w1)
    a2 = timeit("unroute_invgather", unroute_invgather, sidx, w0, w1)
    timeit("route_sort(2col)", route_sort, w0, sidx)
    import numpy as _np
    assert _np.array_equal(_np.asarray(a0[0]), _np.asarray(a1[0]))
    assert _np.array_equal(_np.asarray(a0[0]), _np.asarray(a2[0]))
    print("equal OK")


if __name__ == "__main__":
    main()
