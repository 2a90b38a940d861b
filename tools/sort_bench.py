"""Cost of lax.sort / argsort-based routing at wavefront sizes on the v5e.

Measures: (a) full multi-payload sort by u32 key, (b) key+index sort then
payload unsort (two sorts), at N = 1M, for the payload counts next_hit needs.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    N = 1 << 20
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 20, N, dtype=np.uint32))
    pays = [jnp.asarray(rng.random(N).astype(np.float32)) for _ in range(8)]

    @functools.partial(jax.jit, static_argnames=("reps", "npay"))
    def run_sort(keys, pays, reps: int, npay: int):
        def body(i, acc):
            k = keys + i.astype(jnp.uint32)
            out = jax.lax.sort([k] + list(pays[:npay]), num_keys=1)
            return acc + out[1][0] + out[npay][-1]

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    def timeit(fn, *a):
        _ = float(jax.device_get(fn(*a)))

        def t(reps):
            t0 = time.perf_counter()
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(jax.device_get(fn(*a[:-1], reps)))
                best = min(best, time.perf_counter() - t0)
            return best

        return (t(8) - t(2)) / 6

    for npay in (1, 4, 8):
        f = lambda k, p, reps: run_sort(k, p, reps, npay)
        _ = float(jax.device_get(f(keys, pays, 2)))
        dt = timeit(lambda k, p, reps: run_sort(k, p, reps, npay), keys, pays, 8)
        print(f"sort 1M keys + {npay} payloads: {dt*1e3:.2f} ms", flush=True)

    # argsort + gather by permutation (the alternative routing)
    @functools.partial(jax.jit, static_argnames=("reps",))
    def run_gather(keys, pay, reps: int):
        def body(i, acc):
            idx = jnp.argsort(keys + i.astype(jnp.uint32))
            g = jnp.take(pay, idx)
            return acc + g[0] + g[-1]

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    _ = float(jax.device_get(run_gather(keys, pays[0], 2)))
    dt = timeit(run_gather, keys, pays[0], 8)
    print(f"argsort 1M + take 1 payload: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
