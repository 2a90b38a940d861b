"""Microbench lax.sort shapes used by the deferred-sky route.

Questions: (a) what does each extra payload cost at 7.4M lanes, (b) does a
batched segment sort (rows sorted independently) beat one flat sort — the
route only needs BLOCK-level texel locality, not a total order.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, reps=10):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n = 7372800
    key = jax.random.PRNGKey(0)
    k = jax.random.randint(key, (n,), 0, 1 << 20, dtype=jnp.int32)
    f = [jax.random.uniform(jax.random.fold_in(key, i), (n,))
         for i in range(6)]

    for np_ in (1, 2, 3, 6):
        fn = jax.jit(lambda k_, fs: jax.lax.sort([k_] + list(fs), num_keys=1))
        ms = bench(fn, k, f[:np_])
        print(f"flat   n={n}  payloads={np_}:  {ms:7.2f} ms")

    for seg in (1 << 14, 1 << 16, 1 << 18):
        rows = n // seg
        kb = k[: rows * seg].reshape(rows, seg)
        fb = [x[: rows * seg].reshape(rows, seg) for x in f[:3]]
        fn = jax.jit(
            lambda k_, fs: jax.lax.sort([k_] + list(fs), dimension=1,
                                        num_keys=1)
        )
        ms = bench(fn, kb, fb)
        print(f"batched rows={rows} seg={seg} payloads=3:  {ms:7.2f} ms")


if __name__ == "__main__":
    main()
