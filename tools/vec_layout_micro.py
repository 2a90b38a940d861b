"""Microbenchmark: (N,3) AoS vector math vs SoA (N,) component arrays.

Sizes the layout cost behind PERF_NOTES' glue-fusion line items: on TPU a
rank-2 (N,3) array tiles as (8,128) vregs with 3 of 128 lanes live, so
every elementwise op and every axis=-1 reduce on packed vec3s runs at
~2.3% lane utilization. SoA (N,) components tile densely.

Usage: python tools/vec_layout_micro.py [--n 7372800] [--iters 64]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5):
    fn(*args)  # compile
    out = fn(*args)
    np.asarray(jax.device_get(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(out))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1280 * 720 * 8)
    ap.add_argument("--inner", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    n, inner = args.n, args.inner

    key = jax.random.PRNGKey(0)
    a3 = jax.random.uniform(key, (n, 3), jnp.float32)
    b3 = jax.random.uniform(jax.random.fold_in(key, 1), (n, 3), jnp.float32)
    ax, ay, az = (a3[:, i] for i in range(3))
    bx, by, bz = (b3[:, i] for i in range(3))
    ax, ay, az, bx, by, bz = jax.device_put((ax, ay, az, bx, by, bz))

    # Chained axpy-style elementwise work (what shading glue mostly is),
    # iterated so the measurement is compute not dispatch.
    @jax.jit
    def aos_chain(a, b):
        def body(i, a):
            return a * b + 0.5 * a
        a = jax.lax.fori_loop(0, inner, body, a)
        return jnp.sum(a)

    @jax.jit
    def soa_chain(ax, ay, az, bx, by, bz):
        def body(i, c):
            x, y, z = c
            return (x * bx + 0.5 * x, y * by + 0.5 * y, z * bz + 0.5 * z)
        x, y, z = jax.lax.fori_loop(0, inner, body, (ax, ay, az))
        return jnp.sum(x) + jnp.sum(y) + jnp.sum(z)

    # Dot-product round trip: dot -> scale, iterated.
    @jax.jit
    def aos_dot(a, b):
        def body(i, a):
            d = jnp.sum(a * b, axis=-1, keepdims=True)
            return a * (0.25 + 1e-9 * d)
        a = jax.lax.fori_loop(0, inner, body, a)
        return jnp.sum(a)

    @jax.jit
    def soa_dot(ax, ay, az, bx, by, bz):
        def body(i, c):
            x, y, z = c
            d = x * bx + y * by + z * bz
            s = 0.25 + 1e-9 * d
            return (x * s, y * s, z * s)
        x, y, z = jax.lax.fori_loop(0, inner, body, (ax, ay, az))
        return jnp.sum(x) + jnp.sum(y) + jnp.sum(z)

    bytes_chain = n * 3 * 4 * 2 * inner  # read a+b, write a (roughly)
    for name, fn, fargs in [
        ("aos_chain", aos_chain, (a3, b3)),
        ("soa_chain", soa_chain, (ax, ay, az, bx, by, bz)),
        ("aos_dot", aos_dot, (a3, b3)),
        ("soa_dot", soa_dot, (ax, ay, az, bx, by, bz)),
    ]:
        t = timeit(fn, *fargs, iters=args.iters)
        per_iter = t / inner
        print(f"{name:10s}  {t*1e3:8.2f} ms total  {per_iter*1e6:8.1f} us/op-round "
              f" ~{bytes_chain/t/1e9:6.1f} GB/s-equiv")


if __name__ == "__main__":
    main()
