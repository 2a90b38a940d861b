"""Measure per-iteration costs of the Mosaic constructs the DDA kernel uses:
empty while body (13 carries), scalar-producing reduce, log-roll OR sweep,
roll-trick gather, dynamic-slice fetch, lax.cond overhead.

Each variant runs a 512-iteration while loop per block over 64 blocks; cost
is the slope between 512 and 128 iterations.
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NB = 512

    def make_kernel(variant):
        def kern(x_ref, tab_ref, o_ref, *, iters):
            x = x_ref[0]
            carries = [x + float(i) for i in range(8)]
            idx = (x.astype(jnp.int32) & 1023)

            def cond(s):
                return s[0] < iters

            def body(s):
                i = s[0]
                c = list(s[1])
                acc = s[2]
                if variant == "orred":
                    v = c[0].astype(jnp.int32) & 31
                    bits = jnp.left_shift(jnp.int32(1), v)
                    g = jax.lax.reduce(
                        bits, jnp.int32(0),
                        lambda a, b: jax.lax.bitwise_or(a, b), (0, 1)
                    )
                    acc = acc + g
                elif variant == "ctz":
                    L = i & (-i)
                    g = jnp.int32(0)
                    t = (L & 0xFFFF) == 0
                    g = g + jnp.where(t, 16, 0)
                    L = jnp.where(t, (L >> 16) & 0xFFFF, L & 0xFFFF)
                    t = (L & 0xFF) == 0
                    g = g + jnp.where(t, 8, 0)
                    L = jnp.where(t, L >> 8, L & 0xFF)
                    t = (L & 0xF) == 0
                    g = g + jnp.where(t, 4, 0)
                    L = jnp.where(t, L >> 4, L & 0xF)
                    t = (L & 3) == 0
                    g = g + jnp.where(t, 2, 0)
                    L = jnp.where(t, L >> 2, L & 3)
                    g = g + jnp.where((L & 1) == 0, 1, 0)
                    acc = acc + g
                elif variant == "reduce":
                    acc = acc + jnp.sum(c[0].astype(jnp.int32))
                elif variant == "reduce2":
                    acc = acc + jnp.sum(c[0].astype(jnp.int32))
                    acc = acc + jnp.max(c[1].astype(jnp.int32))
                elif variant == "rolls":
                    g = c[0].astype(jnp.int32)
                    for sh in (64, 32, 16, 8, 4, 2, 1):
                        g = g | pltpu.roll(g, sh, 1)
                    for sh in (4, 2, 1):
                        g = g | pltpu.roll(g, sh, 0)
                    acc = acc + g[0, 0]
                elif variant == "gather":
                    from voxelrt.ops.dda_pallas import _gather_1024

                    g = _gather_1024(tab_ref[0:8, :], idx + i)
                    acc = acc + g[0, 0]
                elif variant == "fetch":
                    from voxelrt.ops.dda_pallas import _gather_1024

                    gdyn = (i & 31)
                    g1 = _gather_1024(tab_ref[pl.ds(gdyn * 8, 8), :], idx)
                    g2 = _gather_1024(tab_ref[pl.ds(gdyn * 8, 8), :], idx + 1)
                    acc = acc + g1[0, 0] + g2[0, 0]
                elif variant == "cond":
                    def yes():
                        return acc + 1

                    def no():
                        return acc

                    acc = jax.lax.cond((i & 1) == 0, yes, no)
                elif variant == "alu20":
                    v = c[0]
                    for _ in range(10):
                        v = v * 1.0001 + 0.001
                    c[0] = v
                for k in range(8):
                    c[k] = c[k] + 1.0
                return (i + 1, tuple(c), acc)

            s = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), tuple(carries), jnp.int32(0)),
            )
            o_ref[0] = s[1][0] + s[2].astype(jnp.float32)

        return kern

    x = jnp.asarray(np.random.rand(NB, 8, 128), jnp.float32)
    tab = jnp.asarray(
        np.random.randint(0, 100, (256, 128)), jnp.int32
    )

    spec = pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((256, 128), lambda b: (0, 0),
                         memory_space=pltpu.VMEM)

    def run(variant, iters):
        kern = functools.partial(make_kernel(variant), iters=iters)
        f = pl.pallas_call(
            kern,
            grid=(NB,),
            in_specs=[spec, tspec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((NB, 8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )
        r = f(x, tab)
        return float(np.asarray(jax.device_get(r)).sum())

    def time_variant(variant, iters, trials=5):
        _ = run(variant, iters)  # compile
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            _ = run(variant, iters)
            best = min(best, time.perf_counter() - t0)
        return best

    base_ns = None
    for variant in ["base", "orred", "ctz", "reduce", "fetch"]:
        lo = time_variant(variant, 512)
        hi = time_variant(variant, 4096)
        per_iter = (hi - lo) / (4096 - 512) / NB * 1e9
        note = ""
        if variant == "base":
            base_ns = per_iter
        elif base_ns is not None:
            note = f"  (+{per_iter - base_ns:7.1f} ns over base)"
        print(f"{variant:8s} {per_iter:8.1f} ns/iter{note}", flush=True)


if __name__ == "__main__":
    main()
