"""Gather / table-lookup primitives.

Random-access lookups are the hot primitive of a voxel ray tracer (occupancy
pyramid queries in the DDA, material palette fetches, sky LUT reads). On GPU
these are plain loads; on TPU the fast formulations differ per table size, so
every lookup in the framework routes through this module and the
implementation can be swapped (and benchmarked) centrally.

Strategies:

* ``gather_1d``      — element gather from a flat table (XLA gather HLO).
* ``lookup_rows``    — row gather, one full row of 128 lanes per index.
* ``lookup_onehot``  — one-hot matmul on the MXU; fastest for small tables
                       (material palette: 128 rows, LUTs: 256 rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def gather_1d(table: jax.Array, idx: jax.Array) -> jax.Array:
    """table[(T,) + rest][idx] for integer idx of any shape."""
    return jnp.take(table, idx, axis=0, mode="clip")


def lookup_onehot(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Row lookup via one-hot matmul (MXU-friendly for small tables).

    table: (R, C) float; idx: (...,) int -> (..., C).
    """
    r = table.shape[0]
    onehot = jax.nn.one_hot(idx, r, dtype=table.dtype)
    return jnp.matmul(onehot, table, precision=jax.lax.Precision.HIGHEST)


def lookup_2d_onehot(table: jax.Array, i: jax.Array, j: jax.Array) -> jax.Array:
    """Lookup into a (R, C, K) table at [i, j] via a row matmul + lane select.

    Used for small 2-D LUTs (e.g. the 256x128 atmosphere transmittance LUT,
    renderer/atmos.py:458-460). The row gather runs on the MXU; the column
    select is a VPU masked reduction.
    """
    r, c, k = table.shape
    rows = lookup_onehot(table.reshape(r, c * k), i)  # (..., C*K)
    rows = rows.reshape(rows.shape[:-1] + (c, k))
    lane = jax.nn.one_hot(j, c, dtype=table.dtype)  # (..., C)
    return jnp.einsum("...ck,...c->...k", rows, lane)


@functools.partial(jax.jit, static_argnames=("axis",))
def take_rows(table: jax.Array, idx: jax.Array, axis: int = 0) -> jax.Array:
    return jnp.take(table, idx, axis=axis, mode="clip")
