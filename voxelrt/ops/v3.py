"""SoA 3-vectors: a V3 is three separate (N,) component arrays.

Why this exists (the TPU layout argument): a packed ``(N, 3)`` f32 array
tiles as (8, 128) vregs with 3 of 128 lanes live, so every elementwise op
and every ``axis=-1`` reduce on packed vectors runs at ~2.3% lane
utilization and pads its HBM traffic 42×. Three dense ``(N,)`` components
tile fully. Measured on v5e (tools/vec_layout_micro.py): 3.2× faster on
fused elementwise chains (831 vs 262 GB/s) and 2.2× on dot-product round
trips. The shading glue around the traversal kernel is exactly such
chains, so the render hot path (render/pathtracer.py) carries V3
everywhere and converts to packed arrays only at module boundaries
(images, ReSTIR reservoirs, tests).

V3 is a NamedTuple (hence a JAX pytree: jit/vmap/scan-transparent).
Binary operators accept another V3 or a per-ray scalar — anything with
ndim <= max(component ndim) — and REJECT trailing singleton dims
(``x[..., None]``-style AoS broadcast shapes) loudly, because silently
broadcasting an (N, 1) against (N,) components would produce (N, N).

The ``c*`` helpers (cmul/cdiv/cwhere/cmix/...) are layout-POLYMORPHIC:
they apply a per-ray scalar to a vector that is either a V3 or a packed
(..., 3) array, inserting the ``[..., None]`` only for the packed case.
Shared modules (ops/bsdf.py, ops/sampling.py) are written against them so
the same formula source serves the V3 render path and the packed-array
callers (render/restir.py, tests) bit-identically.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


def _coerce(other):
    """Return (x, y, z) operand components for a V3 binary op."""
    if isinstance(other, V3):
        return other.x, other.y, other.z
    nd = jnp.ndim(other)
    if nd > 1:
        raise TypeError(
            f"V3 binary op with rank-{nd} operand (shape "
            f"{jnp.shape(other)}): per-ray scalars must be rank<=1; a "
            "packed (N, 3) or (N, 1) operand would broadcast wrongly — "
            "convert with v3.load()."
        )
    return other, other, other


class V3(NamedTuple):
    """Three same-shaped component arrays (or python/0-d scalars)."""

    x: Any
    y: Any
    z: Any

    # -- arithmetic (tuple's concat/repeat semantics deliberately shadowed)
    def __add__(self, o):
        ox, oy, oz = _coerce(o)
        return V3(self.x + ox, self.y + oy, self.z + oz)

    def __radd__(self, o):
        ox, oy, oz = _coerce(o)
        return V3(ox + self.x, oy + self.y, oz + self.z)

    def __sub__(self, o):
        ox, oy, oz = _coerce(o)
        return V3(self.x - ox, self.y - oy, self.z - oz)

    def __rsub__(self, o):
        ox, oy, oz = _coerce(o)
        return V3(ox - self.x, oy - self.y, oz - self.z)

    def __mul__(self, o):
        ox, oy, oz = _coerce(o)
        return V3(self.x * ox, self.y * oy, self.z * oz)

    def __rmul__(self, o):
        ox, oy, oz = _coerce(o)
        return V3(ox * self.x, oy * self.y, oz * self.z)

    def __truediv__(self, o):
        ox, oy, oz = _coerce(o)
        return V3(self.x / ox, self.y / oy, self.z / oz)

    def __rtruediv__(self, o):
        ox, oy, oz = _coerce(o)
        return V3(ox / self.x, oy / self.y, oz / self.z)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)

    # -- shape/dtype conveniences
    @property
    def shape(self):
        return jnp.shape(self.x)

    def astype(self, dt):
        return V3(self.x.astype(dt), self.y.astype(dt), self.z.astype(dt))


def is_v3(a) -> bool:
    return isinstance(a, V3)


def load(a) -> V3:
    """Packed (..., 3) array -> V3 (a[..., i] component slices)."""
    if isinstance(a, V3):
        return a
    return V3(a[..., 0], a[..., 1], a[..., 2])


def stack(v: V3, axis: int = -1):
    """V3 -> packed array (module boundary only — see module docstring)."""
    if not isinstance(v, V3):
        return v
    return jnp.stack([v.x, v.y, v.z], axis=axis)


def splat(c, dtype=jnp.float32) -> V3:
    """(3,)-like constant -> V3 of 0-d scalars (broadcasts against (N,))."""
    if isinstance(c, V3):
        return c
    a = jnp.asarray(c, dtype)
    return V3(a[..., 0], a[..., 1], a[..., 2])


def full(shape, value, dtype=jnp.float32) -> V3:
    f = jnp.full(shape, value, dtype)
    return V3(f, f, f)


def zeros(shape, dtype=jnp.float32) -> V3:
    return full(shape, 0.0, dtype)


def ones(shape, dtype=jnp.float32) -> V3:
    return full(shape, 1.0, dtype)


def map2(f, a: V3, b: V3) -> V3:
    return V3(f(a.x, b.x), f(a.y, b.y), f(a.z, b.z))


def map1(f, a: V3) -> V3:
    return V3(f(a.x), f(a.y), f(a.z))


def vdot(a: V3, b: V3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def vcross(a: V3, b: V3) -> V3:
    return V3(
        a.y * b.z - a.z * b.y,
        a.z * b.x - a.x * b.z,
        a.x * b.y - a.y * b.x,
    )


def vlength(v: V3):
    return jnp.sqrt(jnp.maximum(vdot(v, v), 0.0))


def vnormalize(v: V3, eps: float = 1e-20) -> V3:
    return v * jax.lax.rsqrt(jnp.maximum(vdot(v, v), eps))


def vwhere(m, a, b) -> V3:
    """Per-ray mask select between V3/scalar operands."""
    ax, ay, az = _coerce(a) if not isinstance(a, V3) else (a.x, a.y, a.z)
    bx, by, bz = _coerce(b) if not isinstance(b, V3) else (b.x, b.y, b.z)
    return V3(jnp.where(m, ax, bx), jnp.where(m, ay, by), jnp.where(m, az, bz))


def vmaximum(a, b) -> V3:
    ax, ay, az = _coerce(a) if not isinstance(a, V3) else (a.x, a.y, a.z)
    bx, by, bz = _coerce(b) if not isinstance(b, V3) else (b.x, b.y, b.z)
    return V3(jnp.maximum(ax, bx), jnp.maximum(ay, by), jnp.maximum(az, bz))


def vminimum(a, b) -> V3:
    ax, ay, az = _coerce(a) if not isinstance(a, V3) else (a.x, a.y, a.z)
    bx, by, bz = _coerce(b) if not isinstance(b, V3) else (b.x, b.y, b.z)
    return V3(jnp.minimum(ax, bx), jnp.minimum(ay, by), jnp.minimum(az, bz))


def vclip(v: V3, lo, hi) -> V3:
    return map1(lambda c: jnp.clip(c, lo, hi), v)


def any_nonzero(v: V3):
    """jnp.any(v != 0, axis=-1) equivalent."""
    return (v.x != 0.0) | (v.y != 0.0) | (v.z != 0.0)


# --- layout-polymorphic helpers (V3 or packed (..., 3) array) ---------------


def comps(a):
    """Component triple of a V3 or packed array."""
    if isinstance(a, V3):
        return a.x, a.y, a.z
    return a[..., 0], a[..., 1], a[..., 2]


def like3(ref, x, y, z):
    """Build a vector in ``ref``'s layout from three components."""
    if isinstance(ref, V3):
        return V3(x, y, z)
    return jnp.stack([x, y, z], axis=-1)


def cmul(vec, s):
    """vec * per-ray scalar (V3: direct; packed: s[..., None])."""
    if isinstance(vec, V3):
        return vec * s
    return vec * _expand(s, vec)


def cdiv(vec, s):
    if isinstance(vec, V3):
        return vec / s
    return vec / _expand(s, vec)


def cadd(vec, s):
    """vec + per-ray scalar (added to every component)."""
    if isinstance(vec, V3):
        return vec + s
    return vec + _expand(s, vec)


def cwhere(m, vec, other):
    """Per-ray mask select in vec's layout (other: same layout or scalar)."""
    if isinstance(vec, V3):
        return vwhere(m, vec, other)
    if isinstance(other, V3):  # pragma: no cover — mixed layouts are a bug
        raise TypeError("cwhere operands must share a layout")
    return jnp.where(_expand(m, vec), vec, other)


def cmix(a, b, t):
    """mix(a, b, t) with per-ray scalar t, in a's layout."""
    return a + cmul(b - a, t) if isinstance(a, V3) else a + (b - a) * _expand(t, a)


def ones_like3(vec):
    if isinstance(vec, V3):
        return V3(jnp.ones_like(vec.x), jnp.ones_like(vec.y),
                  jnp.ones_like(vec.z))
    return jnp.ones_like(vec)


def _expand(s, vec):
    """Append the [..., None] axis iff the packed vec has one more dim."""
    if jnp.ndim(s) == jnp.ndim(vec) - 1:
        return s[..., None]
    return s
