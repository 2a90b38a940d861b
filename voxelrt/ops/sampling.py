"""Sampling and shading-frame helpers (vectorized over ray batches).

TPU-native counterparts of the free functions in renderer/math_utils.py.
Where the reference consumes ``ti.random()`` per thread, these take explicit
uniform arguments driven by a counter-based JAX PRNG, so every sample is
reproducible and the whole pipeline stays purely functional.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from voxelrt.ops.v3 import (
    V3,
    cmul,
    is_v3,
    vcross,
    vdot,
    vnormalize,
    vwhere,
)

EPS = 1e-6
INF = jnp.inf
PI = 3.141592653589793


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def sqr(x):
    return x * x


# Layout note: every vector helper below is polymorphic over packed
# (..., 3) arrays and SoA V3 component triples (ops/v3.py — the render hot
# path uses V3 for its ~16x better vreg lane utilization). For PACKED
# inputs the formulations are kept bit-for-bit as before; in particular
# keep the jnp.sum reduces: an unrolled x+y+z slice chain OVER PACKED
# ARRAYS was measured (round-3 HLO profile) to break XLA's
# multiply_reduce fusion patterns and regress the frame 72.7 -> 82.5
# ms/spp. (V3 components are separate dense arrays — no slicing — which
# is why the same unrolled math is the fast form THERE.)
def dot(a, b):
    if is_v3(a):
        return vdot(a, b)
    return jnp.sum(a * b, axis=-1)


def dot3(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def length(v):
    if is_v3(v):
        return jnp.sqrt(jnp.maximum(vdot(v, v), 0.0))
    return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1), 0.0))


def normalize(v, eps: float = 1e-20):
    if is_v3(v):
        return vnormalize(v, eps)
    return v * jax.lax.rsqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps))


def is_vec_zero(v):
    """renderer/math_utils.py:18-19 — |v|^2 < 1e-7."""
    if is_v3(v):
        return vdot(v, v) < 1e-7
    return jnp.sum(v * v, axis=-1) < 1e-7


def luminance(c):
    """renderer/math_utils.py:151-153."""
    if is_v3(c):
        return c.x * 0.2125 + c.y * 0.7154 + c.z * 0.0721
    w = jnp.asarray([0.2125, 0.7154, 0.0721], dtype=c.dtype)
    return jnp.sum(c * w, axis=-1)


def mix(a, b, t):
    return a + (b - a) * t


def smoothstep(edge0, edge1, x):
    t = jnp.clip((x - edge0) / (edge1 - edge0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def reflect(i, n):
    """GLSL reflect: i - 2*dot(n,i)*n (i points toward the surface)."""
    if is_v3(i):
        return i - n * (2.0 * vdot(n, i))
    return i - 2.0 * dot3(n, i) * n


def make_orthonormal_basis(n):
    """renderer/math_utils.py:32-37 — returns (tangent, bitangent).

    h = x-axis when |n.y| > 0.9 else y-axis; y = normalize(cross(n, h));
    x = cross(n, y).
    """
    if is_v3(n):
        ny = jnp.abs(n.y) > 0.9
        one = jnp.ones((), n.x.dtype)
        zero = jnp.zeros((), n.x.dtype)
        h = V3(jnp.where(ny, one, zero), jnp.where(ny, zero, one), zero)
        y = vnormalize(vcross(n, h))
        x = vcross(n, y)
        return x, y
    ny = jnp.abs(n[..., 1:2]) > 0.9
    h = jnp.where(
        ny,
        jnp.asarray([1.0, 0.0, 0.0], n.dtype),
        jnp.asarray([0.0, 1.0, 0.0], n.dtype),
    )
    y = normalize(jnp.cross(n, h))
    x = jnp.cross(n, y)
    return x, y


def _uv2(u):
    """Uniform pair: (..., 2) array or a (u0, u1) component tuple."""
    if isinstance(u, tuple):
        return u
    return u[..., 0], u[..., 1]


def tangent_to_world(n, v_local):
    """renderer/math_utils.py:40-42 / :56-59 — columns (x, y, n) frame.

    v_local is expressed with z along the normal.
    """
    x, y = make_orthonormal_basis(n)
    if is_v3(n):
        return x * v_local.x + y * v_local.y + n * v_local.z
    return (
        x * v_local[..., 0:1] + y * v_local[..., 1:2] + n * v_local[..., 2:3]
    )


def sample_cosine_weighted_hemisphere(n, u):
    """renderer/math_utils.py:22-30 (Shirley et al., RT Gems ch. 16).

    u: (..., 2) uniforms (or a component tuple for the V3 path).
    """
    u0, u1 = _uv2(u)
    a = 1.0 - 2.0 * u0
    b = jnp.sqrt(jnp.maximum(1.0 - a * a, 0.0))
    a = a * (1.0 - 1e-5)
    b = b * (1.0 - 1e-5)  # grazing-angle precision fix
    phi = 2.0 * PI * u1
    if is_v3(n):
        return vnormalize(
            V3(n.x + b * jnp.cos(phi), n.y + b * jnp.sin(phi), n.z + a)
        )
    v = jnp.stack(
        [
            n[..., 0] + b * jnp.cos(phi),
            n[..., 1] + b * jnp.sin(phi),
            n[..., 2] + a,
        ],
        axis=-1,
    )
    return normalize(v)


def sample_cone(cos_theta_max, u, soa: bool = False):
    """renderer/math_utils.py:44-54 — cone around +z, u: (..., 2)."""
    u0, u1 = _uv2(u)
    cos_theta = (1.0 - u0) + u0 * cos_theta_max
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = 2.0 * PI * u1
    if soa:
        return V3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def sample_cone_oriented(cos_theta_max, n, u):
    """renderer/math_utils.py:56-59 — cone around direction n."""
    return tangent_to_world(n, sample_cone(cos_theta_max, u, soa=is_v3(n)))


def cone_sample_pdf(cos_theta_max, cos_theta):
    """renderer/math_utils.py:61-65.

    Deliberately reproduces the reference's simplification (the comment there
    admits the pdf ignores the cone orientation); it is part of the image.
    """
    pdf = 1.0 / (2.0 * PI * (1.0 - cos_theta_max))
    return jnp.where(cos_theta >= cos_theta_max, pdf, 0.0)


def power_heuristic(a, b):
    """renderer/pathtracer.py:349-353."""
    a_sqr = a * a
    p_sum = jnp.maximum(a_sqr + b * b, 1e-4)
    return a_sqr / p_sum


def get_unit_vec(u):
    """renderer/atmos.py:27-31 — uniform direction from (..., 2) uniforms."""
    ax = u[..., 0] * (2.0 * PI)
    ay = u[..., 1] * 2.0 - 1.0
    ground = jnp.stack([jnp.sin(ax), jnp.cos(ax)], axis=-1) * jnp.sqrt(
        jnp.maximum(1.0 - ay * ay, 0.0)
    )[..., None]
    return normalize(jnp.stack([ground[..., 0], ground[..., 1], ay], axis=-1))


def ray_aabb_intersection(box_min, box_max, o, d):
    """renderer/math_utils.py:103-123, IEEE-division formulation.

    Division by a zero direction component yields +/-inf which propagates
    through min/max exactly as the reference's special-case intends.
    Returns (intersect, near, far).
    """
    safe_d = jnp.where(d == 0.0, 1e-30, d)
    i1 = (box_min - o) / safe_d
    i2 = (box_max - o) / safe_d
    near = jnp.max(jnp.minimum(i1, i2), axis=-1)
    far = jnp.min(jnp.maximum(i1, i2), axis=-1)
    # Zero-direction component outside the slab -> no intersection.
    outside = jnp.any((d == 0.0) & ((o < box_min) | (o > box_max)), axis=-1)
    intersect = (near <= far) & ~outside
    return intersect, near, far


def hash3(x, y, z):
    """renderer/math_utils.py:217-229 — integer hash (uint32)."""
    x = x.astype(jnp.uint32)
    y = y.astype(jnp.uint32)
    z = z.astype(jnp.uint32)
    x = x + (x >> 11)
    x = x ^ (x << 7)
    x = x + y
    x = x ^ (x << 3)
    x = x + (z ^ (x >> 14))
    x = x ^ (x << 6)
    x = x + (x >> 15)
    x = x ^ (x << 5)
    x = x + (x >> 12)
    x = x ^ (x << 9)
    return x


def uniforms(key, shape, n: int):
    """Draw ``n`` independent uniform layers of `shape` — (n,) + shape."""
    return jax.random.uniform(key, (n,) + tuple(shape), dtype=jnp.float32)


def pcg3d(a, b, c):
    """PCG3D hash (Jarzynski & Olano, "Hash Functions for GPU Rendering",
    JCGT 2020): three u32 inputs -> three decorrelated u32 outputs.

    Used for per-sample draw slots (config.rng_draws='pcg3d'): ~20 fused
    u32 VPU ops replace a materialized (n_draws, N) threefry table whose
    row extraction cost ~3 ms/spp of HBM relayout traffic (PERF_NOTES.md).
    """
    m = jnp.uint32(1664525)
    add = jnp.uint32(1013904223)
    a = a * m + add
    b = b * m + add
    c = c * m + add
    a = a + b * c
    b = b + c * a
    c = c + a * b
    a = a ^ (a >> jnp.uint32(16))
    b = b ^ (b >> jnp.uint32(16))
    c = c ^ (c >> jnp.uint32(16))
    a = a + b * c
    b = b + c * a
    c = c + a * b
    return a, b, c


def u32_to_uniform(bits):
    """Top 24 bits -> f32 uniform in [0, 1) (the f32-mantissa-exact form)."""
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 24)
    )
