"""Bit-packing codecs (octahedral normals, material words, arbitrary-precision
u32 packs) — vectorized counterparts of renderer/math_utils.py:87-263.

These matter for two reasons: (a) the ReSTIR storage reservoir compresses its
payload through them (renderer/reservoir.py:105-141), and (b) the G-buffer
stores octahedral f16 normals whose quantization is part of the reference
image (renderer/pathtracer.py:113,404).
"""

from __future__ import annotations

import jax.numpy as jnp

from voxelrt.ops.sampling import normalize
from voxelrt.ops.v3 import V3, vnormalize


def rgb32f_to_rgb8(c):
    """renderer/math_utils.py:86-92."""
    return (jnp.clip(c, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def rgb8_to_rgb32f(c):
    """renderer/math_utils.py:95-100."""
    return c.astype(jnp.float32) / 255.0


def encode_unit_vector_3x16(v):
    """Octahedral encode to 2 x f16 in [0,1] (renderer/math_utils.py:202-207)."""
    l1 = jnp.abs(v[..., 0]) + jnp.abs(v[..., 1]) + jnp.abs(v[..., 2])
    l1 = jnp.maximum(l1, 1e-20)
    x = v[..., 0] / l1
    y = v[..., 1] / l1
    sx = jnp.where(x >= 0.0, 1.0, -1.0)
    sy = jnp.where(y >= 0.0, 1.0, -1.0)
    fold_x = (1.0 - jnp.abs(y)) * sx
    fold_y = (1.0 - jnp.abs(x)) * sy
    ex = jnp.where(v[..., 2] <= 0.0, fold_x, x) * 0.5 + 0.5
    ey = jnp.where(v[..., 2] <= 0.0, fold_y, y) * 0.5 + 0.5
    return jnp.stack([ex, ey], axis=-1).astype(jnp.float16)


def decode_unit_vector_3x16(e):
    """renderer/math_utils.py:209-215."""
    e = e.astype(jnp.float32) * 2.0 - 1.0
    x = e[..., 0]
    y = e[..., 1]
    z = 1.0 - jnp.abs(x) - jnp.abs(y)
    t = jnp.maximum(-z, 0.0)
    x = x + jnp.where(x >= 0.0, -t, t)
    y = y + jnp.where(y >= 0.0, -t, t)
    return normalize(jnp.stack([x, y, z], axis=-1))


def encode_unit_vector_3x16_soa(v: V3):
    """encode_unit_vector_3x16 on a V3 — returns (ex, ey) f16 components."""
    l1 = jnp.abs(v.x) + jnp.abs(v.y) + jnp.abs(v.z)
    l1 = jnp.maximum(l1, 1e-20)
    x = v.x / l1
    y = v.y / l1
    sx = jnp.where(x >= 0.0, 1.0, -1.0)
    sy = jnp.where(y >= 0.0, 1.0, -1.0)
    fold_x = (1.0 - jnp.abs(y)) * sx
    fold_y = (1.0 - jnp.abs(x)) * sy
    ex = jnp.where(v.z <= 0.0, fold_x, x) * 0.5 + 0.5
    ey = jnp.where(v.z <= 0.0, fold_y, y) * 0.5 + 0.5
    return ex.astype(jnp.float16), ey.astype(jnp.float16)


def decode_unit_vector_3x16_soa(ex, ey) -> V3:
    x = ex.astype(jnp.float32) * 2.0 - 1.0
    y = ey.astype(jnp.float32) * 2.0 - 1.0
    z = 1.0 - jnp.abs(x) - jnp.abs(y)
    t = jnp.maximum(-z, 0.0)
    x = x + jnp.where(x >= 0.0, -t, t)
    y = y + jnp.where(y >= 0.0, -t, t)
    return vnormalize(V3(x, y, z))


def pack_2x8(v):
    """renderer/math_utils.py:188-191 — two [0,1] floats into one f16."""
    floored = jnp.floor(255.0 * v + 0.5)
    packed = floored[..., 0] * (1.0 / 65535.0) + floored[..., 1] * (256.0 / 65535.0)
    return packed.astype(jnp.float16)


def unpack_2x8(p):
    """renderer/math_utils.py:193-199."""
    packed = p.astype(jnp.float32) * (65535.0 / 256.0)
    y = jnp.floor(packed)
    x = packed - y
    return jnp.stack([x * (256.0 / 255.0), y * (1.0 / 255.0)], axis=-1)


def encode_material(mat_id, albedo):
    """renderer/math_utils.py:231-236 — mat id + rgb8 albedo in one u32."""
    m = mat_id.astype(jnp.uint32) & 0xFF
    r = (albedo[..., 0] * 255.0).astype(jnp.uint32) & 0xFF
    g = (albedo[..., 1] * 255.0).astype(jnp.uint32) & 0xFF
    b = (albedo[..., 2] * 255.0).astype(jnp.uint32) & 0xFF
    return m | (r << 8) | (g << 16) | (b << 24)


def decode_material_word(enc):
    """renderer/math_utils.py:238-247 — returns (mat_id i32, albedo f32[3])."""
    enc = enc.astype(jnp.uint32)
    mat_id = (enc & 0xFF).astype(jnp.int32)
    albedo = (
        jnp.stack(
            [(enc >> 8) & 0xFF, (enc >> 16) & 0xFF, (enc >> 24) & 0xFF], axis=-1
        ).astype(jnp.float32)
        / 255.0
    )
    return mat_id, albedo


def encode_material_soa(mat_id, albedo: V3):
    """encode_material on a V3 albedo."""
    m = mat_id.astype(jnp.uint32) & 0xFF
    r = (albedo.x * 255.0).astype(jnp.uint32) & 0xFF
    g = (albedo.y * 255.0).astype(jnp.uint32) & 0xFF
    b = (albedo.z * 255.0).astype(jnp.uint32) & 0xFF
    return m | (r << 8) | (g << 16) | (b << 24)


def decode_material_word_soa(enc):
    """decode_material_word returning the albedo as a V3."""
    enc = enc.astype(jnp.uint32)
    mat_id = (enc & 0xFF).astype(jnp.int32)
    albedo = V3(
        ((enc >> 8) & 0xFF).astype(jnp.float32) / 255.0,
        ((enc >> 16) & 0xFF).astype(jnp.float32) / 255.0,
        ((enc >> 24) & 0xFF).astype(jnp.float32) / 255.0,
    )
    return mat_id, albedo


def encode_u32_arb(data, sizes):
    """renderer/math_utils.py:249-255 — 4 floats in (0,1) -> one u32.

    data: (..., 4) f32; sizes: static tuple of 4 bit widths.
    """
    out = jnp.zeros(data.shape[:-1], dtype=jnp.uint32)
    shift = 0
    for i, bits in enumerate(sizes):
        mult = float(2.0**bits - 1.0)
        q = (data[..., i] * mult + 0.5).astype(jnp.uint32)
        out = out | (q << shift)
        shift += bits
    return out


def decode_u32_arb(enc, sizes):
    """renderer/math_utils.py:257-263 — inverse of encode_u32_arb."""
    enc = enc.astype(jnp.uint32)
    parts = []
    shift = 0
    for bits in sizes:
        maxv = jnp.uint32(2**bits - 1)
        parts.append(((enc >> shift) & maxv).astype(jnp.float32) / float(2**bits - 1))
        shift += bits
    return jnp.stack(parts, axis=-1)
