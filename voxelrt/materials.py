"""Disney material palette (renderer/materials.py + default_material_set.csv).

128 slots; IDs 0/1/2 = air / default rough surface / emissive, 10..82 are the
curated set. Parameters are stored SoA as a (128, 15) f32 matrix so a
per-ray material fetch is a one-hot matmul on the MXU instead of a gather.

Column order matches the reference CSV header
(default_material_set.csv:1): base_col rgb, subsurface, metallic, specular,
specular_tint, roughness, anisotropic, sheen, sheen_tint, clearcoat,
clearcoat_gloss, ior_minus_one.
"""

from __future__ import annotations

import csv
import io
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from voxelrt.ops.lookup import lookup_onehot

N_SLOTS = 128
PARAM_NAMES = (
    "base_col_r", "base_col_g", "base_col_b",
    "subsurface", "metallic", "specular", "specular_tint", "roughness",
    "anisotropic", "sheen", "sheen_tint", "clearcoat", "clearcoat_gloss",
    "ior_minus_one",
)

# Default slot values (renderer/materials.py:49-63): white base, specular
# 0.04, roughness 0.9, everything else zero.
_DEFAULT_ROW = (1.0, 1.0, 1.0, 0.0, 0.0, 0.04, 0.0, 0.9, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)

# Curated palette, same values as the reference's default_material_set.csv
# (IDs documented at renderer/materials.py:12-45):
#  id   base rgb   subs met  spec tint rough aniso sheen stint cc  ccg  ior-1
_DEFAULT_SET = [
    (10, 1, 1, 1, 0.0, 0.0, 0.30, 0.0, 0.60, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),   # rough concrete
    (11, 1, 1, 1, 0.0, 0.0, 0.30, 0.0, 0.20, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),   # smooth concrete
    (20, 1, 1, 1, 0.9, 0.0, 0.50, 0.2, 0.04, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),   # silicate
    (21, 1, 1, 1, 0.5, 0.0, 0.35, 0.0, 0.22, 0.0, 0.0, 0.0, 0.6, 0.8, 0.0),   # smooth ceramic
    (22, 1, 1, 1, 0.5, 0.0, 0.35, 0.0, 0.80, 0.0, 0.0, 0.0, 0.6, 0.8, 0.0),   # rough ceramic
    (30, 1, 1, 1, 0.3, 0.0, 0.20, 0.0, 0.60, 0.0, 0.4, 0.5, 0.0, 0.0, 0.0),   # bark
    (31, 1, 1, 1, 0.3, 0.0, 0.50, 0.0, 0.50, 0.0, 0.4, 0.0, 0.0, 0.0, 0.0),   # wood plank
    (32, 1, 1, 1, 0.3, 0.0, 0.50, 0.0, 0.50, 0.0, 0.4, 0.0, 0.6, 0.7, 0.0),   # coated plank
    (40, 1, 1, 1, 0.4, 0.0, 0.30, 0.9, 0.20, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),   # smooth plastic
    (41, 1, 1, 1, 0.4, 0.0, 0.30, 0.9, 0.60, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),   # rough plastic
    (50, 1, 1, 1, 0.0, 1.0, 0.80, 0.0, 0.40, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),   # rough metal
    (51, 1, 1, 1, 0.0, 1.0, 0.80, 0.0, 0.11, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),   # smooth metal
    (52, 1, 1, 1, 0.0, 1.0, 0.80, 0.0, 1.00, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),   # mirror
    (53, 1, 1, 1, 0.0, 1.0, 0.80, 0.0, 0.40, 0.8, 0.0, 0.0, 0.0, 0.0, 0.0),   # brushed metal
    (54, 1, 1, 1, 0.0, 0.7, 0.80, 0.0, 0.30, 0.0, 0.0, 0.0, 0.7, 0.9, 0.0),   # car paint
    (80, 1, 1, 1, 0.9, 0.0, 0.04, 0.0, 0.80, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),   # plant
    (81, 1, 1, 1, 0.9, 0.0, 0.30, 0.0, 0.40, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),   # light skin
    (82, 1, 1, 1, 0.95, 0.0, 0.00, 0.0, 0.40, 0.0, 0.9, 0.4, 0.0, 0.0, 0.0),  # cloth
]


class Material(NamedTuple):
    """Batched Disney material parameters (renderer/bsdf.py:26-37)."""

    base_col: jax.Array  # (..., 3)
    subsurface: jax.Array
    metallic: jax.Array
    specular: jax.Array
    specular_tint: jax.Array
    roughness: jax.Array
    anisotropic: jax.Array
    sheen: jax.Array
    sheen_tint: jax.Array
    clearcoat: jax.Array
    clearcoat_gloss: jax.Array
    ior_minus_one: jax.Array


def fetch_material(params: jax.Array, mat_id: jax.Array,
                   albedo: jax.Array | None = None,
                   used_ids: tuple | None = None) -> Material:
    """Fetch materials from a (128, 14) palette array for (N,) ids; the
    per-voxel color always overrides base_col
    (renderer/math_utils.py:245-247, renderer/pathtracer.py:429).

    ``used_ids``: the static set of ids that can occur at runtime (baked by
    the app shell from the voxel grid + floor). When given and small, the
    lookup compiles to a per-field select chain over those rows — exact,
    fully fusable VPU ops — instead of a (N, 128) one-hot matmul, which
    measured 17 ms per 7.4M-lane wavefront (2.1 ms/spp at 8-sample
    launches) on v5e.
    """
    if used_ids and len(used_ids) <= 16:
        rows = [params[int(i)] for i in used_ids]

        def sel(col):
            acc = jnp.broadcast_to(rows[0][col], mat_id.shape)
            for i, row in zip(used_ids[1:], rows[1:]):
                acc = jnp.where(mat_id == int(i), row[col], acc)
            return acc

        if albedo is None:
            base = jnp.stack([sel(0), sel(1), sel(2)], axis=-1)
        else:
            base = albedo
        return Material(
            base_col=base,
            subsurface=sel(3),
            metallic=sel(4),
            specular=sel(5),
            specular_tint=sel(6),
            roughness=sel(7),
            anisotropic=sel(8),
            sheen=sel(9),
            sheen_tint=sel(10),
            clearcoat=sel(11),
            clearcoat_gloss=sel(12),
            ior_minus_one=sel(13),
        )
    p = lookup_onehot(params, mat_id)
    base = p[..., 0:3] if albedo is None else albedo
    return Material(
        base_col=base,
        subsurface=p[..., 3],
        metallic=p[..., 4],
        specular=p[..., 5],
        specular_tint=p[..., 6],
        roughness=p[..., 7],
        anisotropic=p[..., 8],
        sheen=p[..., 9],
        sheen_tint=p[..., 10],
        clearcoat=p[..., 11],
        clearcoat_gloss=p[..., 12],
        ior_minus_one=p[..., 13],
    )


class MaterialList:
    """128-slot palette uploaded as a (128, 14) parameter matrix."""

    def __init__(self, rows=None):
        params = np.tile(np.asarray(_DEFAULT_ROW, np.float32), (N_SLOTS, 1))
        for row in rows if rows is not None else _DEFAULT_SET:
            idx = int(row[0])
            params[idx] = np.asarray(row[1:], np.float32)
        self.params_np = params
        self.params = jnp.asarray(params)

    @classmethod
    def from_csv(cls, path_or_text: str) -> "MaterialList":
        """Load a user CSV with the reference's column format
        (renderer/materials.py:102-112)."""
        if "\n" in path_or_text:
            fh = io.StringIO(path_or_text)
        else:
            fh = open(path_or_text, newline="")
        with fh:
            reader = csv.reader(fh, delimiter=",")
            rows = []
            for i, row in enumerate(reader):
                if i == 0:
                    continue
                rows.append([float(x) for x in row])
        return cls(rows)

    def fetch(self, mat_id: jax.Array, albedo: jax.Array | None = None) -> Material:
        return fetch_material(self.params, mat_id, albedo)
