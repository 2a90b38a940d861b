"""Screen/view/world space transforms (renderer/space_transformations.py).

Matrices follow the OpenGL column-vector convention the reference obtains
from ``ti.ui.Camera`` (scene.py:186-237): ``clip = P @ V @ world``, NDC in
[-1, 1], screen coords in [0, 1].
"""

from __future__ import annotations

import jax.numpy as jnp

from voxelrt.ops.v3 import V3


def apply_mat4(m, v3, w):
    """Apply a 4x4 matrix to (..., 3) points with homogeneous w -> (..., 4).

    Written as explicit multiply-adds: a contraction would be routed to the
    MXU at default (bfloat16-pass) precision on TPU, which is catastrophic
    for camera transforms."""
    out = [
        m[i, 0] * v3[..., 0] + m[i, 1] * v3[..., 1] + m[i, 2] * v3[..., 2]
        + m[i, 3] * w
        for i in range(4)
    ]
    return jnp.stack(out, axis=-1)


def linearize_depth(depth, inv_proj):
    """renderer/space_transformations.py:6-8."""
    return 1.0 / ((depth * 2.0 - 1.0) * inv_proj[3, 2] + inv_proj[3, 3])


def delinearize_depth(lin_depth, proj):
    """renderer/space_transformations.py:10-12."""
    safe = jnp.where(lin_depth == 0.0, 1e-20, lin_depth)
    return ((-safe * proj[2, 2] + proj[2, 3]) / -safe) * -0.5 + 0.5


def screen_to_view(uv, depth, inv_proj):
    """renderer/space_transformations.py:14-20 — depth is non-linear [0,1]."""
    ndc = jnp.stack(
        [uv[..., 0] * 2.0 - 1.0, uv[..., 1] * 2.0 - 1.0,
         jnp.broadcast_to(depth, uv[..., 0].shape) * 2.0 - 1.0],
        axis=-1,
    )
    pos = apply_mat4(inv_proj, ndc, 1.0)
    return pos[..., :3] / pos[..., 3:4]


def view_to_screen(view_pos, proj):
    """renderer/space_transformations.py:22-26."""
    pos = apply_mat4(proj, view_pos, 1.0)
    return (pos[..., :3] / pos[..., 3:4]) * 0.5 + 0.5


def view_to_world(pos, inv_view, is_position=1.0):
    """renderer/space_transformations.py:28-30."""
    return apply_mat4(inv_view, pos, is_position)[..., :3]


def world_to_view(pos, view, is_position=1.0):
    """renderer/space_transformations.py:32-34."""
    return apply_mat4(view, pos, is_position)[..., :3]


# --- SoA variants (ops/v3.py V3 component triples; the render hot path) ----


def _apply_mat4_soa(m, v: V3, w):
    return tuple(
        m[i, 0] * v.x + m[i, 1] * v.y + m[i, 2] * v.z + m[i, 3] * w
        for i in range(4)
    )


def screen_to_view_soa(u, v, depth, inv_proj) -> V3:
    """screen_to_view on (u, v) screen-coordinate components."""
    ndc = V3(u * 2.0 - 1.0, v * 2.0 - 1.0,
             jnp.broadcast_to(depth, jnp.shape(u)) * 2.0 - 1.0)
    px, py, pz, pw = _apply_mat4_soa(inv_proj, ndc, 1.0)
    return V3(px / pw, py / pw, pz / pw)


def view_to_world_soa(pos: V3, inv_view, is_position=1.0) -> V3:
    x, y, z, _ = _apply_mat4_soa(inv_view, pos, is_position)
    return V3(x, y, z)


def world_to_view_soa(pos: V3, view, is_position=1.0) -> V3:
    x, y, z, _ = _apply_mat4_soa(view, pos, is_position)
    return V3(x, y, z)


def view_to_screen_z_soa(view_pos: V3, proj):
    """The z component of view_to_screen — all the G-buffer consumes."""
    z = (proj[2, 0] * view_pos.x + proj[2, 1] * view_pos.y
         + proj[2, 2] * view_pos.z + proj[2, 3])
    w = (proj[3, 0] * view_pos.x + proj[3, 1] * view_pos.y
         + proj[3, 2] * view_pos.z + proj[3, 3])
    return (z / w) * 0.5 + 0.5
