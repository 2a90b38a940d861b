"""Tonemapping and display transform (renderer/math_utils.py:160-186,
renderer/pathtracer.py:634-662).
"""

from __future__ import annotations

import jax.numpy as jnp

from voxelrt.ops.sampling import saturate, smoothstep


def uchimura(x):
    """Uchimura 2017 'HDR theory and practice' (renderer/math_utils.py:163-186)."""
    P = 1.0  # max display brightness
    a = 1.0  # contrast
    m = 0.22  # linear section start
    l = 0.4  # linear section length
    c = 1.33  # black
    b = 0.0  # pedestal

    l0 = ((P - m) * l) / a
    S0 = m + l0
    S1 = m + a * l0
    C2 = (a * P) / (P - S1)
    CP = -C2 / P

    w0 = 1.0 - smoothstep(0.0, m, x)
    w2 = jnp.where(x >= m + l0, 1.0, 0.0)  # ti.math.step
    w1 = 1.0 - w0 - w2

    T = m * jnp.power(jnp.maximum(x, 0.0) / m, c) + b
    S = P - (P - S1) * jnp.exp(CP * (x - S0))
    L = m + a * (x - m)

    return T * w0 + L * w1 + S * w2


def render_to_image(hdr, cfg, exposure, render_scale):
    """Display transform (renderer/pathtracer.py:634-662).

    hdr: (W, H, 3) color buffer at full resolution; sampling at
    ``render_scale``-scaled coordinates reproduces the reference's
    nearest-fetch upscale while the camera moves. Returns (W, H, 3) LDR.
    """
    w, h = hdr.shape[0], hdr.shape[1]
    ui = jnp.arange(w, dtype=jnp.float32)[:, None]
    vj = jnp.arange(h, dtype=jnp.float32)[None, :]
    uv = jnp.stack(
        [jnp.broadcast_to(ui / w, (w, h)), jnp.broadcast_to(vj / h, (w, h))], axis=-1
    )

    center = jnp.asarray(cfg.vignette_center, dtype=jnp.float32)
    dist = jnp.sqrt(jnp.sum((uv - center) ** 2, axis=-1))
    darken = 1.0 - cfg.vignette_strength * jnp.maximum(
        dist - cfg.vignette_radius, 0.0
    )

    # Nearest fetch at scaled coordinates (renderer/pathtracer.py:643-644).
    si = jnp.clip((ui[:, 0] * render_scale).astype(jnp.int32), 0, w - 1)
    sj = jnp.clip((vj[0, :] * render_scale).astype(jnp.int32), 0, h - 1)
    sampled = hdr[si][:, sj]

    ldr = saturate(
        jnp.power(uchimura(sampled * darken[..., None] * exposure), 1.0 / 2.2)
    )
    return ldr
