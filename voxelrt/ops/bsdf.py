"""Disney BSDF: evaluate / sample / pdf, vectorized over ray batches.

TPU-native port of renderer/bsdf.py (references: Burley 2012/2015, the wdas
brdf explorer). The reference evaluates per-thread with branches; here every
lobe is computed data-parallel with `where` masking, which suits the VPU.

Preserved reference quirks (they are part of the image):
  * ``sample_disney`` returns only the *chosen* lobe's BSDF value and
    pdf = lobe_pdf * lobe_weight (renderer/bsdf.py:395-458), not the full
    mixture — the renderer relies on this for its ReSTIR lobewise math.
  * NaN/inf pdf guards return 1.0 (renderer/bsdf.py:378-380, 455-456).
  * ``disney_get_lobe_probabilities`` weighting (renderer/bsdf.py:352-363).

The translucent BSDF (renderer/bsdf.py:460-659) is dead code upstream — it
is never called by the renderer and contains an undefined-variable bug — so
it is deliberately not ported (SURVEY.md §2.5).
"""

from __future__ import annotations

import jax.numpy as jnp

from voxelrt.ops.sampling import (
    PI,
    dot,
    luminance,
    mix,
    normalize,
    reflect,
    sample_cosine_weighted_hemisphere,
    saturate,
    sqr,
)
from voxelrt.ops.v3 import (
    V3,
    cadd,
    cdiv,
    cmix,
    cmul,
    cwhere,
    is_v3,
    like3,
    ones_like3,
    vcross,
    vnormalize,
    vwhere,
)

# Layout note: every vector-valued formula below is written against the
# layout-polymorphic c* helpers (ops/v3.py), so the same source serves
# both packed (N, 3) callers (render/restir.py, tests — bit-identical to
# the previous explicit [..., None] broadcasts) and the SoA V3 render hot
# path (render/pathtracer.py), where it runs at full vreg lane density.

LOBE_DIFFUSE = 0
LOBE_SPEC_REFL = 1
LOBE_CLEARC = 2
LOBE_ALL = 9


from typing import NamedTuple


class MatFeatures(NamedTuple):
    """Static per-scene material feature flags (baked by the app shell from
    the palette rows reachable via cfg.material_ids). A False flag certifies
    the feature is 0.0 for every material that can occur, so the lobes it
    scales are exact zeros and trace-time specialization drops their math —
    bitwise identical except the measure-zero case where the reference's
    lobe-choice uniform lands in the float gap above dw+sw and picks the
    weight-0 clearcoat lobe (pdf 0 -> clamped; ~1 lane per 1e7 draws)."""

    subsurface: bool = True
    metallic: bool = True
    anisotropic: bool = True
    sheen: bool = True
    clearcoat: bool = True


ALL_FEATURES = MatFeatures()


def _pow5(x):
    x2 = x * x
    return x2 * x2 * x


def _safe_pow(x, p):
    return jnp.power(jnp.maximum(x, 1e-20), p)


def disney_subsurface(mat, n_dot_l, n_dot_v, l_dot_h, f_l, f_v):
    """renderer/bsdf.py:39-46."""
    fss90 = l_dot_h * l_dot_h * mat.roughness
    fss = mix(1.0, fss90, f_l) * mix(1.0, fss90, f_v)
    ss = 1.25 * (fss * (1.0 / jnp.maximum(n_dot_l + n_dot_v, 1e-7) - 0.5) + 0.5)
    return cmul(mat.base_col, (1.0 / PI) * ss)


def disney_diffuse(mat, n_dot_l, n_dot_v, l_dot_h, feat=ALL_FEATURES):
    """Diffuse + retro + subsurface + sheen (renderer/bsdf.py:48-67)."""
    r_r = 2.0 * mat.roughness * sqr(l_dot_h)
    f_l = _pow5(1.0 - n_dot_l)
    f_v = _pow5(1.0 - n_dot_v)

    f_lambert = mat.base_col / PI
    f_retro = cmul(f_lambert, r_r * (f_l + f_v + f_l * f_v * (r_r - 1.0)))
    f_d = cmul(f_lambert, (1.0 - 0.5 * f_l) * (1.0 - 0.5 * f_v)) + f_retro

    if feat.subsurface:
        ss = disney_subsurface(mat, n_dot_l, n_dot_v, l_dot_h, f_l, f_v)
        out = cmix(f_d, ss, mat.subsurface)
    else:
        out = f_d
    if feat.sheen:
        albedo_lum = luminance(mat.base_col)
        sheen_col = cwhere(
            albedo_lum > 0.0,
            cdiv(mat.base_col, jnp.maximum(albedo_lum, 1e-20)),
            1.0,
        )
        sheen_schlick = _pow5(1.0 - l_dot_h)
        sheen = cmul(
            cmul(cmix(ones_like3(sheen_col), sheen_col, mat.sheen_tint),
                 mat.sheen),
            sheen_schlick,
        )
        out = out + sheen
    return out


def gtr2_anisotropic(n_dot_h, h_dot_x, h_dot_y, ax, ay):
    """renderer/bsdf.py:69-71."""
    denom = PI * ax * ay * sqr(sqr(h_dot_x / ax) + sqr(h_dot_y / ay) + sqr(n_dot_h))
    return 1.0 / jnp.maximum(denom, 1e-20)


def smith_g_ggx_aniso(n_dot_v, v_dot_x, v_dot_y, ax, ay):
    """renderer/bsdf.py:73-75."""
    denom = n_dot_v + jnp.sqrt(
        jnp.maximum(sqr(v_dot_x * ax) + sqr(v_dot_y * ay) + sqr(n_dot_v), 0.0)
    )
    return 1.0 / jnp.where(denom == 0.0, 1e-20, denom)


def disney_fresnel(mat, l_dot_h, feat=ALL_FEATURES):
    """renderer/bsdf.py:77-83."""
    albedo_lum = luminance(mat.base_col)
    spec_tint = cwhere(
        albedo_lum > 0.0,
        cdiv(mat.base_col, jnp.maximum(albedo_lum, 1e-20)),
        1.0,
    )
    dielectric = cmul(
        cmix(ones_like3(spec_tint), spec_tint, mat.specular_tint),
        mat.specular * 0.08,
    )
    if feat.metallic:
        spec_col = cmix(dielectric, mat.base_col, mat.metallic)
    else:
        spec_col = dielectric
    f_l = _pow5(1.0 - l_dot_h)
    return cmix(spec_col, ones_like3(spec_col), f_l)


def _aniso_alphas(mat, feat=ALL_FEATURES):
    if not feat.anisotropic:  # aspect == 1.0 exactly
        ax = jnp.maximum(sqr(mat.roughness), 1e-3)
        return ax, ax
    aspect = jnp.sqrt(jnp.maximum(1.0 - 0.9 * mat.anisotropic, 0.0))
    ax = jnp.maximum(sqr(mat.roughness) / jnp.maximum(aspect, 1e-4), 1e-3)
    ay = jnp.maximum(sqr(mat.roughness) * aspect, 1e-3)
    return ax, ay


def disney_specular(mat, n_dot_l, n_dot_v, l_dot_h, n_dot_h, h_dot_x, h_dot_y,
                    l_dot_x, l_dot_y, v_dot_x, v_dot_y, feat=ALL_FEATURES):
    """Specular reflection lobe (renderer/bsdf.py:86-105). Note the
    reference's 1/(4 NdotL NdotV) is commented out there; kept identical."""
    ax, ay = _aniso_alphas(mat, feat)
    d = gtr2_anisotropic(n_dot_h, h_dot_x, h_dot_y, ax, ay)
    g = smith_g_ggx_aniso(n_dot_l, l_dot_x, l_dot_y, ax, ay) * smith_g_ggx_aniso(
        n_dot_v, v_dot_x, v_dot_y, ax, ay
    )
    f = disney_fresnel(mat, l_dot_h, feat)
    return cmul(f, d * g)


def gtr1(n_dot_h, alpha):
    """renderer/bsdf.py:112-121."""
    a2 = alpha * alpha
    t = 1.0 + (a2 - 1.0) * n_dot_h * n_dot_h
    d = (a2 - 1.0) / (PI * jnp.log(jnp.maximum(a2, 1e-20)) * t)
    return jnp.where(alpha >= 1.0, 1.0 / PI, d)


def smith_g_ggx(n_dot_v, alpha):
    """renderer/bsdf.py:123-127."""
    a2 = alpha * alpha
    b = n_dot_v * n_dot_v
    return 1.0 / jnp.maximum(n_dot_v + jnp.sqrt(jnp.maximum(a2 + b - a2 * b, 0.0)), 1e-20)


def disney_clearcoat(mat, n_dot_l, n_dot_v, n_dot_h, l_dot_h):
    """renderer/bsdf.py:129-135."""
    alpha = mix(0.1, 0.001, mat.clearcoat_gloss)
    d = gtr1(jnp.abs(n_dot_h), alpha)
    f = mix(0.04, 1.0, _pow5(1.0 - l_dot_h))
    g = smith_g_ggx(n_dot_l, 0.25) * smith_g_ggx(n_dot_v, 0.25)
    return mat.clearcoat * d * f * g


def _half_vectors(v, n, l, tang, bitang):
    h = normalize(l + v)
    return dict(
        n_dot_l=dot(n, l),
        n_dot_v=dot(n, v),
        l_dot_h=dot(l, h),
        n_dot_h=dot(n, h),
        h_dot_x=dot(h, tang),
        h_dot_y=dot(h, bitang),
        l_dot_x=dot(l, tang),
        l_dot_y=dot(l, bitang),
        v_dot_x=dot(v, tang),
        v_dot_y=dot(v, bitang),
        h=h,
    )


def _metallic_scale(bsdf_d, mat, feat):
    if not feat.metallic:  # (1 - 0) multiply is exact identity
        return bsdf_d
    return cmul(bsdf_d, 1.0 - mat.metallic)


def disney_evaluate_split(mat, v, n, l, tang, bitang, feat=ALL_FEATURES):
    """renderer/bsdf.py:138-172 — (diffuse, specular) with the
    upper-hemisphere gate."""
    q = _half_vectors(v, n, l, tang, bitang)
    valid = (q["n_dot_l"] > 0.0) & (q["n_dot_v"] > 0.0)

    bsdf_d = _metallic_scale(
        disney_diffuse(mat, q["n_dot_l"], q["n_dot_v"], q["l_dot_h"], feat),
        mat, feat,
    )
    bsdf_s = disney_specular(
        mat, q["n_dot_l"], q["n_dot_v"], q["l_dot_h"], q["n_dot_h"],
        q["h_dot_x"], q["h_dot_y"], q["l_dot_x"], q["l_dot_y"],
        q["v_dot_x"], q["v_dot_y"], feat,
    )
    if feat.clearcoat:
        bsdf_s = cadd(bsdf_s, disney_clearcoat(
            mat, q["n_dot_l"], q["n_dot_v"], q["n_dot_h"], q["l_dot_h"]
        ))

    return cwhere(valid, bsdf_d, 0.0), cwhere(valid, bsdf_s, 0.0)


def disney_evaluate(mat, v, n, l, tang, bitang, feat=ALL_FEATURES):
    """renderer/bsdf.py:174-177."""
    d, s = disney_evaluate_split(mat, v, n, l, tang, bitang, feat)
    return d + s


def disney_eval_split_pdf(mat, v, n, l, tang, bitang, feat=ALL_FEATURES):
    """Fused (diffuse, specular, mixture pdf) — bitwise equal to
    ``disney_evaluate_split`` + ``pdf_disney`` (renderer/bsdf.py:138-172,
    383-393) but sharing the half-vector frame, GTR/Smith terms and lobe
    weights between the two: the NEE inner loop calls both per depth on
    every lane, so the duplicate lobe stack is pure waste there.
    """
    q = _half_vectors(v, n, l, tang, bitang)
    valid = (q["n_dot_l"] > 0.0) & (q["n_dot_v"] > 0.0)
    ax, ay = _aniso_alphas(mat, feat)

    # shared lobe terms
    spec_d = gtr2_anisotropic(q["n_dot_h"], q["h_dot_x"], q["h_dot_y"], ax, ay)
    g1_v = smith_g_ggx_aniso(q["n_dot_v"], q["v_dot_x"], q["v_dot_y"], ax, ay)

    # evaluate (disney_evaluate_split)
    bsdf_d = _metallic_scale(
        disney_diffuse(mat, q["n_dot_l"], q["n_dot_v"], q["l_dot_h"], feat),
        mat, feat,
    )
    g = smith_g_ggx_aniso(q["n_dot_l"], q["l_dot_x"], q["l_dot_y"], ax, ay) * g1_v
    f = disney_fresnel(mat, q["l_dot_h"], feat)
    bsdf_s = cmul(f, spec_d * g)

    # pdf (pdf_disney); v_dot_h kept as its own dot for bitwise parity with
    # pdf_clearcoat's dot(v, h)
    dw, sw, cw = lobe_probabilities(mat, feat)
    pdf_d = saturate(q["n_dot_l"]) / PI
    pdf_s = (
        g1_v * jnp.abs(q["l_dot_h"]) * spec_d
        / jnp.maximum(jnp.abs(q["n_dot_l"]), 1e-20)
    )
    pdf = pdf_d * dw + pdf_s * sw
    if feat.clearcoat:
        cc_alpha = mix(0.1, 0.001, mat.clearcoat_gloss)
        cc_d = gtr1(jnp.abs(q["n_dot_h"]), cc_alpha)
        cc_f = mix(0.04, 1.0, _pow5(1.0 - q["l_dot_h"]))
        cc_g = smith_g_ggx(q["n_dot_l"], 0.25) * smith_g_ggx(q["n_dot_v"], 0.25)
        bsdf_s = cadd(bsdf_s, mat.clearcoat * cc_d * cc_f * cc_g)
        v_dot_h = dot(v, q["h"])
        pdf_c = cc_d * jnp.abs(q["n_dot_h"]) / jnp.where(
            v_dot_h == 0.0, 1e-20, 4.0 * v_dot_h
        )
        pdf = pdf + pdf_c * cw
    return cwhere(valid, bsdf_d, 0.0), cwhere(valid, bsdf_s, 0.0), pdf


def disney_evaluate_lobewise_split(mat, v, n, l, tang, bitang, lobe_id,
                                   specular_mult=1.0):
    """renderer/bsdf.py:306-344 — lobe_id is a traced per-ray int."""
    q = _half_vectors(v, n, l, tang, bitang)
    valid = (q["n_dot_l"] > 0.0) & (q["n_dot_v"] > 0.0)

    want_d = (lobe_id == LOBE_DIFFUSE) | (lobe_id == LOBE_ALL)
    want_s = (lobe_id == LOBE_SPEC_REFL) | (lobe_id == LOBE_ALL)
    want_c = (lobe_id == LOBE_CLEARC) | (lobe_id == LOBE_ALL)

    bsdf_d = cwhere(
        want_d & valid,
        cmul(disney_diffuse(mat, q["n_dot_l"], q["n_dot_v"], q["l_dot_h"]),
             1.0 - mat.metallic),
        0.0,
    )
    spec = disney_specular(
        mat, q["n_dot_l"], q["n_dot_v"], q["l_dot_h"], q["n_dot_h"],
        q["h_dot_x"], q["h_dot_y"], q["l_dot_x"], q["l_dot_y"],
        q["v_dot_x"], q["v_dot_y"],
    )
    cc = disney_clearcoat(mat, q["n_dot_l"], q["n_dot_v"], q["n_dot_h"], q["l_dot_h"])
    bsdf_s = cwhere(want_s & valid, spec * specular_mult, 0.0)
    bsdf_s = cadd(
        bsdf_s, jnp.where(want_c & valid, cc * specular_mult, 0.0)
    )
    return bsdf_d, bsdf_s


def disney_evaluate_lobewise(mat, v, n, l, tang, bitang, lobe_id, specular_mult=1.0):
    """renderer/bsdf.py:346-349."""
    d, s = disney_evaluate_lobewise_split(mat, v, n, l, tang, bitang, lobe_id,
                                          specular_mult)
    return d + s


def lobe_probabilities(mat, feat=ALL_FEATURES):
    """renderer/bsdf.py:351-363."""
    if feat.metallic:
        diffuse_w = (1.0 - mat.metallic) * jnp.clip(1.0 - mat.specular, 0.4, 0.9)
    else:
        diffuse_w = jnp.clip(1.0 - mat.specular, 0.4, 0.9)
    specular_w = 1.0 - diffuse_w
    if not feat.clearcoat:  # clearcoat_w == 0.0 exactly; sums/quotients exact
        w_sum = diffuse_w + specular_w
        return diffuse_w / w_sum, specular_w / w_sum, jnp.zeros_like(diffuse_w)
    clearcoat_w = mat.clearcoat * 0.7
    w_sum = diffuse_w + specular_w + clearcoat_w
    return diffuse_w / w_sum, specular_w / w_sum, clearcoat_w / w_sum


def pdf_diffuse(mat, n, l):
    """renderer/bsdf.py:179-182."""
    return saturate(dot(l, n)) / PI


def pdf_clearcoat(mat, v, n, l):
    """renderer/bsdf.py:191-199."""
    alpha = mix(0.1, 0.001, mat.clearcoat_gloss)
    h = normalize(v + l)
    n_dot_h = jnp.abs(dot(n, h))
    v_dot_h = dot(v, h)
    d = gtr1(n_dot_h, alpha)
    return d * n_dot_h / jnp.where(v_dot_h == 0.0, 1e-20, 4.0 * v_dot_h)


def pdf_specular(mat, v, n, l, tang, bitang):
    """renderer/bsdf.py:254-277 — anisotropic GGX VNDF pdf."""
    ax, ay = _aniso_alphas(mat)
    h = normalize(v + l)
    n_dot_l = jnp.abs(dot(n, l))
    n_dot_v = dot(n, v)
    l_dot_h = jnp.abs(dot(l, h))
    n_dot_h = dot(n, h)
    h_dot_x = dot(h, tang)
    h_dot_y = dot(h, bitang)
    v_dot_x = dot(v, tang)
    v_dot_y = dot(v, bitang)
    d = gtr2_anisotropic(n_dot_h, h_dot_x, h_dot_y, ax, ay)
    g = smith_g_ggx_aniso(n_dot_v, v_dot_x, v_dot_y, ax, ay)
    return g * l_dot_h * d / jnp.maximum(n_dot_l, 1e-20)


def _scrub_pdf(pdf):
    """NaN/inf guard -> 1.0 (renderer/bsdf.py:378-380, 455-456)."""
    return jnp.where(jnp.isfinite(pdf), pdf, 1.0)


def pdf_disney_lobewise(mat, v, n, l, tang, bitang, lobe_id):
    """renderer/bsdf.py:365-381."""
    dw, sw, cw = lobe_probabilities(mat)
    pdf = jnp.where(
        lobe_id == LOBE_DIFFUSE,
        pdf_diffuse(mat, n, l) * dw,
        jnp.where(
            lobe_id == LOBE_SPEC_REFL,
            pdf_specular(mat, v, n, l, tang, bitang) * sw,
            pdf_clearcoat(mat, v, n, l) * cw,
        ),
    )
    return _scrub_pdf(pdf)


def pdf_disney(mat, v, n, l, tang, bitang):
    """renderer/bsdf.py:383-393 — full mixture pdf (no NaN guard upstream)."""
    dw, sw, cw = lobe_probabilities(mat)
    return (
        pdf_diffuse(mat, n, l) * dw
        + pdf_specular(mat, v, n, l, tang, bitang) * sw
        + pdf_clearcoat(mat, v, n, l) * cw
    )


def _ggx_vndf_sample(mat, v, n, tang, bitang, ax, ay, u):
    """renderer/bsdf.py:226-252 — anisotropic GGX VNDF half-vector sample."""
    from voxelrt.ops.sampling import _uv2

    u0, u1 = _uv2(u)
    # View in tangent space with y along the normal (mat3(tang, n, bitang) @ v).
    vt0, vt1, vt2 = dot(tang, v), dot(n, v), dot(bitang, v)

    if is_v3(v):
        big_v = vnormalize(V3(vt0 * ax, vt1, vt2 * ay))
        up = V3(jnp.zeros((), big_v.x.dtype), jnp.ones((), big_v.x.dtype),
                jnp.zeros((), big_v.x.dtype))
        t1 = vwhere(
            big_v.y < 0.9999,
            vnormalize(vcross(big_v, up)),
            V3(jnp.ones((), big_v.x.dtype), jnp.zeros((), big_v.x.dtype),
               jnp.zeros((), big_v.x.dtype)),
        )
        t2 = vcross(t1, big_v)
        big_v_y = big_v.y
    else:
        big_v = normalize(
            jnp.stack([vt0 * ax, vt1, vt2 * ay], axis=-1)
        )
        up = jnp.zeros_like(big_v).at[..., 1].set(1.0)
        t1 = jnp.where(
            (big_v[..., 1] < 0.9999)[..., None],
            normalize(jnp.cross(big_v, up)),
            jnp.asarray([1.0, 0.0, 0.0], big_v.dtype),
        )
        t2 = jnp.cross(t1, big_v)
        big_v_y = big_v[..., 1]

    a = 1.0 / (1.0 + big_v_y)
    r = jnp.sqrt(u0)
    lo = u1 < a
    phi = jnp.where(
        lo,
        (u1 / jnp.maximum(a, 1e-20)) * PI,
        PI + (u1 - a) / jnp.maximum(1.0 - a, 1e-20) * PI,
    )
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi) * jnp.where(lo, 1.0, big_v_y)

    p3 = jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))
    m = cmul(t1, p1) + cmul(t2, p2) + cmul(big_v, p3)
    mx, my, mz = (m.x, m.y, m.z) if is_v3(m) else (
        m[..., 0], m[..., 1], m[..., 2])
    if is_v3(v):
        m = vnormalize(V3(ax * mx, my, ay * mz))
        m = tang * m.x + bitang * m.z + n * m.y
        m = vwhere(dot(m, v) < 0.0, -m, m)
        return m
    m = normalize(jnp.stack([ax * mx, my, ay * mz], axis=-1))
    # Back to world space.
    m = m[..., 0:1] * tang + m[..., 2:3] * bitang + m[..., 1:2] * n
    m = jnp.where((dot(m, v) < 0.0)[..., None], -m, m)
    return m


def sample_specular(mat, v, n, tang, bitang, u, feat=ALL_FEATURES):
    """renderer/bsdf.py:279-304 — returns (dir, pdf)."""
    ax, ay = _aniso_alphas(mat, feat)
    m = _ggx_vndf_sample(mat, v, n, tang, bitang, ax, ay, u)
    sampled = reflect(-v, m)
    n_dot_l = jnp.abs(dot(n, sampled))
    n_dot_v = dot(n, v)
    l_dot_h = jnp.abs(dot(sampled, m))
    n_dot_h = dot(n, m)
    h_dot_x = dot(m, tang)
    h_dot_y = dot(m, bitang)
    v_dot_x = dot(v, tang)
    v_dot_y = dot(v, bitang)
    d = gtr2_anisotropic(n_dot_h, h_dot_x, h_dot_y, ax, ay)
    g = smith_g_ggx_aniso(n_dot_v, v_dot_x, v_dot_y, ax, ay)
    pdf = g * l_dot_h * d / jnp.maximum(n_dot_l, 1e-20)
    return sampled, pdf


def sample_clearcoat(mat, v, n, tang, bitang, u):
    """renderer/bsdf.py:201-224 — GTR1 inverse-CDF sample, returns (dir, pdf)."""
    from voxelrt.ops.sampling import _uv2

    u0, u1 = _uv2(u)
    alpha = mix(0.1, 0.001, mat.clearcoat_gloss)
    a2 = sqr(alpha)
    cos_theta = jnp.sqrt(
        jnp.maximum(1e-4, (1.0 - _safe_pow(a2, 1.0 - u0)) / (1.0 - a2))
    )
    sin_theta = jnp.sqrt(jnp.maximum(1e-4, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * PI * u1
    m = (
        cmul(tang, sin_theta * jnp.cos(phi))
        + cmul(bitang, sin_theta * jnp.sin(phi))
        + cmul(n, cos_theta)
    )
    m = cwhere(dot(m, v) < 0.0, -m, m)
    sampled = reflect(-v, m)
    n_dot_h = jnp.abs(dot(n, m))
    v_dot_h = dot(v, m)
    d = gtr1(n_dot_h, alpha)
    pdf = d * n_dot_h / jnp.where(v_dot_h == 0.0, 1e-20, 4.0 * v_dot_h)
    return sampled, pdf


def sample_diffuse(mat, n, u):
    """renderer/bsdf.py:184-189 — returns (dir, pdf)."""
    d = sample_cosine_weighted_hemisphere(n, u)
    return d, saturate(dot(d, n)) / PI


def sample_disney(mat, v, n, tang, bitang, u3, feat=ALL_FEATURES):
    """renderer/bsdf.py:395-458 — returns (dir, brdf, pdf, lobe_id).

    u3: (..., 3) uniforms — lobe choice + 2-D lobe sample. All three lobe
    samplers share the 2-D uniforms; only the chosen lane is used, which is
    statistically equivalent to the reference's independent draws.
    """
    dw, sw, cw = lobe_probabilities(mat, feat)
    if isinstance(u3, tuple):
        u_lobe, u2 = u3[0], (u3[1], u3[2])
    else:
        u_lobe = u3[..., 0]
        u2 = u3[..., 1:3]

    dir_d, pdf_d = sample_diffuse(mat, n, u2)
    dir_s, pdf_s = sample_specular(mat, v, n, tang, bitang, u2, feat)

    choose_d = u_lobe <= dw
    choose_s = (~choose_d) & (u_lobe <= dw + sw)

    if feat.clearcoat:
        dir_c, pdf_c = sample_clearcoat(mat, v, n, tang, bitang, u2)
        lobe = jnp.where(choose_d, LOBE_DIFFUSE,
                         jnp.where(choose_s, LOBE_SPEC_REFL, LOBE_CLEARC))
        sample_dir = cwhere(choose_d, dir_d, cwhere(choose_s, dir_s, dir_c))
        pdf = jnp.where(choose_d, pdf_d, jnp.where(choose_s, pdf_s, pdf_c))
    else:
        # cw == 0 so the clearcoat branch is unreachable except the float
        # gap above dw+sw (see MatFeatures); fold it into specular.
        lobe = jnp.where(choose_d, LOBE_DIFFUSE, LOBE_SPEC_REFL)
        sample_dir = cwhere(choose_d, dir_d, dir_s)
        pdf = jnp.where(choose_d, pdf_d, pdf_s)
        choose_s = ~choose_d

    q = _half_vectors(v, n, sample_dir, tang, bitang)
    brdf_d = _metallic_scale(
        disney_diffuse(mat, q["n_dot_l"], q["n_dot_v"], q["l_dot_h"], feat),
        mat, feat,
    )
    brdf_s = disney_specular(
        mat, q["n_dot_l"], q["n_dot_v"], q["l_dot_h"], q["n_dot_h"],
        q["h_dot_x"], q["h_dot_y"], q["l_dot_x"], q["l_dot_y"],
        q["v_dot_x"], q["v_dot_y"], feat,
    )
    if feat.clearcoat:
        cc = disney_clearcoat(
            mat, q["n_dot_l"], q["n_dot_v"], q["n_dot_h"], q["l_dot_h"]
        )
        brdf_c = V3(cc, cc, cc) if is_v3(brdf_s) else cc[..., None]
        brdf = cwhere(choose_d, brdf_d, cwhere(choose_s, brdf_s, brdf_c))
    else:
        brdf = cwhere(choose_d, brdf_d, brdf_s)
    pdf = pdf * jnp.where(choose_d, dw, jnp.where(choose_s, sw, cw))
    pdf = _scrub_pdf(pdf)
    return sample_dir, brdf, pdf, lobe
