"""ReSTIR-PT: reservoirs, reconnection-shift mapping and the spatial GRIS
pass (renderer/reservoir.py + renderer/pathtracer.py:672-989).

Default-off like the reference (USE_RESTIR_PT=False, pathtracer.py:15);
enabled via RenderConfig.use_restir_pt. Reservoirs are SoA arrays; the
compressed storage applies the same quantization as the reference's
StorageReservoir (f16 M/W/jacobian, octahedral u32-packed normal+NEE dir,
f16 octahedral incident dir — reservoir.py:105-141) so numerical behavior
round-trips identically.

Reference quirks preserved:
  * the invalid-jacobian branch zeroes BOTH the jacobian and the shifted
    integrand (pathtracer.py:799-803 — `1/0 > 11` is always true);
  * `valid_samples + 1` division after finalize (pathtracer.py:977-978);
  * defensive pairwise MIS with the canonical reservoir
    (pathtracer.py:870-944).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from voxelrt.materials import fetch_material
from voxelrt.ops import packing
from voxelrt.ops.v3 import load as v3load
from voxelrt.ops.bsdf import (
    disney_evaluate,
    disney_evaluate_lobewise,
    disney_evaluate_lobewise_split,
    pdf_disney,
    pdf_disney_lobewise,
)
from voxelrt.ops.sampling import (
    INF,
    cone_sample_pdf,
    dot,
    hash3,
    is_vec_zero,
    luminance,
    make_orthonormal_basis,
    normalize,
    power_heuristic,
    saturate,
)
from voxelrt.ops.transforms import (
    linearize_depth,
    screen_to_view,
    view_to_world,
)

GOLDEN_ANGLE = 2.399963229728  # pathtracer.py:887

_FIELDS3 = ("F", "rc_pos", "rc_normal", "rc_incident_dir", "rc_incident_L",
            "rc_NEE_dir")


def _f16(x):
    return x.astype(jnp.float16).astype(jnp.float32)


def _oct_roundtrip(v, bits_sim):
    """Octahedral encode/decode with the zero-vector sentinel preserved.

    The reference packs rc_normal/rc_NEE_dir/rc_incident_dir octahedrally
    (reservoir.py:112-118) but uses the ZERO vector as its escape/terminated/
    shadowed flag (reservoir.py:25-33) — a zero vector octahedral-encodes
    through 0/0 and cannot survive its own storage round-trip (latent
    upstream bug in the default-off path). We quantize like the reference
    but keep exact zeros as zeros so the flags stay functional.
    """
    zero = is_vec_zero(v)
    dec = bits_sim(v)
    return jnp.where(zero[..., None], 0.0, dec)


def encode_reservoir(res):
    """Apply StorageReservoir quantization (renderer/reservoir.py:105-124)."""
    out = dict(res)
    out["M"] = _f16(res["M"])
    out["weight"] = _f16(res["weight"])

    def via_u32(v):
        oct_ = packing.encode_unit_vector_3x16(v).astype(jnp.float32)
        packed = packing.encode_u32_arb(
            jnp.stack([oct_[..., 0], oct_[..., 1], oct_[..., 0] * 0,
                       oct_[..., 1] * 0], axis=-1),
            (8, 8, 8, 8),
        )
        data = packing.decode_u32_arb(packed, (8, 8, 8, 8))
        return packing.decode_unit_vector_3x16(data[..., 0:2])

    def via_f16(v):
        return packing.decode_unit_vector_3x16(
            packing.encode_unit_vector_3x16(v)
        )

    out["rc_normal"] = _oct_roundtrip(res["rc_normal"], via_u32)
    out["rc_NEE_dir"] = _oct_roundtrip(res["rc_NEE_dir"], via_u32)
    out["rc_incident_dir"] = _oct_roundtrip(res["rc_incident_dir"], via_f16)
    out["cached_jacobian_term"] = _f16(res["cached_jacobian_term"])
    out["lobes"] = res["lobes"].astype(jnp.int8).astype(jnp.int32)
    return out


def init_reservoir_storage(cfg):
    """Two ping-pong slots of per-pixel reservoirs (pathtracer.py:107-109)."""
    w, h = cfg.image_res

    def slot():
        d = {k: jnp.zeros((w, h, 3), jnp.float32) for k in _FIELDS3}
        d["rc_mat_info"] = jnp.zeros((w, h), jnp.uint32)
        d["cached_jacobian_term"] = jnp.ones((w, h), jnp.float32)
        d["lobes"] = jnp.zeros((w, h), jnp.int32)
        d["M"] = jnp.zeros((w, h), jnp.float32)
        d["weight"] = jnp.zeros((w, h), jnp.float32)
        return d

    return (slot(), slot())


def shift(cfg, scene, params, dst_pos, dst_normal, dst_mat, src_reservoir):
    """Reconnection shift of a reservoir sample into a new primary vertex's
    domain (renderer/pathtracer.py:670-812).

    Returns (diffuse, specular, jacobian*passed_checks)."""
    z = src_reservoir
    rc_is_escape = is_vec_zero(z["rc_normal"])
    rc_is_last = is_vec_zero(z["rc_incident_dir"])
    rc_nee_visible = ~is_vec_zero(z["rc_NEE_dir"])

    to_rc = jnp.where(
        rc_is_escape[..., None], z["rc_pos"], normalize(z["rc_pos"] - dst_pos)
    )

    passed = jnp.where(
        (dot(dst_normal, to_rc) < 1e-5)
        | (~rc_is_escape & (dot(z["rc_normal"], -to_rc) < 1e-5)),
        0.0,
        1.0,
    )

    rc_tang, rc_bitang = make_orthonormal_basis(z["rc_normal"])
    rc_mat_id, rc_albedo = packing.decode_material_word(z["rc_mat_info"])
    rc_mat = fetch_material(scene.mat_params, rc_mat_id, rc_albedo,
                            used_ids=cfg.material_ids)
    rc_lobe = z["lobes"] // 10

    # rc-vertex bounce weights (pathtracer.py:694-717).
    has_bounce = ~rc_is_last & ~rc_is_escape
    rc_brdf = disney_evaluate_lobewise(
        rc_mat, -to_rc, z["rc_normal"], z["rc_incident_dir"], rc_tang, rc_bitang,
        rc_lobe,
    ) * saturate(dot(z["rc_normal"], z["rc_incident_dir"]))[..., None]
    dst_rc_pdf = pdf_disney_lobewise(
        rc_mat, -to_rc, z["rc_normal"], z["rc_incident_dir"], rc_tang, rc_bitang,
        rc_lobe,
    )

    rc_nee_brdf = disney_evaluate(
        rc_mat, -to_rc, z["rc_normal"], z["rc_NEE_dir"], rc_tang, rc_bitang
    ) * saturate(dot(z["rc_normal"], z["rc_NEE_dir"]))[..., None]

    # primary dst vertex (pathtracer.py:730-742): evaluate the source
    # sample's primary lobe.
    dst_tang, dst_bitang = make_orthonormal_basis(dst_normal)
    view = normalize(params.camera_pos - dst_pos)
    prim_d, prim_s = disney_evaluate_lobewise_split(
        dst_mat, view, dst_normal, to_rc, dst_tang, dst_bitang, z["lobes"] % 10
    )
    cosw = saturate(dot(dst_normal, to_rc))[..., None]
    prim_d = prim_d * cosw
    prim_s = prim_s * cosw

    # shifted integrand (pathtracer.py:759-782).
    contrib = jnp.zeros_like(z["F"])
    rc_bsdf_light_pdf = cone_sample_pdf(
        params.light_cone_cos_theta_max,
        dot(jnp.broadcast_to(params.light_direction, z["rc_incident_dir"].shape),
            z["rc_incident_dir"]),
    )
    rc_bsdf_mis = power_heuristic(
        dst_rc_pdf, rc_bsdf_light_pdf * rc_nee_visible.astype(jnp.float32)
    )
    clamp = lambda v: jnp.clip(v, 0.0, cfg.radiance_clamp)
    contrib = contrib + jnp.where(
        has_bounce[..., None],
        clamp(
            (rc_bsdf_mis / jnp.maximum(dst_rc_pdf, 1e-20))[..., None]
            * rc_brdf * z["rc_incident_L"]
        ),
        0.0,
    )
    contrib = contrib + jnp.where(
        rc_is_escape[..., None], clamp(z["rc_incident_L"]), 0.0
    )
    if cfg.use_directional_light:
        rc_light_bsdf_pdf = pdf_disney(
            rc_mat, -to_rc, z["rc_normal"], z["rc_NEE_dir"], rc_tang, rc_bitang
        )
        rc_light_pdf = cone_sample_pdf(params.light_cone_cos_theta_max, 1.0)
        rc_light_mis = power_heuristic(rc_light_pdf, rc_light_bsdf_pdf)
        if cfg.use_physical_sky:
            from voxelrt.sky.atmos import sample_skybox_transmittance

            strans = sample_skybox_transmittance(cfg, scene.sky, z["rc_NEE_dir"])
        else:
            strans = jnp.ones_like(contrib)
        contrib = contrib + jnp.where(
            (rc_nee_visible & ~rc_is_escape)[..., None],
            clamp(
                rc_light_mis[..., None] * rc_nee_brdf * strans
                * cfg.light_weight * params.light_color
            ),
            0.0,
        )
    contrib = contrib + jnp.where((rc_mat_id == 2)[..., None], rc_mat.base_col, 0.0)

    diffuse = prim_d * contrib
    specular = prim_s * contrib

    # jacobian (pathtracer.py:787-803).
    jac = jnp.ones(dst_pos.shape[:-1], jnp.float32)
    dir_y1_x2 = z["rc_pos"] - dst_pos
    d2 = dot(dir_y1_x2, dir_y1_x2)
    jac_conn = z["cached_jacobian_term"] * jnp.abs(
        dot(normalize(dir_y1_x2), z["rc_normal"])
    ) / jnp.maximum(d2, 1e-20)
    jac = jnp.where(rc_is_escape, jac, jac_conn)
    invalid = (jac < 0.0) | ~jnp.isfinite(jac)
    jac = jnp.where(invalid, 0.0, jac)
    # the reference's invalid branch always zeroes the integrand too.
    diffuse = jnp.where(invalid[..., None], 0.0, diffuse)
    specular = jnp.where(invalid[..., None], 0.0, specular)

    return diffuse, specular, jac * passed


def _gather_px(img, xi, yi):
    w, h = img.shape[0], img.shape[1]
    xi = jnp.clip(xi, 0, w - 1)
    yi = jnp.clip(yi, 0, h - 1)
    flat = img.reshape((w * h,) + img.shape[2:])
    return jnp.take(flat, xi * h + yi, axis=0, mode="clip")


def spatial_gris(cfg, scene, params, reservoir_img, color, color_spec, gbuffer,
                 frame, key, camera_is_moving, render_scale, pass_id=0,
                 pass_total=1):
    """Spatial GRIS resampling pass (renderer/pathtracer.py:815-989).

    Consumes the per-pixel input reservoirs from the render pass, performs
    ``cfg.restir_taps`` golden-spiral neighbor taps with defensive pairwise
    MIS, revalidates the winner with a shadow ray and writes the resolved
    diffuse/specular. Returns (color, color_spec, reservoir_slots).
    """
    from voxelrt.render.pathtracer import next_hit

    w, h = cfg.image_res
    n = w * h
    max_taps = cfg.restir_taps
    max_radius = cfg.restir_radius

    # Input reservoirs from the render pass ((W, H, ...) image-ordered),
    # quantized like the storage write at pathtracer.py:607.
    res_img = encode_reservoir(reservoir_img)

    ui = jnp.broadcast_to(jnp.arange(w)[:, None], (w, h)).reshape(-1)
    vi = jnp.broadcast_to(jnp.arange(h)[None, :], (w, h)).reshape(-1)
    inv_res = jnp.asarray([1.0 / w, 1.0 / h], jnp.float32)
    texcoord = (jnp.stack([ui, vi], axis=-1) + 0.5) * inv_res / render_scale

    center = {k: v.reshape((n,) + v.shape[2:]) for k, v in res_img.items()}

    center_depth_nl = gbuffer["depth"].reshape(-1)
    center_x1 = view_to_world(
        screen_to_view(texcoord, center_depth_nl, params.proj_inv),
        params.view_inv,
    )
    center_dist = jnp.sqrt(
        dot(center_x1 - params.camera_pos, center_x1 - params.camera_pos)
    )
    center_depth = linearize_depth(center_depth_nl, params.proj_inv)
    center_n1 = packing.decode_unit_vector_3x16(gbuffer["normals"].reshape(-1, 2))
    sky_px = is_vec_zero(center_x1)

    cmat_id, calbedo = packing.decode_material_word(gbuffer["mat_id"].reshape(-1))
    center_mat = fetch_material(scene.mat_params, cmat_id, calbedo,
                                used_ids=cfg.material_ids)

    # random offsets (pathtracer.py:830-837)
    seed_x = jnp.where(pass_id == 0, (ui >> 3).astype(jnp.uint32), jnp.uint32(2))
    seed_y = jnp.where(pass_id == 0, (vi >> 3).astype(jnp.uint32), jnp.uint32(2))
    seed = hash3(seed_x, seed_y,
                 (frame * 2 + pass_id).astype(jnp.uint32)
                 if hasattr(frame, "astype") else jnp.uint32(frame * 2 + pass_id))
    angle_shift = (
        ((seed & jnp.uint32(0x007FFFFF)) | jnp.uint32(0x3F800000)).astype(
            jnp.float32
        ) / 4294967295.0 * jnp.pi
    )
    radius_shift = jax.random.uniform(jax.random.fold_in(key, 17), (n,))

    out_res = {k: jnp.zeros_like(v) for k, v in center.items()}
    out_res["cached_jacobian_term"] = jnp.ones_like(
        center["cached_jacobian_term"]
    )
    out_M = jnp.zeros((n,), jnp.float32)
    out_weight = jnp.zeros((n,), jnp.float32)
    valid_samples = jnp.zeros((n,), jnp.float32)
    canonical_mis_weight = jnp.ones((n,), jnp.float32)
    chosen_f_d = jnp.zeros((n, 3), jnp.float32)
    chosen_f_s = jnp.zeros((n, 3), jnp.float32)

    def z_of(res):
        return {k: res[k] for k in
                (*_FIELDS3, "rc_mat_info", "cached_jacobian_term", "lobes")}

    center_z = z_of(center)

    def tap_body(i, carry):
        (out_M, out_weight, valid_samples, canonical_mis_weight,
         chosen_f_d, chosen_f_s, out_res) = carry
        fi = i.astype(jnp.float32)
        angle = (fi + angle_shift) * GOLDEN_ANGLE
        offset_radius = jnp.sqrt((fi + radius_shift) / max_taps) * max_radius
        ox = (jnp.cos(angle) * offset_radius).astype(jnp.int32)
        oy = (jnp.sin(angle) * offset_radius).astype(jnp.int32)
        nonzero = (ox != 0) | (oy != 0)

        tx = ui.astype(jnp.int32) + ox
        ty = vi.astype(jnp.int32) + oy
        tap_texcoord = (
            jnp.stack([tx, ty], axis=-1).astype(jnp.float32) + 0.5
        ) * inv_res / render_scale

        nb_n1 = packing.decode_unit_vector_3x16(
            _gather_px(gbuffer["normals"], tx, ty)
        )
        nb_depth_nl = _gather_px(gbuffer["depth"], tx, ty)
        nb_x1 = view_to_world(
            screen_to_view(tap_texcoord, nb_depth_nl, params.proj_inv),
            params.view_inv,
        )
        nb_dist = jnp.sqrt(dot(nb_x1 - params.camera_pos,
                               nb_x1 - params.camera_pos))
        nb_res = {k: _gather_px(v, tx, ty) for k, v in res_img.items()}

        gate = nonzero & ~(
            (jnp.abs(nb_dist - center_dist) > 0.1 * center_dist)
            | (dot(center_n1, nb_n1) < 0.5)
        )

        nb_mat_word = _gather_px(gbuffer["mat_id"], tx, ty)
        nmat_id, nalbedo = packing.decode_material_word(nb_mat_word)
        nb_mat = fetch_material(scene.mat_params, nmat_id, nalbedo,
                                used_ids=cfg.material_ids)

        # Shift center sample into neighbor's domain and vice versa.
        c_d, c_s, c_jac = shift(cfg, scene, params, nb_x1, nb_n1, nb_mat,
                                center_z)
        s_d, s_s, jac = shift(cfg, scene, params, center_x1, center_n1,
                              center_mat, z_of(nb_res))

        center_p_hat = luminance(c_d + c_s) * c_jac
        canonical_weight = center_p_hat * nb_res["M"]
        canonical_weight = canonical_weight / jnp.maximum(
            center_p_hat * nb_res["M"]
            + luminance(center["F"]) * center["M"] / max_taps,
            1e-20,
        )
        canonical_mis_weight = canonical_mis_weight + jnp.where(
            gate, 1.0 - canonical_weight, 0.0
        )

        p_hat = luminance(s_d + s_s)
        p_hat_from_nb = p_hat / jnp.maximum(jac, 1e-20)
        nb_mis = p_hat_from_nb * nb_res["M"]
        nb_mis = nb_mis / jnp.maximum(
            p_hat_from_nb * nb_res["M"] + p_hat * center["M"] / max_taps, 1e-20
        )
        nb_mis = jnp.where(jnp.isfinite(nb_mis), nb_mis, 0.0)

        in_w = nb_res["weight"] * p_hat * jac * nb_mis
        in_w = jnp.where(gate, in_w, 0.0)

        # WRS merge (reservoir.py:77-87).
        out_M = out_M + jnp.where(gate, nb_res["M"], 0.0)
        new_weight = out_weight + in_w
        u = jax.random.uniform(jax.random.fold_in(key, 100 + i), (n,))
        sel = (in_w > 0.0) & (u * new_weight <= in_w)
        out_weight = new_weight
        shifted_z = dict(z_of(nb_res))
        shifted_z["F"] = s_d + s_s
        out_res = dict(out_res)
        for k in out_res:
            if k in ("M", "weight"):
                continue
            val = shifted_z[k]
            out_res[k] = jnp.where(
                sel[..., None] if out_res[k].ndim == 2 else sel,
                val.astype(out_res[k].dtype), out_res[k],
            )
        chosen_f_d = jnp.where(sel[..., None], s_d, chosen_f_d)
        chosen_f_s = jnp.where(sel[..., None], s_s, chosen_f_s)
        valid_samples = valid_samples + gate.astype(jnp.float32)
        return (out_M, out_weight, valid_samples, canonical_mis_weight,
                chosen_f_d, chosen_f_s, out_res)

    # A fori_loop (not a python unroll) keeps ONE tap's temporaries live at
    # a time: the 32-tap unroll let XLA overlap tap pipelines and blew HBM
    # at 720p (16 GB exceeded by the prefetch copies of the (n, …) temps).
    (out_M, out_weight, valid_samples, canonical_mis_weight,
     chosen_f_d, chosen_f_s, out_res) = jax.lax.fori_loop(
        0, max_taps, tap_body,
        (out_M, out_weight, valid_samples, canonical_mis_weight,
         chosen_f_d, chosen_f_s, out_res),
    )

    # Visibility revalidation of the chosen sample (pathtracer.py:959-967).
    escape = is_vec_zero(out_res["rc_normal"])
    to_rc = jnp.where(
        escape[..., None], out_res["rc_pos"],
        normalize(out_res["rc_pos"] - center_x1),
    )
    origin = center_x1 + center_n1 * (0.003 * center_dist)[..., None]
    # next_hit is SoA (V3) — this GRIS pass is packed; convert at the call.
    sh = next_hit(cfg, scene, params, v3load(origin), v3load(to_rc), ~sky_px,
                  shadow_ray=True)
    actual = jnp.where(
        escape, jnp.float32(INF),
        jnp.sqrt(dot(center_x1 - out_res["rc_pos"],
                     center_x1 - out_res["rc_pos"])),
    )
    occluded = jnp.isfinite(sh.closest) & (
        jnp.abs(sh.closest - actual) > 0.1 * actual
    )
    out_weight = jnp.where(occluded, 0.0, out_weight)

    # Merge the canonical sample (pathtracer.py:970-975).
    c_p_hat = luminance(center["F"])
    in_w = center["weight"] * c_p_hat * canonical_mis_weight
    out_M = out_M + center["M"]
    new_weight = out_weight + in_w
    u = jax.random.uniform(jax.random.fold_in(key, 55), (n,))
    sel = ((in_w > 0.0) & (u * new_weight <= in_w)) | occluded
    out_weight = jnp.where(in_w > 0.0, new_weight, out_weight)
    for k in out_res:
        if k in ("M", "weight"):
            continue
        val = center_z[k]
        out_res[k] = jnp.where(
            sel[..., None] if out_res[k].ndim == 2 else sel,
            val.astype(out_res[k].dtype), out_res[k],
        )
    chosen_f_d = jnp.where(sel[..., None], color.reshape(-1, 3), chosen_f_d)
    chosen_f_s = jnp.where(sel[..., None], color_spec.reshape(-1, 3), chosen_f_s)

    # finalize_without_M + /(valid+1) (pathtracer.py:977-978).
    p_hat_final = luminance(out_res["F"])
    out_weight = jnp.where(
        p_hat_final < 1e-6, 0.0, out_weight / jnp.maximum(p_hat_final, 1e-20)
    )
    out_weight = out_weight / (valid_samples + 1.0)

    # Final color (pathtracer.py:981-986).
    emission = jnp.where((cmat_id == 2)[..., None], center_mat.base_col, 0.0)
    wgt = jnp.clip(out_weight, 0.0, 50.0)[..., None]
    f_d = chosen_f_d
    if camera_is_moving:
        f_d = f_d / jnp.maximum(center_mat.base_col, 1e-2)
    new_color = f_d * wgt + emission
    new_color_s = chosen_f_s * wgt

    # Sky pixels bypass resampling (pathtracer.py:858-860).
    new_color = jnp.where(sky_px[..., None], center["F"], new_color)
    new_color_s = jnp.where(sky_px[..., None], color_spec.reshape(-1, 3),
                            new_color_s)

    # update cached jacobian + store (pathtracer.py:988-989).
    dir_x1x2 = out_res["rc_pos"] - center_x1
    denom = jnp.abs(dot(normalize(dir_x1x2), out_res["rc_normal"]))
    out_res["cached_jacobian_term"] = dot(dir_x1x2, dir_x1x2) / jnp.maximum(
        denom, 1e-20
    )
    out_res["M"] = out_M
    out_res["weight"] = out_weight
    stored = encode_reservoir(out_res)
    slot_out = {k: v.reshape((w, h) + v.shape[1:]) for k, v in stored.items()}

    return (
        new_color.reshape(w, h, 3),
        new_color_s.reshape(w, h, 3),
        (res_img, slot_out),
    )
