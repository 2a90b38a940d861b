"""Wavefront path-tracing sample pass.

TPU-native redesign of the reference's per-pixel megakernel
(renderer/pathtracer.py:355-632). One call traces one progressive sample for
every pixel: ray generation, a statically unrolled 4-deep bounce loop
(MAX_RAY_DEPTH, renderer/pathtracer.py:17) with NEE + MIS against the sun
cone light, sky/emissive termination, and the diffuse/specular split +
G-buffer epilogue. Divergence is handled with lane masks instead of thread
divergence; terminated rays cost nothing inside the traversal while-loop
because their `ray_max_t` is zeroed.

Reference quirks preserved on purpose (they are part of the image):
  * cone pdf that ignores orientation (renderer/math_utils.py:61-65);
  * the first-bounce BSDF-sample MIS weight is applied only to the ReSTIR
    reservoir copy of the integrand, NOT to the displayed contrib
    (renderer/pathtracer.py:571-574 vs :615);
  * firefly clamp at 300 (renderer/pathtracer.py:20-24);
  * light_weight = 3.0 multiplier (renderer/pathtracer.py:144);
  * emission is only added to the diffuse channel when the first-bounce lobe
    is diffuse (renderer/pathtracer.py:615);
  * Russian roulette disabled (renderer/pathtracer.py:527-533).

Divergence from the reference: an escaped first bounce adds a large finite
reflection distance instead of the reference's inf (which poisons its
reflection-depth G-buffer with NaNs, renderer/pathtracer.py:414-417,543-547).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from voxelrt.materials import fetch_material
from voxelrt.ops import packing
from voxelrt.ops.bsdf import (
    LOBE_DIFFUSE,
    LOBE_SPEC_REFL,
    ALL_FEATURES,
    MatFeatures,
    disney_eval_split_pdf,
    sample_disney,
)
from voxelrt.ops.dda import OccupancyPyramid, raytrace
from voxelrt.ops.sampling import (
    EPS,
    INF,
    cone_sample_pdf,
    dot,
    is_vec_zero,
    length,
    make_orthonormal_basis,
    normalize,
    power_heuristic,
    sample_cone_oriented,
    saturate,
)
from voxelrt.ops.transforms import (
    linearize_depth,
    screen_to_view_soa,
    view_to_screen_z_soa,
    view_to_world_soa,
    world_to_view_soa,
)
from voxelrt.ops import v3
from voxelrt.ops.v3 import V3, vclip, vwhere

SKY_REFLECTION_DIST = 1.0e4  # finite stand-in for the reference's inf

# Layout note: this module carries every per-ray 3-vector as a SoA V3
# (three dense (N,) components, ops/v3.py) rather than a packed (N, 3)
# array — on TPU the packed layout runs the whole shading glue at ~2.3%
# vreg lane utilization (see ops/v3.py; measured 3.2x elementwise /2.2x
# dot-chain win). Packed arrays appear only at module boundaries: the
# ReSTIR reservoir dict (render/restir.py) and the image-space outputs
# (render/pipeline.py stacks after the per-launch sample mean).


class SceneData(NamedTuple):
    """Immutable device-side scene (see voxelrt.world.VoxelWorld)."""

    occ_words: jax.Array  # u32 packed occupancy pyramid
    voxels: jax.Array  # u32[res³] z-major: r | g<<8 | b<<16 | mat<<24
    mat_params: jax.Array  # f32[128, 14] Disney palette
    sky: Any = None  # SkyData when physical sky enabled
    tables: Any = None  # ops.accel.PallasTables when use_pallas_dda


class RenderParams(NamedTuple):
    """Per-frame traced values (the reference's 0-D fields)."""

    camera_pos: jax.Array  # (3,)
    proj: jax.Array  # (4,4)
    proj_inv: jax.Array
    view: jax.Array
    view_inv: jax.Array
    prev_proj: jax.Array
    prev_view: jax.Array
    prev_camera_pos: jax.Array
    light_direction: jax.Array  # (3,) normalized
    light_cone_cos_theta_max: jax.Array  # ()
    light_color: jax.Array  # (3,)
    floor_height: jax.Array  # ()
    floor_color: jax.Array  # (3,)
    floor_material: jax.Array  # () i32
    background_color: jax.Array  # (3,)
    max_accum_frames: jax.Array  # ()
    taa_jitter: jax.Array  # (2,)
    frame_idx: jax.Array  # () i32
    voxel_edges: jax.Array = 0.06  # () f32 — traced so scenes that differ
    # only in edge width (Scene(voxel_edges=...)) share one compilation


def mat_features(cfg) -> MatFeatures:
    """Static Disney feature flags for this scene's palette subset (baked
    into cfg by HeadlessRenderer.prepare_data); () = unknown = all on."""
    if cfg.material_features:
        return MatFeatures(*cfg.material_features)
    return ALL_FEATURES


class _Pcg3dDraws:
    """Lazy per-slot uniform draws: ``draws[slot]`` hashes the per-pixel
    key pair with PCG3D (ops/sampling.pcg3d) instead of indexing a
    materialized (n_draws, N) threefry table. Slots group 3 to a PCG3D
    evaluation; repeated evaluations of a triple are XLA-CSE'd, and each
    draw fuses into its consumer (config.rng_draws)."""

    def __init__(self, k0, k1):
        self._k0 = k0
        self._k1 = k1

    def __getitem__(self, slot):
        from voxelrt.ops.sampling import pcg3d, u32_to_uniform

        t, c = divmod(int(slot), 3)
        salt = jnp.uint32((0x9E3779B9 * (t + 1)) & 0xFFFFFFFF)
        trip = pcg3d(self._k0, self._k1, salt)
        return u32_to_uniform(trip[c])


def march_unroll_of(cfg) -> int:
    """Resolve config.dda_march_unroll: the app shell's prepare_data
    replaces 'auto' with a scene-class-measured int (3 open / 2 enclosed,
    by the sun-openness statistic); configs built without the shell
    resolve to the open-scene value here."""
    u = cfg.dda_march_unroll
    return u if isinstance(u, int) else 3


def firefly_filter(v, cfg):
    """renderer/pathtracer.py:22-24."""
    if isinstance(v, V3):
        return vclip(v, 0.0, cfg.radiance_clamp)
    return jnp.clip(v, 0.0, cfg.radiance_clamp)


def fetch_voxel_surface(cfg, scene, ipos, uv, color_word=None,
                        voxel_edges=None):
    """Voxel surface color + edge darkening (renderer/voxel_world.py:34-56).

    ipos: V3 grid-space cell index in [0, res); uv: V3 in-cell frac.
    ``color_word`` short-circuits the grid gather when the traversal kernel
    already fetched the packed voxel word. Returns (color, is_light, mat_id).
    """
    res = cfg.grid_res
    if color_word is not None:
        word = color_word.astype(jnp.uint32)
    else:
        flat = (ipos.z * res + ipos.y) * res + ipos.x
        word = jnp.take(scene.voxels, jnp.maximum(flat, 0), axis=0, mode="clip")
    mat_id = (word >> 24).astype(jnp.int32)
    color = V3(
        (word & 0xFF).astype(jnp.float32) / 255.0,
        ((word >> 8) & 0xFF).astype(jnp.float32) / 255.0,
        ((word >> 16) & 0xFF).astype(jnp.float32) / 255.0,
    )
    boundary = cfg.voxel_edges if voxel_edges is None else voxel_edges

    def near_edge(c):
        return ((c < boundary) | (c > 1.0 - boundary)).astype(jnp.int32)

    count = near_edge(uv.x) + near_edge(uv.y) + near_edge(uv.z)
    f = (count >= 2).astype(jnp.float32)
    color = color * (1.0 - 0.9 * f)
    is_light = mat_id == 2
    return color, is_light, mat_id


class Hit(NamedTuple):
    closest: jax.Array  # (N,) world-space distance (inf = miss)
    normal: V3  # (N,) f32 components
    albedo: V3  # (N,) f32 components
    hit_light: jax.Array  # (N,) bool
    mat_id: jax.Array  # (N,) i32
    iters: jax.Array  # (N,) i32 traversal advance count


def _trace_voxels_sorted(cfg, tables, origin, d, tmin, mask,
                         shadow_ray: bool, sun_shadow: bool = False):
    """Route rays through the Pallas kernel in (alive, origin-cell-morton,
    direction-octant) order, then restore ray order. Masked-off rays trace
    with tmax 0 (dead); live rays with tmax ∞ (the voxel grid bounds the
    march; next_hit's closest-hit merge handles the floor plane).

    Bounce/shadow wavefronts are pixel-ordered but spatially scattered; the
    kernel's lock-step (8,128) blocks then pay worst-ray iteration counts and
    wide mask-fetch working sets. Sorting makes dead lanes vanish (their
    blocks exit after one iteration) and live blocks spatially tight. The
    route/unroute lax.sorts carry the minimum payload set: tmax is
    reconstructed from the routing key (dead ⇒ 0), and hit cell + normal
    come back packed in one u32 (the kernel's own pack_word layout).
    ``iters`` is returned in SORTED order (reduction-compatible only — the
    renderer never reads it per-ray).
    """
    from voxelrt.ops.dda_pallas import _morton3, raytrace_pallas

    n = origin.shape[0]
    r2 = cfg.grid_res // 4
    cx = jnp.clip(origin.x.astype(jnp.int32) >> 2, 0, r2 - 1)
    cy = jnp.clip(origin.y.astype(jnp.int32) >> 2, 0, r2 - 1)
    cz = jnp.clip(origin.z.astype(jnp.int32) >> 2, 0, r2 - 1)
    octant = (
        (d.x > 0).astype(jnp.int32)
        + 2 * (d.y > 0).astype(jnp.int32)
        + 4 * (d.z > 0).astype(jnp.int32)
    )
    DEAD = jnp.int32(0x7FFFFFFF)
    key = (_morton3(cx, cy, cz) << 3) | octant
    key = jnp.where(mask, key, DEAD)
    idx = jnp.arange(n, dtype=jnp.int32)
    skey, sidx, o0, o1, o2, d0, d1, d2 = jax.lax.sort(
        [key, idx, origin.x, origin.y, origin.z, d.x, d.y, d.z],
        num_keys=1, is_stable=False,
    )
    stmax = jnp.where(skey != DEAD, jnp.float32(INF), 0.0)
    so = V3(o0, o1, o2)
    sd = V3(d0, d1, d2)
    tr = raytrace_pallas(
        tables, so, sd, tmin, stmax, cfg.grid_res, cfg.max_dda_advances,
        fetch_colors=not shadow_ray, any_hit=shadow_ray,
        use_sun_open=sun_shadow,
        queue_depth=cfg.dda_queue_depth,
        refill_every=cfg.dda_refill_every,
        march_unroll=march_unroll_of(cfg),
        fetch_cadence=cfg.dda_fetch_cadence,
        interpret=cfg.pallas_interpret, block_rows=cfg.dda_block_rows,
    )
    if shadow_ray:
        _, dist = jax.lax.sort([sidx, tr.distance], num_keys=1,
                               is_stable=False)
        return tr._replace(distance=dist)
    # Pack hit cell + face normal into one u32 (same layout as the kernel's
    # loop state) so the unroute sort carries 4 payloads instead of 10.
    word = (
        (tr.ipos.x + 1) | ((tr.ipos.y + 1) << 8)
        | ((tr.ipos.z + 1) << 16)
        | ((tr.normal.x.astype(jnp.int32) + 1) << 24)
        | ((tr.normal.y.astype(jnp.int32) + 1) << 26)
        | ((tr.normal.z.astype(jnp.int32) + 1) << 28)
    )
    _, dist, word, col = jax.lax.sort(
        [sidx, tr.distance, word, tr.color_word.astype(jnp.int32)],
        num_keys=1, is_stable=False,
    )
    return tr._replace(
        distance=dist,
        ipos=V3((word & 255) - 1, ((word >> 8) & 255) - 1,
                ((word >> 16) & 255) - 1),
        normal=V3((((word >> 24) & 3) - 1).astype(jnp.float32),
                  (((word >> 26) & 3) - 1).astype(jnp.float32),
                  (((word >> 28) & 3) - 1).astype(jnp.float32)),
        color_word=col.astype(jnp.uint32),
    )


def next_hit(cfg, scene, params, pos, d, mask, shadow_ray: bool,
             coherent: bool = False, sun_shadow: bool = False,
             nee_u=None):
    """Closest hit of floor plane + voxel grid (renderer/pathtracer.py:218-244).

    mask: rays to trace; others are skipped inside the traversal loop.
    ``coherent`` marks ray sets already in tight screen-tile order (primary
    rays), which skip the sorted-routing path. ``sun_shadow`` marks shadow
    rays sampled within the directional-light NEE cone, enabling the baked
    sun-visibility early-out (ops.accel.build_sun_open_bits) — only valid
    for that cone, so ReSTIR revalidation rays must not set it.

    ``nee_u``: (N, 2) cone uniforms enabling IN-KERNEL NEE (the traversal
    kernel itself traces each surviving surface's sun-cone shadow ray — see
    ops/dda_pallas.py). Returns (Hit, nee_visible) then; plain Hit
    otherwise. The floor-plane surface case is handled by passing the floor
    crossing as the kernel's alternative shadow origin; floor OCCLUSION of
    the shadow ray stays a closed-form check in the caller.
    """
    n = pos.shape[0]
    closest = jnp.full((n,), jnp.float32(INF))
    normal = v3.zeros((n,))
    albedo = v3.ones((n,))
    hit_light = jnp.zeros((n,), jnp.bool_)
    mat_id = jnp.zeros((n,), jnp.int32)

    # --- implicit floor plane (renderer/pathtracer.py:152-190)
    dy = d.y
    floor_dist = (params.floor_height - pos.y) / jnp.where(dy == 0.0, 1e-20, dy)
    hit_pos = pos + d * floor_dist
    # The reference's extent check subtracts the scalar dot(hit_pos, normal)
    # from the vector hit_pos (a quirky broadcast) — reproduced verbatim.
    extent = length(hit_pos - hit_pos.y)
    floor_ok = mask & (floor_dist > EPS) & (floor_dist < closest) & (extent < 10.0)
    closest = jnp.where(floor_ok, floor_dist, closest)
    normal = vwhere(floor_ok, V3(0.0, 1.0, 0.0), normal)
    # Floor normal flip (pathtracer.py:186-187).
    flip = floor_ok & (dy > 0.0)
    normal = vwhere(flip, -normal, normal)
    albedo = vwhere(floor_ok, v3.splat(params.floor_color), albedo)
    hit_light = jnp.where(floor_ok, params.floor_material == 2, hit_light)
    mat_id = jnp.where(floor_ok, params.floor_material.astype(jnp.int32), mat_id)

    # --- voxel grid (renderer/pathtracer.py:192-216)
    inv_size = 1.0 / cfg.voxel_dx
    offset = cfg.grid_offset
    eye_scaled = pos * inv_size - offset  # world_to_voxel (pathtracer.py:165-167)
    tmax = jnp.where(mask, jnp.float32(INF), 0.0)
    color_word = None
    if cfg.use_pallas_dda:
        if cfg.sort_rays and not coherent:
            assert nee_u is None
            tr = _trace_voxels_sorted(
                cfg, scene.tables, eye_scaled, d, EPS, mask, shadow_ray,
                sun_shadow=sun_shadow,
            )
        else:
            from voxelrt.ops.dda_pallas import raytrace_pallas

            nee = None
            if nee_u is not None:
                # floor crossing as the kernel's alternative shadow origin
                # (grid units; the 10-unit extent bound is the reference's
                # floor clamp, renderer/pathtracer.py:152-190)
                floor_valid = mask & (floor_dist > EPS) & (extent < 10.0)
                alt_t = jnp.where(floor_valid, floor_dist * inv_size,
                                  jnp.float32(jnp.inf))
                ldir = jnp.asarray(params.light_direction, jnp.float32)
                tang_l, bitang_l = make_orthonormal_basis(ldir)
                nee = dict(
                    u=nee_u, alt_t=alt_t, light_dir=ldir, tangent=tang_l,
                    bitangent=bitang_l,
                    cone_cos=params.light_cone_cos_theta_max,
                    eps_grid=EPS * inv_size, shadow_tmin=EPS,
                )
            tr = raytrace_pallas(
                scene.tables, eye_scaled, d, EPS, tmax, cfg.grid_res,
                cfg.max_dda_advances, fetch_colors=not shadow_ray,
                any_hit=shadow_ray, use_sun_open=sun_shadow,
                queue_depth=(1 if coherent and nee is None
                             else cfg.dda_queue_depth),
                refill_every=cfg.dda_refill_every,
                march_unroll=march_unroll_of(cfg),
                fetch_cadence=cfg.dda_fetch_cadence,
                sun_mode=cfg.dda_sun_mode,
                resolve_steps=cfg.dda_resolve_steps,
                nee_src_open=cfg.dda_nee_src_open == "on",
                interpret=cfg.pallas_interpret,
                block_rows=cfg.dda_block_rows,
                nee=nee,
                # Queued dispatches skip dead wavefront lanes entirely
                # (terminated paths at later depths drain for free); their
                # outputs are the canonical miss, which every consumer
                # below already masks by ``mask``/vox_ok.
                alive=mask,
            )
        color_word = tr.color_word
    else:
        assert nee_u is None, "in-kernel NEE requires the Pallas backend"
        pyr = OccupancyPyramid(scene.occ_words, cfg.grid_res, cfg.n_lods)
        tr = raytrace(pyr, v3.stack(eye_scaled), v3.stack(d), EPS, tmax,
                      cfg.max_dda_advances)
        tr = tr._replace(ipos=v3.load(tr.ipos), normal=v3.load(tr.normal))
    vox_dist = tr.distance * cfg.voxel_dx
    vox_ok = mask & (vox_dist < closest)
    closest = jnp.where(vox_ok, vox_dist, closest)
    if not shadow_ray:
        uv = vclip(
            eye_scaled + d * tr.distance - tr.ipos.astype(jnp.float32),
            0.0,
            1.0,
        )
        color, v_is_light, v_mat = fetch_voxel_surface(
            cfg, scene, tr.ipos, uv, color_word=color_word,
            voxel_edges=params.voxel_edges,
        )
        normal = vwhere(vox_ok, tr.normal, normal)
        albedo = vwhere(vox_ok, color, albedo)
        hit_light = jnp.where(vox_ok, v_is_light, hit_light)
        mat_id = jnp.where(vox_ok, v_mat, mat_id)

    hit_out = Hit(closest, normal, albedo, hit_light, mat_id, tr.iters)
    if nee_u is not None:
        return hit_out, tr.nee_visible
    return hit_out


def get_cast_dir(cfg, params, key, u, v, camera_is_moving: bool,
                 render_scale: float, jitter_u=None):
    """Primary ray directions (renderer/pathtracer.py:293-312).

    The TAA jitter is drawn per SAMPLE from the sample key (the reference
    draws it per frame in set_proj_mat, renderer/pathtracer.py:263-265; one
    progressive sample here == one frame there), so a static-camera
    accumulation anti-aliases exactly like the reference's frame loop.

    ``jitter_u``: optional (u0, u1) raw uniform components replacing the
    per-call draw — used when several samples' rays are traced in one
    batched wavefront, each sample slice carrying its own sample-key jitter.
    """
    iw = jnp.float32(1.0 / cfg.image_res[0])
    ih = jnp.float32(1.0 / cfg.image_res[1])
    tc_u = (u + 0.5) * iw / render_scale
    tc_v = (v + 0.5) * ih / render_scale
    if not camera_is_moving:
        if jitter_u is None:
            ju = jax.random.uniform(jax.random.fold_in(key, 417), (2,))
            j0, j1 = ju[0], ju[1]
        else:
            j0, j1 = jitter_u
        tc_u = tc_u + (j0 * 2.0 - 1.0) * iw * 0.5
        tc_v = tc_v + (j1 * 2.0 - 1.0) * ih * 0.5
    d = normalize(screen_to_view_soa(tc_u, tc_v, 1.0, params.proj_inv))
    d = view_to_world_soa(d, params.view_inv, 0.0)
    return normalize(d)


def sample_sky(cfg, scene, params, d, u3, scattered=False, want_trans=True):
    """Sky radiance for escaped rays: constant background or precomputed
    skybox (renderer/pathtracer.py:499-517). ``want_trans=False`` returns
    ``(scatt, None)`` and skips the transmittance-map work."""
    if cfg.use_physical_sky:
        from voxelrt.sky.atmos import sample_skybox

        return sample_skybox(cfg, scene.sky, d, u3, scattered=scattered,
                             want_trans=want_trans)
    n = d.shape[0]
    scatt = v3.map1(lambda c: jnp.broadcast_to(c, (n,)),
                    v3.splat(params.background_color))
    if not want_trans:
        return scatt, None
    return scatt, v3.ones((n,))


def _sky_emission(cfg, params, d, scatt, trans):
    """Escape radiance: in-scatter + sun disk through the transmittance
    (renderer/pathtracer.py:499-517)."""
    hit_sun = (
        dot(v3.splat(params.light_direction), d)
        >= params.light_cone_cos_theta_max
    ).astype(jnp.float32)
    return firefly_filter(
        scatt
        + trans * cfg.light_weight * v3.splat(params.light_color) * hit_sun,
        cfg,
    )


def sky_transmittance(cfg, scene, d):
    """Sun transmittance for NEE (renderer/pathtracer.py:465-466).

    ``d`` is a V3 (per-ray directions) or a packed (1, 3) array (the
    cone-centre evaluation); the return layout follows the input."""
    if cfg.use_physical_sky:
        from voxelrt.sky.atmos import sample_skybox_transmittance

        return sample_skybox_transmittance(cfg, scene.sky, d)
    if isinstance(d, V3):
        one = jnp.ones(d.shape, jnp.float32)
        return V3(one, one, one)
    return jnp.ones(d.shape[:-1] + (3,), jnp.float32)


def nee_transmittance(cfg, scene, params, light_dir):
    """Sun transmittance for a cone-sampled NEE direction set (a V3).

    cfg.nee_transmittance == 'center' evaluates the skybox once at the cone
    centre (a (1,)-component fetch, broadcast over the wavefront) — see
    config.py for the measured sub-percent deviation bound; 'per_ray'
    fetches per direction like the reference
    (renderer/pathtracer.py:465-466). The ReSTIR path always fetches per
    ray: its GRIS shift re-evaluates stored NEE terms (render/restir.py)
    and must see the same transmittance function."""
    if (cfg.nee_transmittance == "center" and cfg.use_physical_sky
            and not cfg.use_restir_pt):
        t = sky_transmittance(
            cfg, scene, jnp.asarray(params.light_direction)[None, :]
        )
        return v3.load(t)  # (1,) components, broadcast over the wavefront
    return sky_transmittance(cfg, scene, light_dir)


def trace_sample(cfg, scene, params, key, u, v,
                 camera_is_moving: bool, render_scale: float,
                 sample_keys=None, jitter_u=None):
    """Trace one progressive sample for pixels (u, v) — the megakernel body
    (renderer/pathtracer.py:355-632). Returns a dict of per-pixel outputs.

    ``sample_keys``/``jitter_u``: per-ray base keys and raw TAA uniforms for
    BATCHED wavefronts — several samples' rays traced as one SoA wavefront
    (pipeline.accumulate builds them so each sample slice draws exactly the
    randoms it would draw traced alone). Batching multiplies the ray count
    the sorted traversal dispatches see, which compacts dead lanes into
    whole dead blocks and tightens per-block fetch working sets.
    """
    n = u.shape[0]
    f3 = lambda: jnp.zeros((n, 3), jnp.float32)  # packed (ReSTIR boundary)
    v3z = lambda: v3.zeros((n,))

    d = get_cast_dir(cfg, params, key, u, v, camera_is_moving, render_scale,
                     jitter_u=jitter_u)
    pos = v3.map1(lambda c: jnp.broadcast_to(c, (n,)),
                  v3.splat(params.camera_pos))

    # is_outside_render_area (renderer/pathtracer.py:289-291).
    inside = ~(
        (u > render_scale * cfg.image_res[0]) | (v > render_scale * cfg.image_res[1])
    )

    contrib = v3z()
    throughput = v3.ones((n,))

    primary_normal_oct = (jnp.zeros((n,), jnp.float16),
                          jnp.zeros((n,), jnp.float16))
    primary_pos = v3z()
    primary_mat_info = jnp.zeros((n,), jnp.uint32)
    primary_albedo = v3.ones((n,))

    first_bounce_lobe_id = jnp.zeros((n,), jnp.int32)
    first_bounce_invpdf = jnp.ones((n,), jnp.float32)
    first_nee_diffuse = v3z()
    first_nee_specular = v3z()
    first_bounce_dir = v3z()
    first_light_sample_bsdf_pdf = jnp.ones((n,), jnp.float32)
    first_bounce_reflection_dist = jnp.zeros((n,), jnp.float32)
    is_sky_ray = jnp.zeros((n,), jnp.bool_)

    # Deferred escape-sky state (one skybox evaluation per sample; the
    # ReSTIR path needs per-depth sky values for its rc bookkeeping and
    # keeps the inline evaluation).
    defer_sky = not cfg.use_restir_pt
    zero_n = jnp.zeros((n,), jnp.float32)
    esc_dir = V3(zero_n, jnp.ones((n,), jnp.float32), zero_n)
    esc_u3 = v3z()
    esc_weight = v3z()

    tracing = inside  # rays still walking the bounce loop

    # Counter-based per-pixel RNG (SURVEY.md §7): every uniform is a pure
    # function of (global pixel id, sample key, draw slot), so renders are
    # bitwise independent of how pixels are sharded across chips — the
    # dp-only multi-chip paths reproduce the single-device image exactly
    # (shaped jax.random draws would depend on the local shard shape).
    pid = u.astype(jnp.int32) * jnp.int32(cfg.image_res[1]) + v.astype(jnp.int32)
    n_draws = 8 * cfg.max_ray_depth + 1
    if sample_keys is None:
        keys_px = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, pid)
    else:
        keys_px = jax.vmap(jax.random.fold_in)(sample_keys, pid)
    if cfg.rng_draws == "pcg3d":
        # Derive each draw slot by hashing (key lo, key hi, slot) with
        # PCG3D: every use fuses into its consumer's elementwise chain —
        # no (n_draws, N) table in HBM, no row-extraction relayouts
        # (~3 ms/spp at 720p×8spl, PERF_NOTES.md). Slots come in triples
        # sharing one PCG3D evaluation (XLA CSE merges the repeats).
        kd = keys_px
        if kd.dtype != jnp.uint32:  # new-style typed PRNG keys
            kd = jax.random.key_data(keys_px)
        draws = _Pcg3dDraws(kd[:, 0], kd[:, 1])
    else:
        # out_axes=1 lays the draws out (n_draws, N): each slot is a dense
        # sublane row.
        draws = jax.vmap(lambda k: jax.random.uniform(k, (n_draws,)),
                         out_axes=1)(keys_px)

    # ReSTIR-PT input-sample state (renderer/pathtracer.py:336-347, 381-391);
    # only materialized when the feature is compiled in. Kept PACKED — this
    # dict is the render/restir.py module boundary.
    if cfg.use_restir_pt:
        rc = dict(
            rc_pos=f3(), rc_normal=f3(), rc_incident_dir=f3(),
            rc_incident_L=f3(), rc_NEE_dir=f3(),
            rc_mat_info=jnp.zeros((n,), jnp.uint32),
        )
        throughput_after_rc = jnp.ones((n, 3), jnp.float32)
        rc_bounce_lobe_id = jnp.zeros((n,), jnp.int32)

    # In-kernel NEE: the traversal kernel itself traces each surface's
    # sun-cone shadow ray (ops/dda_pallas.py nee=...), replacing the
    # separate any-hit dispatch per depth. Only on the unsorted Pallas path
    # with a directional light; ReSTIR keeps explicit dispatches (its
    # revalidation rays are not sun-cone samples).
    use_knee = (cfg.nee_in_kernel and cfg.use_pallas_dda
                and cfg.use_directional_light and not cfg.use_restir_pt
                and not cfg.sort_rays)

    for depth in range(cfg.max_ray_depth):
        base = 8 * depth
        u_nee = (draws[base], draws[base + 1])
        u_bsdf = (draws[base + 2], draws[base + 3], draws[base + 4])
        u_sky = V3(draws[base + 5], draws[base + 6], draws[base + 7])

        if use_knee:
            hit, knee_vis = next_hit(cfg, scene, params, pos, d, tracing,
                                     shadow_ray=False, coherent=depth == 0,
                                     nee_u=u_nee)
        else:
            hit = next_hit(cfg, scene, params, pos, d, tracing,
                           shadow_ray=False, coherent=depth == 0)
        hit_mat = fetch_material(scene.mat_params, hit.mat_id, hit.albedo,
                                 used_ids=cfg.material_ids)
        finite_closest = jnp.isfinite(hit.closest)
        hit_pos = pos + d * jnp.where(finite_closest, hit.closest, 0.0)

        if depth == 0:
            oct_x, oct_y = packing.encode_unit_vector_3x16_soa(hit.normal)
            primary_normal_oct = (
                jnp.where(tracing, oct_x, primary_normal_oct[0]),
                jnp.where(tracing, oct_y, primary_normal_oct[1]),
            )
            primary_pos = vwhere(tracing & finite_closest, hit_pos,
                                 primary_pos)
            primary_mat_info = jnp.where(
                tracing,
                packing.encode_material_soa(hit.mat_id, hit.albedo),
                primary_mat_info,
            )
            primary_albedo = vwhere(tracing, hit.albedo, primary_albedo)
        elif depth == 1:
            add_refl = tracing & (first_bounce_lobe_id != LOBE_DIFFUSE)
            first_bounce_reflection_dist = first_bounce_reflection_dist + jnp.where(
                add_refl,
                jnp.where(finite_closest, hit.closest, SKY_REFLECTION_DIST),
                0.0,
            )
            if cfg.use_restir_pt:
                # rc vertex capture (renderer/pathtracer.py:409-414).
                t3 = tracing[..., None]
                rc["rc_pos"] = jnp.where(t3, v3.stack(hit_pos), rc["rc_pos"])
                rc["rc_normal"] = jnp.where(t3, v3.stack(hit.normal),
                                            rc["rc_normal"])
                rc["rc_mat_info"] = jnp.where(
                    tracing,
                    packing.encode_material_soa(hit.mat_id, hit.albedo),
                    rc["rc_mat_info"],
                )
        elif depth == 2:
            if cfg.use_restir_pt:
                # renderer/pathtracer.py:416-417.
                rc["rc_incident_dir"] = jnp.where(
                    tracing[..., None], v3.stack(d), rc["rc_incident_dir"]
                )

        surf = tracing & ~hit.hit_light & finite_closest
        term_sky = tracing & ~hit.hit_light & ~finite_closest
        term_light = tracing & hit.hit_light & finite_closest

        # --- miss → sky (renderer/pathtracer.py:499-517)
        if defer_sky:
            # A ray escapes at most once, so the (expensive) skybox fetch is
            # DEFERRED: record the escape direction/weight here and evaluate
            # the sky exactly once after the bounce loop — 1 skybox fetch per
            # sample instead of max_ray_depth of them.
            esc_dir = vwhere(term_sky, d, esc_dir)
            esc_u3 = vwhere(term_sky, u_sky, esc_u3)
            esc_weight = vwhere(term_sky, throughput, esc_weight)
        else:
            sky_scatt, sky_trans = sample_sky(cfg, scene, params, d, u_sky)
            sky_emission = _sky_emission(cfg, params, d, sky_scatt, sky_trans)
            contrib = contrib + vwhere(
                term_sky, throughput * sky_emission, 0.0
            )
        if depth == 0:
            is_sky_ray = term_sky
            primary_pos = vwhere(term_sky, 0.0, primary_pos)
        if cfg.use_restir_pt:
            if depth == 1:
                # Escape at the rc vertex: rc_pos becomes a direction and
                # rc_incident_L the sky color (renderer/pathtracer.py:512-514).
                rc["rc_pos"] = jnp.where(term_sky[..., None], v3.stack(d),
                                         rc["rc_pos"])
                rc["rc_incident_L"] = jnp.where(
                    term_sky[..., None], v3.stack(sky_emission),
                    rc["rc_incident_L"]
                )
            if depth >= 2:
                rc["rc_incident_L"] = rc["rc_incident_L"] + jnp.where(
                    term_sky[..., None],
                    firefly_filter(
                        throughput_after_rc * v3.stack(sky_emission), cfg),
                    0.0,
                )

        # --- emissive voxel/floor hit terminates (pathtracer.py:518-525)
        if depth > 0:
            contrib = contrib + vwhere(
                term_light, throughput * hit.albedo, 0.0
            )
        if cfg.use_restir_pt and depth >= 2:
            rc["rc_incident_L"] = rc["rc_incident_L"] + jnp.where(
                term_light[..., None],
                firefly_filter(
                    throughput_after_rc * v3.stack(hit.albedo), cfg),
                0.0,
            )

        tracing = surf

        # --- surface shading (runs at every depth incl. the last: the
        # reference shades + NEEs before the loop counter expires) ----------
        spos = hit_pos + hit.normal * EPS
        view = -d
        tang, bitang = make_orthonormal_basis(hit.normal)

        nee_visible = jnp.zeros((n,), jnp.float32)
        if cfg.use_directional_light:
            ld = v3.splat(params.light_direction)
            light_dir = sample_cone_oriented(
                params.light_cone_cos_theta_max,
                v3.map1(lambda c: jnp.broadcast_to(c, (n,)), ld),
                u_nee,
            )
            ndl = dot(light_dir, hit.normal)
            # one fused lobe stack for the NEE pdf AND its bsdf value
            # (bitwise equal to pdf_disney + disney_evaluate_split)
            bsdf_d, bsdf_s, light_sample_bsdf_pdf = disney_eval_split_pdf(
                hit_mat, view, hit.normal, light_dir, tang, bitang,
                feat=mat_features(cfg),
            )
            if depth == 0:
                first_light_sample_bsdf_pdf = jnp.where(
                    surf, light_sample_bsdf_pdf, first_light_sample_bsdf_pdf
                )

            shadow_mask = surf & (ndl > 0.0)
            if use_knee:
                # kernel verdict covers voxel occlusion; the floor plane is
                # a closed-form check (renderer/pathtracer.py:152-190 quirky
                # extent bound included)
                dyl = light_dir.y
                fd = (params.floor_height - spos.y) / jnp.where(
                    dyl == 0.0, 1e-20, dyl)
                hpf = spos + light_dir * fd
                floor_occ = (fd > EPS) & (length(hpf - hpf.y) < 10.0)
                visible = shadow_mask & (knee_vis != 0) & ~floor_occ
            else:
                sh = next_hit(cfg, scene, params, spos, light_dir,
                              shadow_mask, shadow_ray=True, sun_shadow=True)
                visible = shadow_mask & ~jnp.isfinite(sh.closest)
            nee_visible = visible.astype(jnp.float32)

            light_mis = jnp.float32(1.0)
            if depth > 0:
                light_pdf = cone_sample_pdf(params.light_cone_cos_theta_max, 1.0)
                light_mis = power_heuristic(light_pdf, light_sample_bsdf_pdf)

            strans = nee_transmittance(cfg, scene, params, light_dir)
            scale = (
                (light_mis * cfg.light_weight * jnp.maximum(ndl, 0.0))
                * v3.splat(params.light_color) * strans
            )
            nee_d = bsdf_d * scale
            nee_s = bsdf_s * scale
            if depth == 0:
                first_nee_diffuse = first_nee_diffuse + vwhere(
                    visible, firefly_filter(throughput * nee_d, cfg), 0.0
                )
                first_nee_specular = first_nee_specular + vwhere(
                    visible, firefly_filter(throughput * nee_s, cfg), 0.0
                )
            else:
                contrib = contrib + vwhere(
                    visible,
                    firefly_filter(throughput * (nee_d + nee_s), cfg),
                    0.0,
                )
            if cfg.use_restir_pt:
                if depth == 1:
                    # renderer/pathtracer.py:454-455.
                    rc["rc_NEE_dir"] = jnp.where(
                        visible[..., None], v3.stack(light_dir),
                        rc["rc_NEE_dir"]
                    )
                if depth >= 2:
                    # renderer/pathtracer.py:475-476 (no firefly clamp here).
                    rc["rc_incident_L"] = rc["rc_incident_L"] + jnp.where(
                        visible[..., None],
                        throughput_after_rc * v3.stack(nee_d + nee_s),
                        0.0,
                    )

        # --- next bounce (renderer/pathtracer.py:479-497). The reference
        # samples a bounce at the last depth too, but its result is never
        # used — skip it here.
        if depth == cfg.max_ray_depth - 1:
            break
        new_d, bsdf, pdf, lobe = sample_disney(hit_mat, view, hit.normal, tang,
                                               bitang, u_bsdf,
                                               feat=mat_features(cfg))
        bounce_weight = bsdf * saturate(dot(new_d, hit.normal))
        if depth == 0:
            first_bounce_invpdf = jnp.where(surf, 1.0 / pdf, first_bounce_invpdf)
            first_bounce_lobe_id = jnp.where(surf, lobe, first_bounce_lobe_id)
            first_bounce_dir = vwhere(surf, new_d, first_bounce_dir)
            if cfg.use_directional_light:
                first_light_sample_dir = vwhere(surf, light_dir, 0.0)
        else:
            bounce_weight = bounce_weight / pdf
            bsdf_light_pdf = cone_sample_pdf(
                params.light_cone_cos_theta_max,
                dot(v3.splat(params.light_direction), new_d),
            )
            bounce_weight = bounce_weight * power_heuristic(
                pdf, nee_visible * bsdf_light_pdf
            )
        if cfg.use_restir_pt:
            if depth == 1:
                rc_bounce_lobe_id = jnp.where(surf, lobe, rc_bounce_lobe_id)
            if depth >= 2:
                throughput_after_rc = jnp.where(
                    surf[..., None],
                    throughput_after_rc * v3.stack(bounce_weight),
                    throughput_after_rc,
                )
        throughput = vwhere(surf, throughput * bounce_weight, throughput)
        d = vwhere(surf, new_d, d)
        pos = vwhere(surf, spos, pos)

    # --- deferred escape sky (single fetch for the whole bounce loop) -------
    if defer_sky:
        esc_any = v3.any_nonzero(esc_weight)
        # The transmittance map is only consumed through the sun-disk term
        # of _sky_emission — i.e. for escape directions INSIDE the NEE sun
        # cone (hit_sun gates it). That is exactly the 0.72° domain over
        # which nee_transmittance='center' was bounded (<0.7% max deviation,
        # config.py), so the same cone-centre value substitutes for the
        # whole per-ray transmittance fetch + its share of the sort route.
        cheap_sun_trans = (cfg.nee_transmittance == "center"
                          and cfg.use_physical_sky)
        sky_scatt, sky_trans = sample_sky(
            cfg, scene, params, esc_dir, esc_u3, scattered=True,
            want_trans=not cheap_sun_trans,
        )
        if sky_trans is None:
            sky_trans = v3.load(sky_transmittance(
                cfg, scene, jnp.asarray(params.light_direction)[None, :]
            ))  # (1,) components broadcast over the wavefront
        sky_emission = _sky_emission(cfg, params, esc_dir, sky_scatt, sky_trans)
        contrib = contrib + vwhere(esc_any, esc_weight * sky_emission, 0.0)

    # --- epilogue (renderer/pathtracer.py:535-632) ---------------------------
    primary_pos_view = world_to_view_soa(primary_pos, params.view)
    gbuff_depth = view_to_screen_z_soa(primary_pos_view, params.proj)

    primary_dir = normalize(primary_pos - v3.splat(params.camera_pos))
    virtual_point = primary_pos + primary_dir * first_bounce_reflection_dist
    refl_depth = view_to_screen_z_soa(
        world_to_view_soa(virtual_point, params.view), params.proj
    )
    gbuff_depth_reflection = jnp.where(
        first_bounce_reflection_dist != 0.0,
        linearize_depth(refl_depth, params.proj_inv),
        0.0,
    )

    # Primary-vertex MIS (renderer/pathtracer.py:556-605).
    from voxelrt.ops.sampling import luminance

    nee_d_out = first_nee_diffuse
    nee_s_out = first_nee_specular
    chose_nee = jnp.zeros((n,), jnp.bool_)
    reservoir = None
    if cfg.use_directional_light:
        light_pdf_one = cone_sample_pdf(params.light_cone_cos_theta_max, 1.0)
        light_sample_mis = power_heuristic(light_pdf_one, first_light_sample_bsdf_pdf)
        apply = ~is_sky_ray
        if not cfg.use_restir_pt:
            nee_d_out = vwhere(apply, nee_d_out * light_sample_mis, nee_d_out)
            nee_s_out = vwhere(apply, nee_s_out * light_sample_mis, nee_s_out)

    if cfg.use_restir_pt:
        # Build the input reservoir (renderer/pathtracer.py:549-607) —
        # PACKED throughout (the render/restir.py module boundary).
        z = dict(rc)
        z["F"] = v3.stack(contrib)
        z["lobes"] = rc_bounce_lobe_id * 10 + first_bounce_lobe_id
        dir_x1x2 = z["rc_pos"] - v3.stack(primary_pos)
        denom = jnp.abs(dot(normalize(dir_x1x2), z["rc_normal"]))
        z["cached_jacobian_term"] = dot(dir_x1x2, dir_x1x2) / jnp.maximum(
            denom, 1e-20
        )
        res_m = jnp.ones((n,), jnp.float32)
        res_weight = jnp.zeros((n,), jnp.float32)

        if cfg.use_directional_light:
            bsdf_pdf0 = 1.0 / first_bounce_invpdf
            bsdf_light_pdf0 = cone_sample_pdf(
                params.light_cone_cos_theta_max,
                dot(v3.splat(params.light_direction), first_bounce_dir),
            )
            bsdf_light_pdf0 = jnp.where(
                is_vec_zero(first_nee_diffuse + first_nee_specular),
                0.0, bsdf_light_pdf0,
            )
            bsdf_mis = power_heuristic(bsdf_pdf0, bsdf_light_pdf0)
            p_hat = luminance(z["F"])
            res_weight = bsdf_mis * p_hat * first_bounce_invpdf

            light_sample_weight = light_sample_mis * luminance(
                first_nee_diffuse + first_nee_specular
            )
            # WRS input of the NEE sample (renderer/pathtracer.py:588-598,
            # reservoir.py:65-74) — vectorized.
            u_wrs = draws[8 * cfg.max_ray_depth]
            new_weight = res_weight + light_sample_weight
            sel = (light_sample_weight > 0.0) & (
                u_wrs * new_weight <= light_sample_weight
            )
            sel = sel & apply
            strans0 = nee_transmittance(cfg, scene, params,
                                        first_light_sample_dir)
            light_z = dict(
                F=v3.stack(first_nee_diffuse + first_nee_specular),
                rc_pos=v3.stack(first_light_sample_dir),
                rc_normal=f3(),
                rc_incident_dir=f3(),
                rc_incident_L=v3.stack(
                    strans0 * cfg.light_weight
                    * v3.splat(params.light_color)
                ),
                rc_NEE_dir=f3(),
                rc_mat_info=jnp.zeros((n,), jnp.uint32),
                cached_jacobian_term=jnp.ones((n,), jnp.float32),
                lobes=jnp.full((n,), 99, jnp.int32),
            )
            for k in z:
                lz = light_z[k]
                z[k] = jnp.where(sel[..., None] if z[k].ndim == 2 else sel,
                                 lz.astype(z[k].dtype), z[k])
            res_weight = jnp.where(
                apply & (light_sample_weight > 0.0), new_weight, res_weight
            )
            res_m = jnp.where(apply, 2.0, res_m)  # input_sample does M += 1
            chose_nee = sel
        else:
            res_weight = luminance(z["F"]) * first_bounce_invpdf

        # finalize_without_M (reservoir.py:96-102) for non-sky rays.
        p_hat_final = luminance(z["F"])
        fin = jnp.where(p_hat_final < 1e-6, 0.0,
                        res_weight / jnp.maximum(p_hat_final, 1e-20))
        res_weight = jnp.where(is_sky_ray, 1.0, fin)
        reservoir = dict(z, M=res_m, weight=res_weight)

    prim_mat_id, prim_albedo_dec = packing.decode_material_word_soa(
        primary_mat_info)
    emission = vwhere(prim_mat_id == 2, prim_albedo_dec, 0.0)

    lobe_diff = first_bounce_lobe_id == LOBE_DIFFUSE
    lobe_spec = first_bounce_lobe_id == LOBE_SPEC_REFL
    if not cfg.use_restir_pt:
        diffuse = (
            vwhere(
                lobe_diff,
                contrib * first_bounce_invpdf + emission,
                0.0,
            )
            + nee_d_out
        )
        specular = (
            vwhere(lobe_spec, contrib * first_bounce_invpdf, 0.0)
            + nee_s_out
        )
    else:
        # renderer/pathtracer.py:620-626: the chosen input-sample integrand,
        # unweighted (the GRIS pass applies the reservoir weight).
        res_f = v3.load(reservoir["F"])
        diffuse = vwhere(
            chose_nee,
            first_nee_diffuse,
            vwhere(lobe_diff, res_f, 0.0),
        )
        specular = vwhere(
            chose_nee,
            first_nee_specular,
            vwhere(lobe_spec, res_f, 0.0),
        )

    if camera_is_moving and not cfg.use_restir_pt:
        # De-modulate albedo so temporal filtering works on irradiance
        # (renderer/pathtracer.py:628-631; with ReSTIR on, demodulation
        # happens at the end of the GRIS pass instead).
        diffuse = diffuse / v3.vmaximum(primary_albedo, 1e-2)

    out = dict(
        diffuse=diffuse.astype(jnp.float32),
        specular=specular.astype(jnp.float32),
        inside=inside,
        gbuff_normals=primary_normal_oct,
        gbuff_depth=gbuff_depth,
        gbuff_depth_reflection=gbuff_depth_reflection,
        gbuff_position=primary_pos,
        gbuff_mat_id=primary_mat_info,
    )
    if cfg.use_restir_pt:
        out["reservoir"] = reservoir
    return out
