"""Independent light-transport oracle (main.py scene).

A from-scratch numpy path tracer sharing NO code with voxelrt's renderer:
ray-vs-every-voxel AABB intersection instead of a DDA, uniform-hemisphere
sampling instead of the renderer's lobewise cosine/VNDF scheme, and its own
transcription of the Disney BRDF formulas (Burley 2012; same published
formulas renderer/bsdf.py implements, including the reference's omitted
1/(4 NdotL NdotV) normalization, renderer/bsdf.py:86-105 — that quirk is
part of the image spec). Both estimators must converge to the same mean
radiance on the main.py scene (floor plane + one emissive voxel + red
background, /root/reference/main.py) — an end-to-end check of composed
light transport that the self-captured golden images cannot provide.

Sun NEE is disabled (light_color = 0) so the comparison isolates the
BSDF-sampled transport; the NEE estimator is covered by unit tests and the
ReSTIR bias test.
"""

import numpy as np
import jax
import jax.numpy as jnp

from voxelrt.camera import look_at_matrix, perspective_matrix
from voxelrt.config import RenderConfig
from voxelrt.materials import MaterialList
from voxelrt.render.pathtracer import RenderParams, SceneData, trace_sample
from voxelrt.world import VoxelWorld

RES = (24, 24)
GRID = 32
DX = 1.0 / 16.0
MAX_DEPTH = 4
EPS = 1e-6
CAM_POS = (0.6, 0.45, 1.1)
LOOK_AT = (0.03, 0.03, 0.0)
FLOOR_H = -0.05
FLOOR_COL = (1.0, 1.0, 1.0)
BG = (1.0, 0.0, 0.0)
VOX_COL = (0.9, 0.1, 0.1)

# Default material row (renderer/materials.py:49-63): the only BSDF the
# scene evaluates (floor, material 1).
SPECULAR = 0.04
ROUGH = 0.9


def _q8(c):
    """world.set_voxels albedo quantization (voxelrt/world.py:112)."""
    return np.floor(np.clip(np.asarray(c, np.float64), 0.0, 1.0) * 255) / 255.0


# ---------------------------------------------------------------------------
# voxelrt side
# ---------------------------------------------------------------------------


def _make_setup():
    cfg = RenderConfig(image_res=RES, grid_res=GRID, voxel_dx=DX,
                       voxel_edges=0.0, use_directional_light=False,
                       max_ray_depth=MAX_DEPTH)
    world = VoxelWorld(cfg.voxel_dx, cfg.grid_res, cfg.voxel_edges)
    world.set_voxels(np.array([[0, 0, 0]]), 2, np.array(VOX_COL))
    arrays = world.device_arrays()
    scene = SceneData(occ_words=arrays["occ_words"], voxels=arrays["voxels"],
                      mat_params=MaterialList().params, sky=None)
    proj = perspective_matrix(cfg.fov, cfg.aspect_ratio, cfg.z_near, cfg.z_far)
    view = look_at_matrix(CAM_POS, LOOK_AT, (0, 1, 0))
    params = RenderParams(
        camera_pos=jnp.asarray(CAM_POS, jnp.float32),
        proj=jnp.asarray(proj), proj_inv=jnp.asarray(np.linalg.inv(proj)),
        view=jnp.asarray(view), view_inv=jnp.asarray(np.linalg.inv(view)),
        prev_proj=jnp.asarray(proj), prev_view=jnp.asarray(view),
        prev_camera_pos=jnp.asarray(CAM_POS, jnp.float32),
        light_direction=jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
        light_cone_cos_theta_max=jnp.float32(np.cos(0.05)),
        light_color=jnp.zeros(3, jnp.float32),  # sun off (see module doc)
        floor_height=jnp.float32(FLOOR_H),
        floor_color=jnp.asarray(FLOOR_COL, jnp.float32),
        floor_material=jnp.int32(1),
        background_color=jnp.asarray(BG, jnp.float32),
        max_accum_frames=jnp.float32(1e9),
        taa_jitter=jnp.zeros(2, jnp.float32),
        frame_idx=jnp.int32(0),
        voxel_edges=jnp.float32(0.0),
    )
    return cfg, scene, params


def _render_mean(cfg, scene, params, n_samples):
    w, h = cfg.image_res
    u = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[:, None], (w, h))
    v = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[None, :], (w, h))
    u, v = u.reshape(-1), v.reshape(-1)

    @jax.jit
    def batch(key):
        out = trace_sample(cfg, scene, params, key, u, v, False, 1.0)
        from voxelrt.ops import v3

        return jnp.mean(v3.stack(out["diffuse"] + out["specular"]), axis=0)

    acc = np.zeros(3)
    for s in range(n_samples):
        acc += np.asarray(batch(jax.random.PRNGKey(s)))
    return acc / n_samples


# ---------------------------------------------------------------------------
# oracle side (pure numpy, float64)
# ---------------------------------------------------------------------------


def _oracle_dirs(rng, n_rays, proj_inv, view_inv):
    w, h = RES
    u = np.repeat(np.arange(w), h)
    v = np.tile(np.arange(h), w)
    u = np.tile(u, n_rays // (w * h))
    v = np.tile(v, n_rays // (w * h))
    tx = (u + rng.random(len(u))) / w
    ty = (v + rng.random(len(v))) / h
    ndc = np.stack([tx * 2 - 1, ty * 2 - 1, np.ones_like(tx)], -1)
    hom = np.concatenate([ndc, np.ones((len(ndc), 1))], -1)
    vpos = hom @ proj_inv.T
    vdir = vpos[:, :3] / vpos[:, 3:4]
    vdir /= np.linalg.norm(vdir, axis=-1, keepdims=True)
    wdir = np.concatenate([vdir, np.zeros((len(vdir), 1))], -1) @ view_inv.T
    d = wdir[:, :3]
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def _disney_eval(albedo, n, v, l):
    """Disney diffuse+retro and specular GTR2 for the default material
    (metallic/sheen/clearcoat/subsurface/aniso = 0), transcribed from
    Burley 2012 §5 with the reference's dropped 1/(4 NdotL NdotV)."""
    ndl = np.einsum("ij,ij->i", n, l)
    ndv = np.einsum("ij,ij->i", n, v)
    hv = l + v
    hv /= np.maximum(np.linalg.norm(hv, axis=-1, keepdims=True), 1e-20)
    ldh = np.einsum("ij,ij->i", l, hv)
    ndh = np.einsum("ij,ij->i", n, hv)
    valid = (ndl > 0) & (ndv > 0)

    fl = (1 - ndl) ** 5
    fv = (1 - ndv) ** 5
    rr = 2.0 * ROUGH * ldh * ldh
    f_base = (1 - 0.5 * fl) * (1 - 0.5 * fv)
    f_retro = rr * (fl + fv + fl * fv * (rr - 1.0))
    diff = albedo[None, :] / np.pi * (f_base + f_retro)[:, None]

    a = max(ROUGH * ROUGH, 1e-3)
    a2 = a * a
    den = ndh * ndh * (a2 - 1.0) + 1.0
    d_gtr2 = a2 / np.maximum(np.pi * den * den, 1e-20)

    def g1(nd):
        return 1.0 / np.maximum(nd + np.sqrt(a2 + nd * nd * (1.0 - a2)), 1e-20)

    g = g1(ndl) * g1(ndv)
    f0 = SPECULAR * 0.08
    fr = f0 + (1.0 - f0) * (1 - ldh) ** 5
    spec = (d_gtr2 * g * fr)[:, None].repeat(3, axis=1)
    out = diff + spec
    out[~valid] = 0.0
    return out


def _oracle_trace(n_rays, seed, proj_inv, view_inv):
    rng = np.random.default_rng(seed)
    pos = np.broadcast_to(np.asarray(CAM_POS, np.float64), (n_rays, 3)).copy()
    d = _oracle_dirs(rng, n_rays, proj_inv, view_inv)
    vox_col = _q8(VOX_COL)
    # world AABB of grid voxel (0,0,0): grid cell (16,16,16), offset -16
    lo = np.zeros(3)
    hi = np.full(3, DX)

    L = np.zeros((n_rays, 3))
    tp = np.ones((n_rays, 3))
    alive = np.ones(n_rays, bool)

    for depth in range(MAX_DEPTH):
        # floor plane (with the reference's quirky extent check,
        # renderer/pathtracer.py:152-190)
        dy = d[:, 1]
        fdist = (FLOOR_H - pos[:, 1]) / np.where(dy == 0, 1e-20, dy)
        fp = pos + d * fdist[:, None]
        ext = np.sqrt((fp[:, 0] - fp[:, 1]) ** 2 + (fp[:, 2] - fp[:, 1]) ** 2)
        f_ok = (fdist > EPS) & (ext < 10.0)
        fdist = np.where(f_ok, fdist, np.inf)

        # the one voxel, brute-force slab AABB test
        invd = 1.0 / np.where(d == 0, 1e-20, d)
        t0 = (lo[None, :] - pos) * invd
        t1 = (hi[None, :] - pos) * invd
        tn = np.minimum(t0, t1).max(axis=1)
        tf = np.maximum(t0, t1).min(axis=1)
        v_ok = (tn <= tf) & (tf > EPS) & (tn > EPS)
        vdist = np.where(v_ok, tn, np.inf)

        hit_floor = alive & (fdist < vdist) & np.isfinite(fdist)
        hit_vox = alive & (vdist <= fdist) & np.isfinite(vdist)
        miss = alive & ~hit_floor & ~hit_vox

        L[miss] += tp[miss] * np.asarray(BG)
        L[hit_vox] += tp[hit_vox] * vox_col  # emissive (mat 2) terminates
        alive = hit_floor
        if depth == MAX_DEPTH - 1 or not alive.any():
            break

        # bounce off the floor: uniform hemisphere around +y
        idx = np.nonzero(alive)[0]
        hp = pos[idx] + d[idx] * fdist[idx, None]
        nrm = np.where(dy[idx, None] > 0, -1.0, 1.0) * np.array([[0.0, 1.0, 0.0]])
        z = rng.random(len(idx))
        phi = rng.random(len(idx)) * 2 * np.pi
        r = np.sqrt(np.maximum(1 - z * z, 0.0))
        local = np.stack([r * np.cos(phi), r * np.sin(phi), z], -1)
        # hemisphere about nrm (floor normal is ±y: swap axes)
        wi = np.stack([local[:, 0], local[:, 2] * nrm[:, 1], local[:, 1]], -1)
        f = _disney_eval(np.asarray(FLOOR_COL, np.float64), nrm, -d[idx], wi)
        cos_i = np.maximum(np.einsum("ij,ij->i", wi, nrm), 0.0)
        tp[idx] *= f * (cos_i * 2.0 * np.pi)[:, None]
        pos[idx] = hp + nrm * EPS
        d[idx] = wi

    return L.mean(axis=0)


def test_transport_matches_oracle():
    cfg, scene, params = _make_setup()
    mean_r = _render_mean(cfg, scene, params, n_samples=192)

    proj_inv = np.linalg.inv(np.asarray(params.proj, np.float64))
    view_inv = np.linalg.inv(np.asarray(params.view, np.float64))
    n_pix = RES[0] * RES[1]
    mean_o = _oracle_trace(n_pix * 512, 0, proj_inv, view_inv)

    # per-channel relative agreement (red channel dominated by the bright
    # sky; green/blue only lit indirectly via the floor)
    rel = np.abs(mean_r - mean_o) / np.maximum(np.abs(mean_o), 1e-3)
    assert rel.max() < 0.05, (mean_r, mean_o, rel)
