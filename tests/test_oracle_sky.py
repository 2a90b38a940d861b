"""Independent float64 oracle for the sky transport path (VERDICT r4 #7).

The production pipeline (voxelrt/sky/atmos.py) re-engineered the reference's
atmosphere for TPU: gather-free transmittance quadrature instead of the LUT,
batched sun/MS sample axes, fori_loop marches, bf16-packed skybox maps and a
stochastic-bilinear fetch. Until now it was covered by formula-level and
statistical tests only (STATUS.md divergence list); this module closes the
gap with a transport ORACLE: a plain numpy float64 transcription of the
REFERENCE's integrators —

  * atmospheric scattering + the ms_energy=5.3 multiple-scattering hack
    (renderer/atmos.py:356-425),
  * the volumetric cloud march with Wrenninge scattering octaves
    (renderer/atmos.py:269-349, 231-260, 195-224),
  * the cloud/air composite (renderer/atmos.py:160-189),

structured independently of the JAX code (python loops, f64, reference
control flow) and compared against the production implementations and the
full `prepare_sky` output. Determinism: the sun cone is collapsed
(cos_theta_max = 1.0 ⇒ sample_cone_oriented returns the axis exactly), and
cloud-march dithers are either fixed or replicated from prepare_sky's
documented key schedule — randomness is shared, the transport math is not.

Also here: the stochastic-bilinear skybox fetch unbiasedness check (its
expectation must equal the 4-corner bilinear value), and the production
16-step transmittance quadrature vs a 512-step f64 truth.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxelrt.sky import atmos

F = np.float64

# --- constants transcribed from renderer/atmos.py:37-83 ---------------------
PLANET_R = 6371e3
ATMOS_HEIGHT = 110e3
SCALE_H_RAYL = 8500.0
SCALE_H_MIE = 1200.0
MIE_G = 0.75
RAYLEIGH = np.array([0.00000519673, 0.0000121427, 0.0000296453], F)
MIE = 8.6e-6
OZONE_CROSS = (
    np.array([4.51103766177301e-21, 3.2854797958699e-21,
              1.96774621921165e-22], F) * 0.0001
)
OZONE = OZONE_CROSS * (2.5035422e25 * 0.012588 * 8e-6)
# extinction matrix rows = color, cols = (rayleigh, mie*1.11, ozone)
EXTINC = np.stack([RAYLEIGH, np.full(3, MIE * 1.11, F), OZONE]).T
CLOUD_HEIGHT = 2000.0
CLOUD_THICK = 340.0
CLOUD_DENSITY = 0.27
CLOUD_EXTINC = 0.075
CLOUD_SCATTER = CLOUD_EXTINC
CAM_POS = np.array([0.0, PLANET_R + 1e3, 0.0], F)


# --- oracle primitives (renderer/atmos.py:9-15, 500-523) --------------------


def o_rsi(pos, d, r):
    """Ray-sphere (near, far); (-1, -1) on miss."""
    b = np.sum(pos * d, -1)
    disc = b * b - np.sum(pos * pos, -1) + r * r
    miss = disc < 0.0
    sq = np.sqrt(np.maximum(disc, 0.0))
    return (np.where(miss, -1.0, -b - sq), np.where(miss, -1.0, -b + sq))


def o_density(h):
    h = np.maximum(np.asarray(h, F), 0.0)
    hk = h * 0.001
    pr2 = (hk - 25.0) ** 2
    oz = (1.0 - 0.375) * np.exp(-pr2 / 49.0) + 0.375 * np.exp(-pr2 / 256.0)
    oz = oz + np.maximum(0.0, -0.000015 * (hk - 15.0) ** 3)
    return np.stack(
        [np.exp(-h / SCALE_H_RAYL), np.exp(-h / SCALE_H_MIE), oz * 4.0], -1
    )


def o_elev(p):
    return np.sqrt(np.sum(p * p, -1)) - PLANET_R


def o_rayleigh_phase(c):
    return 3.0 / (16.0 * np.pi) * (1.0 + c * c)


def o_mie_phase(c, g):
    return (1 - g * g) / (
        4.0 * np.pi * np.maximum(1.0 + g * g - 2 * g * c, 1e-12) ** 1.5
    )


def o_sun_transmittance(pos, d, steps=128):
    """Midpoint quadrature of the optical-depth integral to the top of the
    atmosphere (the quantity the reference's 256×128 LUT tabulates,
    renderer/atmos.py:475-498), with the below-horizon zeroing."""
    _, far = o_rsi(pos, d, PLANET_R + ATMOS_HEIGHT)
    far = np.maximum(far, 0.0)
    dt = far / steps
    od = np.zeros(pos.shape[:-1] + (3,), F)
    for k in range(steps):
        p = pos + d * ((k + 0.5) * dt)[..., None]
        od += o_density(o_elev(p)) * dt[..., None]
    trans = np.exp(-od @ EXTINC.T)
    near_p, _ = o_rsi(pos, d, PLANET_R)
    return np.where((near_p > 0.0)[..., None], 0.0, trans)


# --- oracle atmosphere (renderer/atmos.py:356-425) ---------------------------


def _o_ms_dirs(n):
    """The reference's fixed MS directions: get_unit_vec((j+0.5)/N,
    fract(j*phi)) (renderer/atmos.py:404-405)."""
    out = []
    for j in range(n):
        u0 = (j + 0.5) / n
        u1 = (j * 1.618033988749) % 1.0
        ax = u0 * 2.0 * np.pi
        ay = u1 * 2.0 - 1.0
        g = np.array([np.sin(ax), np.cos(ax)]) * np.sqrt(max(1 - ay * ay, 0.0))
        v = np.array([g[0], g[1], ay])
        out.append(v / np.linalg.norm(v))
    return np.asarray(out, F)


def o_atmospheric_scattering(pos, d, sun_dir, sun_col, steps, n_ms, ms_steps,
                             depth=0, trans_steps=128):
    """Single + hack-multiple scattering (renderer/atmos.py:356-425) with the
    sun cone collapsed to its axis (deterministic). pos/d: (N, 3)."""
    n = pos.shape[0]
    if depth > 1:
        return np.zeros((n, 3), F), np.ones((n, 3), F)
    air_near, air_far = o_rsi(pos, d, PLANET_R + ATMOS_HEIGHT)
    pl_near, _ = o_rsi(pos, d, PLANET_R)
    air_far = np.where(pl_near > 0.0, np.minimum(air_far, pl_near), air_far)
    dt = (air_far - np.maximum(air_near, 0.0)) / steps
    p = pos + d * (0.5 * dt)[..., None]

    in_scatter = np.zeros((n, 3), F)
    trans = np.ones((n, 3), F)
    ms_dirs = _o_ms_dirs(n_ms) if depth == 0 else None
    for _ in range(steps):
        h = o_elev(p)
        dens = o_density(h)
        step_od = (dens * dt[..., None]) @ EXTINC.T
        step_trans = np.clip(np.exp(-step_od), 0.0, 1.0)
        visible = trans * np.clip(
            (1.0 - step_trans) / np.maximum(step_od, 1e-20), 0.0, 1.0
        )
        cos_t = np.sum(d * sun_dir, -1)
        sun_trans = o_sun_transmittance(p, np.broadcast_to(sun_dir, p.shape),
                                        steps=trans_steps)
        common = sun_col * sun_trans * visible
        in_scatter = in_scatter + RAYLEIGH * common * (
            o_rayleigh_phase(cos_t) * dens[..., 0] * dt)[..., None]
        in_scatter = in_scatter + MIE * common * (
            o_mie_phase(cos_t, MIE_G) * dens[..., 1] * dt)[..., None]

        if depth == 0:
            for md in ms_dirs:
                amb, _ = o_atmospheric_scattering(
                    p, np.broadcast_to(md, p.shape), sun_dir, sun_col,
                    ms_steps, 0, 0, depth=1, trans_steps=trans_steps)
                cms = np.sum(d * md, -1)
                in_scatter = in_scatter + 5.3 * RAYLEIGH * amb * (
                    visible / n_ms) * (dens[..., 0] * dt)[..., None]
                in_scatter = in_scatter + 5.3 * MIE * amb * o_mie_phase(
                    cms, MIE_G)[..., None] * (visible / n_ms) * (
                    dens[..., 1] * dt)[..., None]
        trans = trans * step_trans
        p = p + d * dt[..., None]
    trans = np.where((pl_near > 0.0)[..., None], 0.0, trans)
    return in_scatter, trans


# --- oracle clouds (renderer/atmos.py:195-349) -------------------------------


def o_cloud_density(p, tex):
    """renderer/atmos.py:195-224 with the texture passed as data (the same
    (256,256,3) f32 array is fed to the production path, so the 0.7
    thresholds see identical values)."""
    tile = 29000.0
    px = p[..., 0] + tile * 0.65
    pz = p[..., 2] + tile * 0.65
    cx = ((np.mod(px, tile) / tile) * 256).astype(np.int64)
    cy = ((np.mod(pz, tile) / tile) * 256).astype(np.int64)
    t = tex[np.clip(cx, 0, 255), np.clip(cy, 0, 255)].astype(F)
    t = np.where(t < 0.7, 0.0, t)
    rel_h = np.sqrt(np.sum(p * p, -1)) - PLANET_R
    cloud = np.where(rel_h < CLOUD_HEIGHT + CLOUD_THICK * 0.65,
                     t[..., 0], t[..., 1])
    in_layer = (rel_h > CLOUD_HEIGHT) & (rel_h < CLOUD_HEIGHT + CLOUD_THICK)
    return np.where(in_layer, CLOUD_DENSITY * t[..., 2] * cloud, 0.0)


def o_cloud_shadow_od(origin, d, dither, steps, tex):
    """renderer/atmos.py:231-260 (exponential stride)."""
    dt = 24.0 / steps
    od = np.zeros(origin.shape[:-1], F)
    p = origin.copy()
    step = d * dt
    for _ in range(steps):
        step = step * 1.6
        dt = dt * 1.6
        dp = p + step * dither[..., None]
        rel_h = np.sqrt(np.sum(dp * dp, -1)) - PLANET_R
        in_layer = (rel_h >= CLOUD_HEIGHT) & (rel_h <= CLOUD_HEIGHT + CLOUD_THICK)
        od = od + np.where(in_layer, o_cloud_density(dp, tex) * dt, 0.0)
        p = p + step
    return od


def o_clouds_scattering(origin, d, sun_dir, sun_col, dither, ambient,
                        steps, shadow_steps, tex):
    """renderer/atmos.py:269-349, sun cone collapsed. Returns
    (in_scatter, transmittance, weighted_dist)."""
    n = origin.shape[0]
    _, bot = o_rsi(origin, d, PLANET_R + CLOUD_HEIGHT)
    _, top = o_rsi(origin, d, PLANET_R + CLOUD_HEIGHT + CLOUD_THICK)
    dt = (top - bot) / steps
    start = origin + d * bot[..., None]
    p = start + d * (dt * dither)[..., None]
    dist = np.sqrt(np.sum((start - origin) ** 2, -1))
    in_scatter = np.zeros((n, 3), F)
    trans = np.ones((n,), F)
    wdist = np.zeros((n,), F)
    wsum = np.zeros((n,), F)
    octaves = np.array([1.0, 0.5, 0.25, 0.125], F)
    up = np.broadcast_to(np.array([0.0, 1.0, 0.0], F), (n, 3))
    for i in range(steps):
        dens = o_cloud_density(p, tex)
        live = (dens > 0.0) & (trans > 1e-4)
        step_od = CLOUD_EXTINC * dens * dt
        step_trans = np.clip(np.exp(-step_od), 0.0, 1.0)
        visible = trans * (1.0 - step_trans) / CLOUD_EXTINC

        cos_t = np.sum(d * sun_dir, -1)
        sun_od = o_cloud_shadow_od(p, np.broadcast_to(sun_dir, p.shape),
                                   dither, shadow_steps, tex)
        sun_at = o_sun_transmittance(p, np.broadcast_to(sun_dir, p.shape))
        add = np.zeros((n, 3), F)
        for an in octaves:
            ph = _o_cloud_phase(cos_t, an)
            add += (an * CLOUD_SCATTER * ph
                    * np.exp(-sun_od * CLOUD_EXTINC * an))[..., None] * sun_at
        add = add * sun_col * visible[..., None]

        amb_od = o_cloud_shadow_od(p, up, dither, shadow_steps, tex)
        amb_amt = np.zeros((n,), F)
        for an in octaves:
            amb_amt += an * (CLOUD_SCATTER / (4.0 * np.pi)) * np.exp(
                -amb_od * CLOUD_EXTINC * an)
        add = add + (visible * amb_amt)[..., None] * ambient

        in_scatter = in_scatter + np.where(live[..., None], add, 0.0)
        trans = np.where(live, trans * step_trans, trans)
        dist2 = dist + dt * (i + 1)
        wdist = wdist + dist2 * trans
        wsum = wsum + trans
        p = p + d * dt[..., None]
    return in_scatter, trans, wdist / np.maximum(wsum, 1e-20)


def _o_cloud_phase(c, an):
    peak = o_mie_phase(c, 0.92 * an)
    front = o_mie_phase(c, 0.4 * an)
    back = o_mie_phase(c, -0.55 * an)
    return (front * 0.5 + back * 0.5) * 0.85 + peak * 0.15


# --- shared fixtures ---------------------------------------------------------

SUN_DIR = np.array([1.0, 1.0, 1.0], F) / np.sqrt(3.0)
SUN_COL = np.array([1.0, 0.95, 0.9], F) * 3.0


def _bake_cloud_tex():
    """Evaluate the production procedural cloud texture once on the full
    256² grid — this (not the noise formulas) is the shared DATA both the
    oracle and the production path sample."""
    cx, cy = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
    lo, hi, cov = jax.jit(atmos.cloud_texture_channels)(
        jnp.asarray(cx), jnp.asarray(cy))
    return np.stack([np.asarray(lo), np.asarray(hi), np.asarray(cov)],
                    -1).astype(np.float32)


def _test_dirs(n=10, seed=7):
    """Directions spread over the sphere, biased above the horizon (below it
    the transmittance is zeroed and scattering truncates at the planet)."""
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    v[: n // 2, 1] = np.abs(v[: n // 2, 1])
    return v.astype(F)


def _cfg(**kw):
    from voxelrt.config import RenderConfig

    base = dict(
        use_physical_sky=True, use_clouds=True, skybox_res=16,
        sky_steps=12, sky_sun_samples=2, sky_ms_samples=4, sky_ms_steps=3,
        cloud_steps=8, cloud_sun_samples=2, cloud_shadow_steps=4,
        cloud_accum_passes=2,
    )
    base.update(kw)
    return RenderConfig(**base)


# --- tests -------------------------------------------------------------------


def test_sun_transmittance_quadrature_accuracy():
    """Production sun_transmittance (16-step midpoint, the gather-free LUT
    replacement — STATUS.md divergence #2) vs a 512-step f64 truth."""
    rng = np.random.default_rng(3)
    hs = np.array([1e3, 1e3, 5e3, 2.1e3, 30e3, 1e3, 1.5e3, 80e3])
    n = hs.size
    pos = np.zeros((n, 3), F)
    pos[:, 1] = PLANET_R + hs
    d = _test_dirs(n)
    d[:, 1] = np.abs(d[:, 1]) * (0.15 + 0.85 * rng.random(n))  # above horizon
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    truth = o_sun_transmittance(pos, d, steps=512)
    got = np.asarray(jax.jit(atmos.sun_transmittance)(
        jnp.asarray(pos, jnp.float32), jnp.asarray(d, jnp.float32)))
    err = np.abs(got - truth)
    # transmittance ∈ [0, 1]: absolute error is the right metric
    assert err.max() < 0.015, (err.max(), got, truth)


def test_atmospheric_scattering_matches_oracle():
    """Production atmospheric_scattering (batched axes, fori_loop, 16-step
    sun quadrature) vs the reference-equation f64 oracle, sun cone collapsed
    (cos_max=1 ⇒ both samplers return the axis exactly)."""
    cfg = _cfg()
    d = _test_dirs(8)
    pos = np.broadcast_to(CAM_POS, d.shape).copy()
    osc, otr = o_atmospheric_scattering(
        pos, d, SUN_DIR, SUN_COL, steps=cfg.sky_steps,
        n_ms=cfg.sky_ms_samples, ms_steps=cfg.sky_ms_steps)
    gsc, gtr = jax.jit(
        lambda p, dd, k: atmos.atmospheric_scattering(
            cfg, p, dd, jnp.asarray(SUN_DIR, jnp.float32),
            jnp.asarray(SUN_COL, jnp.float32), jnp.float32(1.0), k)
    )(jnp.asarray(pos, jnp.float32), jnp.asarray(d, jnp.float32),
      jax.random.PRNGKey(0))
    gsc, gtr = np.asarray(gsc), np.asarray(gtr)
    scale = np.abs(osc).max()
    assert np.abs(gsc - osc).max() < 0.01 * scale, (
        np.abs(gsc - osc).max() / scale)
    assert np.abs(gtr - otr).max() < 0.01, np.abs(gtr - otr).max()


def test_cloud_march_matches_oracle():
    """Production clouds_scattering vs the reference-equation f64 oracle:
    fixed dither, collapsed sun cone, shared texture data."""
    cfg = _cfg()
    tex = _bake_cloud_tex()
    d = _test_dirs(8, seed=11)
    d[:, 1] = np.abs(d[:, 1]) + 0.08  # the march needs upward rays
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pos = np.broadcast_to(CAM_POS, d.shape).copy()
    dither = np.full((8,), 0.37, F)
    ambient = np.array([0.02, 0.03, 0.05], F)

    osc, otr, odist = o_clouds_scattering(
        pos, d, SUN_DIR, SUN_COL, dither, ambient,
        steps=cfg.cloud_steps, shadow_steps=cfg.cloud_shadow_steps, tex=tex)
    gsc, gtr, gdist = jax.jit(
        lambda p, dd, dth, k: atmos.clouds_scattering(
            cfg, p, dd, jnp.asarray(SUN_DIR, jnp.float32),
            jnp.asarray(SUN_COL, jnp.float32), jnp.float32(1.0), dth, k,
            jnp.asarray(ambient, jnp.float32), tex=jnp.asarray(tex))
    )(jnp.asarray(pos, jnp.float32), jnp.asarray(d, jnp.float32),
      jnp.asarray(dither, jnp.float32), jax.random.PRNGKey(0))
    gsc, gtr, gdist = np.asarray(gsc), np.asarray(gtr), np.asarray(gdist)
    scale = max(np.abs(osc).max(), 1e-6)
    assert np.abs(gsc - osc).max() < 0.01 * scale, (
        np.abs(gsc - osc).max() / scale)
    assert np.abs(gtr - otr).max() < 0.01
    # mean cloud distance: relative to the cloud-layer distance scale
    assert np.abs(gdist - odist).max() < 0.01 * np.abs(odist).max()


def test_prepare_sky_composite_matches_oracle(tmp_path):
    """END-TO-END: prepare_sky's skybox maps (stage B cloud accumulation +
    stage C scattering + the cloud/air composite, renderer/atmos.py:160-189)
    vs the oracle composite at every texel of a 16² skybox. The cloud
    dithers are replicated from prepare_sky's key schedule; with the sun
    cone collapsed they are the only randomness."""
    cfg = _cfg()
    tex = _bake_cloud_tex()
    sky = atmos.prepare_sky(cfg, SUN_DIR.astype(np.float32),
                            SUN_COL.astype(np.float32), 1.0, quiet=True,
                            cache_dir=str(tmp_path), cloud_tex=tex)
    res = cfg.skybox_res
    n = res * res

    # texel directions (production helper — pure geometry, tested by the
    # project/unproject roundtrip in test_sky.py)
    dirs = np.asarray(atmos._texel_dirs(cfg, 0, n), F)
    pos = np.broadcast_to(CAM_POS, dirs.shape).copy()

    # cloud ambient: deterministic at collapsed cone — oracle evaluates it
    amb_pos = (CAM_POS + np.array([0.0, CLOUD_HEIGHT, 0.0]))[None]
    amb_up = np.array([[0.0, 1.0, 0.0]], F)
    ambient = o_atmospheric_scattering(
        amb_pos, amb_up, SUN_DIR, SUN_COL, cfg.sky_steps,
        cfg.sky_ms_samples, cfg.sky_ms_steps)[0][0]

    # stage B: cloud accumulation with prepare_sky's dither schedule
    key = jax.random.PRNGKey(1234)
    kc = jax.random.fold_in(key, 1000)
    acc_s = np.zeros((n, 3), F)
    acc_t = np.zeros((n,), F)
    acc_d = np.zeros((n,), F)
    passes = cfg.cloud_accum_passes
    for p in range(passes):
        kp = jax.random.fold_in(jax.random.fold_in(kc, 1), p)
        dither = np.asarray(
            jax.random.uniform(jax.random.fold_in(kp, 1), (n,)), F)
        s, t, dist = o_clouds_scattering(
            pos, dirs, SUN_DIR, SUN_COL, dither, ambient,
            steps=cfg.cloud_steps, shadow_steps=cfg.cloud_shadow_steps,
            tex=tex)
        acc_s += s * 1.2 / passes
        acc_t += np.clip(t, 0.0, 1.0) / passes
        acc_d += dist / passes

    # stage C: scattering + composite
    sky_s, sky_t = o_atmospheric_scattering(
        pos, dirs, SUN_DIR, SUN_COL, cfg.sky_steps, cfg.sky_ms_samples,
        cfg.sky_ms_steps)
    cloud_pos = pos + dirs * np.maximum(acc_d, 0.0)[..., None]
    fc_s, fc_t = o_atmospheric_scattering(
        cloud_pos, dirs, SUN_DIR, SUN_COL, cfg.sky_steps,
        cfg.sky_ms_samples, cfg.sky_ms_steps)
    trans_to_cloud = sky_t / np.maximum(fc_t, 1e-20)
    in_scatt = sky_s - fc_s * np.clip(
        trans_to_cloud * np.maximum(1.0 - acc_t, 0.0)[..., None], 0.0, 1.0)
    in_scatt = in_scatt + acc_s * np.clip(trans_to_cloud, 0.0, 1.0)
    out_trans = sky_t * acc_t[..., None]

    got_s = np.asarray(sky.skybox_scattering).reshape(n, 3)
    got_t = np.asarray(sky.skybox_transmittance).reshape(n, 3)
    scale = np.abs(in_scatt).max()
    err_s = np.abs(got_s - in_scatt) / scale
    err_t = np.abs(got_t - out_trans)
    # Production evaluates in f32 with a 16-step sun quadrature (the oracle
    # uses 128-step f64); the horizon band concentrates that quadrature
    # difference. Gate the map at 1.5% with a 2% tail allowance.
    assert np.quantile(err_s, 0.98) < 0.015, (
        np.quantile(err_s, 0.98), err_s.max())
    assert err_s.max() < 0.05, err_s.max()
    assert np.quantile(err_t, 0.98) < 0.015, (
        np.quantile(err_t, 0.98), err_t.max())
    assert err_t.max() < 0.05, err_t.max()


def test_stochastic_bilinear_fetch_unbiased():
    """The stochastic skybox fetch (one corner, probability = bilinear
    weight) must average to the exact 4-corner bilinear interpolation."""
    from voxelrt.config import RenderConfig

    res = 8
    rng = np.random.default_rng(5)
    scatt = rng.random((res, res, 3)).astype(np.float32)
    trans = rng.random((res, res, 3)).astype(np.float32)
    sky = atmos.SkyData(jnp.asarray(scatt), jnp.asarray(trans),
                        jnp.zeros(3), jnp.zeros((256, 128, 3)))
    cfg = RenderConfig(use_physical_sky=True, skybox_res=res,
                       sky_fetch="stochastic")

    d = _test_dirs(16, seed=9).astype(np.float32)
    dd = jnp.asarray(d)

    # exact bilinear value at the same (wrapped) coordinates
    uv = np.asarray(atmos.project_sky(dd, res))
    fx = uv[:, 0] * res - 0.5
    fy = uv[:, 1] * res - 0.5
    ix = np.floor(fx).astype(int)
    iy = np.floor(fy).astype(int)
    gx = (fx - ix)[:, None]
    gy = (fy - iy)[:, None]

    def at(ax, ay):
        return scatt[np.mod(ax, res), np.mod(ay, res)].astype(F)

    exact = ((at(ix, iy) * (1 - gx) + at(ix + 1, iy) * gx) * (1 - gy)
             + (at(ix, iy + 1) * (1 - gx) + at(ix + 1, iy + 1) * gx) * gy)

    m = 4000
    keys = jax.random.split(jax.random.PRNGKey(0), m)

    @jax.jit
    def one(k):
        u = jax.random.uniform(k, (3, 16))
        from voxelrt.ops.v3 import V3

        s, _ = atmos.sample_skybox(cfg, sky, dd, u.T, scattered=False,
                                   want_trans=False)
        return s

    acc = np.zeros((16, 3), F)
    batch = jax.jit(jax.vmap(one))(keys)
    acc = np.asarray(batch, F).mean(0)
    # MC error at m=4000 draws of a bounded estimator: ~3σ ≈ 0.024
    assert np.abs(acc - exact).max() < 0.03, np.abs(acc - exact).max()
