"""Unit tests for codecs, transforms, sampling and tonemap (SURVEY.md §4a)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxelrt.ops import packing, sampling, tonemap, transforms
from voxelrt.camera import look_at_matrix, perspective_matrix


def test_octahedral_roundtrip():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(500, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    enc = packing.encode_unit_vector_3x16(jnp.asarray(v))
    dec = np.asarray(packing.decode_unit_vector_3x16(enc))
    dots = np.sum(dec * v, axis=1)
    # f16 octahedral: within ~0.5 degrees
    assert dots.min() > 0.9999, dots.min()


def test_pack_unpack_2x8():
    """The reference's Pack2x8 (math_utils.py:188-199) squeezes 16 bits into
    an f16, which cannot represent them — the codec is inherently lossy in
    the low byte (and is dead code upstream). Verify the high (y) component
    survives and the format round-trips its own representable points."""
    rng = np.random.default_rng(1)
    v = rng.random((256, 2)).astype(np.float32) * 0.95
    out = np.asarray(packing.unpack_2x8(packing.pack_2x8(jnp.asarray(v))))
    assert np.abs(out[:, 1] - v[:, 1]).max() < 2.5 / 255.0


def test_u32_arb_roundtrip():
    rng = np.random.default_rng(2)
    v = rng.random((128, 4)).astype(np.float32)
    sizes = (8, 8, 8, 8)
    out = np.asarray(packing.decode_u32_arb(packing.encode_u32_arb(jnp.asarray(v), sizes), sizes))
    assert np.abs(out - v).max() < 1.0 / 255.0 + 1e-6
    sizes = (10, 6, 12, 4)
    out = np.asarray(packing.decode_u32_arb(packing.encode_u32_arb(jnp.asarray(v), sizes), sizes))
    for i, b in enumerate(sizes):
        assert np.abs(out[:, i] - v[:, i]).max() < 1.0 / (2**b - 1) + 1e-6


def test_material_word_roundtrip():
    rng = np.random.default_rng(3)
    mat = jnp.asarray(rng.integers(0, 128, 64), jnp.int32)
    alb = jnp.asarray(rng.random((64, 3)), jnp.float32)
    word = packing.encode_material(mat, alb)
    m2, a2 = packing.decode_material_word(word)
    assert np.array_equal(np.asarray(m2), np.asarray(mat))
    assert np.abs(np.asarray(a2) - np.asarray(alb)).max() < 1.0 / 255.0


def test_screen_view_world_roundtrip():
    proj = perspective_matrix(np.deg2rad(50), 16 / 9, 0.01, 10.0)
    view = look_at_matrix((0.4, 0.5, 2.0), (0, 0, 0), (0, 1, 0))
    # invert in f64 like the production path (app/headless.py)
    proj_inv = jnp.asarray(np.linalg.inv(proj.astype(np.float64)))
    view_inv = jnp.asarray(np.linalg.inv(view.astype(np.float64)))
    proj = jnp.asarray(proj)
    view = jnp.asarray(view)

    rng = np.random.default_rng(4)
    world = jnp.asarray(rng.uniform(-1, 1, (100, 3)), jnp.float32)
    vpos = transforms.world_to_view(world, view)
    spos = transforms.view_to_screen(vpos, proj)
    # reconstruct
    v2 = transforms.screen_to_view(spos[..., 0:2], spos[..., 2], proj_inv)
    w2 = transforms.view_to_world(v2, view_inv)
    # only points in front of the camera reconstruct cleanly
    front = np.asarray(vpos)[:, 2] < -0.02
    err = np.abs(np.asarray(w2) - np.asarray(world))[front]
    assert err.max() < 1e-2, err.max()


def test_depth_linearize_roundtrip():
    proj = jnp.asarray(perspective_matrix(np.deg2rad(50), 16 / 9, 0.01, 10.0))
    proj_inv = jnp.linalg.inv(proj)
    d = jnp.linspace(0.05, 0.999, 50)
    lin = transforms.linearize_depth(d, proj_inv)
    d2 = np.asarray(transforms.delinearize_depth(lin, proj))
    assert np.abs(d2 - np.asarray(d)).max() < 1e-3


def test_cone_sampling_within_cone():
    key = jax.random.PRNGKey(0)
    n = jnp.asarray(np.tile([0.0, 1.0, 0.0], (1000, 1)), jnp.float32)
    cos_max = float(np.cos(0.3))
    u = jax.random.uniform(key, (1000, 2))
    d = sampling.sample_cone_oriented(cos_max, n, u)
    cos = np.asarray(sampling.dot(d, n))
    assert cos.min() >= cos_max - 1e-5
    assert np.abs(np.linalg.norm(np.asarray(d), axis=1) - 1).max() < 1e-5


def test_cosine_hemisphere_distribution():
    key = jax.random.PRNGKey(1)
    n = jnp.asarray(np.tile([0.0, 0.0, 1.0], (200_000, 1)), jnp.float32)
    u = jax.random.uniform(key, (200_000, 2))
    d = sampling.sample_cosine_weighted_hemisphere(n, u)
    cos = np.asarray(d[:, 2])
    assert (cos > -1e-5).all()
    # E[cos] for pdf cos/pi is 2/3
    assert abs(cos.mean() - 2.0 / 3.0) < 0.01


def test_uchimura_tonemap_anchors():
    x = jnp.asarray([0.0, 0.22, 1.0, 10.0])
    y = np.asarray(tonemap.uchimura(x))
    assert y[0] == pytest.approx(0.0, abs=1e-5)
    assert y[1] == pytest.approx(0.22, abs=1e-3)  # linear section start
    assert 0.75 < y[2] <= 1.0
    assert y[3] <= 1.0 + 1e-4  # asymptote at P=1


def test_ray_aabb():
    o = jnp.asarray([[-1.0, 0.5, 0.5], [0.5, 0.5, 0.5], [2.0, 2.0, 2.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    hit, near, far = sampling.ray_aabb_intersection(
        jnp.zeros(3), jnp.ones(3), o, d
    )
    hit, near, far = np.asarray(hit), np.asarray(near), np.asarray(far)
    assert hit[0] and near[0] == pytest.approx(1.0)
    assert hit[1] and near[1] <= 0.0 and far[1] == pytest.approx(0.5)
    assert not hit[2]


def test_hash3_matches_bit_ops():
    # spot-check the integer hash is deterministic and spreads
    a = np.asarray(sampling.hash3(jnp.arange(100, dtype=jnp.uint32),
                                  jnp.zeros(100, jnp.uint32),
                                  jnp.zeros(100, jnp.uint32)))
    assert len(np.unique(a)) > 95


def test_fetch_material_select_chain_matches_onehot():
    """The static used_ids select chain must be bitwise equal to the one-hot
    palette matmul for every id in the set."""
    from voxelrt.materials import MaterialList, fetch_material

    mats = MaterialList()
    rng = np.random.default_rng(3)
    used = (0, 1, 2, 54, 82)
    mid = jnp.asarray(rng.choice(used, 4096).astype(np.int32))
    alb = jnp.asarray(rng.random((4096, 3), np.float32))
    ref = fetch_material(mats.params, mid, alb)
    fast = fetch_material(mats.params, mid, alb, used_ids=used)
    for a, b in zip(ref, fast):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # base_col path without albedo override
    ref = fetch_material(mats.params, mid)
    fast = fetch_material(mats.params, mid, used_ids=used)
    assert np.array_equal(np.asarray(ref.base_col), np.asarray(fast.base_col))


def test_bsdf_feature_specialization_bitwise():
    """Dropping zero-valued Disney features (MatFeatures) must be bitwise
    identical to the full lobe stack for materials where they are zero."""
    from voxelrt.materials import MaterialList, fetch_material
    from voxelrt.ops import bsdf
    from voxelrt.ops.sampling import make_orthonormal_basis

    mats = MaterialList()
    rng = np.random.default_rng(11)
    n = 4096
    used = (0, 1, 2, 11, 80)  # example6's set: subsurface only
    mid = jnp.asarray(rng.choice(used, n).astype(np.int32))
    alb = jnp.asarray(rng.random((n, 3), np.float32))
    mat = fetch_material(mats.params, mid, alb, used_ids=used)

    def unit(x):
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    nrm = jnp.asarray(unit(rng.normal(size=(n, 3))).astype(np.float32))
    view = jnp.asarray(unit(rng.normal(size=(n, 3))).astype(np.float32))
    l = jnp.asarray(unit(rng.normal(size=(n, 3))).astype(np.float32))
    u3 = jnp.asarray(rng.random((n, 3), np.float32))
    tang, bit = make_orthonormal_basis(nrm)

    feat = bsdf.MatFeatures(subsurface=True, metallic=False,
                            anisotropic=False, sheen=False, clearcoat=False)

    ref = bsdf.disney_eval_split_pdf(mat, view, nrm, l, tang, bit)
    fast = bsdf.disney_eval_split_pdf(mat, view, nrm, l, tang, bit, feat=feat)
    for a, b in zip(ref, fast):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    ref = bsdf.sample_disney(mat, view, nrm, tang, bit, u3)
    fast = bsdf.sample_disney(mat, view, nrm, tang, bit, u3, feat=feat)
    # the float-gap lobe-choice corner affects ~1 lane per 1e7 draws; at
    # n=4096 every lane must agree exactly
    for a, b in zip(ref, fast):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    ref = bsdf.disney_evaluate_split(mat, view, nrm, l, tang, bit)
    fast = bsdf.disney_evaluate_split(mat, view, nrm, l, tang, bit, feat=feat)
    for a, b in zip(ref, fast):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_sliced_sky_route_sort_matches_global():
    """sky_sort_sliced (per-sample-slice route/unroute sorts) is a pure
    routing change: per-lane fetches are exact and each slice's unroute is
    a permutation, so outputs must be BITWISE equal to the global sort —
    with and without the transmittance payload, and at a wavefront length
    not divisible by samples_per_launch (fallback to global)."""
    from voxelrt.config import RenderConfig
    from voxelrt.ops.texfetch import pack_rgb_bf16
    from voxelrt.sky import atmos
    from voxelrt.ops.v3 import V3

    rng = np.random.default_rng(11)
    res = 64
    tex = (rng.uniform(0.2, 1.5, (res, res, 3)) ** 2).astype(np.float32)
    sky = atmos.SkyData(
        jnp.asarray(tex), jnp.asarray(tex), jnp.zeros(3),
        jnp.zeros((256, 128, 3)),
        packed_scatt=jnp.asarray(pack_rgb_bf16(tex)),
        packed_trans=jnp.asarray(pack_rgb_bf16(tex)),
    )

    for n, spl in ((4096, 4), (4096 + 128, 4)):
        d = np.stack([np.random.default_rng(5).normal(size=n),
                      np.abs(np.random.default_rng(6).normal(size=n)) + 0.1,
                      np.random.default_rng(7).normal(size=n)], -1)
        d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
        dv = V3(*(jnp.asarray(d[:, i]) for i in range(3)))
        u3 = V3(*(jnp.asarray(
            np.random.default_rng(8 + i).uniform(size=n).astype(np.float32))
            for i in range(3)))
        for want_trans in (False, True):
            outs = {}
            for sliced in (False, True):
                cfg = RenderConfig(skybox_res=res, pallas_interpret=True,
                                   samples_per_launch=spl,
                                   sky_sort_sliced=sliced)
                s, t = atmos._sample_skybox_stochastic(
                    cfg, sky, dv, u3, scattered=True, want_trans=want_trans)
                outs[sliced] = (s, t)
            for c in "xyz":
                np.testing.assert_array_equal(
                    np.asarray(getattr(outs[False][0], c)),
                    np.asarray(getattr(outs[True][0], c)),
                    err_msg=f"scatt.{c} n={n}")
                if want_trans:
                    np.testing.assert_array_equal(
                        np.asarray(getattr(outs[False][1], c)),
                        np.asarray(getattr(outs[True][1], c)),
                        err_msg=f"trans.{c} n={n}")
