"""Disney BSDF numeric tests: pdf normalization, sampling consistency,
reciprocal structure (SURVEY.md §4a)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxelrt.materials import MaterialList, fetch_material
from voxelrt.ops import bsdf
from voxelrt.ops.sampling import dot, make_orthonormal_basis


def _mat(mat_id, n, albedo=(0.8, 0.6, 0.4)):
    ml = MaterialList()
    ids = jnp.full((n,), mat_id, jnp.int32)
    alb = jnp.asarray(np.tile(albedo, (n, 1)), jnp.float32)
    return fetch_material(ml.params, ids, alb)


def _frames(n, seed=0):
    rng = np.random.default_rng(seed)
    nrm = np.tile([0.0, 0.0, 1.0], (n, 1)).astype(np.float32)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v[:, 2] = np.abs(v[:, 2]) + 0.05
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    nrm = jnp.asarray(nrm)
    v = jnp.asarray(v)
    tang, bitang = make_orthonormal_basis(nrm)
    return nrm, v, tang, bitang


@pytest.mark.parametrize("mat_id", [1, 11, 21, 50, 53])
def test_pdf_mixture_sane(mat_id):
    """The diffuse component of the mixture pdf integrates exactly to its
    lobe weight; the full mixture stays finite and non-negative. (The
    reference's specular pdf formula — renderer/bsdf.py:254-277 — is
    deliberately nonstandard and does NOT normalize over the sphere; we only
    require consistency with sampling, tested separately.)"""
    n = 200_000
    mat = _mat(mat_id, n)
    nrm, v, tang, bitang = _frames(n)
    key = jax.random.PRNGKey(42)
    u = jax.random.normal(key, (n, 3))
    l = u / jnp.linalg.norm(u, axis=1, keepdims=True)
    pdf = np.asarray(bsdf.pdf_disney(mat, v, nrm, l, tang, bitang))
    assert np.isfinite(pdf).all() and (pdf >= 0).all()
    dw, sw, cw = bsdf.lobe_probabilities(mat)
    est_d = np.asarray(bsdf.pdf_diffuse(mat, nrm, l)).mean() * 4.0 * np.pi
    assert abs(est_d - 1.0) < 0.02, est_d  # cosine pdf integrates to 1


@pytest.mark.parametrize("mat_id", [1, 21, 50])
def test_sample_matches_pdf(mat_id):
    """pdf reported by sample_disney == pdf_disney_lobewise of the chosen
    lobe at the sampled direction."""
    n = 50_000
    mat = _mat(mat_id, n)
    nrm, v, tang, bitang = _frames(n, seed=1)
    u3 = jax.random.uniform(jax.random.PRNGKey(7), (n, 3))
    d, brdf, pdf, lobe = bsdf.sample_disney(mat, v, nrm, tang, bitang, u3)
    pdf2 = bsdf.pdf_disney_lobewise(mat, v, nrm, d, tang, bitang, lobe)
    pdf, pdf2 = np.asarray(pdf), np.asarray(pdf2)
    ok = np.isfinite(pdf) & (pdf > 1e-6) & (pdf < 1e6)
    rel = np.abs(pdf[ok] - pdf2[ok]) / np.maximum(pdf[ok], 1e-6)
    assert np.quantile(rel, 0.99) < 1e-3


def test_evaluate_split_consistency():
    """lobewise(LOBE_ALL) == full evaluate; diffuse+specular split sums."""
    n = 10_000
    mat = _mat(21, n)
    nrm, v, tang, bitang = _frames(n, seed=2)
    l = _frames(n, seed=3)[1]
    d1, s1 = bsdf.disney_evaluate_split(mat, v, nrm, l, tang, bitang)
    d2, s2 = bsdf.disney_evaluate_lobewise_split(
        mat, v, nrm, l, tang, bitang, jnp.full((n,), bsdf.LOBE_ALL)
    )
    assert np.allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)
    assert np.allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    full = bsdf.disney_evaluate(mat, v, nrm, l, tang, bitang)
    assert np.allclose(np.asarray(full), np.asarray(d1 + s1), atol=1e-6)


def test_diffuse_white_furnace_bound():
    """Pure diffuse energy: ∫ f cosθ dω ≤ albedo (+sheen≈0, metallic=0)."""
    n = 400_000
    mat = _mat(1, n, albedo=(1.0, 1.0, 1.0))
    nrm, _, tang, bitang = _frames(n, seed=4)
    v = jnp.asarray(np.tile([0.0, 0.0, 1.0], (n, 1)), jnp.float32)
    key = jax.random.PRNGKey(3)
    u = jax.random.uniform(key, (n, 2))
    # cosine-weighted MC over hemisphere: E[f * cos / (cos/pi)] = pi*E[f]
    from voxelrt.ops.sampling import sample_cosine_weighted_hemisphere

    l = sample_cosine_weighted_hemisphere(nrm, u)
    d, s = bsdf.disney_evaluate_split(mat, v, nrm, l, tang, bitang)
    refl = np.pi * np.asarray(d).mean(axis=0)
    assert (refl < 1.15).all(), refl  # retro-reflection term can push near 1
    assert (refl > 0.5).all(), refl


def test_lobe_probabilities_normalized():
    for mat_id in [1, 21, 32, 50, 54]:
        mat = _mat(mat_id, 4)
        dw, sw, cw = bsdf.lobe_probabilities(mat)
        s = np.asarray(dw + sw + cw)
        assert np.allclose(s, 1.0, atol=1e-6)


def test_sampled_dirs_unit_length():
    n = 20_000
    mat = _mat(54, n)  # car paint: all three lobes active
    nrm, v, tang, bitang = _frames(n, seed=5)
    u3 = jax.random.uniform(jax.random.PRNGKey(11), (n, 3))
    d, brdf, pdf, lobe = bsdf.sample_disney(mat, v, nrm, tang, bitang, u3)
    ln = np.linalg.norm(np.asarray(d), axis=1)
    # clearcoat half-vector reflection loses ~1e-4 of length in f32
    assert np.abs(ln - 1.0).max() < 1e-3
    assert set(np.unique(np.asarray(lobe))) <= {0, 1, 2}
    assert np.isfinite(np.asarray(pdf)).all()
    assert np.isfinite(np.asarray(brdf)).all()


def test_fused_eval_split_pdf_bitwise():
    """disney_eval_split_pdf == disney_evaluate_split + pdf_disney exactly
    (the NEE inner loop uses the fused form; any drift would shift images)."""
    n = 20_000
    for mat_id in [1, 21, 32, 50, 54]:
        mat = _mat(mat_id, n)
        nrm, v, tang, bitang = _frames(n, seed=7)
        l = jax.random.normal(jax.random.PRNGKey(13), (n, 3))
        l = l / np.linalg.norm(np.asarray(l), axis=1, keepdims=True)
        d0, s0 = bsdf.disney_evaluate_split(mat, v, nrm, l, tang, bitang)
        p0 = bsdf.pdf_disney(mat, v, nrm, l, tang, bitang)
        d1, s1, p1 = bsdf.disney_eval_split_pdf(mat, v, nrm, l, tang, bitang)
        assert np.array_equal(np.asarray(d0), np.asarray(d1))
        assert np.array_equal(np.asarray(s0), np.asarray(s1))
        assert np.array_equal(
            np.nan_to_num(np.asarray(p0)), np.nan_to_num(np.asarray(p1))
        )
