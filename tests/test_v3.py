"""SoA V3 layout: operator semantics + packed-vs-SoA equivalence of the
shared shading formulas (ops/v3.py, ops/sampling.py, ops/bsdf.py).

The render hot path carries V3 component triples while ReSTIR/tests call
the same functions with packed (N, 3) arrays; these tests pin that both
layouts compute the same values (up to reduce-order ULPs in dots).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxelrt.materials import MaterialList, fetch_material
from voxelrt.ops import bsdf, v3
from voxelrt.ops import sampling as sp


def _rand_unit(key, n):
    u = jax.random.normal(key, (n, 3))
    return np.asarray(u / np.linalg.norm(u, axis=-1, keepdims=True))


def _close(a, b, tol=1e-5):
    a = np.asarray(v3.stack(a) if isinstance(a, v3.V3) else a)
    b = np.asarray(v3.stack(b) if isinstance(b, v3.V3) else b)
    np.testing.assert_allclose(a, b, rtol=tol, atol=tol)


def test_v3_operators():
    a = v3.V3(jnp.asarray([1.0, 2.0]), jnp.asarray([3.0, 4.0]),
              jnp.asarray([5.0, 6.0]))
    b = v3.load(jnp.asarray([[1.0, 1.0, 2.0], [2.0, 2.0, 2.0]]))
    _close(a + b, jnp.asarray([[2.0, 4.0, 7.0], [4.0, 6.0, 8.0]]))
    _close(a - 1.0, jnp.asarray([[0.0, 2.0, 4.0], [1.0, 3.0, 5.0]]))
    _close(2.0 * a, v3.stack(a) * 2.0)
    _close(a / b, v3.stack(a) / v3.stack(b))
    _close(-a, -v3.stack(a))
    s = jnp.asarray([2.0, 3.0])
    _close(a * s, v3.stack(a) * s[:, None])
    np.testing.assert_allclose(np.asarray(v3.vdot(a, b)),
                               (v3.stack(a) * v3.stack(b)).sum(-1))
    _close(v3.vcross(a, b), jnp.cross(v3.stack(a), v3.stack(b)))
    _close(v3.vnormalize(a), sp.normalize(v3.stack(a)), tol=1e-6)
    # round trip
    _close(v3.load(v3.stack(a)), a)


def test_v3_rejects_packed_operand():
    a = v3.V3(jnp.zeros(4), jnp.zeros(4), jnp.zeros(4))
    with pytest.raises(TypeError):
        a * jnp.zeros((4, 1))
    with pytest.raises(TypeError):
        a + jnp.zeros((4, 3))


def test_sampling_helpers_equivalence():
    key = jax.random.PRNGKey(7)
    n = 257
    nrm = jnp.asarray(_rand_unit(key, n))
    d = jnp.asarray(_rand_unit(jax.random.fold_in(key, 1), n))
    u = jax.random.uniform(jax.random.fold_in(key, 2), (n, 2))
    nv, dv = v3.load(nrm), v3.load(d)

    np.testing.assert_allclose(np.asarray(sp.dot(nv, dv)),
                               np.asarray(sp.dot(nrm, d)), rtol=2e-6, atol=2e-7)
    _close(sp.normalize(dv + nv), sp.normalize(d + nrm), tol=1e-6)
    np.testing.assert_allclose(np.asarray(sp.length(dv + nv)),
                               np.asarray(sp.length(d + nrm)), rtol=1e-6)
    _close(sp.reflect(dv, nv), sp.reflect(d, nrm), tol=1e-6)
    tx, ty = sp.make_orthonormal_basis(nrm)
    txv, tyv = sp.make_orthonormal_basis(nv)
    _close(txv, tx, tol=1e-6)
    _close(tyv, ty, tol=1e-6)
    _close(
        sp.sample_cosine_weighted_hemisphere(nv, (u[:, 0], u[:, 1])),
        sp.sample_cosine_weighted_hemisphere(nrm, u),
        tol=1e-6,
    )
    _close(
        sp.sample_cone_oriented(0.97, nv, (u[:, 0], u[:, 1])),
        sp.sample_cone_oriented(0.97, nrm, u),
        tol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(sp.luminance(dv)),
                               np.asarray(sp.luminance(d)), rtol=1e-5,
                               atol=1e-7)


@pytest.mark.parametrize("mat_id", [1, 10, 33, 55, 81])
def test_bsdf_packed_vs_v3(mat_id):
    mats = MaterialList()
    key = jax.random.PRNGKey(3)
    n = 513
    nrm = jnp.asarray(_rand_unit(key, n))
    view = jnp.asarray(_rand_unit(jax.random.fold_in(key, 1), n))
    view = sp.normalize(jnp.where(sp.dot(view, nrm)[:, None] < 0, -view, view))
    l = jnp.asarray(_rand_unit(jax.random.fold_in(key, 2), n))
    u3 = jax.random.uniform(jax.random.fold_in(key, 3), (n, 3))
    albedo = jax.random.uniform(jax.random.fold_in(key, 4), (n, 3))
    ids = jnp.full((n,), mat_id, jnp.int32)

    mat_p = fetch_material(mats.params, ids, albedo)
    tang, bitang = sp.make_orthonormal_basis(nrm)

    mat_v = mat_p._replace(base_col=v3.load(mat_p.base_col))
    nv, vv, lv = v3.load(nrm), v3.load(view), v3.load(l)
    tv, bv = sp.make_orthonormal_basis(nv)

    d_p, s_p, pdf_p = bsdf.disney_eval_split_pdf(mat_p, view, nrm, l, tang,
                                                 bitang)
    d_v, s_v, pdf_v = bsdf.disney_eval_split_pdf(mat_v, vv, nv, lv, tv, bv)
    _close(d_v, d_p)
    _close(s_v, s_p)
    np.testing.assert_allclose(np.asarray(pdf_v), np.asarray(pdf_p),
                               rtol=1e-4, atol=1e-6)

    dir_p, brdf_p, pdf2_p, lobe_p = bsdf.sample_disney(mat_p, view, nrm, tang,
                                                       bitang, u3)
    dir_v, brdf_v, pdf2_v, lobe_v = bsdf.sample_disney(
        mat_v, vv, nv, tv, bv, (u3[:, 0], u3[:, 1], u3[:, 2])
    )
    np.testing.assert_array_equal(np.asarray(lobe_v), np.asarray(lobe_p))
    _close(dir_v, dir_p, tol=1e-5)
    _close(brdf_v, brdf_p, tol=2e-4)
    np.testing.assert_allclose(np.asarray(pdf2_v), np.asarray(pdf2_p),
                               rtol=2e-4, atol=1e-6)

    lw_d_p, lw_s_p = bsdf.disney_evaluate_lobewise_split(
        mat_p, view, nrm, l, tang, bitang, lobe_p
    )
    lw_d_v, lw_s_v = bsdf.disney_evaluate_lobewise_split(
        mat_v, vv, nv, lv, tv, bv, lobe_v
    )
    _close(lw_d_v, lw_d_p)
    _close(lw_s_v, lw_s_p)
