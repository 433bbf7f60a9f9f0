"""Numerical-robustness tests for the GGX/Fresnel shading math.

Port of the reference's ShadingTest.cpp suite (7 tests driven by edge-case
generators, asserting only that no NaN/Inf escapes — TestCommon.h:9-19).
The same production code paths are exercised (tests call pt.render.shading
directly, like the reference #includes the production GLSL into its test
compute shaders)."""

import itertools

import numpy as np
import pytest
import jax.numpy as jnp

from pt.render import shading
from tests import _data


ALPHAS = np.array([0.0, 1e-6, 1e-3, 0.01, 0.25, 1.0], np.float32)
ETAS = np.array([1.0 / 1.5, 1.0, 1.5, 2.4], np.float32)


def _assert_finite(*arrays):
    for a in arrays:
        a = np.asarray(a)
        assert np.isfinite(a).all(), f"non-finite values: {a[~np.isfinite(a)][:5]}"


def _pairs(vs):
    """Cartesian vector pairs flattened for broadcasting."""
    n = len(vs)
    v = np.repeat(vs, n, axis=0)
    l = np.tile(vs, (n, 1))
    return v, l


def test_ggx_distribution_finite():
    h = _data.upper_unit_vectors()
    for alpha in ALPHAS:
        d = shading.ggx_distribution(jnp.asarray(h), alpha)
        _assert_finite(d)
        assert (np.asarray(d) >= 0).all()


def test_lambda_finite():
    v = np.concatenate([_data.near_axis_unit_vectors(),
                        _data.random_unit_vectors(64)])
    for alpha in ALPHAS:
        lam = shading.smith_lambda(jnp.asarray(v), alpha)
        _assert_finite(lam)


def test_ggx_smith_finite():
    v = _data.upper_unit_vectors()
    for alpha in ALPHAS:
        g = shading.ggx_smith(jnp.asarray(v), alpha)
        _assert_finite(g)
        g = np.asarray(g)
        assert ((g >= 0) & (g <= 1.0 + 1e-5)).all()


def test_dielectric_fresnel_finite_and_bounded():
    cos = _data.edge_floats()
    for eta in ETAS:
        f = shading.dielectric_fresnel(jnp.asarray(cos), eta)
        _assert_finite(f)
        f = np.asarray(f)
        assert ((f >= -1e-6) & (f <= 1.0 + 1e-5)).all()


def test_dielectric_fresnel_tir():
    # grazing incidence through a dense-to-sparse interface → TIR → F = 1
    f = shading.dielectric_fresnel(jnp.asarray(0.1), 1.5)
    assert float(f) == pytest.approx(1.0)


def test_schlick_fresnel_finite():
    cos = np.concatenate([_data.edge_floats(), [-0.5, 1.5]]).astype(np.float32)
    f = shading.schlick_fresnel(jnp.asarray(cos))
    _assert_finite(f)
    assert ((np.asarray(f) >= 0) & (np.asarray(f) <= 1)).all()


def test_evaluate_reflection_finite():
    vs = _data.upper_unit_vectors()
    v, l = _pairs(vs)
    f = jnp.ones((len(v), 3))
    for alpha in ALPHAS:
        val, pdf = shading.evaluate_reflection(jnp.asarray(v), jnp.asarray(l),
                                               f, alpha)
        _assert_finite(val, pdf)


def test_evaluate_refraction_finite():
    vs = _data.upper_unit_vectors()
    lo = vs.copy()
    lo[:, 2] = -np.abs(lo[:, 2])     # transmitted directions: z <= 0
    v, l = _pairs(vs)[0], _pairs(lo)[1]
    f = jnp.ones((len(v), 3))
    for alpha, eta in itertools.product(ALPHAS, ETAS):
        val, pdf = shading.evaluate_refraction(
            jnp.asarray(v), jnp.asarray(l), f, alpha, jnp.asarray(eta))
        _assert_finite(val, pdf)


def test_sample_ggx_finite_unit():
    v = _data.upper_unit_vectors()
    u = _data.edge_floats()
    for alpha in ALPHAS:
        for u1 in u[::2]:
            h = shading.sample_ggx(jnp.full(len(v), u1), jnp.full(len(v), 1 - u1),
                                   jnp.asarray(v), alpha)
            _assert_finite(h)
            h = np.asarray(h)
            assert (h[:, 2] >= -1e-6).all()              # upper hemisphere
            norms = np.linalg.norm(h, axis=-1)
            # degenerate (V.z == 0, alpha == 0) lanes return the guarded
            # zero vector where GLSL normalize(0) would be undefined/NaN;
            # all non-degenerate lanes must be unit length
            nonzero = norms > 0.5
            assert np.allclose(norms[nonzero], 1.0, atol=1e-4)


def test_sample_ggx_matches_vndf_mean():
    """Sampled half-vectors concentrate around V's reflection axis for
    small alpha (sanity, beyond the reference's no-NaN checks)."""
    rngv = np.array([[0.0, 0.0, 1.0]], np.float32).repeat(4096, 0)
    rng = np.random.default_rng(1)
    u1 = rng.random(4096).astype(np.float32)
    u2 = rng.random(4096).astype(np.float32)
    h = np.asarray(shading.sample_ggx(jnp.asarray(u1), jnp.asarray(u2),
                                      jnp.asarray(rngv), 0.05))
    assert h[:, 2].mean() > 0.99
