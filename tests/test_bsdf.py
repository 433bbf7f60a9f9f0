"""BSDF tests: lobe-probability normalization + sampling/eval consistency.

Port of the reference's BsdfTest.cpp:12-41 (sampleLobePdfs over a 5x5x5 grid
sums to exactly 1) plus distribution checks the reference lacks (cheap in
JAX, recommended by SURVEY §4)."""

import numpy as np
import jax.numpy as jnp

from pt.render import rng as prng
from pt.render.bsdf import (MaterialSample, evaluate_bsdf, sample_bsdf,
                            sample_lobe_pdfs)


def _grid5():
    return np.linspace(0.0, 1.0, 5, dtype=np.float32)


def test_lobe_pdfs_sum_to_one():
    m, t, f = np.meshgrid(_grid5(), _grid5(), _grid5(), indexing="ij")
    lobes = sample_lobe_pdfs(jnp.asarray(m.ravel()), jnp.asarray(t.ravel()),
                             jnp.asarray(f.ravel()))
    total = np.asarray(lobes.diffuse + lobes.glossy + lobes.metallic
                       + lobes.transmissive)
    np.testing.assert_allclose(total, 1.0, rtol=0, atol=1e-6)


def _make_material(n, color=(0.8, 0.6, 0.4), roughness=0.5, metalness=0.0,
                   transmission=0.0, eta=1.0 / 1.5):
    ones = jnp.ones((n,), jnp.float32)
    return MaterialSample(
        color=jnp.broadcast_to(jnp.asarray(color, jnp.float32), (n, 3)),
        emissive=jnp.zeros((n, 3)),
        normal=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3)),
        roughness=ones * roughness,
        metalness=ones * metalness,
        transmission=ones * transmission,
        eta=ones * eta,
        attenuation_color=jnp.ones((n, 3)),
        attenuation_distance=ones * 1e32,
    )


def test_sample_eval_pdf_consistency():
    """sampleBSDF's returned (color, pdf) must equal evaluateBSDF at the
    sampled direction (the reference computes them that way,
    bsdf.glsl:126-129)."""
    n = 1024
    mat = _make_material(n, roughness=0.4, metalness=0.3, transmission=0.2)
    v = jnp.broadcast_to(jnp.asarray([0.3, 0.1, 0.95]), (n, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    state = prng.jenkins_hash(jnp.arange(n, dtype=jnp.uint32))
    _, bs = sample_bsdf(mat, v, state)
    val, pdf = evaluate_bsdf(mat, v, bs.direction)
    np.testing.assert_allclose(np.asarray(bs.color), np.asarray(val),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bs.pdf), np.asarray(pdf),
                               rtol=1e-5, atol=1e-6)


def test_diffuse_white_furnace():
    """For a pure-diffuse white material, E[bsdf/pdf] == 1 (energy
    conservation of cosine-weighted sampling)."""
    n = 1 << 14
    mat = _make_material(n, color=(1.0, 1.0, 1.0), roughness=1.0,
                         metalness=0.0, transmission=0.0)
    v = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    state = prng.jenkins_hash(jnp.arange(n, dtype=jnp.uint32) + 7)
    _, bs = sample_bsdf(mat, v, state)
    w = np.asarray(bs.color[:, 0] / np.maximum(np.asarray(bs.pdf), 1e-12))
    ok = np.asarray(bs.pdf) > 1e-6
    # diffuse lanes dominate; mean weight ≈ 1 within MC error
    assert abs(w[ok].mean() - 1.0) < 0.05


def test_sampled_direction_finite_unit():
    n = 4096
    for rough, metal, trans in [(0.0, 0.0, 1.0), (0.01, 1.0, 0.0),
                                (1.0, 0.0, 0.0), (0.5, 0.5, 0.5)]:
        mat = _make_material(n, roughness=rough, metalness=metal,
                             transmission=trans)
        v = jnp.broadcast_to(jnp.asarray([0.4, -0.2, 0.89]), (n, 3))
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        state = prng.jenkins_hash(jnp.arange(n, dtype=jnp.uint32) + 99)
        _, bs = sample_bsdf(mat, v, state)
        d = np.asarray(bs.direction)
        assert np.isfinite(d).all()
        assert np.isfinite(np.asarray(bs.pdf)).all()
        assert np.isfinite(np.asarray(bs.color)).all()
        norms = np.linalg.norm(d, axis=-1)
        # refract() yields zero vector on TIR lanes — those get pdf 0
        nonzero = norms > 0.5
        assert np.allclose(norms[nonzero], 1.0, atol=1e-4)
