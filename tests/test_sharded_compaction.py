"""Sharded renderer: per-shard wavefront compaction is bit-exact and the
per-bounce host sync is gone (VERDICT round-2 task 3).

Runs on the 8-device virtual CPU mesh from conftest."""

import jax
import numpy as np
import pytest

import pt.run.renderer as ptr
from pt.dist.mesh import film_mesh
from pt.render.integrator import PathTracingSettings
from pt.run.renderer import Renderer
from pt.scene.examples import make_default_scene


@pytest.fixture
def mesh():
    return film_mesh(jax.devices("cpu")[:8])


def _run(mesh, steps, compact):
    r = Renderer(PathTracingSettings(sample_count=1, bounce_count=4,
                                     backend="brute"), mesh=mesh)
    r.set_scene(make_default_scene(), stream_textures=False)
    r.on_resize(64, 64)
    for _ in range(steps):
        if not compact:
            r._plans.clear()                # forbid compaction entirely
            r._plan_ages.clear()
        r.render(1)
    return np.asarray(r.accum), r.rays_traced


def test_sharded_compaction_bit_exact(mesh, monkeypatch):
    # shrink the class floor so the 512-lane shards actually compact
    orig = ptr._size_class
    monkeypatch.setattr(ptr, "_size_class",
                        lambda n, minimum=64: orig(n, minimum))
    film_c, rays_c = _run(mesh, 3, compact=True)
    film_u, rays_u = _run(mesh, 3, compact=False)
    # compaction must not change a single sample: dead lanes neither
    # consume RNG nor contribute, live lanes keep their streams
    np.testing.assert_array_equal(film_c, film_u)
    assert rays_c == rays_u


def test_sharded_band_tiling_covers_film(mesh):
    """Every pixel accumulates exactly once per sample despite the
    band-local tile swizzle (the film_perm scatter is a permutation)."""
    r = Renderer(PathTracingSettings(sample_count=1, bounce_count=1,
                                     backend="brute"), mesh=mesh)
    r.set_scene(make_default_scene(), stream_textures=False)
    r.on_resize(32, 32)
    perm = np.asarray(r._film_perm_sharded)
    n_local = (32 * 32) // 8
    for b in range(8):
        band = perm[b * n_local:(b + 1) * n_local]
        assert sorted(band.tolist()) == list(range(n_local))
    r.render(1)
    img = np.asarray(r.accum)
    assert np.isfinite(img).all()
    # an interior render leaves no untouched scanline bands
    assert (np.abs(img).sum(axis=(1, 2)) > 0).all()
