"""Adaptive per-pixel film tests (render_adaptive): noise-driven stopping,
mean correctness vs the uniform path, checkpoint round-trip.

The reference has no adaptive-film analogue (its progressive accumulation
always samples the full film, Renderer.cpp:1694-1700); this is the upgrade
path for the time-to-converged-frame metric."""

import numpy as np
import pytest

from pt.render.integrator import PathTracingSettings
from pt.run.renderer import Renderer
from pt.scene.examples import make_default_scene

SET = PathTracingSettings(sample_count=1, bounce_count=2, backend="bvh")


def _renderer(size=16):
    r = Renderer(SET)
    r.set_scene(make_default_scene(), stream_textures=False)
    r.on_resize(size, size)
    return r


class TestAllocHelpers:
    """Invariants of the shared redistribution helpers (they feed both the
    single-device and per-band sharded loops — drift breaks tol=0
    cross-topology equality)."""

    def test_largest_remainder_properties(self):
        from pt.run.renderer import _largest_remainder_alloc
        rng = np.random.default_rng(7)
        for _ in range(50):
            n = int(rng.integers(1, 40))
            deficit = rng.integers(0, 100, n).astype(np.int64)
            total = int(deficit.sum())
            if total == 0:
                continue
            budget = int(rng.integers(1, total + 1))
            alloc = _largest_remainder_alloc(deficit.copy(), budget)
            assert int(alloc.sum()) == budget
            assert (alloc <= deficit).all() and (alloc >= 0).all()
            # proportionality: never off by more than 1 from the real share
            share = deficit * budget / total
            assert (np.abs(alloc - share) <= 1.0 + 1e-9).all()

    def test_rep_major_stream(self):
        from pt.run.renderer import _rep_major_stream
        alloc = np.array([2, 0, 3, 1], np.int64)
        base = np.array([5, 9, 0, 7], np.int64)
        pix, frm = _rep_major_stream(alloc, base)
        # rep-major: rep0 pixels first (0,2,3), then rep1 (0,2), rep2 (2)
        np.testing.assert_array_equal(pix, [0, 2, 3, 0, 2, 2])
        np.testing.assert_array_equal(frm, [5, 0, 7, 6, 1, 2])
        # every pixel's frames are its own consecutive stream continuation
        for p in range(4):
            np.testing.assert_array_equal(
                np.sort(frm[pix == p]), base[p] + np.arange(alloc[p]))


class TestAdaptiveFilm:
    def test_tol_zero_matches_uniform(self):
        """tol=0 never converges → every pixel gets exactly max_spp samples
        with the same per-sample RNG streams as repeated render(1) calls;
        the films must agree."""
        ra = _renderer()
        stats = ra.render_adaptive(tol=0.0, max_spp=4, min_spp=1,
                                   check_every=4)
        assert stats["spp_min"] == stats["spp_max"] == 4
        ru = _renderer()
        for _ in range(4):
            ru.render(1)
        np.testing.assert_allclose(ra.snapshot(), ru.snapshot(),
                                   atol=1e-5)

    def test_converges_and_counts_vary(self):
        r = _renderer()
        stats = r.render_adaptive(tol=0.05, max_spp=16, min_spp=2,
                                  check_every=2)
        assert stats["spp_min"] >= 2
        assert stats["spp_max"] <= 16
        assert stats["spp_mean"] <= 16
        img = r.snapshot()
        assert np.isfinite(img).all()
        # the Cornell box has easy (emissive/background) and hard
        # (indirect) pixels: adaptive must NOT spend max_spp everywhere
        assert stats["spp_mean"] < 16 or stats["spp_min"] == 16

    def test_adaptive_film_near_uniform_film(self):
        """Per-pixel means from the adaptive film agree with a uniform
        16-spp film to within Monte-Carlo noise."""
        ra = _renderer()
        ra.render_adaptive(tol=0.02, max_spp=16, min_spp=4, check_every=4)
        ru = _renderer()
        for _ in range(16):
            ru.render(1)
        a, u = ra.snapshot(), ru.snapshot()
        assert np.abs(a - u).mean() < 0.05

    def test_checkpoint_roundtrip(self, tmp_path):
        r = _renderer()
        r.render_adaptive(tol=0.05, max_spp=8, min_spp=2, check_every=2)
        p = str(tmp_path / "ckpt.npz")
        r.save_checkpoint(p)
        r2 = _renderer()
        r2.load_checkpoint(p)
        np.testing.assert_allclose(r.snapshot(), r2.snapshot(), atol=1e-7)
        assert np.array_equal(r2._spp_map, r._spp_map)

    def test_target_mse_mode(self):
        """Global-MSE stopping: runs to the estimated-MSE threshold and
        the film's estimated mean(var/n) honors it."""
        r = _renderer()
        stats = r.render_adaptive(target_mse=5e-4, max_spp=64, min_spp=4,
                                  check_every=4)
        assert stats["spp_min"] >= 4
        img = r.snapshot()
        assert np.isfinite(img).all()
        # estimated global MSE at the stop point
        counts = np.maximum(r._spp_map, 1)
        lum = np.asarray(r.accum.reshape(-1, 3) @ np.array(
            [0.2126, 0.7152, 0.0722], np.float32)) / counts
        var = np.maximum(np.asarray(r._accum_sq) / counts - lum * lum, 0.0)
        est = float(np.mean(var / counts * np.exp(-lum) ** 2))
        capped = (r._spp_map >= 64).any()
        assert est < 5e-4 or capped

    def test_offline_adaptive_end_to_end(self, tmp_path):
        """RenderSettings.adaptive_tol drives the offline flow (the
        `pt render --adaptive TOL` path) and writes a finite frame."""
        import os

        from pt.out.saver import OutputInfo
        from pt.run.offline import OfflineRenderer, RenderSettings
        r = _renderer()
        out = str(tmp_path / "a.png")
        rs = RenderSettings(output=OutputInfo(out, 16, 16, 30.0, "png"),
                            max_sample_count=8, adaptive_tol=0.05)
        n = OfflineRenderer(r).render(rs)
        assert n == 1 and os.path.exists(out)
        assert r._spp_map is not None and r._spp_map.min() >= 1

    def test_sharded_matches_single_device(self):
        """Band-sharded adaptive at tol=0 must reproduce the single-device
        adaptive film: streams are (pixel, count)-seeded, independent of
        which shard traces them (8-device CPU mesh; film 16x16 = 32 px
        per band)."""
        from pt.dist.mesh import film_mesh
        ra = _renderer()
        ra.render_adaptive(tol=0.0, max_spp=4, min_spp=1, check_every=4)
        rs = Renderer(SET, mesh=film_mesh())
        rs.set_scene(make_default_scene(), stream_textures=False)
        rs.on_resize(16, 16)
        stats = rs.render_adaptive(tol=0.0, max_spp=4, min_spp=1,
                                   check_every=4)
        assert stats["spp_min"] == stats["spp_max"] == 4
        np.testing.assert_allclose(rs.snapshot(), ra.snapshot(), atol=1e-5)

    def test_sharded_target_mse(self):
        """Global-MSE stopping on the mesh: converges, per-band allocation
        keeps every pixel at >= min_spp, film finite."""
        from pt.dist.mesh import film_mesh
        r = Renderer(SET, mesh=film_mesh())
        r.set_scene(make_default_scene(), stream_textures=False)
        r.on_resize(16, 16)
        stats = r.render_adaptive(target_mse=5e-4, max_spp=32, min_spp=2,
                                  check_every=4)
        assert stats["spp_min"] >= 2 and stats["spp_max"] <= 32
        assert np.isfinite(r.snapshot()).all()

    def test_max_seconds_deadline(self):
        """max_seconds bounds wall time at round granularity; an expired
        deadline leaves a valid (possibly empty) film."""
        r = _renderer()
        stats = r.render_adaptive(tol=0.0, max_spp=64, min_spp=1,
                                  check_every=1, max_seconds=0.0)
        assert stats["steps"] == 0 and stats["spp_max"] == 0
        stats = r.render_adaptive(tol=0.0, max_spp=4, min_spp=1,
                                  check_every=4, max_seconds=1e9)
        assert stats["spp_min"] == 4
        assert np.isfinite(r.snapshot()).all()

    def test_uniform_render_resets_adaptive_film(self):
        """Mixing modes: a uniform render() after an adaptive one restarts
        accumulation rather than corrupting per-pixel statistics."""
        r = _renderer()
        r.render_adaptive(tol=0.05, max_spp=4, min_spp=2, check_every=2)
        r.render(1)
        assert r._spp_map is None
        assert r.total_samples == 1
        assert np.isfinite(r.snapshot()).all()
