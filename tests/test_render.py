"""End-to-end render tests: Default scene smoke, determinism, sharding
equivalence, and post-processing."""

import numpy as np
import jax
import pytest

from pt.post.pipeline import PostProcessSettings, postprocess, tonemap_sdr
from pt.render.integrator import PathTracingSettings, render_image_stats
from pt.render.textures import default_texture_pool
from pt.scene.examples import make_default_scene
from pt.scene.flatten import flatten_scene


@pytest.fixture(scope="module")
def default_setup():
    scene = make_default_scene()
    ds = flatten_scene(scene)
    from pt.scene.textures import build_scene_textures
    tex = build_scene_textures(scene)   # Default now carries embedded art
    cam = scene.cameras[0]
    cam.on_resize(32, 32)
    return scene, ds, tex, cam


def _render(ds, tex, cam, frame=0, spp=2, bounces=4, w=32, h=32):
    return render_image_stats(ds, tex, cam.inv_view, cam.inv_proj, w, h, frame,
                              PathTracingSettings(sample_count=spp,
                                                  bounce_count=bounces))


def test_default_scene_renders(default_setup):
    _, ds, tex, cam = default_setup
    img, rays = _render(ds, tex, cam)
    img = np.asarray(img)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.0                      # light reaches the film
    assert int(rays) > 32 * 32 * 2              # beyond primary rays


def test_render_deterministic(default_setup):
    _, ds, tex, cam = default_setup
    a, _ = _render(ds, tex, cam, frame=0)
    b, _ = _render(ds, tex, cam, frame=0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_frames_decorrelated(default_setup):
    _, ds, tex, cam = default_setup
    a, _ = _render(ds, tex, cam, frame=0)
    b, _ = _render(ds, tex, cam, frame=2)
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_progressive_accumulation_converges(default_setup):
    """More accumulated samples → lower variance between halves."""
    _, ds, tex, cam = default_setup
    frames = [np.asarray(_render(ds, tex, cam, frame=f, spp=2)[0])
              for f in range(0, 8, 2)]
    a = (frames[0] + frames[1]) / 4
    b = (frames[2] + frames[3]) / 4
    single_diff = np.abs(frames[0] / 2 - frames[2] / 2).mean()
    pair_diff = np.abs(a - b).mean()
    assert pair_diff < single_diff * 1.05


def test_film_sharding_matches_single_device(default_setup):
    from pt.dist.mesh import film_mesh, render_image_sharded
    _, ds, tex, cam = default_setup
    st = PathTracingSettings(sample_count=1, bounce_count=3)
    ref, rays_ref = render_image_stats(ds, tex, cam.inv_view, cam.inv_proj,
                                       32, 32, 0, st)
    mesh = film_mesh()
    assert mesh.devices.size == 8, "conftest must provide 8 virtual devices"
    img, rays = jax.jit(
        lambda *a: render_image_sharded(*a, 32, 32, 0, st, mesh)
    )(ds, tex, cam.inv_view, cam.inv_proj)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(ref))
    assert int(rays) == int(rays_ref)


def test_spp_sharding_scales(default_setup):
    from pt.dist.mesh import film_mesh, render_spp_sharded
    _, ds, tex, cam = default_setup
    st = PathTracingSettings(sample_count=1, bounce_count=3)
    mesh = film_mesh()
    img, rays = render_spp_sharded(ds, tex, cam.inv_view, cam.inv_proj,
                                   32, 32, 0, st, mesh)
    ref, rays_ref = render_image_stats(ds, tex, cam.inv_view, cam.inv_proj,
                                       32, 32, 0, st)
    ratio = float(np.asarray(img).mean() / np.asarray(ref).mean())
    assert 6.0 < ratio < 10.0        # 8 merged films within MC noise
    assert int(rays) > 6 * int(rays_ref)


def test_postprocess_sentinels():
    accum = np.zeros((4, 4, 3), np.float32)
    accum[0, 0] = np.nan
    accum[1, 1] = np.inf
    accum[2, 2] = 1.0
    out = np.asarray(postprocess(accum, 1.0,
                                 PostProcessSettings(enable_bloom=False)))
    # NaN→red, Inf→green sentinels survive the tonemap as saturated pixels
    assert out[0, 0, 0] > 0.99 and out[0, 0, 1] < 0.01
    assert out[1, 1, 1] > 0.99 and out[1, 1, 0] < 0.01
    assert np.isfinite(out).all()


def test_tonemap_sdr():
    x = np.asarray([0.0, 1.0, 100.0], np.float32)
    y = np.asarray(tonemap_sdr(x))
    np.testing.assert_allclose(y, 1.0 - np.exp(-x), rtol=1e-6)
    assert (y <= 1.0).all() and (y >= 0.0).all()


def test_bloom_adds_glow():
    accum = np.zeros((64, 64, 3), np.float32)
    accum[32, 32] = 500.0                       # bright spot
    with_bloom = np.asarray(postprocess(accum, 1.0, PostProcessSettings()))
    without = np.asarray(postprocess(accum, 1.0,
                                     PostProcessSettings(enable_bloom=False)))
    # neighborhood pixels pick up energy only with bloom
    assert with_bloom[32, 36].sum() > without[32, 36].sum()
    assert with_bloom[20, 20].sum() >= without[20, 20].sum()


def test_production_renderer_sharded(default_setup):
    """The host-orchestrated multi-chip path (shard_map stages) agrees with
    the single-device production renderer in expectation."""
    from pt.dist.mesh import film_mesh
    from pt.run.renderer import Renderer
    scene, _, _, _ = default_setup
    st = PathTracingSettings(sample_count=1, bounce_count=3, backend="brute")
    mesh = film_mesh()
    r = Renderer(st, mesh=mesh)
    r.set_scene(scene, stream_textures=False)
    r.on_resize(32, 32)
    r.render(4)
    img = np.asarray(r.accum) / 4
    r2 = Renderer(st)
    r2.set_scene(scene, stream_textures=False)
    r2.on_resize(32, 32)
    r2.render(4)
    ref = np.asarray(r2.accum) / 4
    assert np.isfinite(img).all()
    # decorrelated seeds → statistical agreement, not bit equality
    assert abs(img.mean() - ref.mean()) / max(ref.mean(), 1e-9) < 0.2


def test_compaction_bit_identical(default_setup):
    """The renderer's wavefront compaction (live-lane gather into smaller
    size classes) must not change results at all: dead lanes neither
    consume RNG nor contribute radiance."""
    from pt.run import renderer as R
    scene, _, _, _ = default_setup
    st = PathTracingSettings(sample_count=1, bounce_count=5, backend="brute")

    r = R.Renderer(st)
    r.set_scene(scene, stream_textures=False)
    r.on_resize(48, 48)                # 2304 lanes → compacts to 1024
    r.render(2)                        # first call observes counts
    r.render(2)                        # second call compacts by plan
    # incoherent-tail dispatches run per-sample at film width (the
    # hybrid splits the spp-group after the coherent bounce 0)
    plan = r._plans.get(("tail", 48 * 48))
    assert plan is not None
    assert min(plan) <= 1152, "plan should trigger compaction"
    with_compact = np.asarray(r.accum)

    # disable compaction by making the size class huge
    orig = R._size_class
    R._size_class = lambda n, minimum=1024: 1 << 30
    try:
        r2 = R.Renderer(st)
        r2.set_scene(scene, stream_textures=False)
        r2.on_resize(48, 48)
        r2.render(2)
        r2.render(2)
        without = np.asarray(r2.accum)
    finally:
        R._size_class = orig

    np.testing.assert_array_equal(with_compact, without)


def test_film_spp_2d_mesh(default_setup):
    """Combined (film, spp) 2-D mesh: the 1-wide special cases are
    bit-identical to the 1-D modes, and the true 2-D grid merges
    decorrelated sample groups over the spp axis."""
    from pt.dist.mesh import (film_mesh, film_spp_mesh,
                              render_image_sharded,
                              render_image_spp_sharded, render_spp_sharded)
    _, ds, tex, cam = default_setup
    st = PathTracingSettings(sample_count=1, bounce_count=3)
    args = (ds, tex, cam.inv_view, cam.inv_proj, 32, 32, 0, st)

    # film-only degeneration (8x1) == 1-D film sharding, bit-exact
    img_f, rays_f = render_image_sharded(*args, film_mesh())
    img_2d, rays_2d = render_image_spp_sharded(*args, film_spp_mesh(8, 1))
    np.testing.assert_array_equal(np.asarray(img_2d), np.asarray(img_f))
    assert int(rays_2d) == int(rays_f)

    # spp-only degeneration (1x8) == 1-D spp sharding, bit-exact
    img_s, rays_s = render_spp_sharded(*args, film_mesh())
    img_2s, rays_2s = render_image_spp_sharded(*args, film_spp_mesh(1, 8))
    np.testing.assert_array_equal(np.asarray(img_2s), np.asarray(img_s))
    assert int(rays_2s) == int(rays_s)

    # true 2-D grid: 4 film groups x 2 sample groups -> ~2x radiance
    img, rays = render_image_spp_sharded(*args, film_spp_mesh(4, 2))
    ref, rays_ref = render_image_stats(ds, tex, cam.inv_view, cam.inv_proj,
                                       32, 32, 0, st)
    ratio = float(np.asarray(img).mean() / np.asarray(ref).mean())
    assert 1.5 < ratio < 2.6            # 2 merged films within MC noise
    assert int(rays) > int(rays_ref)


def test_spf_retune_does_not_recompile():
    """The adaptive samples-per-frame controller retunes sample_count
    every few seconds; no traced stage reads it, so it must not be part
    of any jit static key (a retune used to recompile raygen + both
    bounce variants, freezing the interactive stream)."""
    import dataclasses

    from pt.run.renderer import Renderer, _bounce_jit, _raygen_jit
    from pt.scene.examples import make_reuse_mesh_scene

    r = Renderer(PathTracingSettings(sample_count=1, bounce_count=2,
                                     backend="brute"))
    r.set_scene(make_reuse_mesh_scene(), stream_textures=False)
    r.on_resize(16, 16)
    # warm the power-of-two spp-group dispatch classes once (the grouped
    # wavefront quantizes to pow2 shapes so the compiled set is bounded)
    r.render(1)
    for spf in (2, 4, 8):
        r.settings = dataclasses.replace(r.settings, sample_count=spf)
        r.render()
    before = _raygen_jit._cache_size() + _bounce_jit._cache_size()
    # arbitrary retunes (incl. non-pow2) must map onto compiled classes
    for spf in (2, 3, 4, 5, 6, 7, 8):
        r.settings = dataclasses.replace(r.settings, sample_count=spf)
        r.render()
    after = _raygen_jit._cache_size() + _bounce_jit._cache_size()
    assert after == before


def test_stale_texture_pool_not_swapped_in():
    """A loader thread from a replaced scene finishing late must not
    install its pool under the new scene's texture indices."""
    from pt.run.renderer import Renderer
    from pt.scene.examples import make_reuse_mesh_scene

    r = Renderer(PathTracingSettings(sample_count=1, bounce_count=1,
                                     backend="brute"))
    r.set_scene(make_reuse_mesh_scene(), stream_textures=False)
    current = r.tex
    r._pending_tex = (r._tex_gen - 1, "stale-pool")   # late stale writer
    r._poll_textures()
    assert r.tex is current
    r._pending_tex = (r._tex_gen, current)            # current-gen writer
    r._poll_textures()
    assert r.tex is current


def test_rays_traced_chunks_fold_and_checkpoint(default_setup, tmp_path):
    """The ray counter accumulates per-sample device chunks folded into a
    host int: folding must not change the total, and checkpoints must
    round-trip it."""
    scene, ds, tex, _cam = default_setup
    from pt.run.renderer import Renderer

    r = Renderer(PathTracingSettings(sample_count=1, bounce_count=2,
                                     backend="brute"))
    r.set_scene(scene, stream_textures=False)
    r.on_resize(16, 16)
    for _ in range(6):
        r.render(1)
    total = r.rays_traced
    assert total > 0
    r._fold_rays(keep=2, limit=3)
    assert len(r._rays_chunks) == 2
    assert r.rays_traced == total
    path = tmp_path / "ck.npz"
    r.save_checkpoint(str(path))
    r2 = Renderer(PathTracingSettings(sample_count=1, bounce_count=2,
                                      backend="brute"))
    r2.set_scene(scene, stream_textures=False)
    r2.on_resize(16, 16)
    r2.load_checkpoint(str(path))
    assert r2.rays_traced == total


def test_multihost_film_assembly(default_setup):
    """film_mesh_multihost degenerates to all local devices single-host;
    assemble_film gathers a band-sharded film to a replicated host array
    (the save-time-only DCN crossing, SURVEY §5)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pt.dist.mesh import assemble_film, film_mesh_multihost

    mesh = film_mesh_multihost()
    assert mesh.devices.size == len(jax.devices())
    film = jnp.arange(mesh.devices.size * 4 * 3, dtype=jnp.float32) \
        .reshape(mesh.devices.size * 4, 1, 3)
    sharded = jax.device_put(
        film, NamedSharding(mesh, P(mesh.axis_names[0])))
    out = assemble_film(sharded, mesh)
    np.testing.assert_array_equal(out, np.asarray(film))


def test_shade_sorted_is_pure_permutation():
    """shade_sorted permutes lanes around _shade_hit and inverse-permutes
    the payload — mathematically a pure permutation (per-lane RNG travels
    with its lane). The two arms are separately compiled XLA programs, so
    FMA contraction may differ by one ulp per op; the film must agree to
    that level (a real permutation bug shows O(1) radiance differences)."""
    import numpy as np
    from pt.render.integrator import PathTracingSettings
    from pt.run.renderer import Renderer
    from pt.scene.examples import make_default_scene

    films = []
    for sorted_ in (False, True):
        r = Renderer(PathTracingSettings(sample_count=2, bounce_count=3,
                                         shade_sorted=sorted_))
        r.set_scene(make_default_scene(), stream_textures=False)
        r.on_resize(32, 32)
        r.render()
        films.append(np.asarray(r.film_mean()))
    np.testing.assert_allclose(films[0], films[1], atol=1e-6, rtol=1e-5)
