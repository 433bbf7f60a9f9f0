"""Split-tree any-hit emulation (AlphaSplit): the opaque/alpha partition
path must reproduce the single-tree loop's semantics (anyhit.rahit /
occlusionAnyhit.rahit) — same hits, decals, and shadow decisions — while
re-tracing only the non-opaque subset."""

import numpy as np
import jax.numpy as jnp

from pt.core.camera import InputCamera
from pt.render.integrator import (PathTracingSettings, make_alpha_split_brute,
                                  prepare_accel, trace_closest_alpha,
                                  trace_occluded_alpha)
from pt.render.textures import default_texture_pool
from pt.scene.builder import SceneBuilder
from pt.scene.flatten import flatten_scene
from pt.scene.types import Geometry, MeshInfo, MetallicRoughnessMaterial

from tests.test_alpha import _quad, _scene_with_alpha


def _layered_scene(alphas, back_z=10.0):
    """Non-opaque quads at z=1,2,3,... with the given base-color alphas,
    then an opaque white wall."""
    b = SceneBuilder("layers")
    meshes = []
    for i, a in enumerate(alphas):
        m = b.add_material(f"layer{i}", MetallicRoughnessMaterial(
            color=(0.2, 0.4, 0.9, a)))
        meshes.append(MeshInfo(_quad(b, 1.0 + i, opaque=False), m))
    back = b.add_material("back", MetallicRoughnessMaterial(
        color=(1.0, 1.0, 1.0, 1.0)))
    meshes.append(MeshInfo(_quad(b, back_z, opaque=True), back))
    model = b.add_model(meshes)
    node = b.add_scene_node(0, np.eye(4))
    b.add_model_instance(model, node)
    b.add_camera(InputCamera(45, 0.1, 100, (0, 0, 0), (0, 0, 1)))
    return b.create_scene()


def _accels(scene):
    ds = flatten_scene(scene)
    tex = default_texture_pool()
    accel = prepare_accel(ds, PathTracingSettings(backend="brute"))
    assert accel.alpha_split is None
    split = make_alpha_split_brute(ds)
    assert split is not None
    return ds, tex, accel, accel._replace(alpha_split=split)


def _rays(n=4):
    o = jnp.zeros((n, 3))
    d = jnp.asarray(np.tile(np.array([[0, 0, 1]], np.float32), (n, 1)))
    return o, d, jnp.ones((n,), bool)


def _assert_hits_equal(a, b):
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))
    np.testing.assert_allclose(np.asarray(a.u), np.asarray(b.u), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.v), np.asarray(b.v), atol=1e-6)


class TestClosestParity:
    def test_skip_chain_matches_single_tree(self):
        # two transparent layers then the opaque wall: the split path must
        # skip both, record the closest decal, and land on the wall
        ds, tex, plain, split = _accels(_layered_scene([0.3, 0.2]))
        o, d, alive = _rays()
        got = trace_closest_alpha(ds, tex, split, o, d, alive)
        want = trace_closest_alpha(ds, tex, plain, o, d, alive)
        _assert_hits_equal(got[0], want[0])
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                                   atol=1e-6)          # decal color
        np.testing.assert_allclose(np.asarray(got[2]), np.asarray(want[2]),
                                   atol=1e-6)          # decal alpha (0.3)
        np.testing.assert_array_equal(np.asarray(got[3]),
                                      np.asarray(want[3]))

    def test_accepting_alpha_matches(self):
        ds, tex, plain, split = _accels(_scene_with_alpha(0.7))
        o, d, alive = _rays()
        got = trace_closest_alpha(ds, tex, split, o, d, alive)
        want = trace_closest_alpha(ds, tex, plain, o, d, alive)
        _assert_hits_equal(got[0], want[0])
        np.testing.assert_allclose(np.asarray(got[0].t), 1.0, atol=1e-3)

    def test_accept_behind_skip(self):
        # α=0.3 skip at z=1, α=0.9 accept at z=2, wall at z=10
        ds, tex, plain, split = _accels(_layered_scene([0.3, 0.9]))
        o, d, alive = _rays()
        got = trace_closest_alpha(ds, tex, split, o, d, alive)
        want = trace_closest_alpha(ds, tex, plain, o, d, alive)
        _assert_hits_equal(got[0], want[0])
        np.testing.assert_allclose(np.asarray(got[0].t), 2.0, atol=1e-3)

    def test_dead_lanes_idle(self):
        ds, tex, plain, split = _accels(_layered_scene([0.3]))
        o, d, _ = _rays()
        alive = jnp.asarray([True, False, True, False])
        got = trace_closest_alpha(ds, tex, split, o, d, alive)
        want = trace_closest_alpha(ds, tex, plain, o, d, alive)
        live = np.asarray(alive)
        np.testing.assert_allclose(np.asarray(got[0].t)[live],
                                   np.asarray(want[0].t)[live], atol=1e-5)

    def test_deep_stack_resolves_to_opaque_bound(self):
        # 5 transparent layers exceed ALPHA_ROUNDS: the split path resolves
        # to the opaque wall (documented divergence from the single-tree
        # loop, which keeps the last transparent surface; the reference's
        # hardware any-hit loop is unbounded and would also reach the wall)
        ds, tex, plain, split = _accels(
            _layered_scene([0.1, 0.1, 0.1, 0.1, 0.1]))
        o, d, alive = _rays()
        got = trace_closest_alpha(ds, tex, split, o, d, alive)
        np.testing.assert_allclose(np.asarray(got[0].t), 10.0, atol=1e-3)


class TestOccludedParity:
    def test_translucent_passes_opaque_blocks(self):
        ds, tex, plain, split = _accels(_scene_with_alpha(0.7))
        o, d, _ = _rays()
        for dist in (1.5, 3.0):
            got = trace_occluded_alpha(ds, tex, split, o, d,
                                       jnp.full((4,), dist))
            want = trace_occluded_alpha(ds, tex, plain, o, d,
                                        jnp.full((4,), dist))
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_fully_opaque_alpha_texel_blocks(self):
        # a non-opaque geometry whose sampled α is exactly 1 blocks light
        # (occlusionAnyhit.rahit: ignore only when α < 1)
        ds, tex, plain, split = _accels(_scene_with_alpha(1.0))
        o, d, _ = _rays()
        got = trace_occluded_alpha(ds, tex, split, o, d, jnp.full((4,), 1.5))
        want = trace_occluded_alpha(ds, tex, plain, o, d,
                                    jnp.full((4,), 1.5))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        assert bool(np.asarray(got).all())

    def test_layered_translucency(self):
        ds, tex, plain, split = _accels(_layered_scene([0.3, 0.6], back_z=4.0))
        o, d, _ = _rays()
        for dist in (2.5, 5.0):
            got = trace_occluded_alpha(ds, tex, split, o, d,
                                       jnp.full((4,), dist))
            want = trace_occluded_alpha(ds, tex, plain, o, d,
                                        jnp.full((4,), dist))
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_renderer_attaches_brute_split_for_static_alpha_scenes():
    # the brute oracle renderer follows the same split semantics as the
    # TPU production path, so oracle-vs-pallas comparisons measure
    # traversal alone (benches/courtyard_baseline.py)
    from pt.run.renderer import Renderer
    r = Renderer(PathTracingSettings(sample_count=1, bounce_count=2,
                                     backend="brute"))
    r.set_scene(_scene_with_alpha(0.3), stream_textures=False)
    r.on_resize(8, 8)
    r.render(1)
    assert r.accel.alpha_split is not None
    assert np.isfinite(r.snapshot()).all()


def test_renderer_skips_split_for_animated_scenes():
    from pt.run.renderer import Renderer
    from pt.scene.examples import make_metallic_roughness_cubes_scene
    scene = make_metallic_roughness_cubes_scene()
    r = Renderer(PathTracingSettings(sample_count=1, bounce_count=2,
                                     backend="brute"))
    r.set_scene(scene, stream_textures=False)
    r.on_resize(8, 8)
    r.render(1)
    assert np.isfinite(r.snapshot()).all()
