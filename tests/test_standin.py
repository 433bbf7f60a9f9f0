"""Courtyard benchmark scene + glTF export round-trip.

The scene is the Sponza-class stand-in (pt/scene/standin.py); the
round-trip (scene → .glb → pt.scene.gltf importer) exercises the importer
on a file it did not synthesize (VERDICT round-2 task 4)."""

import numpy as np
import pytest

from pt.scene.flatten import flatten_scene
from pt.scene.standin import make_courtyard_scene


@pytest.fixture(scope="module")
def scene():
    return make_courtyard_scene(detail=0.3, tex_scale=1 / 16)   # small for tests


@pytest.fixture(scope="module")
def full_counts():
    ds = flatten_scene(make_courtyard_scene(tex_scale=1 / 16))
    return ds


class TestSceneContent:
    def test_scale_targets(self, full_counts):
        ds = full_counts
        assert ds.tri_idx.shape[0] >= 200_000          # Sponza-class size
        assert ds.has_alpha
        assert int((~np.asarray(ds.tri_opaque)).sum()) > 500

    def test_material_variety(self, scene):
        assert len(scene.materials_mr) >= 20
        assert len(scene.textures) >= 40
        assert len(scene.point_lights) == 4
        assert scene.directional_light is not None

    def test_render_small(self, scene):
        from pt.render.integrator import PathTracingSettings
        from pt.run.renderer import Renderer
        r = Renderer(PathTracingSettings(sample_count=1, bounce_count=2,
                                         backend="bvh"))
        r.set_scene(scene, stream_textures=False)
        r.on_resize(32, 32)
        r.render(1)
        img = r.snapshot()
        assert np.isfinite(img).all()
        assert img.std() > 1e-3                        # not a blank frame


class TestGlbRoundTrip:
    def test_export_import(self, scene, tmp_path):
        from pt.scene.builder import SceneBuilder
        from pt.scene.gltf import import_gltf
        from pt.scene.gltf_export import export_glb

        path = str(tmp_path / "courtyard.glb")
        export_glb(scene, path)
        b = SceneBuilder("rt")
        import_gltf(b, path)
        s2 = b.create_scene()

        ds1 = flatten_scene(scene)
        ds2 = flatten_scene(s2)
        # world triangle count is preserved exactly
        assert ds1.tri_idx.shape[0] == ds2.tri_idx.shape[0]
        # alpha-tested foliage survives (alphaMode MASK round-trip)
        assert ds2.has_alpha
        assert (int((~np.asarray(ds2.tri_opaque)).sum())
                == int((~np.asarray(ds1.tri_opaque)).sum()))
        # lights survive
        assert len(s2.point_lights) == len(scene.point_lights)
        assert s2.directional_light is not None
        d1 = np.asarray(scene.directional_light.direction, np.float64)
        d2 = np.asarray(s2.directional_light.direction, np.float64)
        np.testing.assert_allclose(d1 / np.linalg.norm(d1), d2, atol=1e-5)
        # textures + camera survive
        assert len(s2.textures) >= 40
        assert len(s2.cameras) >= 1

    def test_imported_world_positions_match(self, scene, tmp_path):
        from pt.scene.builder import SceneBuilder
        from pt.scene.gltf import import_gltf
        from pt.scene.gltf_export import export_glb
        from pt.scene.flatten import world_vertices
        import jax

        path = str(tmp_path / "courtyard.glb")
        export_glb(scene, path)
        b = SceneBuilder("rt")
        import_gltf(b, path)
        s2 = b.create_scene()
        ds1 = flatten_scene(scene)
        ds2 = flatten_scene(s2)
        w1 = np.asarray(jax.jit(lambda d: world_vertices(d)[0])(ds1))
        w2 = np.asarray(jax.jit(lambda d: world_vertices(d)[0])(ds2))
        # same world-space AABB and centroid (vertex order may differ)
        np.testing.assert_allclose(w1.min(0), w2.min(0), atol=1e-3)
        np.testing.assert_allclose(w1.max(0), w2.max(0), atol=1e-3)
        np.testing.assert_allclose(w1.mean(0), w2.mean(0), atol=1e-3)


class TestFlythrough:
    """Orbiting AnimatedCamera variant (camera-path video scene)."""

    def test_orbit_kinematics(self):
        from pt.scene.standin import make_courtyard_flythrough_scene
        s = make_courtyard_flythrough_scene(detail=0.25, tex_scale=1 / 16)
        cam = s.cameras[0]
        s.update(0.0)
        p0 = cam.position.copy()
        s.update(1.0); s.update(0.0)       # camera reads last tick's node
        p1 = cam.position.copy()
        assert not np.allclose(p0, p1)
        # rigid orbit: radius and height preserved
        r0 = np.linalg.norm(p0[[0, 2]])
        r1 = np.linalg.norm(p1[[0, 2]])
        np.testing.assert_allclose(r0, r1, atol=1e-6)
        np.testing.assert_allclose(p0[1], p1[1], atol=1e-9)
        # geometry stays static: camera node carries no instances
        assert not s.has_animated_instances

    def test_frames_differ(self):
        from pt.render.integrator import PathTracingSettings
        from pt.run.renderer import Renderer
        from pt.scene.standin import make_courtyard_flythrough_scene
        s = make_courtyard_flythrough_scene(detail=0.25, tex_scale=1 / 16)
        r = Renderer(PathTracingSettings(sample_count=1, bounce_count=2,
                                         backend="bvh"))
        r.set_scene(s, stream_textures=False)
        r.on_resize(32, 32)
        s.update(0.0)
        r.render(1)
        img0 = r.snapshot()
        s.update(1.0); s.update(0.0)
        r.update_scene_data(scene_changed=True)
        r.render(1)
        img1 = r.snapshot()
        assert np.isfinite(img0).all() and np.isfinite(img1).all()
        assert np.abs(img1 - img0).max() > 1e-3

    def test_camera_index_selects_static_camera(self):
        from pt.render.integrator import PathTracingSettings
        from pt.run.renderer import Renderer
        from pt.scene.standin import (make_courtyard_flythrough_scene,
                                      make_courtyard_scene)
        s = make_courtyard_flythrough_scene(detail=0.25, tex_scale=1 / 16)
        assert len(s.cameras) == 2
        r = Renderer(PathTracingSettings(sample_count=1, bounce_count=2,
                                         backend="bvh"))
        r.set_scene(s, stream_textures=False)
        r.on_resize(32, 32)
        r.camera_index = 1                  # the static InputCamera
        r.render(1)
        img_static = r.snapshot()
        base = make_courtyard_scene(detail=0.25, tex_scale=1 / 16)
        rb = Renderer(PathTracingSettings(sample_count=1, bounce_count=2,
                                          backend="bvh"))
        rb.set_scene(base, stream_textures=False)
        rb.on_resize(32, 32)
        rb.render(1)
        np.testing.assert_allclose(img_static, rb.snapshot(), atol=1e-6)
