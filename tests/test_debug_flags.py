"""Debug pipeline flags + real mip-LOD heatmap
(≙ the Debug tab's raygen/hit flag checkboxes, DebugShaderTypes.incl:24-43,
and the computeLod heatmap, debugClosestHit.rchit)."""

import numpy as np
import pytest

from pt.render.debug import DebugFlags, DebugRenderMode, render_debug_image
from pt.scene.flatten import flatten_scene


@pytest.fixture(scope="module")
def default_setup():
    from pt.render.textures import default_texture_pool
    from pt.scene.examples import make_default_scene
    scene = make_default_scene()
    ds = flatten_scene(scene)
    cam = scene.cameras[0]
    cam.on_resize(48, 48)
    return ds, default_texture_pool(), cam


def _render(ds, tex, cam, mode, **flag_kwargs):
    return np.asarray(render_debug_image(
        ds, tex, cam.inv_view.astype("float32"),
        cam.inv_proj.astype("float32"), 48, 48, mode,
        flags=DebugFlags(**flag_kwargs)))


class TestFlags:
    def test_shadows_flag_changes_color_mode(self):
        # the Cornell default scene has no NEE-sampleable light (area light
        # only), so build a deterministic shadow caster: floor + cube under
        # a near-vertical sun; the floor below the cube must darken when
        # shadows are on
        from pt.core.camera import InputCamera
        from pt.render.textures import default_texture_pool
        from pt.scene.builder import SceneBuilder
        from pt.scene.examples import _add_quad_list, add_cube
        from pt.scene.types import (DirectionalLight, MeshInfo,
                                    MetallicRoughnessMaterial)
        b = SceneBuilder("shadowtest")
        m = b.add_material("w", MetallicRoughnessMaterial(
            color=(0.8, 0.8, 0.8, 1.0), roughness=1.0))
        floor = _add_quad_list(b, [
            ((-10, 0, -10), (0, 0), (0, 1, 0), (1, 0, 0), (0, 0, 1)),
            ((10, 0, -10), (1, 0), (0, 1, 0), (1, 0, 0), (0, 0, 1)),
            ((10, 0, 10), (1, 1), (0, 1, 0), (1, 0, 0), (0, 0, 1)),
            ((-10, 0, 10), (0, 1), (0, 1, 0), (1, 0, 0), (0, 0, 1))])
        cube = b.add_model([MeshInfo(g, m) for g in add_cube(b)])
        b.add_model_instance(b.add_model([MeshInfo(floor, m)]),
                             b.add_scene_node(0, np.eye(4)))
        up = np.eye(4)
        up[1, 3] = 3.0  # 3 units above the floor
        b.add_model_instance(cube, b.add_scene_node(0, up))
        b.set_directional_light(DirectionalLight(color=(3.0, 3.0, 3.0),
                                                 direction=(0.15, -1.0, 0.1)))
        b.add_camera(InputCamera(45.0, 100.0, 0.1, (0.0, 5.0, -10.0),
                                 (0.0, -0.4, 1.0)))
        scene = b.create_scene()
        ds = flatten_scene(scene)
        tex = default_texture_pool()
        cam = scene.cameras[0]
        cam.on_resize(48, 48)
        lit = _render(ds, tex, cam, DebugRenderMode.COLOR,
                      disable_shadows=True)
        shadowed = _render(ds, tex, cam, DebugRenderMode.COLOR)
        assert np.isfinite(lit).all() and np.isfinite(shadowed).all()
        # shadowing must darken at least some pixels, never brighten
        diff = lit - shadowed
        assert diff.max() > 1e-3
        assert diff.min() >= -1e-5

    def test_disable_color_texture(self, default_setup):
        ds, tex, cam = default_setup
        a = _render(ds, tex, cam, DebugRenderMode.COLOR)
        b = _render(ds, tex, cam, DebugRenderMode.COLOR,
                    disable_color_texture=True)
        # the Cornell walls are colored; whitening them changes the frame
        assert np.abs(a - b).max() > 1e-3

    def test_cull_backfaces(self, default_setup):
        ds, tex, cam = default_setup
        a = _render(ds, tex, cam, DebugRenderMode.NORMAL)
        b = _render(ds, tex, cam, DebugRenderMode.NORMAL,
                    cull_backfaces=True)
        assert np.isfinite(b).all()
        # the camera inside the box sees wall interiors (frontfaces stay);
        # the area-light quad is single-sided, so SOME pixels change
        assert a.shape == b.shape

    def test_force_opaque_on_alpha_scene(self):
        from pt.scene.standin import make_courtyard_scene
        from pt.scene.textures import build_scene_textures
        scene = make_courtyard_scene(detail=0.3, tex_scale=1 / 16)
        ds = flatten_scene(scene)
        tex = build_scene_textures(scene)
        cam = scene.cameras[0]
        cam.on_resize(32, 32)
        see_through = np.asarray(render_debug_image(
            ds, tex, cam.inv_view.astype("float32"),
            cam.inv_proj.astype("float32"), 32, 32,
            DebugRenderMode.PRIMITIVE))
        solid = np.asarray(render_debug_image(
            ds, tex, cam.inv_view.astype("float32"),
            cam.inv_proj.astype("float32"), 32, 32,
            DebugRenderMode.PRIMITIVE, flags=DebugFlags(force_opaque=True)))
        assert np.isfinite(see_through).all() and np.isfinite(solid).all()


class TestMipHeatmap:
    def test_lod_increases_with_distance(self):
        """Real computeLod heatmap on textured content: a far wall samples
        a higher mip (red channel) than a near wall."""
        from pt.core.camera import InputCamera
        from pt.scene.builder import SceneBuilder
        from pt.scene.examples import _add_quad_list
        from pt.scene.types import (DirectionalLight, MeshInfo,
                                    MetallicRoughnessMaterial, TextureInfo,
                                    TextureType)
        b = SceneBuilder("mips")
        px = np.random.default_rng(0).random((64, 64, 4)).astype(np.float32)
        ti = b.add_texture(TextureInfo(name="t", type=TextureType.COLOR,
                                       pixels=px))
        m = b.add_material("m", MetallicRoughnessMaterial(color_idx=ti))
        # one huge floor quad receding from the camera
        geo = _add_quad_list(b, [
            ((-50, 0, 0), (0, 0), (0, 1, 0), (1, 0, 0), (0, 0, 1)),
            ((50, 0, 0), (50, 0), (0, 1, 0), (1, 0, 0), (0, 0, 1)),
            ((50, 0, 200), (50, 100), (0, 1, 0), (1, 0, 0), (0, 0, 1)),
            ((-50, 0, 200), (0, 100), (0, 1, 0), (1, 0, 0), (0, 0, 1))])
        model = b.add_model([MeshInfo(geo, m)])
        b.add_model_instance(model, b.add_scene_node(0, np.eye(4)))
        b.set_directional_light(DirectionalLight(color=(1, 1, 1),
                                                 direction=(0, -1, 0)))
        b.add_camera(InputCamera(60.0, 500.0, 0.1, (0.0, 1.0, 1.0),
                                 (0.0, -0.12, 1.0)))
        scene = b.create_scene()
        from pt.scene.textures import build_scene_textures
        ds = flatten_scene(scene)
        tex = build_scene_textures(scene)
        cam = scene.cameras[0]
        cam.on_resize(64, 64)
        img = np.asarray(render_debug_image(
            ds, tex, cam.inv_view.astype("float32"),
            cam.inv_proj.astype("float32"), 64, 64, DebugRenderMode.MIPS))
        # find hit rows (non-background) and compare near vs far red level
        bg = np.asarray([0.1, 0.1, 0.12])
        hitmask = (np.abs(img - bg).sum(-1) > 1e-3)
        rows = np.where(hitmask.any(axis=1))[0]
        assert len(rows) > 10
        near_row, far_row = rows[2], rows[-3]
        near_lvl = img[near_row][hitmask[near_row]][:, 0].mean()
        far_lvl = img[far_row][hitmask[far_row]][:, 0].mean()
        assert not np.isclose(near_lvl, far_lvl, atol=1e-3)
