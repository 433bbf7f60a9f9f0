"""Embedded resources (pt/resources.py ≙ Resources.{h,cpp}) and the UI
composition stage (compose_ui ≙ uiComposition.comp:55-60)."""

import numpy as np

from pt import resources
from pt.post import PostProcessSettings, compose_ui, postprocess
from pt.post.pipeline import _srgb_to_linear, linear_to_hdr10, tonemap_sdr


class TestEmbeddedResources:
    def test_all_assets_decode(self):
        # ≙ Resources.h:9-12: four embedded textures
        assert set(resources.NAMES) == {"placeholder", "logo", "authors",
                                        "press_space"}
        for name in resources.NAMES:
            rgba = resources.texture_rgba(name)
            assert rgba.ndim == 3 and rgba.shape[2] == 4
            assert rgba.dtype == np.uint8
            assert rgba.shape[0] >= 32 and rgba.shape[1] >= 32
            assert (rgba[..., 3] == 255).all()      # opaque art

    def test_bytes_are_png_and_deterministic(self):
        for name in resources.NAMES:
            data = resources.texture_bytes(name)
            assert data[:8] == b"\x89PNG\r\n\x1a\n"
            assert data == resources.texture_bytes(name)

    def test_default_scene_wires_embedded_textures(self):
        # ≙ ExampleScenes.cpp:338-383: logo wall = placeholder art,
        # mirror cube = engine banner, glass cube = authors, floor =
        # press-space
        from pt.scene.examples import make_default_scene
        from pt.scene.types import SCENE_TEXTURE_OFFSET

        scene = make_default_scene()
        names = [t.name for t in scene.textures]
        assert names == ["Logo Color Texture", "TPU Path-Tracing Texture",
                         "Authors Texture", "Press Space Texture"]
        idx = {m.color_idx for m in scene.materials_mr}
        # all four table slots are referenced by some material
        for k in range(4):
            assert SCENE_TEXTURE_OFFSET + k in idx, (k, idx)

    def test_scene_texture_pool_builds(self):
        from pt.scene.examples import make_default_scene
        from pt.scene.textures import build_scene_textures
        from pt.scene.types import SCENE_TEXTURE_OFFSET

        pool = build_scene_textures(make_default_scene())
        assert pool.count >= SCENE_TEXTURE_OFFSET + 4
        assert not pool.all_constant


class TestComposeUI:
    def test_zero_alpha_is_passthrough(self):
        screen = np.random.default_rng(0).uniform(
            0, 1, (8, 8, 3)).astype(np.float32)
        ui = np.zeros((8, 8, 4), np.float32)
        np.testing.assert_allclose(np.asarray(compose_ui(screen, ui)),
                                   screen, rtol=1e-6)

    def test_covered_pixels_blend_99_to_1(self):
        # uiComposition.comp:58: srgb_to_linear(ui)*0.99 + screen*0.01
        screen = np.full((4, 4, 3), 0.5, np.float32)
        ui = np.zeros((4, 4, 4), np.float32)
        ui[:2] = [0.5, 0.25, 1.0, 1.0]
        out = np.asarray(compose_ui(screen, ui))
        lin = np.asarray(_srgb_to_linear(np.asarray([0.5, 0.25, 1.0],
                                                    np.float32)))
        np.testing.assert_allclose(out[:2], np.broadcast_to(
            lin * 0.99 + 0.5 * 0.01, (2, 4, 3)), rtol=1e-5)
        np.testing.assert_allclose(out[2:], 0.5, rtol=1e-6)

    def test_uint8_overlay_accepted(self):
        screen = np.zeros((2, 2, 3), np.float32)
        ui = np.zeros((2, 2, 4), np.uint8)
        ui[0, 0] = [255, 255, 255, 255]
        out = np.asarray(compose_ui(screen, ui))
        assert out[0, 0, 0] > 0.9 and out[1, 1, 0] == 0.0

    def test_postprocess_ui_order_sdr(self):
        # blend happens AFTER tone mapping (Renderer.cpp:1766-1776 order)
        accum = np.full((4, 4, 3), 2.0, np.float32)
        ui = np.zeros((4, 4, 4), np.float32)
        ui[0, 0] = [1.0, 0.0, 0.0, 1.0]
        settings = PostProcessSettings(enable_bloom=False)
        out = np.asarray(postprocess(accum, 1.0, settings, ui=ui))
        base = np.asarray(tonemap_sdr(np.asarray(accum)))
        expect = np.asarray(compose_ui(base, ui))
        np.testing.assert_allclose(out, expect, rtol=1e-5)

    def test_postprocess_ui_order_hdr(self):
        # HDR: blend in linear light, THEN PQ encode (uiComposition.comp:60)
        accum = np.full((4, 4, 3), 0.25, np.float32)
        ui = np.zeros((4, 4, 4), np.float32)
        ui[1, 1] = [0.5, 0.5, 0.5, 1.0]
        settings = PostProcessSettings(enable_bloom=False)
        out = np.asarray(postprocess(accum, 1.0, settings, hdr=True, ui=ui))
        expect = np.asarray(linear_to_hdr10(
            compose_ui(np.asarray(accum), ui)))
        np.testing.assert_allclose(out, expect, rtol=1e-5)


class TestViewerHud:
    def test_hud_overlay_has_logo_coverage(self):
        from pt.run.viewer import _build_hud

        hud = _build_hud(320, 240)
        assert hud.shape == (240, 320, 4)
        assert hud[..., 3].any()
        # logo sits top-left; bottom-right stays clear for the film
        assert not hud[120:, 160:, 3].any()

    def test_tiny_film_skips_hud(self):
        from pt.run.viewer import _build_hud

        hud = _build_hud(16, 16)
        assert not hud[..., 3].any()
