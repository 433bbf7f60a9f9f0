"""MetallicRoughness cubes scene: node-attached animated point light
(≙ CreateMetallicRoughnessCubesScene, ExampleScenes.cpp:547-658 — the only
scene exercising animated node-attached lights end-to-end)."""

import numpy as np

from pt.render.integrator import PathTracingSettings
from pt.scene.examples import make_metallic_roughness_cubes_scene


def test_light_follows_animated_node():
    scene = make_metallic_roughness_cubes_scene()
    assert scene.graph.has_animations
    x0 = scene.point_lights[0].position[0]
    assert x0 == -1.0
    scene.update(3.0)                       # tick 90: keyframe midpoint
    assert scene.point_lights[0].position[0] == 1.0
    scene.update(3.0)                       # tick 180 wraps to 0
    assert scene.point_lights[0].position[0] == -1.0


def test_render_changes_with_light_motion():
    """Full loop: the moving light must change the image, and the flattened
    device scene must pick up the new light position via
    update_seg_transforms (the per-frame upload path)."""
    from pt.run.renderer import Renderer

    scene = make_metallic_roughness_cubes_scene()
    r = Renderer(PathTracingSettings(sample_count=1, bounce_count=2,
                                     backend="brute"))
    r.set_scene(scene, stream_textures=False)
    r.on_resize(48, 48)
    r.render(1)
    img0 = r.snapshot()
    assert np.isfinite(img0).all()

    changed = scene.update(3.0)             # light to x=+1
    assert changed
    r.update_scene_data(scene_changed=True)
    assert float(r.ds.point_light_pos[0, 0]) == 1.0
    r.render(1)
    img1 = r.snapshot()
    assert np.isfinite(img1).all()
    # illumination moved: images must differ meaningfully
    assert np.abs(img1 - img0).max() > 1e-3


def test_textures_present():
    scene = make_metallic_roughness_cubes_scene()
    # 3 materials x 4 texture slots
    assert len(scene.textures) == 12
    from pt.scene.textures import build_scene_textures
    pool = build_scene_textures(scene)
    # defaults 0..8 + 12 scene textures
    assert pool.mip_counts.shape[0] == 21
    assert not pool.all_constant
