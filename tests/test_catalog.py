"""HQ scene catalog resolution (≙ AddHighQualityScenes,
ExampleScenes.cpp:82-236): descriptions resolve against an on-disk asset
layout, missing entries are skipped, and a resolved entry loads through
the SceneManager + importer end to end."""

import numpy as np

from pt.scene.catalog import add_high_quality_scenes
from pt.scene.manager import SceneManager


def _make_pavilion_asset(base):
    """Write a real scene as a GLB under the catalog's expected path (the
    importer sniffs the GLB magic, so the .gltf name is fine)."""
    from pt.scene.examples import make_roughness_test_scene
    from pt.scene.gltf_export import export_glb

    path = base / "scenes" / "EMirageBarcelonaPavilion"
    path.mkdir(parents=True)
    export_glb(make_roughness_test_scene(),
               str(path / "barcelona_pavilion_day.gltf"))


def test_empty_assets_registers_nothing(tmp_path):
    mgr = SceneManager()
    assert add_high_quality_scenes(mgr, tmp_path) == 0
    assert "High Quality Scenes" not in mgr.groups


def test_resolved_entry_loads_end_to_end(tmp_path):
    _make_pavilion_asset(tmp_path)
    mgr = SceneManager()
    added = add_high_quality_scenes(mgr, tmp_path)
    assert added == 1
    assert "eMirage Barcelona Pavilion Day" in mgr.groups["High Quality Scenes"]

    mgr.set_active_scene("High Quality Scenes",
                         "eMirage Barcelona Pavilion Day", blocking=True)
    scene = mgr.get_active_scene()
    assert scene is not None
    assert len(scene.vertices) > 0 and len(scene.instances) > 0

    from pt.scene.flatten import flatten_scene
    ds = flatten_scene(scene)
    assert np.isfinite(np.asarray(ds.obj_positions)).all()
