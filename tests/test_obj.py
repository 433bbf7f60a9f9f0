"""Wavefront OBJ/MTL importer (pt/scene/obj.py)
(≙ the assimp OBJ path, SceneImporter.cpp:1060-1075)."""

import numpy as np
import pytest

from pt.scene.builder import SceneBuilder
from pt.scene.obj import import_obj

OBJ = """\
# test cube-ish
mtllib test.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
vt 0 0
vt 1 0
vt 1 1
vn 0 0 -1
usemtl red
f 1/1/1 2/2/1 3/3/1 4/1/1
usemtl shiny
f -5 -4 -1
"""

MTL = """\
newmtl red
Kd 0.9 0.1 0.1
Ns 10
newmtl shiny
Kd 0.2 0.2 0.8
Ks 1 1 1
Ns 250
Ke 0.5 0.5 0.0
d 0.5
"""


@pytest.fixture
def obj_path(tmp_path):
    (tmp_path / "test.mtl").write_text(MTL)
    p = tmp_path / "test.obj"
    p.write_text(OBJ)
    return p


def test_import_obj(obj_path):
    b = SceneBuilder("obj")
    import_obj(b, obj_path)
    scene = b.create_scene()
    # quad fan-triangulates to 2 tris + 1 negative-index tri
    assert scene.indices.shape[0] // 3 == 3
    assert len(scene.materials_ph) == 2
    red = scene.materials_ph[0]
    assert red.color[:3] == (0.9, 0.1, 0.1)
    shiny = scene.materials_ph[1]
    assert shiny.shininess == 250
    assert shiny.emissive_intensity == 1.0
    assert shiny.color[3] == 0.5                   # d -> alpha
    # d < 1 marks the geometry non-opaque
    opaque = [g.is_opaque for g in scene.geometries]
    assert opaque == [True, False]
    # generated flat normal for the vn-less face
    assert np.isfinite(scene.vertices.normals).all()


def test_render_obj_scene(obj_path):
    from pt.core.camera import InputCamera
    from pt.render.integrator import PathTracingSettings
    from pt.run.renderer import Renderer

    b = SceneBuilder("obj")
    import_obj(b, obj_path)
    b.add_camera(InputCamera(45.0, 100.0, 0.1, (0.5, 0.5, -3.0),
                             (0.0, 0.0, 1.0)))
    from pt.scene.types import DirectionalLight
    b.set_directional_light(DirectionalLight(color=(2.0, 2.0, 2.0),
                                             direction=(0.2, 0.5, 0.8)))
    scene = b.create_scene()
    r = Renderer(PathTracingSettings(sample_count=2, bounce_count=2,
                                     backend="brute"))
    r.set_scene(scene)
    r.on_resize(32, 32)
    r.render()
    img = r.snapshot()
    assert np.isfinite(img).all()
    assert img.std() > 1e-4


def test_scene_manager_dispatches_obj(obj_path):
    from pt.scene.manager import SceneDescription
    loader = SceneDescription("o", [str(obj_path)]).to_loader()
    assert loader is not None
    b = SceneBuilder("o")
    loader.load(b)
    assert b.indices is not None and len(b.geometries) == 2
