"""Material/light table layout round-trip tests.

Port of the reference's PaddingTest.cpp (5 tests round-tripping the three
material structs + both light structs through a copy shader to verify
C++/GLSL layout agreement). Here the layout under test is the unified
device material table built by pt.scene.flatten: every host-side field must
land in its declared column and read back exactly."""

import numpy as np

from pt.scene.builder import SceneBuilder
from pt.scene.examples import _add_quad_list  # reuse quad helper
from pt.scene import flatten as fl
from pt.scene.types import (DirectionalLight, Geometry, MeshInfo,
                            MetallicRoughnessMaterial, PhongMaterial,
                            PointLight, SpecularGlossinessMaterial)


def _scene_with(materials):
    b = SceneBuilder("layout")
    mids = [b.add_material(f"m{i}", m) for i, m in enumerate(materials)]
    quad = [((0, 0, 0), (0, 0), (0, 0, 1), (1, 0, 0), (0, 1, 0)),
            ((1, 0, 0), (1, 0), (0, 0, 1), (1, 0, 0), (0, 1, 0)),
            ((1, 1, 0), (1, 1), (0, 0, 1), (1, 0, 0), (0, 1, 0)),
            ((0, 1, 0), (0, 1), (0, 0, 1), (1, 0, 0), (0, 1, 0))]
    geo = _add_quad_list(b, quad)
    model = b.add_model([MeshInfo(geo, mid) for mid in mids])
    node = b.add_scene_node(0, np.eye(4))
    b.add_model_instance(model, node)
    b.add_point_light(PointLight(color=(1, 2, 3), position=(4, 5, 6),
                                 attenuation_constant=0.5,
                                 attenuation_linear=0.25,
                                 attenuation_quadratic=0.125))
    b.set_directional_light(DirectionalLight(color=(7, 8, 9),
                                             direction=(0.1, -0.9, 0.2)))
    return b.create_scene()


def test_metallic_roughness_roundtrip():
    m = MetallicRoughnessMaterial(
        emissive_color=(0.1, 0.2, 0.3), emissive_intensity=2.5,
        color=(0.4, 0.5, 0.6, 0.7), roughness=0.8, metalness=0.9,
        ior=1.33, transmission=0.25, attenuation_color=(0.11, 0.22, 0.33),
        attenuation_distance=12.5, emissive_idx=4, color_idx=10,
        normal_idx=11, roughness_idx=12, metallic_idx=13)
    ds = fl.flatten_scene(_scene_with([m]))
    p = np.asarray(ds.mat_params)[0]
    t = np.asarray(ds.mat_tex)[0]
    np.testing.assert_allclose(p[fl.F_EMISSIVE:fl.F_EMISSIVE + 3], (0.1, 0.2, 0.3))
    assert p[fl.F_EMISSIVE_INT] == np.float32(2.5)
    np.testing.assert_allclose(p[fl.F_COLOR:fl.F_COLOR + 4], (0.4, 0.5, 0.6, 0.7))
    assert p[fl.F_ROUGHNESS] == np.float32(0.8)
    assert p[fl.F_METALNESS] == np.float32(0.9)
    assert p[fl.F_IOR] == np.float32(1.33)
    assert p[fl.F_TRANSMISSION] == np.float32(0.25)
    np.testing.assert_allclose(p[fl.F_ATTEN_COLOR:fl.F_ATTEN_COLOR + 3],
                               (0.11, 0.22, 0.33), rtol=1e-6)
    assert p[fl.F_ATTEN_DIST] == np.float32(12.5)
    assert list(t) == [4, 10, 11, 12, 13]
    assert np.asarray(ds.mat_type)[0] == 0


def test_specular_glossiness_roundtrip():
    m = SpecularGlossinessMaterial(
        emissive_color=(1, 2, 3), emissive_intensity=4,
        color=(5, 6, 7, 8), specular=(0.9, 0.8, 0.7), glossiness=0.6,
        attenuation_color=(0.5, 0.4, 0.3), attenuation_distance=0.2,
        ior=1.1, transmission=0.05, emissive_idx=1, color_idx=2,
        normal_idx=3, specular_idx=14, glossiness_idx=15)
    ds = fl.flatten_scene(_scene_with([m]))
    p = np.asarray(ds.mat_params)[0]
    t = np.asarray(ds.mat_tex)[0]
    np.testing.assert_allclose(p[fl.F_SPECULAR:fl.F_SPECULAR + 3],
                               (0.9, 0.8, 0.7), rtol=1e-6)
    assert p[fl.F_GLOSS] == np.float32(0.6)
    assert list(t) == [1, 2, 3, 14, 15]
    assert np.asarray(ds.mat_type)[0] == 1


def test_phong_roundtrip():
    m = PhongMaterial(specular=(0.33, 0.66, 0.99), shininess=0.77,
                      specular_idx=20, shininess_idx=21)
    ds = fl.flatten_scene(_scene_with([m]))
    p = np.asarray(ds.mat_params)[0]
    t = np.asarray(ds.mat_tex)[0]
    np.testing.assert_allclose(p[fl.F_SPECULAR:fl.F_SPECULAR + 3],
                               (0.33, 0.66, 0.99), rtol=1e-6)
    assert p[fl.F_GLOSS] == np.float32(0.77)
    assert t[fl.T_A] == 20 and t[fl.T_B] == 21
    assert np.asarray(ds.mat_type)[0] == 2


def test_lights_roundtrip():
    ds = fl.flatten_scene(_scene_with([MetallicRoughnessMaterial()]))
    np.testing.assert_allclose(np.asarray(ds.point_light_color)[0], (1, 2, 3))
    np.testing.assert_allclose(np.asarray(ds.point_light_pos)[0], (4, 5, 6))
    np.testing.assert_allclose(np.asarray(ds.point_light_atten)[0],
                               (0.5, 0.25, 0.125))
    assert int(ds.point_light_count) == 1
    np.testing.assert_allclose(np.asarray(ds.dir_light_color), (7, 8, 9))
    np.testing.assert_allclose(np.asarray(ds.dir_light_dir), (0.1, -0.9, 0.2),
                               rtol=1e-6)


def test_material_id_packing():
    """≙ CreateMaterialId/unpackMaterialId (ShaderTypes.incl:155-167)."""
    from pt.scene.types import MaterialType, create_material_id, unpack_material_id
    mid = create_material_id(1234, MaterialType.PHONG)
    assert mid == (1234 << 8) | 2
    idx, mtype = unpack_material_id(mid)
    assert idx == 1234 and mtype == MaterialType.PHONG


def test_mixed_material_rows_resolve():
    """Triangles of different material models index the right unified rows."""
    mats = [MetallicRoughnessMaterial(color=(1, 0, 0, 1)),
            SpecularGlossinessMaterial(color=(0, 1, 0, 1)),
            PhongMaterial(color=(0, 0, 1, 1))]
    ds = fl.flatten_scene(_scene_with(mats))
    rows = np.asarray(ds.tri_mat)
    types = np.asarray(ds.mat_type)[rows]
    # two triangles per quad, three quads in model order mr, sg, phong
    np.testing.assert_array_equal(types, [0, 0, 1, 1, 2, 2])
    colors = np.asarray(ds.mat_params)[rows][:, fl.F_COLOR:fl.F_COLOR + 3]
    np.testing.assert_allclose(colors[0], (1, 0, 0))
    np.testing.assert_allclose(colors[2], (0, 1, 0))
    np.testing.assert_allclose(colors[4], (0, 0, 1))
