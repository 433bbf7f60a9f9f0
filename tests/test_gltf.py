"""glTF importer tests against generated assets (no downloads in this
environment; the generator doubles as a writer reference)."""

import base64
import json
import struct

import numpy as np
import pytest

from pt.scene.builder import SceneBuilder
from pt.scene.gltf import import_gltf
from pt.scene.types import MaterialType, unpack_material_id


def _tri_gltf(tmp_path, binary=False, with_anim=True):
    """Two-triangle quad with a MetallicRoughness material, a child node
    cube instance, a rotation animation, and a punctual light."""
    positions = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                         np.float32)
    normals = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    indices = np.array([0, 1, 2, 2, 3, 0], np.uint16)

    blob = b"".join([positions.tobytes(), normals.tobytes(), uvs.tobytes(),
                     indices.tobytes()])
    while len(blob) % 4:
        blob += b"\0"
    anim_times = np.array([0.0, 2.0], np.float32)
    anim_rots = np.array([[0, 0, 0, 1], [0, 0.7071068, 0, 0.7071068]],
                         np.float32)
    anim_off = len(blob)
    blob += anim_times.tobytes() + anim_rots.tobytes()

    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [
            {"name": "root", "children": [1, 2],
             "translation": [0, 0, -5]},
            {"name": "quad", "mesh": 0},
            {"name": "lamp", "translation": [0, 3, 0],
             "extensions": {"KHR_lights_punctual": {"light": 0}}},
        ],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3, "material": 0}]}],
        "materials": [{
            "name": "mat",
            "pbrMetallicRoughness": {
                "baseColorFactor": [0.8, 0.1, 0.2, 1.0],
                "metallicFactor": 0.25, "roughnessFactor": 0.5},
            "emissiveFactor": [0.1, 0.2, 0.3],
            "extensions": {
                "KHR_materials_transmission": {"transmissionFactor": 0.5},
                "KHR_materials_ior": {"ior": 1.33}},
        }],
        "extensions": {"KHR_lights_punctual": {"lights": [
            {"type": "point", "color": [1.0, 0.9, 0.8], "intensity": 2.0}]}},
        "extensionsUsed": ["KHR_lights_punctual", "KHR_materials_transmission",
                          "KHR_materials_ior"],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 32},
            {"buffer": 0, "byteOffset": 128, "byteLength": 12},
            {"buffer": 0, "byteOffset": anim_off, "byteLength": 8},
            {"buffer": 0, "byteOffset": anim_off + 8, "byteLength": 32},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3", "min": [0, 0, 0], "max": [1, 1, 0]},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4,
             "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
            {"bufferView": 4, "componentType": 5126, "count": 2,
             "type": "SCALAR"},
            {"bufferView": 5, "componentType": 5126, "count": 2,
             "type": "VEC4"},
        ],
        "buffers": [{"byteLength": len(blob)}],
    }
    if with_anim:
        gltf["animations"] = [{
            "name": "spin",
            "channels": [{"sampler": 0,
                          "target": {"node": 1, "path": "rotation"}}],
            "samplers": [{"input": 4, "interpolation": "LINEAR",
                          "output": 5}],
        }]

    if binary:
        payload = json.dumps(gltf).encode()
        while len(payload) % 4:
            payload += b" "
        glb = (struct.pack("<III", 0x46546C67, 2,
                           12 + 8 + len(payload) + 8 + len(blob))
               + struct.pack("<II", len(payload), 0x4E4F534A) + payload
               + struct.pack("<II", len(blob), 0x004E4942) + blob)
        path = tmp_path / "scene.glb"
        path.write_bytes(glb)
    else:
        gltf["buffers"][0]["uri"] = ("data:application/octet-stream;base64,"
                                     + base64.b64encode(blob).decode())
        path = tmp_path / "scene.gltf"
        path.write_text(json.dumps(gltf))
    return path


@pytest.mark.parametrize("binary", [False, True])
def test_import_geometry_and_material(tmp_path, binary):
    path = _tri_gltf(tmp_path, binary=binary)
    b = SceneBuilder("t")
    import_gltf(b, path)
    scene = b.create_scene()

    assert len(scene.instances) == 1
    assert len(scene.geometries) == 1
    geo = scene.geometries[0]
    assert geo.vertex_count == 4 and geo.index_count == 6
    np.testing.assert_allclose(scene.vertices.positions[1], [1, 0, 0])

    mid = scene.models[0].meshes[0].material_id
    idx, mtype = unpack_material_id(mid)
    assert mtype == MaterialType.METALLIC_ROUGHNESS
    m = scene.materials_mr[idx]
    np.testing.assert_allclose(m.color, (0.8, 0.1, 0.2, 1.0))
    assert m.metalness == 0.25 and m.roughness == 0.5
    assert m.transmission == 0.5
    assert m.ior == 1.33
    assert m.emissive_intensity == 1.0          # emissiveFactor present

    # punctual point light attached to its node (world pos = root + lamp)
    assert len(scene.point_lights) == 1
    np.testing.assert_allclose(scene.point_lights[0].color, (2.0, 1.8, 1.6))
    np.testing.assert_allclose(scene.point_lights[0].position, (0, 3, -5),
                               atol=1e-6)


def test_import_animation(tmp_path):
    path = _tri_gltf(tmp_path)
    b = SceneBuilder("t")
    import_gltf(b, path)
    scene = b.create_scene()
    assert scene.graph.has_animations
    # advance to t=1 (half the clip): quad node rotated 45° about Y
    scene.update(1.0)
    quad_node = scene.instances[0].scene_node_index
    rot = scene.graph.current[quad_node][:3, :3]
    v = rot @ np.array([1.0, 0, 0])
    np.testing.assert_allclose(v, [np.sqrt(0.5), 0, -np.sqrt(0.5)],
                               atol=1e-5)


def test_import_renders(tmp_path):
    """End-to-end: imported scene flattens and renders without error."""
    from pt.render.integrator import PathTracingSettings, render_image_stats
    from pt.render.textures import default_texture_pool
    from pt.scene.flatten import flatten_scene
    from pt.core.camera import InputCamera

    path = _tri_gltf(tmp_path, with_anim=False)
    b = SceneBuilder("t")
    import_gltf(b, path)
    b.add_camera(InputCamera(45.0, 0.1, 100.0, (0.5, 0.5, -2.0), (0, 0, -1)))
    scene = b.create_scene()
    ds = flatten_scene(scene)
    tex = default_texture_pool()
    cam = scene.cameras[0]
    cam.on_resize(16, 16)
    img, rays = render_image_stats(ds, tex, cam.inv_view, cam.inv_proj,
                                   16, 16, 0,
                                   PathTracingSettings(1, 2, backend="brute"))
    assert np.isfinite(np.asarray(img)).all()


def test_sparse_accessor(tmp_path):
    """Sparse accessors substitute values at listed indices."""
    base = np.zeros((4, 3), np.float32)
    blob = base.tobytes()
    sparse_idx = np.array([2], np.uint16).tobytes()
    sparse_val = np.array([[7.0, 8.0, 9.0]], np.float32).tobytes()
    off_i = len(blob)
    blob += sparse_idx
    blob += b"\0\0"                         # 4-byte align
    off_v = len(blob)
    blob += sparse_val
    gltf = {
        "asset": {"version": "2.0"},
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": off_i, "byteLength": 2},
            {"buffer": 0, "byteOffset": off_v, "byteLength": 12},
        ],
        "accessors": [{
            "bufferView": 0, "componentType": 5126, "count": 4,
            "type": "VEC3",
            "sparse": {"count": 1,
                       "indices": {"bufferView": 1, "componentType": 5123},
                       "values": {"bufferView": 2}}}],
        "buffers": [{"byteLength": len(blob),
                     "uri": "data:application/octet-stream;base64,"
                            + base64.b64encode(blob).decode()}],
    }
    path = tmp_path / "sparse.gltf"
    path.write_text(json.dumps(gltf))
    from pt.scene.gltf import GLTFFile
    out = GLTFFile(path).accessor(0)
    np.testing.assert_allclose(out[2], [7, 8, 9])
    np.testing.assert_allclose(out[0], [0, 0, 0])
