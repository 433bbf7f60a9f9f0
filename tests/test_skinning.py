"""Skeletal-animation tests: LBS skinning on device + glTF skin import
(≙ the reference's skinning.comp + bone pipeline)."""

import base64
import json

import numpy as np

from pt.scene.builder import SceneBuilder
from pt.scene.flatten import flatten_scene, update_seg_transforms, world_vertices
from pt.scene.gltf import import_gltf
from pt.scene.graph import Animation, AnimationNode, KeySequence
from pt.scene.types import Geometry, MeshInfo, MetallicRoughnessMaterial


def _skinned_scene():
    """Two-bone chain: verts 0,1 bound to bone A (identity), verts 2,3 fully
    to bone B whose node gets animated."""
    b = SceneBuilder("skin")
    root = b.add_scene_node(0, np.eye(4))
    bone_a_node = b.add_scene_node(root, np.eye(4))
    bone_b_node = b.add_scene_node(root, np.eye(4))
    bone_a = b.add_bone("A", bone_a_node, np.eye(4))
    bone_b = b.add_bone("B", bone_b_node, np.eye(4))

    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    uv = np.zeros((4, 2), np.float32)
    tan = np.tile(np.array([[1, 0, 0]], np.float32), (4, 1))
    bit = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    bone_idx = np.array([[bone_a, 0, 0, 0]] * 2 + [[bone_b, 0, 0, 0]] * 2,
                        np.int32)
    bone_w = np.array([[1, 0, 0, 0]] * 4, np.float32)
    vbase = b.add_animated_vertices(pos, uv, nrm, tan, bit, bone_idx, bone_w)
    ibase = b.add_animated_indices([0, 1, 2, 2, 3, 0])
    geo = b.add_geometry(Geometry(vbase, 4, ibase, 6, True, is_animated=True))
    mid = b.add_material("m", MetallicRoughnessMaterial())
    model = b.add_model([MeshInfo(geo, mid)])
    b.add_model_instance(model, root)

    # animate bone B: translate +2 in x over 1 second
    b.add_animation(Animation(
        nodes=[AnimationNode(
            scene_node_index=bone_b_node,
            positions=KeySequence(np.array([0.0, 1.0]),
                                  np.array([[0, 0, 0], [2, 0, 0.]])),
            rotations=KeySequence(np.array([0.0]),
                                  np.array([[1, 0, 0, 0.]]),
                                  is_rotation=True),
            scales=KeySequence(np.array([0.0]), np.array([[1, 1, 1.]])))],
        ticks_per_second=1.0, duration=1.0))
    return b.create_scene(), bone_b_node


def test_skinning_moves_bound_vertices():
    scene, _ = _skinned_scene()
    assert scene.has_skinned_geometry
    ds = flatten_scene(scene)
    assert ds.has_skinning

    # rest pose: vertices at bind positions
    pos0 = np.asarray(world_vertices(ds)[0])
    np.testing.assert_allclose(pos0[2], [0, 1, 0], atol=1e-6)

    # advance animation to t=0.5 → bone B at x+1
    scene.update(0.5)
    ds = update_seg_transforms(ds, scene)
    pos1 = np.asarray(world_vertices(ds)[0])
    np.testing.assert_allclose(pos1[0], [0, 0, 0], atol=1e-5)   # bone A still
    np.testing.assert_allclose(pos1[2], [1, 1, 0], atol=1e-5)   # bone B moved
    np.testing.assert_allclose(pos1[3], [2, 1, 0], atol=1e-5)


def test_skinned_scene_renders():
    from pt.render.integrator import PathTracingSettings, render_image_stats
    from pt.render.textures import default_texture_pool
    from pt.core.camera import InputCamera

    scene, _ = _skinned_scene()
    scene.cameras[0] = InputCamera(45, 0.1, 100, (0.5, 0.5, -3.0), (0, 0, 1))
    ds = flatten_scene(scene)
    cam = scene.cameras[0]
    cam.on_resize(16, 16)
    img, _ = render_image_stats(ds, default_texture_pool(),
                                cam.inv_view, cam.inv_proj, 16, 16, 0,
                                PathTracingSettings(1, 2, backend="brute"))
    assert np.isfinite(np.asarray(img)).all()


def test_gltf_skin_import(tmp_path):
    """Minimal skinned glTF: 1 joint translating the whole quad."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    joints = np.zeros((4, 4), np.uint16)
    weights = np.array([[1, 0, 0, 0]] * 4, np.float32)
    idx = np.array([0, 1, 2, 2, 3, 0], np.uint16)
    ibm = np.eye(4, dtype=np.float32).T.reshape(1, 16)

    blob = (pos.tobytes() + joints.tobytes() + weights.tobytes()
            + idx.tobytes() + ibm.tobytes())
    gltf = {
        "asset": {"version": "2.0"}, "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"mesh": 0, "skin": 0},
            {"name": "joint", "translation": [0, 0, 0]},
        ],
        "skins": [{"joints": [1], "inverseBindMatrices": 4}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "JOINTS_0": 1, "WEIGHTS_0": 2},
            "indices": 3}]}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 32},
            {"buffer": 0, "byteOffset": 80, "byteLength": 64},
            {"buffer": 0, "byteOffset": 144, "byteLength": 12},
            {"buffer": 0, "byteOffset": 156, "byteLength": 64},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 4, "type": "VEC4"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC4"},
            {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
            {"bufferView": 4, "componentType": 5126, "count": 1, "type": "MAT4"},
        ],
        "buffers": [{"byteLength": len(blob),
                     "uri": "data:application/octet-stream;base64,"
                            + base64.b64encode(blob).decode()}],
    }
    path = tmp_path / "skin.gltf"
    path.write_text(json.dumps(gltf))

    b = SceneBuilder("t")
    import_gltf(b, path)
    scene = b.create_scene()
    assert scene.has_skinned_geometry
    assert len(scene.bones) == 1
    ds = flatten_scene(scene)
    assert ds.has_skinning
    pos0 = np.asarray(world_vertices(ds)[0])
    np.testing.assert_allclose(pos0[:4], pos, atol=1e-6)
