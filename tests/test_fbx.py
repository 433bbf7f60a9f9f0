"""Binary FBX importer tests (pt/scene/fbx.py).

A minimal binary-FBX writer lives here (tests only) so the importer is
exercised on real container bytes: node records in both the 32-bit
(≤7.4) and 64-bit (≥7.5) layouts, zlib-compressed arrays, layer
mapping/reference combinations, the OO model hierarchy, and OP
material-texture links."""

import struct
import zlib

import numpy as np
import pytest

from pt.scene.builder import SceneBuilder
from pt.scene.fbx import import_fbx, parse_fbx

MAGIC = b"Kaydara FBX Binary  \x00\x1a\x00"


def _prop(v):
    if isinstance(v, bool):
        return b"C" + bytes([v])
    if isinstance(v, int):
        return b"L" + struct.pack("<q", v)
    if isinstance(v, float):
        return b"D" + struct.pack("<d", v)
    if isinstance(v, str):
        b = v.encode()
        return b"S" + struct.pack("<I", len(b)) + b
    if isinstance(v, np.ndarray):
        code = {"float64": b"d", "float32": b"f", "int64": b"l",
                "int32": b"i"}[str(v.dtype)]
        raw = v.tobytes()
        comp = zlib.compress(raw)
        return (code + struct.pack("<III", v.size, 1, len(comp)) + comp)
    raise TypeError(type(v))


def _node(name, props=(), children=(), wide=False, base=0):
    """Serialize one node record at absolute offset `base`."""
    name_b = name.encode()
    props_b = b"".join(_prop(p) for p in props)
    hdr = 25 if wide else 13
    hdr_fmt = "<QQQB" if wide else "<IIIB"
    null = b"\0" * hdr
    # children rendered after the header+name+props
    body_off = base + hdr + len(name_b) + len(props_b)
    kids = b""
    for c in children:
        kids += c(wide, body_off + len(kids))
    if children:
        kids += null
    end = body_off + len(kids)
    return struct.pack(hdr_fmt, end, len(props), len(props_b),
                       len(name_b)) + name_b + props_b + kids


def N(name, props=(), children=()):
    return lambda wide, base: _node(name, props, children, wide, base)


def write_fbx(path, top_nodes, version=7400):
    wide = version >= 7500
    out = MAGIC + struct.pack("<I", version)
    for n in top_nodes:
        out += n(wide, len(out))
    out += b"\0" * (25 if wide else 13)
    path.write_bytes(out)


def _cube_fbx(version=7400, mapping="ByPolygonVertex", ref="Direct",
              diffuse=(0.8, 0.2, 0.2), translation=(0.0, 2.0, 0.0)):
    """Quad-faced unit cube: 8 verts, 6 polygons, normals + UVs."""
    verts = np.asarray([
        [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
        [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], np.float64)
    polys = [(0, 1, 2, 3), (4, 7, 6, 5), (0, 4, 5, 1),
             (2, 6, 7, 3), (0, 3, 7, 4), (1, 5, 6, 2)]
    pvi = []
    for p in polys:
        pvi.extend(p[:-1])
        pvi.append(~p[-1])
    pvi = np.asarray(pvi, np.int32)
    fnormals = np.asarray([[0, 0, -1], [0, 0, 1], [0, -1, 0],
                           [0, 1, 0], [-1, 0, 0], [1, 0, 0]], np.float64)
    if mapping == "ByPolygonVertex":
        nrm = np.repeat(fnormals, 4, axis=0).reshape(-1)
    elif mapping == "ByPolygon":
        nrm = fnormals.reshape(-1)
    else:  # ByVertice: vertex normals (cube corner average, unnormalized ok)
        nrm = (verts / np.linalg.norm(verts, axis=-1,
                                      keepdims=True)).reshape(-1)
    uv_data = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float64)
    uv_idx = np.tile(np.arange(4, dtype=np.int32), 6).astype(np.int32)

    norm_children = [
        N("MappingInformationType", [mapping]),
        N("ReferenceInformationType", ["Direct"]),
        N("Normals", [np.asarray(nrm, np.float64)])]
    uv_children = [
        N("MappingInformationType", ["ByPolygonVertex"]),
        N("ReferenceInformationType", [ref]),
    ]
    if ref == "IndexToDirect":
        uv_children += [N("UV", [uv_data.reshape(-1)]),
                        N("UVIndex", [uv_idx])]
    else:
        uv_children += [N("UV", [uv_data.reshape(-1)[
            np.repeat(uv_idx, 2) * 2 + np.tile([0, 1], len(uv_idx))]])]

    geometry = N("Geometry", [1001, "cube\x00\x01Geometry", "Mesh"], [
        N("Vertices", [verts.reshape(-1)]),
        N("PolygonVertexIndex", [pvi]),
        N("LayerElementNormal", [0], norm_children),
        N("LayerElementUV", [0], uv_children)])
    model = N("Model", [2001, "cube\x00\x01Model", "Mesh"], [
        N("Properties70", [], [
            N("P", ["Lcl Translation", "Lcl Translation", "", "A",
                    *map(float, translation)]),
            N("P", ["Lcl Scaling", "Lcl Scaling", "", "A",
                    2.0, 2.0, 2.0])])])
    material = N("Material", [3001, "red\x00\x01Material", ""], [
        N("Properties70", [], [
            N("P", ["DiffuseColor", "Color", "", "A", *map(float, diffuse)]),
            N("P", ["SpecularColor", "Color", "", "A", 0.3, 0.3, 0.3]),
            N("P", ["Shininess", "double", "Number", "", 32.0]),
            N("P", ["Opacity", "double", "Number", "", 1.0])])])
    objects = N("Objects", [], [geometry, model, material])
    connections = N("Connections", [], [
        N("C", ["OO", 1001, 2001]),
        N("C", ["OO", 2001, 0]),
        N("C", ["OO", 3001, 2001])])
    return [objects, connections], version


class TestParser:
    @pytest.mark.parametrize("version", [7400, 7500])
    def test_roundtrip_node_layouts(self, tmp_path, version):
        nodes, _ = _cube_fbx(version)
        f = tmp_path / "cube.fbx"
        write_fbx(f, nodes, version)
        top, ver = parse_fbx(f.read_bytes())
        assert ver == version
        names = [n.name for n in top]
        assert "Objects" in names and "Connections" in names
        objects = top[names.index("Objects")]
        geo = objects.find("Geometry")
        v = geo.find("Vertices").props[0]
        assert v.shape == (24,)

    def test_garbage_rejected(self, tmp_path):
        f = tmp_path / "a.fbx"
        f.write_bytes(b"\x89PNG not an fbx at all")
        with pytest.raises(ValueError, match="FBX"):
            parse_fbx(f.read_bytes())


ASCII_CUBE = """; FBX 7.4.0 project file
FBXHeaderExtension:  {
\tFBXVersion: 7400
}
Objects:  {
\tGeometry: 1001, "Geometry::cube", "Mesh" {
\t\tVertices: *24 {
\t\t\ta: -1,-1,-1,1,-1,-1,1,1,-1,-1,1,-1,-1,-1,1,1,-1,1,1,1,1,-1,1,1
\t\t}
\t\tPolygonVertexIndex: *30 {
\t\t\ta: 0,1,2,-4,4,7,6,-6,0,4,5,-2,2,6,7,-4,0,3,7,-5,1,5,6,-3,0,1,-3,
\t\t\t4,5,-7
\t\t}
\t\tLayerElementNormal: 0 {
\t\t\tMappingInformationType: "ByPolygon"
\t\t\tReferenceInformationType: "Direct"
\t\t\tNormals: *24 {
\t\t\t\ta: 0,0,-1,0,0,1,0,-1,0,0,1,0,-1,0,0,1,0,0,0,0,-1,0,0,1
\t\t\t}
\t\t}
\t}
\tModel: 2001, "Model::cube", "Mesh" {
\t\tProperties70:  {
\t\t\tP: "Lcl Translation", "Lcl Translation", "", "A",1,2,3
\t\t}
\t\tShading: T
\t\tCulling: "CullingOff"
\t}
\tMaterial: 3001, "Material::green", "" {
\t\tProperties70:  {
\t\t\tP: "DiffuseColor", "Color", "", "A",0.1,0.9,0.2
\t\t\tP: "Opacity", "double", "Number", "",1
\t\t}
\t}
}
Connections:  {
\tC: "OO",1001,2001
\tC: "OO",2001,0
\tC: "OO",3001,2001
}
"""


class TestSkinning:
    def _skinned_fbx(self, tmp_path):
        """Quad with 4 control points: cps 0,1 bound to boneA (static),
        cps 2,3 to boneB whose Lcl Translation animates +2x over 1 s."""
        KTIME = 46186158000
        verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
                           np.float64)
        pvi = np.asarray([0, 1, 3, ~2], np.int32)
        eye16 = np.eye(4, dtype=np.float64).reshape(-1)
        geometry = N("Geometry", [1001, "quad\x00\x01Geometry", "Mesh"], [
            N("Vertices", [verts.reshape(-1)]),
            N("PolygonVertexIndex", [pvi])])
        mesh_model = N("Model", [2001, "quad\x00\x01Model", "Mesh"], [])
        bone_a = N("Model", [4001, "boneA\x00\x01Model", "LimbNode"], [])
        bone_b = N("Model", [4002, "boneB\x00\x01Model", "LimbNode"], [])
        skin = N("Deformer", [5001, "s\x00\x01Deformer", "Skin"], [])
        cl_a = N("Deformer", [5002, "ca\x00\x01SubDeformer", "Cluster"], [
            N("Indexes", [np.asarray([0, 1], np.int32)]),
            N("Weights", [np.asarray([1.0, 1.0], np.float64)]),
            N("Transform", [eye16]),
            N("TransformLink", [eye16])])
        cl_b = N("Deformer", [5003, "cb\x00\x01SubDeformer", "Cluster"], [
            N("Indexes", [np.asarray([2, 3], np.int32)]),
            N("Weights", [np.asarray([1.0, 1.0], np.float64)]),
            N("Transform", [eye16]),
            N("TransformLink", [eye16])])
        cn = N("AnimationCurveNode", [6001, "T\x00\x01AnimCurveNode", ""],
               [N("Properties70", [], [])])
        curve = N("AnimationCurve", [7001, "\x00\x01AnimCurve", ""], [
            N("KeyTime", [np.asarray([0, KTIME], np.int64)]),
            N("KeyValueFloat", [np.asarray([0.0, 2.0], np.float64)])])
        objects = N("Objects", [], [geometry, mesh_model, bone_a, bone_b,
                                    skin, cl_a, cl_b, cn, curve])
        connections = N("Connections", [], [
            N("C", ["OO", 1001, 2001]),
            N("C", ["OO", 2001, 0]),
            N("C", ["OO", 4001, 0]),
            N("C", ["OO", 4002, 0]),
            N("C", ["OO", 5001, 1001]),      # skin → geometry
            N("C", ["OO", 5002, 5001]),      # clusters → skin
            N("C", ["OO", 5003, 5001]),
            N("C", ["OO", 4001, 5002]),      # bone models → clusters
            N("C", ["OO", 4002, 5003]),
            N("C", ["OP", 6001, 4002, "Lcl Translation"]),
            N("C", ["OP", 7001, 6001, "d|X"])])
        f = tmp_path / "skin.fbx"
        write_fbx(f, [objects, connections])
        return f

    def test_skinned_import_and_lbs(self, tmp_path):
        from pt.scene.flatten import (flatten_scene, update_seg_transforms,
                                      world_vertices)
        f = self._skinned_fbx(tmp_path)
        b = SceneBuilder("fbx")
        import_fbx(b, f)
        scene = b.create_scene()
        assert scene.has_skinned_geometry
        assert len(scene.bones) == 2
        assert len(scene.graph.animations) == 1
        ds = flatten_scene(scene)
        pos0 = np.asarray(world_vertices(ds)[0])
        # rest pose: corner order 0,1,3,2 (quad fan 0-1-3, 0-3-2)
        np.testing.assert_allclose(pos0[2], [1, 1, 0], atol=1e-5)
        scene.update(0.5)    # boneB at +1 x
        ds = update_seg_transforms(ds, scene)
        pos1 = np.asarray(world_vertices(ds)[0])
        np.testing.assert_allclose(pos1[0], [0, 0, 0], atol=1e-5)
        np.testing.assert_allclose(pos1[2], [2, 1, 0], atol=1e-5)


class TestAscii:
    def test_ascii_cube_imports(self, tmp_path):
        f = tmp_path / "cube_ascii.fbx"
        f.write_text(ASCII_CUBE)
        nodes, ver = parse_fbx(f.read_bytes())
        assert ver == 7400
        b = SceneBuilder("fbx")
        import_fbx(b, f)
        scene = b.create_scene()
        # 6 quads + 2 extra tris in the index stream above
        assert len(scene.indices) == 6 * 2 * 3 + 2 * 3
        m = scene.instance_transforms[0]
        assert np.allclose(m[:3, 3], [1, 2, 3])
        mat = scene.materials_ph[scene.models[0].meshes[0].material_id >> 8]
        assert np.allclose(mat.color[:3], (0.1, 0.9, 0.2))

    def test_ascii_comments_and_bare_words(self, tmp_path):
        """Comments, T/F bare words, tab indentation all tolerated."""
        f = tmp_path / "c.fbx"
        f.write_text(ASCII_CUBE.replace("Objects:",
                                        "; a comment line\nObjects:"))
        nodes, _ = parse_fbx(f.read_bytes())
        names = [n.name for n in nodes]
        assert "Objects" in names and "Connections" in names
        model = [n for n in nodes[names.index("Objects")].children
                 if n.name == "Model"][0]
        assert model.find("Shading").props == ["T"]


class TestImport:
    @pytest.mark.parametrize("version", [7400, 7500])
    def test_cube_imports(self, tmp_path, version):
        nodes, _ = _cube_fbx(version)
        f = tmp_path / "cube.fbx"
        write_fbx(f, nodes, version)
        b = SceneBuilder("fbx")
        import_fbx(b, f)
        scene = b.create_scene()
        assert len(scene.models) == 1
        # 6 quads fan-triangulated → 12 tris → 36 corners
        assert len(scene.indices) == 36
        # Lcl Translation + Scaling applied on the instance node
        m = scene.instance_transforms[0]
        assert np.allclose(m[:3, 3], [0, 2, 0])
        assert np.allclose(np.diag(m)[:3], [2, 2, 2])
        mat = scene.materials_ph[scene.models[0].meshes[0].material_id >> 8]
        assert np.allclose(mat.color[:3], (0.8, 0.2, 0.2))
        assert mat.shininess == 32.0

    @pytest.mark.parametrize("mapping", ["ByPolygon", "ByVertice"])
    def test_normal_mappings(self, tmp_path, mapping):
        nodes, _ = _cube_fbx(mapping=mapping)
        f = tmp_path / "m.fbx"
        write_fbx(f, nodes)
        b = SceneBuilder("fbx")
        import_fbx(b, f)
        scene = b.create_scene()
        n = scene.vertices.normals
        assert len(n) == 36
        assert np.isfinite(n).all()
        assert (np.linalg.norm(n, axis=-1) > 0.5).all()

    def test_uv_index_to_direct(self, tmp_path):
        nodes, _ = _cube_fbx(ref="IndexToDirect")
        f = tmp_path / "u.fbx"
        write_fbx(f, nodes)
        b = SceneBuilder("fbx")
        import_fbx(b, f)
        scene = b.create_scene()
        uv = scene.vertices.tex_coords
        # corners use the 4 canonical uv pairs (v flipped)
        assert set(np.unique(uv[:, 0]).tolist()) <= {0.0, 1.0}

    def test_renders_end_to_end(self, tmp_path):
        """Imported FBX scene flattens and debug-renders."""
        nodes, _ = _cube_fbx()
        f = tmp_path / "r.fbx"
        write_fbx(f, nodes)
        b = SceneBuilder("fbx")
        import_fbx(b, f)
        from pt.core.camera import InputCamera
        from pt.scene.types import DirectionalLight
        b.set_directional_light(DirectionalLight(color=(1, 1, 1),
                                                 direction=(0.3, 1, 0.2)))
        b.add_camera(InputCamera(45.0, 100.0, 0.1, (0.0, -1.0, -8.0),
                                 (0.0, 0.35, 1.0)))
        scene = b.create_scene()
        import numpy as np_
        from pt.render.debug import DebugRenderMode, render_debug_image
        from pt.render.textures import default_texture_pool
        from pt.scene.flatten import flatten_scene
        ds = flatten_scene(scene)
        cam = scene.cameras[0]
        cam.on_resize(32, 32)
        img = np_.asarray(render_debug_image(
            ds, default_texture_pool(), cam.inv_view.astype("float32"),
            cam.inv_proj.astype("float32"), 32, 32,
            DebugRenderMode.NORMAL))
        assert np_.isfinite(img).all()
        bg = np_.asarray([0.1, 0.1, 0.12])
        assert (np_.abs(img - bg).sum(-1) > 1e-3).any(), "cube not visible"


def test_multi_material_mesh_splits(tmp_path):
    """LayerElementMaterial ByPolygon: a mesh whose polygons reference two
    materials imports as two geometries, each bound to its own material —
    not wholly the first one."""
    verts = np.asarray([
        [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
        [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], np.float64)
    polys = [(0, 1, 2, 3), (4, 7, 6, 5), (0, 4, 5, 1),
             (2, 6, 7, 3), (0, 3, 7, 4), (1, 5, 6, 2)]
    pvi = []
    for p in polys:
        pvi.extend(p[:-1])
        pvi.append(~p[-1])
    geometry = N("Geometry", [1001, "cube\x00\x01Geometry", "Mesh"], [
        N("Vertices", [verts.reshape(-1)]),
        N("PolygonVertexIndex", [np.asarray(pvi, np.int32)]),
        N("LayerElementMaterial", [0], [
            N("MappingInformationType", ["ByPolygon"]),
            N("ReferenceInformationType", ["IndexToDirect"]),
            N("Materials", [np.asarray([0, 0, 0, 1, 1, 1], np.int32)])])])
    model = N("Model", [2001, "cube\x00\x01Model", "Mesh"], [])
    mat_r = N("Material", [3001, "red\x00\x01Material", ""], [
        N("Properties70", [], [
            N("P", ["DiffuseColor", "Color", "", "A", 0.8, 0.2, 0.2]),
            N("P", ["Opacity", "double", "Number", "", 1.0])])])
    mat_g = N("Material", [3002, "green\x00\x01Material", ""], [
        N("Properties70", [], [
            N("P", ["DiffuseColor", "Color", "", "A", 0.1, 0.9, 0.1]),
            N("P", ["Opacity", "double", "Number", "", 1.0])])])
    objects = N("Objects", [], [geometry, model, mat_r, mat_g])
    connections = N("Connections", [], [
        N("C", ["OO", 1001, 2001]),
        N("C", ["OO", 2001, 0]),
        N("C", ["OO", 3001, 2001]),
        N("C", ["OO", 3002, 2001])])

    f = tmp_path / "two_mats.fbx"
    write_fbx(f, [objects, connections])
    from pt.scene.builder import SceneBuilder
    from pt.scene.fbx import import_fbx
    b = SceneBuilder()
    import_fbx(b, f)
    scene = b.create_scene()
    assert len(scene.models) == 1
    meshes = scene.models[0].meshes
    assert len(meshes) == 2
    assert len({m.material_id for m in meshes}) == 2
    # 3 quads each -> 6 triangles -> 18 corners per geometry
    counts = sorted(scene.geometries[m.geometry_index].vertex_count
                    for m in meshes)
    assert counts == [18, 18]
    colors = sorted(tuple(round(c, 2) for c in mat.color[:3])
                    for mat in scene.materials_ph)
    assert (0.1, 0.9, 0.1) in colors and (0.8, 0.2, 0.2) in colors
