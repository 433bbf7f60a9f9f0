#!/usr/bin/env python
"""Generate hand-authored adversarial importer fixtures (tests/data/).

These replicate real-world file quirks that pt's own writers never
produce (VERDICT round-2 task 4; ≙ the content classes the reference's
assimp/gli paths absorb, SceneImporter.cpp:1060-1075,
TextureImporter.cpp:69-260):

- glTF: interleaved bufferViews with padded (non-tight) byteStride,
  non-4-aligned ushort index views, KHR_texture_transform payloads,
  missing image files, unnormalized skin weights in a base64 data-URI
  buffer with UNSIGNED_BYTE joints.
- FBX: a binary 7100-era 32-bit container with zlib-compressed arrays,
  a ByEdge normal layer (valid FBX; no importer we target maps it),
  ByPolygon/IndexToDirect materials; an ASCII file with CRLF, comments,
  Properties70 P-records and a pentagon polygon.
- OBJ: negative indices, polygon fans, a missing .mtl library, an
  undefined usemtl, stray s/l statements.
- DDS: legacy FourCC-only headers (DXT1 mip chain, ATI2/BC5) and a
  cubemap-flagged file (must FAIL cleanly per the keep-prev-scene
  contract).

The bytes are constructed here field-by-field (struct.pack), not via
pt's exporters — first contact with each container layout happens in
the importer under test. Deterministic output; run from the repo root:
    python tools/make_adversarial_fixtures.py
"""

import json
import pathlib
import struct
import zlib

import numpy as np

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "data"


# --------------------------------------------------------------- glTF --

def gltf_interleaved() -> None:
    """One triangle; POSITION/NORMAL/TEXCOORD_0 interleaved in a single
    bufferView with a padded 40-byte stride (12+12+8 payload + 8 pad),
    ushort indices in a 2-but-not-4-aligned view, and a
    KHR_texture_transform on a baseColorTexture whose image file does
    not exist (texture must fall back to the default, scene must load)."""
    verts = []
    pos = [(0, 0, 0), (1, 0, 0), (0, 1, 0)]
    uv = [(0, 0), (1, 0), (0, 1)]
    for p, t in zip(pos, uv):
        verts.append(struct.pack("<3f", *p) + struct.pack("<3f", 0, 0, 1)
                     + struct.pack("<2f", *t) + b"\xCD" * 8)   # pad garbage
    blob = b"".join(verts)                    # 120 B
    blob += b"\xEE\xEE"                       # 2-byte shim → odd alignment
    blob += struct.pack("<3H", 0, 1, 2)       # indices at offset 122
    doc = {
        "asset": {"version": "2.0", "generator": "hand-authored fixture"},
        "extensionsUsed": ["KHR_texture_transform"],
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"name": "tri", "mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorTexture": {
                "index": 0,
                "extensions": {"KHR_texture_transform": {
                    "offset": [0.5, 0.5], "scale": [2.0, 2.0],
                    "rotation": 0.3}}},
            "metallicFactor": 0.1, "roughnessFactor": 0.8}}],
        "textures": [{"source": 0}],
        "images": [{"uri": "this_texture_does_not_exist.png"}],
        "buffers": [{"uri": "adv_interleaved.bin", "byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 120,
             "byteStride": 40, "target": 34962},
            {"buffer": 0, "byteOffset": 122, "byteLength": 6,
             "target": 34963},
        ],
        "accessors": [
            {"bufferView": 0, "byteOffset": 0, "componentType": 5126,
             "count": 3, "type": "VEC3", "min": [0, 0, 0],
             "max": [1, 1, 0]},
            {"bufferView": 0, "byteOffset": 12, "componentType": 5126,
             "count": 3, "type": "VEC3"},
            {"bufferView": 0, "byteOffset": 24, "componentType": 5126,
             "count": 3, "type": "VEC2"},
            {"bufferView": 1, "byteOffset": 0, "componentType": 5123,
             "count": 3, "type": "SCALAR"},
        ],
    }
    (OUT / "adv_interleaved.gltf").write_text(json.dumps(doc, indent=1))
    (OUT / "adv_interleaved.bin").write_bytes(blob)


def gltf_unnormalized_skin() -> None:
    """Skinned triangle in a single self-contained .gltf: base64 data-URI
    buffer, UNSIGNED_BYTE joints, float weights that sum to 2.0 per
    vertex (a classic exporter bug assimp normalizes away)."""
    import base64
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    joints = np.array([[0, 1, 0, 0]] * 3, np.uint8)
    weights = np.array([[1.2, 0.8, 0, 0],
                        [0.5, 1.5, 0, 0],
                        [2.0, 0.0, 0, 0]], np.float32)
    ibm = np.tile(np.eye(4, dtype=np.float32).reshape(1, 16), (2, 1))
    idx = np.array([0, 1, 2], np.uint16)
    blob = pos.tobytes() + joints.tobytes() + weights.tobytes() \
        + ibm.tobytes() + idx.tobytes()
    uri = "data:application/octet-stream;base64," + \
        base64.b64encode(blob).decode()
    o_j = pos.nbytes
    o_w = o_j + joints.nbytes
    o_m = o_w + weights.nbytes
    o_i = o_m + ibm.nbytes
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"name": "skinned", "mesh": 0, "skin": 0},
            {"name": "rootbone", "children": [2]},
            {"name": "tipbone", "translation": [0, 1, 0]},
        ],
        "skins": [{"joints": [1, 2], "inverseBindMatrices": 4}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "JOINTS_0": 1, "WEIGHTS_0": 2},
            "indices": 3}]}],
        "buffers": [{"uri": uri, "byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": pos.nbytes},
            {"buffer": 0, "byteOffset": o_j, "byteLength": joints.nbytes},
            {"buffer": 0, "byteOffset": o_w, "byteLength": weights.nbytes},
            {"buffer": 0, "byteOffset": o_m, "byteLength": ibm.nbytes},
            {"buffer": 0, "byteOffset": o_i, "byteLength": idx.nbytes},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3", "min": [0, 0, 0], "max": [1, 1, 0]},
            {"bufferView": 1, "componentType": 5121, "count": 3,
             "type": "VEC4"},
            {"bufferView": 2, "componentType": 5126, "count": 3,
             "type": "VEC4"},
            {"bufferView": 4, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
            {"bufferView": 3, "componentType": 5126, "count": 2,
             "type": "MAT4"},
        ],
    }
    (OUT / "adv_unnormalized_skin.gltf").write_text(json.dumps(doc, indent=1))


# ---------------------------------------------------------------- FBX --

_FBX_MAGIC = b"Kaydara FBX Binary  \x00\x1a\x00"


class _L(int):
    """Marker: serialize as int64 ('L'), the type real FBX ids use."""


def _fbx_prop(v) -> bytes:
    if isinstance(v, _L):
        return b"L" + struct.pack("<q", int(v))
    if isinstance(v, bool):
        return b"C" + bytes([int(v)])
    if isinstance(v, int):
        return b"I" + struct.pack("<i", v)
    if isinstance(v, float):
        return b"D" + struct.pack("<d", v)
    if isinstance(v, str):
        b = v.encode()
        return b"S" + struct.pack("<I", len(b)) + b
    if isinstance(v, np.ndarray):
        code = {"float64": b"d", "float32": b"f",
                "int32": b"i", "int64": b"l"}[str(v.dtype)]
        comp = zlib.compress(v.tobytes())     # enc=1: deflate, like real files
        return code + struct.pack("<III", v.size, 1, len(comp)) + comp
    raise TypeError(type(v))


def _fbx_node(name: str, props, children, base: int) -> bytes:
    """One 32-bit (version < 7500) binary FBX record at absolute `base`."""
    name_b = name.encode()
    pb = b"".join(_fbx_prop(p) for p in props)
    head_len = 12 + 1 + len(name_b)
    body = b""
    pos = base + head_len + len(pb)
    if children:
        for c in children:
            cb = _fbx_node(c[0], c[1], c[2], pos)
            body += cb
            pos += len(cb)
        body += b"\x00" * 13                  # child-list null terminator
        pos += 13
    end = base + head_len + len(pb) + len(body)
    return (struct.pack("<III", end, len(props), len(pb))
            + bytes([len(name_b)]) + name_b + pb + body)


def fbx_v7100_byedge() -> None:
    """Binary FBX, version 7100 (32-bit record offsets), deflate-encoded
    arrays, a quad+triangle geometry with: a ByEdge normal layer (the
    importer must fall back to generated face normals), an AllSame UV
    layer, and ByPolygon/IndexToDirect materials (per-polygon split)."""
    verts = np.array([0, 0, 0, 1, 0, 0, 1, 1, 0, 0, 1, 0, 2, 0, 0],
                     np.float64)
    pvi = np.array([0, 1, 2, -4, 1, 4, -3], np.int32)   # quad + tri
    edges = np.array([0, 1, 2, 3], np.int32)
    edge_normals = np.tile(np.array([0.0, 0.0, 1.0]), 4)
    uv = np.array([0.25, 0.75], np.float64)
    mats = np.array([1, 0], np.int32)                   # per polygon

    def N(name, props=(), children=()):
        return (name, list(props), list(children))

    geometry = N("Geometry", [_L(1001), "adv\x00\x01Geometry", "Mesh"], [
        N("Vertices", [verts]),
        N("PolygonVertexIndex", [pvi]),
        N("Edges", [edges]),
        N("LayerElementNormal", [0], [
            N("MappingInformationType", ["ByEdge"]),
            N("ReferenceInformationType", ["Direct"]),
            N("Normals", [edge_normals]),
        ]),
        N("LayerElementUV", [0], [
            N("MappingInformationType", ["AllSame"]),
            N("ReferenceInformationType", ["Direct"]),
            N("UV", [uv]),
        ]),
        N("LayerElementMaterial", [0], [
            N("MappingInformationType", ["ByPolygon"]),
            N("ReferenceInformationType", ["IndexToDirect"]),
            N("Materials", [mats]),
        ]),
    ])
    model = N("Model", [_L(2001), "adv\x00\x01Model", "Mesh"], [
        N("Properties70", [], [
            N("P", ["Lcl Translation", "Lcl Translation", "", "A",
                    0.0, 0.0, 0.5]),
        ]),
    ])
    mat_a = N("Material", [_L(3001), "matA\x00\x01Material", ""], [
        N("Properties70", [], [
            N("P", ["DiffuseColor", "Color", "", "A", 0.8, 0.1, 0.1]),
        ]),
    ])
    mat_b = N("Material", [_L(3002), "matB\x00\x01Material", ""], [
        N("Properties70", [], [
            N("P", ["DiffuseColor", "Color", "", "A", 0.1, 0.8, 0.1]),
        ]),
    ])
    top = [
        N("FBXHeaderExtension", [], [N("FBXVersion", [7100])]),
        N("GlobalSettings", [], [N("Version", [1000])]),
        N("Objects", [], [geometry, model, mat_a, mat_b]),
        N("Connections", [], [
            N("C", ["OO", _L(1001), _L(2001)]),
            N("C", ["OO", _L(2001), _L(0)]),
            N("C", ["OO", _L(3001), _L(2001)]),
            N("C", ["OO", _L(3002), _L(2001)]),
        ]),
        N("Takes", [], [N("Current", [""])]),
    ]
    out = _FBX_MAGIC + struct.pack("<I", 7100)
    for name, props, children in top:
        out += _fbx_node(name, props, children, len(out))
    out += b"\x00" * 13 + b"\xfa\xbc" * 8     # footer garbage, real files too
    (OUT / "adv_v7100_byedge.fbx").write_bytes(out)


def fbx_ascii_quirks() -> None:
    """ASCII FBX with CRLF line endings, comments, Properties70 records,
    a pentagon polygon, and ByPolygon/IndexToDirect materials."""
    text = """; adversarial ASCII FBX (hand-authored)
; ---------------------------------------
FBXHeaderExtension:  {
\tFBXHeaderVersion: 1003
\tFBXVersion: 7300
}
Objects:  {
\tGeometry: 1001, "Geometry::pent", "Mesh" {
\t\tVertices: *15 {
\t\t\ta: 0,0,0, 1,0,0, 1.3,1,0, 0.5,1.6,0, -0.3,1,0
\t\t}
\t\tPolygonVertexIndex: *5 {
\t\t\ta: 0,1,2,3,-5
\t\t}
\t\tLayerElementNormal: 0 {
\t\t\tMappingInformationType: "ByPolygon"
\t\t\tReferenceInformationType: "Direct"
\t\t\tNormals: *3 {
\t\t\t\ta: 0,0,1
\t\t\t}
\t\t}
\t\tLayerElementMaterial: 0 {
\t\t\tMappingInformationType: "ByPolygon"
\t\t\tReferenceInformationType: "IndexToDirect"
\t\t\tMaterials: *1 {
\t\t\t\ta: 0
\t\t\t}
\t\t}
\t}
\tModel: 2001, "Model::pent", "Mesh" {
\t\tProperties70:  {
\t\t\tP: "Lcl Rotation", "Lcl Rotation", "", "A",0,0,90
\t\t}
\t}
\tMaterial: 3001, "Material::gold", "" {
\t\tProperties70:  {
\t\t\tP: "DiffuseColor", "Color", "", "A",1,0.8,0.2
\t\t\tP: "ShininessExponent", "Number", "", "A",64
\t\t}
\t}
}
Connections:  {
\tC: "OO",1001,2001
\tC: "OO",2001,0
\tC: "OO",3001,2001
}
"""
    (OUT / "adv_ascii_quirks.fbx").write_bytes(
        text.replace("\n", "\r\n").encode())


# ---------------------------------------------------------------- OBJ --

def obj_quirks() -> None:
    """Negative indices, polygon fan, v//vn form, MISSING .mtl library,
    undefined usemtl, stray s/l statements."""
    text = """# adversarial OBJ (hand-authored)
mtllib does_not_exist.mtl
o pent
v 0 0 0
v 1 0 0
v 1.3 1 0
v 0.5 1.6 0
v -0.3 1 0
vn 0 0 1
vt 0 0
s off
usemtl undefined_material
f -5/-1/-1 -4/-1/-1 -3/-1/-1 -2/-1/-1 -1/-1/-1
l 1 2
g second
f 1//1 2//1 3//1
"""
    (OUT / "adv_negative.obj").write_text(text)


# ---------------------------------------------------------------- DDS --

def _dds_header(width, height, mips, fourcc, caps2=0) -> bytes:
    flags = 0x1 | 0x2 | 0x4 | 0x1000 | (0x20000 if mips > 1 else 0)
    hdr = struct.pack("<7I", 124, flags, height, width, 0, 0, mips)
    hdr += b"\x00" * 44                                  # reserved1[11]
    hdr += struct.pack("<2I4s5I", 32, 0x4, fourcc, 0, 0, 0, 0, 0)
    caps1 = 0x1000 | (0x400008 if mips > 1 else 0) | (0x8 if caps2 else 0)
    hdr += struct.pack("<4I", caps1, caps2, 0, 0)
    hdr += b"\x00" * 4                                   # reserved2
    assert len(hdr) == 124
    return b"DDS " + hdr


def dds_legacy_dxt1() -> None:
    """8x8 DXT1 with an authored 4-level mip chain, legacy FourCC-only
    header (no DX10 block) — the layout 2005-era tools emit."""
    # solid red BC1 block: color0=color1=0xF800, all indices 0
    block = struct.pack("<HHI", 0xF800, 0xF800, 0)
    data = block * 4 + block + block + block     # 8x8, 4x4, 2x2, 1x1
    (OUT / "adv_legacy_dxt1.dds").write_bytes(
        _dds_header(8, 8, 4, b"DXT1") + data)


def dds_legacy_ati2() -> None:
    """4x4 ATI2 (BC5 two-channel normal map), legacy FourCC header."""
    chan = struct.pack("<BB", 128, 128) + b"\x00" * 6    # constant 128
    (OUT / "adv_legacy_ati2.dds").write_bytes(
        _dds_header(4, 4, 1, b"ATI2") + chan + chan)


def dds_cubemap() -> None:
    """Cubemap-flagged legacy DDS — the importer must reject it with a
    clean exception (keep-prev-scene contract), never crash or hang."""
    block = struct.pack("<HHI", 0x07E0, 0x07E0, 0)
    (OUT / "adv_cubemap.dds").write_bytes(
        _dds_header(4, 4, 1, b"DXT1", caps2=0x200 | 0xFC00) + block * 6)


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    gltf_interleaved()
    gltf_unnormalized_skin()
    fbx_v7100_byedge()
    fbx_ascii_quirks()
    obj_quirks()
    dds_legacy_dxt1()
    dds_legacy_ati2()
    dds_cubemap()
    for p in sorted(OUT.glob("adv_*")):
        print(f"{p.name:28s} {p.stat().st_size:6d} B")


if __name__ == "__main__":
    main()
