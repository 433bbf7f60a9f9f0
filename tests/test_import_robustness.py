"""Importer robustness against malformed / corrupted files.

The reference reads assets through assimp, which is hardened by years of
fuzzing (SceneImporter.cpp:1060-1075 just forwards to ReadFile and
propagates assimp's error string). pt's importers are native in-repo
parsers, so first contact with a damaged real-world file must degrade to
a clean Python exception — never an infinite loop, unbounded allocation,
or interpreter crash — because SceneManager's keep-previous-scene
contract (SceneManager.cpp:120-157 ≙ pt/scene/manager.py) only holds for
exceptions it can catch.

Every case here runs the parse on a watchdog thread: success and any
Exception both pass; a hang fails the test.
"""

import struct
import threading

import numpy as np
import pytest

from pt.scene.builder import SceneBuilder
from pt.scene.fbx import _MAGIC, parse_fbx
from pt.scene.gltf import import_gltf
from pt.scene.obj import import_obj

TIMEOUT = 30.0


def _bounded(fn):
    """Run fn; pass on success or Exception, fail the test on a hang."""
    box = {}

    def run():
        try:
            box["out"] = fn() or True
        except Exception as exc:        # any clean exception is a pass
            box["exc"] = exc

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(TIMEOUT)
    assert not t.is_alive(), "parser hung on corrupt input"
    return box


def _flips(data: bytes, rng: np.random.Generator, n_variants: int):
    """Deterministic single/multi byte-flip corruptions."""
    out = []
    for _ in range(n_variants):
        buf = bytearray(data)
        for _ in range(int(rng.integers(1, 5))):
            pos = int(rng.integers(0, len(buf)))
            buf[pos] ^= int(rng.integers(1, 256))
        out.append(bytes(buf))
    return out


def _truncations(data: bytes, steps: int = 14):
    return [data[: max(1, len(data) * i // steps)] for i in range(steps)]


# ---------------------------------------------------------------- FBX

def _cube_fbx_bytes(tmp_path) -> bytes:
    from test_fbx import _cube_fbx, write_fbx
    path = tmp_path / "cube.fbx"
    nodes, _ = _cube_fbx()
    write_fbx(path, nodes)
    return path.read_bytes()


class TestFbxRobustness:
    def test_back_pointing_record_rejected(self):
        """A record whose end offset points at an earlier record must
        raise, not rewind the scan loop into an infinite cycle."""
        hdr = _MAGIC + struct.pack("<I", 7400)
        p0 = len(hdr)
        rec_a = struct.pack("<III", 0, 0, 0) + bytes([1]) + b"A"
        end_a = p0 + len(rec_a)
        rec_a = struct.pack("<III", end_a, 0, 0) + bytes([1]) + b"A"
        rec_b = struct.pack("<III", p0, 0, 0) + bytes([1]) + b"B"
        box = _bounded(lambda: parse_fbx(hdr + rec_a + rec_b))
        assert isinstance(box.get("exc"), ValueError)

    def test_zero_end_record_rejected(self):
        hdr = _MAGIC + struct.pack("<I", 7400)
        rec = struct.pack("<III", 0, 0, 0) + bytes([1]) + b"X"
        box = _bounded(lambda: parse_fbx(hdr + rec + rec))
        assert isinstance(box.get("exc"), ValueError)

    def test_truncations(self, tmp_path):
        data = _cube_fbx_bytes(tmp_path)
        for variant in _truncations(data):
            _bounded(lambda v=variant: parse_fbx(v))

    def test_byte_flips(self, tmp_path):
        data = _cube_fbx_bytes(tmp_path)
        rng = np.random.default_rng(0)
        for variant in _flips(data, rng, 40):
            _bounded(lambda v=variant: parse_fbx(v))

    def test_ascii_garbage(self):
        texts = [
            "FBXHeaderExtension: {",              # unclosed block
            "FBXHeaderExtension: { a: *4 {",      # unclosed array
            'Objects: "unterminated',
            "Objects: { Geometry: *99999999 { a: 1,2,3 } }",
            ";" * 5000,
            "}" * 100 + "{" * 100,
        ]
        for text in texts:
            _bounded(lambda t=text: parse_fbx(
                b"; FBX ASCII\nFBXHeaderExtension: {}\n" + t.encode()))


# ---------------------------------------------------------------- glTF

def _small_glb_bytes(tmp_path) -> bytes:
    from pt.scene.examples import make_reuse_mesh_scene
    from pt.scene.gltf_export import export_glb
    path = tmp_path / "scene.glb"
    export_glb(make_reuse_mesh_scene(), str(path))
    return path.read_bytes()


def _import_glb(tmp_path, data: bytes):
    path = tmp_path / "corrupt.glb"
    path.write_bytes(data)
    import_gltf(SceneBuilder(), path)


class TestGltfRobustness:
    def test_truncations(self, tmp_path):
        data = _small_glb_bytes(tmp_path)
        for variant in _truncations(data):
            _bounded(lambda v=variant: _import_glb(tmp_path, v))

    def test_byte_flips(self, tmp_path):
        data = _small_glb_bytes(tmp_path)
        rng = np.random.default_rng(1)
        for variant in _flips(data, rng, 40):
            _bounded(lambda v=variant: _import_glb(tmp_path, v))

    def test_accessor_allocation_bomb_rejected(self, tmp_path):
        """A corrupt accessor count with no backing buffer view must not
        allocate terabytes of zeros."""
        import json
        gltf = {
            "asset": {"version": "2.0"},
            "scene": 0,
            "scenes": [{"nodes": [0]}],
            "nodes": [{"mesh": 0}],
            "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
            "accessors": [{"count": 2 ** 40, "type": "VEC3",
                           "componentType": 5126}],
        }
        path = tmp_path / "bomb.gltf"
        path.write_text(json.dumps(gltf))
        box = _bounded(lambda: import_gltf(SceneBuilder(), path))
        assert isinstance(box.get("exc"), ValueError)

    def test_node_cycle_rejected(self, tmp_path):
        """Self/mutually-referencing node children must terminate (Python
        recursion guard) rather than spin."""
        import json
        gltf = {
            "asset": {"version": "2.0"},
            "scene": 0,
            "scenes": [{"nodes": [0]}],
            "nodes": [{"children": [1]}, {"children": [0]}],
        }
        path = tmp_path / "cycle.gltf"
        path.write_text(json.dumps(gltf))
        box = _bounded(lambda: import_gltf(SceneBuilder(), path))
        assert isinstance(box.get("exc"), RecursionError)


# ---------------------------------------------------------------- OBJ

class TestObjRobustness:
    def test_garbage_lines(self, tmp_path):
        cases = [
            "v 1 2\nf 1 2 3\n",                    # short vertex
            "v 1 2 3\nv 4 5 6\nv 7 8 9\nf 1 2 99\n",   # index out of range
            "f -1000000/2/3 2 3\n",
            "v nan nan nan\nv 0 0 1\nv 1 0 0\nf 1 2 3\n",
            "mtllib missing.mtl\nusemtl nope\nv 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n",
            "\x00\x01\x02 binary garbage \xff\xfe\n",
        ]
        for i, text in enumerate(cases):
            path = tmp_path / f"bad{i}.obj"
            path.write_bytes(text.encode("latin-1"))
            _bounded(lambda p=path: import_obj(SceneBuilder(), p))


# ---------------------------------------------------------------- DDS

class TestDdsRobustness:
    def _valid_dds(self):
        from test_dds import bc1_block, make_dds  # the suite's builders
        block = bc1_block(0xF800, 0x001F, [0] * 16)
        return make_dds(8, 8, b"DXT1", block * 4)

    def test_truncations(self):
        from pt.scene.dds import decode_dds
        data = self._valid_dds()
        for variant in _truncations(data):
            _bounded(lambda v=variant: decode_dds(v))

    def test_header_flips(self):
        from pt.scene.dds import decode_dds, parse_dds
        data = self._valid_dds()
        rng = np.random.default_rng(2)
        for variant in _flips(data, rng, 30):
            _bounded(lambda v=variant: decode_dds(v))
        _bounded(lambda: parse_dds(b"DDS " + b"\x00" * 20))


# -------------------------------------------------- SceneManager contract

def test_scene_manager_keeps_previous_on_corrupt_file(tmp_path):
    """The keep-previous-scene-on-failure contract
    (SceneManager.cpp:120-157) must hold for a *corrupt file*, not just a
    missing one: the active scene stays, the error is swallowed into the
    log, and the manager remains usable."""
    from pt.scene.manager import CombinedSceneLoader, SceneManager

    bad = tmp_path / "broken.glb"
    bad.write_bytes(b"glTF" + b"\x00" * 64)

    mgr = SceneManager()
    mgr.set_active_scene("Test Scenes", "Reuse Mesh", blocking=True)
    prev = mgr.get_active_scene()
    assert prev is not None

    mgr.register("Tests", "Broken", CombinedSceneLoader([bad]))
    mgr.set_active_scene("Tests", "Broken")
    mgr.wait()
    assert mgr.get_active_scene() is prev
