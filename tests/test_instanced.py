"""Shared-BLAS instancing build invariants (CPU).

The instanced traversal kernels are TPU-only (validated on-device by
benches/instancing_ab.py against the flatten+BF8 production path); these
tests pin the host build contract of pt/accel/instanced.py:
leaf→(page, segment) indirection covers every (segment, mesh-leaf) pair
exactly once, world leaf AABBs bound the transformed object boxes, the
inverse-transform table actually inverts, and id packing round-trips.
≙ shared-BLAS TLAS semantics, AccelerationStructure.cpp:260-301."""

import numpy as np
import jax.numpy as jnp
import pytest

from pt.accel.instanced import (MAX_SEGS, SEG_SHIFT, TRI_MASK, BF8Instanced,
                                build_instanced_bf8, decode_instanced_tri,
                                remap_global_tri)
from pt.accel.native import sah_available

pytestmark = pytest.mark.skipif(not sah_available(),
                                reason="native SAH builder unavailable")


def _grid_mesh(n=12, seed=0):
    rng = np.random.default_rng(seed)
    xs = np.linspace(-1, 1, n, dtype=np.float32)
    gx, gz = np.meshgrid(xs, xs, indexing="ij")
    gy = 0.2 * np.sin(gx * 4) * np.cos(gz * 3) \
        + rng.normal(0, 0.01, gx.shape).astype(np.float32)
    pos = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)
    idx = np.arange(n * n).reshape(n, n)
    a, c = idx[:-1, :-1].ravel(), idx[1:, 1:].ravel()
    b, d = idx[1:, :-1].ravel(), idx[:-1, 1:].ravel()
    tris = np.concatenate([np.stack([a, c, b], -1),
                           np.stack([c, a, d], -1)]).astype(np.int32)
    return pos, tris


def _transforms(n, seed=1):
    rng = np.random.default_rng(seed)
    ts = []
    for i in range(n):
        s = rng.uniform(0.5, 2.0)
        ang = rng.uniform(0, 2 * np.pi)
        c, sn = np.cos(ang), np.sin(ang)
        m = np.eye(4, dtype=np.float64)
        m[:3, :3] = s * np.asarray([[c, 0, sn], [0, 1, 0], [-sn, 0, c]])
        m[:3, 3] = rng.uniform(-10, 10, 3)
        ts.append(m)
    return np.stack(ts)


def _build(n_segs=7, n_meshes=2):
    meshes = [(_grid_mesh(10 + 2 * m, seed=m)[0],
               _grid_mesh(10 + 2 * m, seed=m)[1], None)
              for m in range(n_meshes)]
    seg_mesh = [s % n_meshes for s in range(n_segs)]
    seg_t = _transforms(n_segs)
    bvh = build_instanced_bf8(meshes, seg_mesh, seg_t)
    return meshes, seg_mesh, seg_t, bvh


def test_build_basic_invariants():
    meshes, seg_mesh, seg_t, bvh = _build()
    assert isinstance(bvh, BF8Instanced)
    assert bvh.n_segs == len(seg_mesh)
    lp = np.asarray(bvh.leaf_page)
    ls = np.asarray(bvh.leaf_seg)
    assert bvh.n_leaves == len(lp) == len(ls)
    assert (lp >= 0).all() and (lp < bvh.pages.shape[0]).all()
    assert (ls >= 0).all() and (ls < bvh.n_segs).all()
    # every (seg, page) pair appears exactly once and segments reference
    # only their own mesh's page range
    pairs = set(zip(ls.tolist(), lp.tolist()))
    assert len(pairs) == bvh.n_leaves
    # pages are SHARED: total pages ≪ leaves when instances repeat
    assert bvh.pages.shape[0] < bvh.n_leaves


def test_seg_inv_inverts():
    _, _, seg_t, bvh = _build()
    inv = np.asarray(bvh.seg_inv).reshape(bvh.n_segs, 12)
    for s in range(bvh.n_segs):
        a = inv[s, :9].reshape(3, 3)
        b = inv[s, 9:]
        m = seg_t[s]
        # A @ M[:3,:3] == I and A @ t + b == 0
        np.testing.assert_allclose(a @ m[:3, :3], np.eye(3), atol=1e-5)
        np.testing.assert_allclose(a @ m[:3, 3] + b, 0.0, atol=1e-4)


def test_world_leaf_boxes_bound_transformed_pages():
    """Each leaf's world AABB must contain the leaf's page triangles
    after the segment transform (the box IS the transform of the object
    box, so containment with slack is the invariant)."""
    meshes, seg_mesh, seg_t, bvh = _build(n_segs=5, n_meshes=1)
    pos, tris = meshes[0][0], meshes[0][1]
    pages = np.asarray(bvh.pages)
    lp = np.asarray(bvh.leaf_page)
    ls = np.asarray(bvh.leaf_seg)
    l_lo = np.asarray(bvh.l_lo)
    l_hi = np.asarray(bvh.l_hi)
    b = bvh.block
    ids = pages[:, 0, 6 * b:7 * b].view(np.int32)          # (P, B)
    for leaf in range(bvh.n_leaves):
        tri_ids = ids[lp[leaf]]
        tri_ids = tri_ids[tri_ids >= 0] & TRI_MASK
        if len(tri_ids) == 0:
            continue
        v = pos[tris[tri_ids].reshape(-1)]
        m = seg_t[ls[leaf]]
        w = v @ m[:3, :3].T + m[:3, 3]
        assert (w >= l_lo[leaf] - 1e-3).all()
        assert (w <= l_hi[leaf] + 1e-3).all()


def test_decode_roundtrip():
    tri = jnp.asarray([5, (3 << SEG_SHIFT) | 77, -1,
                       (1023 << SEG_SHIFT) | TRI_MASK], jnp.int32)
    mesh_tri, seg = decode_instanced_tri(tri)
    np.testing.assert_array_equal(np.asarray(mesh_tri),
                                  [5, 77, -1, TRI_MASK])
    np.testing.assert_array_equal(np.asarray(seg), [0, 3, 0, 1023])


def test_fallbacks():
    meshes = [(_grid_mesh(8)[0], _grid_mesh(8)[1], None)]
    # singular transform → None
    t = _transforms(2)
    t[1, :3, :3] = 0.0
    assert build_instanced_bf8(meshes, [0, 0], t) is None
    # too many segments → None
    seg_t = np.broadcast_to(np.eye(4), (MAX_SEGS + 1, 4, 4)).copy()
    assert build_instanced_bf8(meshes, [0] * (MAX_SEGS + 1), seg_t) is None
    # single segment of a tiny mesh still builds (or falls back cleanly)
    one = build_instanced_bf8(meshes, [0, 0],
                              _transforms(2), block=32)
    # 8x8 grid = 98 tris → 2+ leaves per seg; must build
    assert one is not None


def test_remap_global_tri():
    """(segment, local) ids → flattened global ids, preserving the miss
    sentinel and ALPHA_TRI_BIT (the production integrator contract)."""
    from pt.accel.instanced import ALPHA_TRI_BIT
    base = jnp.asarray([0, 100, 250], jnp.int32)       # 3 segments
    tri = jnp.asarray([7,                              # seg 0 local 7
                       (1 << SEG_SHIFT) | 3,           # seg 1 local 3
                       (2 << SEG_SHIFT) | 0 | ALPHA_TRI_BIT,
                       -1], jnp.int32)
    out = np.asarray(remap_global_tri(tri, base))
    np.testing.assert_array_equal(out, [7, 103, 250 | ALPHA_TRI_BIT, -1])


def test_shared_mesh_layout_matches_flatten():
    """seg order, tri bases and local tris must agree with flatten_scene's
    global numbering (the remap correctness precondition)."""
    from pt.scene.examples import make_reuse_mesh_scene
    from pt.scene.flatten import flatten_scene, shared_mesh_layout

    scene = make_reuse_mesh_scene()
    out = shared_mesh_layout(scene)
    assert out is not None
    meshes, seg_mesh, seg_tri_base, dup = out
    ds = flatten_scene(scene)
    assert len(seg_mesh) == ds.num_segments
    assert dup == pytest.approx(16.0)        # 16 instances of one model
    # geometry reuse: unique meshes ≪ segments
    assert len(meshes) * 16 == len(seg_mesh)

    tri_np = np.asarray(ds.tri_idx)
    vert_seg = np.asarray(ds.vert_seg)
    vbase = np.zeros(len(seg_mesh), np.int64)
    for s in range(1, len(seg_mesh)):
        vbase[s] = vbase[s - 1] + meshes[seg_mesh[s - 1]][0].shape[0]
    # flatten duplicates each mesh's vertices per segment in seg order
    np.testing.assert_array_equal(
        np.searchsorted(vbase, np.arange(len(vert_seg)), side="right") - 1,
        vert_seg)
    for s, mi in enumerate(seg_mesh):
        local = meshes[mi][1]
        t0 = seg_tri_base[s]
        np.testing.assert_array_equal(
            tri_np[t0:t0 + len(local)] - vbase[s], local)


def test_shared_mesh_layout_none_for_animated():
    from pt.scene.examples import make_reuse_mesh_scene
    from pt.scene.flatten import shared_mesh_layout
    scene = make_reuse_mesh_scene()
    scene.geometries[0].is_animated = True
    assert shared_mesh_layout(scene) is None


def test_want_instanced_policy():
    from pt.run.renderer import Renderer
    want = Renderer._want_instanced
    # round 5: alpha content no longer excluded (build_instanced_split
    # instances the AlphaSplit subset trees, VERDICT r4 task 2)
    assert want("auto", 16.0, 300_000, has_alpha=True)
    assert not want("flatten", 16.0, 300_000, False)
    assert want("shared", 1.0, 10, False)                    # forced
    assert not want("auto", 2.0, 300_000, False)             # light reuse
    assert not want("auto", 16.0, 50_000, False)             # small scene
    assert want("auto", 8.0, 400_000, False)


def test_root_bounds_cover_everything():
    meshes, seg_mesh, seg_t, bvh = _build()
    lo = np.asarray(bvh.root_lo)
    hi = np.asarray(bvh.root_hi)
    l_lo = np.asarray(bvh.l_lo)
    l_hi = np.asarray(bvh.l_hi)
    assert (l_lo >= lo - 1e-3).all() and (l_hi <= hi + 1e-3).all()


# -- round-5 additions: instanced-kernel MATH gates (VERDICT r4 task 3) +
# -- the instanced alpha split (task 2) ------------------------------------

def test_xform_rays_matches_numpy_inverse():
    """_xform_rays (the per-visit packet ray transform inside the
    instanced kernels) is plain jnp on a (8, L) ray matrix — runnable on
    CPU. Its output must equal transforming each ray by the numpy
    inverse: o' = M^-1 @ (o - t) == A o + b with [A|b] from seg_inv."""
    from pt.accel.instanced import _xform_rays

    rng = np.random.default_rng(7)
    seg_t = _transforms(3, seed=5)
    L = 16
    o = rng.normal(0, 5, (L, 3)).astype(np.float32)
    d = rng.normal(0, 1, (L, 3)).astype(np.float32)
    tmax = rng.uniform(1, 100, L).astype(np.float32)
    sub = np.stack([o[:, 0], o[:, 1], o[:, 2], np.ones(L, np.float32),
                    d[:, 0], d[:, 1], d[:, 2], tmax]).astype(np.float32)
    for m in seg_t:
        inv = np.linalg.inv(m)
        a9 = inv[:3, :3].reshape(-1).astype(np.float32)
        b3 = inv[:3, 3].astype(np.float32)
        a = [jnp.float32(v) for v in np.concatenate([a9, b3])]
        out = np.asarray(_xform_rays(jnp.asarray(sub), a))
        o_ref = o @ inv[:3, :3].T.astype(np.float32) \
            + inv[:3, 3].astype(np.float32)
        d_ref = d @ inv[:3, :3].T.astype(np.float32)
        np.testing.assert_allclose(out[0:3].T, o_ref, rtol=2e-5, atol=3e-5)
        np.testing.assert_allclose(out[4:7].T, d_ref, rtol=2e-5, atol=3e-5)
        # rows 3 (homogeneous 1) and 7 (tmax) pass through untouched:
        # the hit parameter t stays world-parameterized
        np.testing.assert_array_equal(out[3], sub[3])
        np.testing.assert_array_equal(out[7], sub[7])


def test_seg_id_pack_roundtrip_full_range():
    """Segment/local id packing over the FULL bit range (seg 0..1023,
    local 0..TRI_MASK), with and without ALPHA_TRI_BIT — the kernel's
    `sel_id | (seg << SEG_SHIFT)` branding must always decode."""
    from pt.accel.instanced import ALPHA_TRI_BIT

    segs = np.asarray([0, 1, 511, 1022, 1023], np.int64)
    locals_ = np.asarray([0, 1, 12345, TRI_MASK - 1, TRI_MASK], np.int64)
    seg_g, loc_g = np.meshgrid(segs, locals_, indexing="ij")
    packed = ((seg_g << SEG_SHIFT) | loc_g).astype(np.int32).ravel()
    mesh_tri, seg = decode_instanced_tri(jnp.asarray(packed))
    np.testing.assert_array_equal(np.asarray(seg), seg_g.ravel())
    np.testing.assert_array_equal(np.asarray(mesh_tri), loc_g.ravel())
    # with the alpha bit: remap must preserve it and land on base+local
    base = np.arange(len(packed), dtype=np.int32) * 7
    out = np.asarray(remap_global_tri(
        jnp.asarray(packed | ALPHA_TRI_BIT), jnp.asarray(base)))
    # remap indexes seg_tri_base by the seg id; use a base table large
    # enough for seg 1023
    base_tab = np.arange(1024, dtype=np.int32) * 1000
    out = np.asarray(remap_global_tri(jnp.asarray(packed | ALPHA_TRI_BIT),
                                      jnp.asarray(base_tab)))
    expect = (base_tab[seg_g.ravel()] + loc_g.ravel()) | ALPHA_TRI_BIT
    np.testing.assert_array_equal(out, expect)


def _alpha_scene(n_inst=6):
    """Instanced scene mixing one opaque and one alpha mesh per model
    (opacity is per-geometry, like the reference's Geometry::IsOpaque)."""
    from pt.scene.builder import SceneBuilder
    from pt.scene.types import (Geometry, MeshInfo,
                                MetallicRoughnessMaterial)

    b = SceneBuilder("InstAlpha")
    opos, otris = _grid_mesh(8, seed=3)
    apos, atris = _grid_mesh(5, seed=4)
    nrm = np.tile(np.asarray([[0, 1, 0]], np.float32), (len(opos), 1))
    uv = opos[:, :2] * 0.5 + 0.5
    vo = b.add_vertices(opos, uv, nrm)
    io = b.add_indices(otris.ravel().astype(np.uint32))
    go = b.add_geometry(Geometry(vo, len(opos), io, otris.size, True))
    nrm_a = np.tile(np.asarray([[0, 1, 0]], np.float32), (len(apos), 1))
    va = b.add_vertices(apos, apos[:, :2] * 0.5 + 0.5, nrm_a)
    ia = b.add_indices(atris.ravel().astype(np.uint32))
    ga = b.add_geometry(Geometry(va, len(apos), ia, atris.size, False))
    mat = b.add_material("m", MetallicRoughnessMaterial(
        color=(0.8, 0.8, 0.8, 1.0), roughness=0.9))
    model = b.add_model([MeshInfo(go, mat), MeshInfo(ga, mat)])
    root = b.add_scene_node(0, np.eye(4))
    ts = _transforms(n_inst, seed=9)
    for i in range(n_inst):
        node = b.add_scene_node(root, ts[i])
        b.add_model_instance(model, node)
    return b.create_scene()


def test_build_instanced_split_contract():
    """The alpha-split instanced build: full tree + per-subset instanced
    trees whose sel arrays map subset ranks to the flattened global ids
    (the AlphaSplit _remap_subset_tri contract)."""
    from pt.accel.instanced import build_instanced_split
    from pt.scene.flatten import flatten_scene, shared_mesh_layout

    scene = _alpha_scene()
    ds = flatten_scene(scene)
    meshes, seg_mesh, seg_base, dup = shared_mesh_layout(scene)
    out = build_instanced_split(
        meshes, seg_mesh, np.asarray(ds.seg_transform, np.float64),
        seg_base)
    assert out is not None
    full, (tree_o, sel_o), (tree_a, sel_a) = out
    assert isinstance(full, BF8Instanced)
    assert full.seg_tri_base is not None

    opq = np.asarray(ds.tri_opaque)
    # sel arrays partition the global ids exactly by opacity, in order
    np.testing.assert_array_equal(np.sort(sel_o), np.nonzero(opq)[0])
    np.testing.assert_array_equal(np.sort(sel_a), np.nonzero(~opq)[0])
    assert (sel_o == np.sort(sel_o)).all()       # subset-rank == sorted
    assert (sel_a == np.sort(sel_a)).all()

    for tree, sel in [(tree_o, sel_o), (tree_a, sel_a)]:
        assert isinstance(tree, BF8Instanced)
        # the subset tree's per-segment bases are the cumulative subset
        # ranks: base[seg] + local == rank into sel
        bases = np.asarray(tree.seg_tri_base)
        assert bases[0] == 0
        assert (np.diff(bases) > 0).all()
        assert bases[-1] < len(sel)
        # its pages are shared across segments like the full tree's
        assert tree.pages.shape[0] < tree.n_leaves or tree.n_segs == 1


def test_build_instanced_split_homogeneity_guard():
    """A mesh with MIXED per-triangle opacity cannot split on mesh
    granularity → None (callers flatten)."""
    from pt.accel.instanced import build_instanced_split

    pos, tris = _grid_mesh(6)
    opq = np.ones(len(tris), bool)
    opq[::2] = False                              # mixed
    meshes = [(pos, tris, opq)]
    out = build_instanced_split(meshes, [0, 1], _transforms(2),
                                np.asarray([0, len(tris)], np.int64))
    assert out is None


def test_renderer_build_instanced_alpha_and_negative_cache():
    """Renderer._build_instanced wires the split into an Accel whose
    alpha_split carries the instanced subset trees; infeasible scenes
    are negative-cached (ADVICE r4: no multi-second re-attempts)."""
    from pt.core.cache import LRUCache
    from pt.render.integrator import PathTracingSettings
    from pt.run.renderer import Renderer, _prepare_attribs_jit
    from pt.scene.flatten import flatten_scene

    scene = _alpha_scene()
    r = Renderer(PathTracingSettings(backend="pallas"), instancing="shared")
    r.scene = scene
    r.ds = flatten_scene(scene)
    base = _prepare_attribs_jit(r.ds, r._jit_settings())
    tri_np = np.asarray(r.ds.tri_idx)
    opq_np = np.asarray(r.ds.tri_opaque)
    Renderer._accel_cache = LRUCache(4)

    def build_static(rows, opq_rows):             # flat-subset fallback
        raise AssertionError("subset instanced builds should succeed here")

    accel = r._build_instanced(("k",), tri_np, opq_np, build_static, base)
    assert accel is not None
    from pt.accel.instanced import BF8Instanced as BI
    assert isinstance(accel.bvh, BI)
    assert accel.alpha_split is not None
    assert isinstance(accel.alpha_split.bvh_opaque, BI)
    assert isinstance(accel.alpha_split.bvh_alpha, BI)
    # second call: served from cache (no rebuild — layout untouched)
    accel2 = r._build_instanced(("k",), tri_np, opq_np, build_static, base)
    assert accel2.bvh is accel.bvh

    # negative cache: make the layout infeasible (animated geometry) and
    # verify the INFEASIBLE verdict is cached — the second call must not
    # re-walk the scene (poison the scene to prove it)
    scene2 = _alpha_scene()
    scene2.geometries[0].is_animated = True       # layout → None
    r2 = Renderer(PathTracingSettings(backend="pallas"),
                  instancing="shared")
    r2.scene = scene2
    r2.ds = flatten_scene(scene2)
    assert r2._build_instanced(("k2",), tri_np, opq_np, build_static,
                               base) is None
    r2.scene = None                               # would crash on re-walk
    assert r2._build_instanced(("k2",), tri_np, opq_np, build_static,
                               base) is None
