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
    assert not want("auto", 16.0, 300_000, has_alpha=True)   # alpha → flat
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
