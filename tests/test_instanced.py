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
                                build_instanced_bf8, decode_instanced_tri)
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


def test_root_bounds_cover_everything():
    meshes, seg_mesh, seg_t, bvh = _build()
    lo = np.asarray(bvh.root_lo)
    hi = np.asarray(bvh.root_hi)
    l_lo = np.asarray(bvh.l_lo)
    l_hi = np.asarray(bvh.l_hi)
    assert (l_lo >= lo - 1e-3).all() and (l_hi <= hi + 1e-3).all()
