"""Native SBVH builder tests (spatial splits, csrc/sah_bvh.cpp
`pt_build_sbvh` via ctypes): structural invariants + closest-hit equality
vs brute force through a host-side reference traversal of the threaded
preorder."""

import numpy as np
import pytest

from pt.accel.native import build_sbvh, sah_available

pytestmark = pytest.mark.skipif(not sah_available(),
                                reason="native builder unavailable")


def _soup(n, seed=0, spread=10.0, big=5):
    """Random small tris + a few huge diagonal ones (spatial-split bait)."""
    rng = np.random.default_rng(seed)
    c = rng.uniform(0, spread, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.25, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.25, (n, 3)).astype(np.float32)
    v0, v1, v2 = c.copy(), c + e1, c + e2
    s = spread
    v0[:big] = [[0, 0, 0], [0, 0, s], [s, 0, 0], [0, s, 0], [s, s, s]][:big]
    v1[:big] = [[s, s, s], [s, s, 0], [0, s, s], [s, 0, s], [0, 0, 0]][:big]
    v2[:big] = [[s, 0, 0], [0, s, 0], [0, 0, s], [s, s, 0], [0, s, s]][:big]
    return v0, v1, v2


def _brute_closest(v0, v1, v2, o, d):
    """Möller–Trumbore over all tris; returns (t, tri) per ray."""
    eps = 1e-7
    e1 = (v1 - v0)[None]
    e2 = (v2 - v0)[None]
    p = np.cross(d[:, None], e2)
    det = np.einsum("rtk,rtk->rt", np.broadcast_to(e1, p.shape), p)
    inv = np.where(np.abs(det) > eps, 1.0 / det, 0.0)
    s = o[:, None] - v0[None]
    u = np.einsum("rtk,rtk->rt", s, p) * inv
    q = np.cross(s, np.broadcast_to(e1, s.shape))
    v = np.einsum("rtk,rtk->rt", np.broadcast_to(d[:, None], q.shape), q) * inv
    t = np.einsum("rtk,rtk->rt", np.broadcast_to(e2, q.shape), q) * inv
    ok = (np.abs(det) > eps) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4)
    t = np.where(ok, t, np.inf)
    tri = t.argmin(axis=1)
    tbest = t.min(axis=1)
    return tbest, np.where(np.isfinite(tbest), tri, -1)


def _tree_closest(res, v0, v1, v2, o, d):
    """Reference traversal of the threaded preorder + miss links."""
    order, nlo, nhi, miss, ls, lc = res
    n = len(miss)
    tb = np.full(len(o), np.inf)
    trib = np.full(len(o), -1)
    for r in range(len(o)):
        i = 0
        inv = 1.0 / np.where(np.abs(d[r]) > 1e-12, d[r], 1e-12)
        while i < n:
            t0 = (nlo[i] - o[r]) * inv
            t1 = (nhi[i] - o[r]) * inv
            tnear = np.minimum(t0, t1).max()
            tfar = np.maximum(t0, t1).min()
            if tnear <= tfar and tfar > 0 and tnear < tb[r]:
                if ls[i] >= 0:
                    tris = order[ls[i]:ls[i] + lc[i]]
                    t, tri = _brute_closest(v0[tris], v1[tris], v2[tris],
                                            o[r:r + 1], d[r:r + 1])
                    if t[0] < tb[r]:
                        tb[r] = t[0]
                        trib[r] = tris[tri[0]]
                i += 1
            else:
                i = miss[i]
    return tb, trib


def test_sbvh_structure_invariants():
    v0, v1, v2 = _soup(2000)
    res = build_sbvh(v0, v1, v2, 32)
    order, nlo, nhi, miss, ls, lc = res
    n = len(miss)
    # references: every tri covered at least once, budget respected
    assert set(order.tolist()) == set(range(2000))
    assert len(order) <= int(1.75 * 2000) + 16
    # spatial splits actually fired on the big-diagonal bait
    assert len(order) > 2000
    # miss links advance; leaves tile the reference array
    assert miss[0] == n
    assert (miss > np.arange(n)).all()
    leaves = sorted((ls[i], lc[i]) for i in range(n) if ls[i] >= 0)
    covered = 0
    for s, cnt in leaves:
        assert s == covered
        assert 0 < cnt <= 32
        covered += cnt
    assert covered == len(order)
    # root covers the scene
    allv = np.concatenate([v0, v1, v2])
    assert (nlo[0] <= allv.min(0) + 1e-4).all()
    assert (nhi[0] >= allv.max(0) - 1e-4).all()


def test_sbvh_closest_matches_brute():
    v0, v1, v2 = _soup(600, seed=3)
    res = build_sbvh(v0, v1, v2, 16)
    rng = np.random.default_rng(7)
    o = rng.uniform(-2, 12, (64, 3)).astype(np.float32)
    d = rng.normal(0, 1, (64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tb_brute, tri_brute = _brute_closest(v0, v1, v2, o, d)
    tb_tree, tri_tree = _tree_closest(res, v0, v1, v2, o, d)
    hit = np.isfinite(tb_brute)
    assert (np.isfinite(tb_tree) == hit).all()
    np.testing.assert_allclose(tb_tree[hit], tb_brute[hit], rtol=1e-4)
    # same triangle except exact-tie races
    same = tri_tree[hit] == tri_brute[hit]
    assert same.mean() > 0.95


def test_sbvh_packet_build():
    """build_packet_bvh_sah(spatial=True) end-to-end: pages carry original
    tri ids (duplicates allowed), root covers the scene."""
    import jax
    import jax.numpy as jnp
    from pt.accel.pallas_bvh import build_packet_bvh_sah
    from pt.scene.examples import make_heightfield_scene
    from pt.scene.flatten import flatten_scene, world_vertices

    scene = make_heightfield_scene(48)
    ds = flatten_scene(scene)
    wpos = np.asarray(world_vertices(ds)[0])
    pbvh = build_packet_bvh_sah(wpos, np.asarray(ds.tri_idx), spatial=True)
    assert pbvh is not None
    b = pbvh.block
    ids = np.asarray(jax.lax.bitcast_convert_type(
        pbvh.pages[:, 0, 6 * b:7 * b], jnp.int32)).ravel()
    valid = ids[ids >= 0]
    t_count = ds.tri_idx.shape[0]
    assert set(np.unique(valid).tolist()) == set(range(t_count))
    assert (np.asarray(pbvh.top_lo[0]) <= wpos.min(0) + 1e-3).all()
    assert (np.asarray(pbvh.top_hi[0]) >= wpos.max(0) - 1e-3).all()


def test_sbvh_alpha_gate():
    """alpha=1 disables every alpha-gated spatial try (no node overlap
    exceeds root_area; only degenerate centroid-coincident ranges, absent
    here, bypass the gate), so no reference is duplicated — and the tree
    still resolves the same closest hits."""
    v0, v1, v2 = _soup(600, seed=3)
    res = build_sbvh(v0, v1, v2, 16, alpha=1.0)
    order = res[0]
    assert len(order) == 600                      # refs == T, no dups
    rng = np.random.default_rng(11)
    o = rng.uniform(-2, 12, (32, 3)).astype(np.float32)
    d = rng.normal(0, 1, (32, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tb_brute, _ = _brute_closest(v0, v1, v2, o, d)
    tb_tree, _ = _tree_closest(res, v0, v1, v2, o, d)
    hit = np.isfinite(tb_brute)
    assert (np.isfinite(tb_tree) == hit).all()
    np.testing.assert_allclose(tb_tree[hit], tb_brute[hit], rtol=1e-4)


def test_sbvh_node_budget_abort():
    """max_nodes: an infeasible budget returns the OVERFLOW sentinel
    (aborted mid-build), and a feasible budget produces arrays identical
    to an unbudgeted build."""
    from pt.accel.native import OVERFLOW

    v0, v1, v2 = _soup(600, seed=5)
    full = build_sbvh(v0, v1, v2, 16)
    n_nodes = len(full[3])
    assert build_sbvh(v0, v1, v2, 16, max_nodes=max(2, n_nodes // 4)) \
        is OVERFLOW
    budgeted = build_sbvh(v0, v1, v2, 16, max_nodes=n_nodes)
    for a, b in zip(full, budgeted):
        np.testing.assert_array_equal(a, b)


def test_sbvh_presplit():
    """presplit_mult: the huge diagonal bait triangles are split into
    multiple clipped references BEFORE the recursion even when the
    per-node spatial pass is alpha-disabled — and closest hits still
    match brute force. (Ernst & Greiner 2007 early split clipping.)"""
    v0, v1, v2 = _soup(600, seed=3)
    # alpha=1 disables per-node spatial tries; only presplit can dup
    res = build_sbvh(v0, v1, v2, 16, alpha=1.0, presplit_mult=16.0)
    order = res[0]
    assert len(order) > 600                       # presplit duplicated
    assert set(order.tolist()) == set(range(600))  # every tri covered
    # the duplicates are exactly the oversized bait (first 5 tris)
    dup = [t for t in range(600) if (order == t).sum() > 1]
    assert set(dup) <= set(range(5)) and len(dup) > 0
    rng = np.random.default_rng(13)
    o = rng.uniform(-2, 12, (48, 3)).astype(np.float32)
    d = rng.normal(0, 1, (48, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tb_brute, _ = _brute_closest(v0, v1, v2, o, d)
    tb_tree, _ = _tree_closest(res, v0, v1, v2, o, d)
    hit = np.isfinite(tb_brute)
    assert (np.isfinite(tb_tree) == hit).all()
    np.testing.assert_allclose(tb_tree[hit], tb_brute[hit], rtol=1e-4)


def test_sbvh_spatial_min_count():
    """spatial_min_count restricts spatial tries to top-level nodes:
    a huge threshold reproduces the no-duplication tree exactly; a
    moderate one duplicates no more than the unrestricted build and
    still matches brute closest hits."""
    v0, v1, v2 = _soup(600, seed=3)
    unrestricted = build_sbvh(v0, v1, v2, 16)
    plain = build_sbvh(v0, v1, v2, 16, alpha=1.0)   # no spatial at all
    top_only = build_sbvh(v0, v1, v2, 16, spatial_min_count=150)
    off = build_sbvh(v0, v1, v2, 16, spatial_min_count=601)
    for a, b in zip(plain, off):
        np.testing.assert_array_equal(a, b)
    assert len(plain[0]) <= len(top_only[0]) <= len(unrestricted[0])
    rng = np.random.default_rng(17)
    o = rng.uniform(-2, 12, (48, 3)).astype(np.float32)
    d = rng.normal(0, 1, (48, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tb_brute, _ = _brute_closest(v0, v1, v2, o, d)
    tb_tree, _ = _tree_closest(top_only, v0, v1, v2, o, d)
    hit = np.isfinite(tb_brute)
    assert (np.isfinite(tb_tree) == hit).all()
    np.testing.assert_allclose(tb_tree[hit], tb_brute[hit], rtol=1e-4)
