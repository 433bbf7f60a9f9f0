"""BVH build + traversal tests (CPU): the XLA threaded LBVH must agree with
the brute-force oracle; packet-BVH build invariants are checked structurally
(the Pallas kernels themselves are TPU-only and are validated against the
oracle on-device by pt/run's verification path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pt.accel.intersect import intersect_brute
from pt.accel.lbvh import _topology, build_bvh, morton_codes, refit_bvh
from pt.accel.pallas_bvh import build_packet_bvh
from pt.accel.traverse import bvh_closest, bvh_occluded


def _random_tris(n, seed=0, spread=10.0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-spread, spread, (n, 3))
    verts = (centers[:, None, :] + rng.normal(0, 0.4, (n, 3, 3))).reshape(-1, 3)
    tri_idx = np.arange(n * 3, dtype=np.int32).reshape(n, 3)
    return jnp.asarray(verts.astype(np.float32)), jnp.asarray(tri_idx)


def _random_rays(n, seed=1, spread=12.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


def test_topology_invariants():
    for n_leaves in (1, 2, 8, 64):
        heap, miss, leaf = _topology(n_leaves)
        n_nodes = 2 * n_leaves - 1
        assert len(heap) == n_nodes
        # preorder root is heap 0; miss of root exits the tree
        assert heap[0] == 0
        assert miss[0] == n_nodes
        # every leaf appears exactly once
        leaves = sorted(leaf[leaf >= 0])
        assert leaves == list(range(n_leaves))
        # miss links strictly increase past the current node
        assert (miss > np.arange(n_nodes)).all()


def test_morton_orders_locality():
    pts = jnp.asarray(np.array([[0, 0, 0], [0.1, 0, 0], [10, 10, 10],
                                [0.2, 0.1, 0]], np.float32))
    lo = jnp.zeros(3)
    hi = jnp.full((3,), 10.0)
    codes = np.asarray(morton_codes(pts, lo, hi))
    # near-origin points sort together, the far point sorts last
    order = np.argsort(codes)
    assert order[-1] == 2


@pytest.mark.parametrize("n_tris", [10, 100, 1000])
def test_bvh_matches_brute(n_tris):
    verts, tri_idx = _random_tris(n_tris)
    o, d = _random_rays(512)
    bvh = build_bvh(verts, tri_idx, leaf_size=4)
    hb = intersect_brute(verts, tri_idx, o, d)
    hv = bvh_closest(bvh, verts, tri_idx, o, d)
    np.testing.assert_allclose(np.asarray(hb.t), np.asarray(hv.t),
                               rtol=1e-5, atol=1e-5)
    # independent triangles (no shared edges) → ids must match exactly
    np.testing.assert_array_equal(np.asarray(hb.tri), np.asarray(hv.tri))


def test_bvh_occlusion_matches_brute():
    verts, tri_idx = _random_tris(300)
    o, d = _random_rays(512, seed=7)
    dist = jnp.full((512,), 8.0)
    bvh = build_bvh(verts, tri_idx, leaf_size=4)
    ob = intersect_brute(verts, tri_idx, o, d, tmax=dist).is_hit
    ov = bvh_occluded(bvh, verts, tri_idx, o, d, dist)
    np.testing.assert_array_equal(np.asarray(ob), np.asarray(ov))


def test_refit_tracks_motion():
    verts, tri_idx = _random_tris(64)
    bvh = build_bvh(verts, tri_idx, leaf_size=4)
    moved = verts + jnp.asarray([5.0, 0.0, 0.0])
    refit = refit_bvh(bvh, moved, tri_idx)
    o, d = _random_rays(256, seed=3)
    hb = intersect_brute(moved, tri_idx, o, d)
    hv = bvh_closest(refit, moved, tri_idx, o, d)
    np.testing.assert_allclose(np.asarray(hb.t), np.asarray(hv.t),
                               rtol=1e-5, atol=1e-5)


def test_packet_bvh_build_structure():
    verts, tri_idx = _random_tris(500)
    pbvh = build_packet_bvh(verts, tri_idx)
    n_leaves = pbvh.pages.shape[0]
    assert pbvh.n_top == 2 * n_leaves - 1
    b = pbvh.block
    from pt.accel.pallas_bvh import _page_cols
    assert pbvh.pages.shape[1:] == (8, _page_cols(b))  # lane-padded 7B
    # triangle ids cover all input triangles exactly once (padding = -1)
    ids = np.asarray(jax.lax.bitcast_convert_type(
        pbvh.pages[:, 0, 6 * b:7 * b], jnp.int32)).ravel()
    valid = ids[ids >= 0]
    assert sorted(valid) == list(range(500))
    # root AABB covers all vertices
    lo = np.asarray(pbvh.top_lo[0])
    hi = np.asarray(pbvh.top_hi[0])
    v = np.asarray(verts)
    assert (v >= lo - 1e-4).all() and (v <= hi + 1e-4).all()
    # leaf AABBs contain their triangles
    leaf_rows = np.asarray(pbvh.top_leaf)
    assert (np.sort(leaf_rows[leaf_rows >= 0]) == np.arange(n_leaves)).all()


def test_select_best_hit_tie_consistency():
    """On an exact t tie the winner is ONE row — the smallest triangle id,
    matching intersect_brute's argmin — and u/v come from that same row
    (the old per-component max could mix rows; BASELINE.md's 8/9216
    shared-edge diff)."""
    from pt.accel.pallas_bvh import _select_best_hit

    B, L = 4, 8
    inf = jnp.inf
    t = jnp.full((B, L), inf).at[:, :4].set(jnp.asarray([
        # lane0: unique best row 2; lane1: rows 1&3 tie; lane2: no hit
        # (all inf); lane3: tie at exactly the limit (not better)
        [5.0, 2.0, inf, 7.0],
        [1.0, 1.5, inf, 7.0],
        [0.5, 9.0, inf, 8.0],
        [3.0, 1.5, inf, 7.0],
    ]))
    ids = jnp.asarray([[30], [11], [7], [23]], jnp.int32)
    u = jnp.asarray(np.tile(np.asarray([[.1], [.2], [.3], [.4]],
                                       np.float32), (1, L)))
    v = u * 10.0
    t_lim = jnp.full((1, L), 7.0)

    t_min, better, sel_id, sel_u, sel_v = _select_best_hit(t, u, v, ids,
                                                           t_lim)
    assert t_min.shape == better.shape == sel_id.shape == (1, L)
    # lane 0: row 2 wins uniquely
    assert bool(better[0, 0]) and int(sel_id[0, 0]) == 7
    assert np.isclose(float(sel_u[0, 0]), 0.3)
    assert np.isclose(float(sel_v[0, 0]), 3.0)
    # lane 1: rows 1 (id 11) and 3 (id 23) tie at t=1.5 -> min id 11,
    # and u/v must BOTH come from row 1 (old code gave u=.4 from row 3)
    assert bool(better[0, 1]) and int(sel_id[0, 1]) == 11
    assert np.isclose(float(sel_u[0, 1]), 0.2)
    assert np.isclose(float(sel_v[0, 1]), 2.0)
    # lane 2: no candidate -> not better
    assert not bool(better[0, 2])
    # lane 3: best equals the limit -> not better
    assert not bool(better[0, 3])
    # masked limit (-inf, exhausted drain queue) can never improve
    _, b2, _, _, _ = _select_best_hit(t, u, v, ids,
                                      jnp.full((1, L), -inf))
    assert not np.asarray(b2).any()
