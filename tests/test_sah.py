"""Native binned-SAH builder tests (csrc/sah_bvh.cpp via ctypes)."""

import numpy as np
import pytest

from pt.accel.native import build_sah, sah_available

pytestmark = pytest.mark.skipif(not sah_available(),
                                reason="native builder unavailable")


def _random_tris(n, seed=0, spread=10.0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    verts = centers[:, None, :] + rng.normal(0, 0.4, (n, 3, 3)).astype(np.float32)
    lo = verts.min(axis=1)
    hi = verts.max(axis=1)
    return lo, hi, verts.mean(axis=1)


def test_sah_structure_invariants():
    lo, hi, c = _random_tris(5000)
    order, nlo, nhi, miss, lstart, lcount = build_sah(lo, hi, c, 64)
    n = len(miss)
    # order is a permutation
    assert sorted(order) == list(range(5000))
    # miss links: strictly advancing, root exits at n
    assert miss[0] == n
    assert (miss > np.arange(n)).all()
    # leaves: contiguous, disjoint, cover all triangles, ≤ max_leaf
    leaves = [(lstart[i], lcount[i]) for i in range(n) if lstart[i] >= 0]
    spans = sorted(leaves)
    covered = 0
    for s, cnt in spans:
        assert s == covered, "leaves must tile the order array"
        assert 0 < cnt <= 64
        covered += cnt
    assert covered == 5000
    # parent boxes contain children: check root contains everything
    assert (nlo[0] <= lo.min(0) + 1e-4).all()
    assert (nhi[0] >= hi.max(0) - 1e-4).all()


def test_sah_single_triangle():
    lo, hi, c = _random_tris(1)
    order, nlo, nhi, miss, lstart, lcount = build_sah(lo, hi, c, 64)
    assert len(miss) == 1 and lstart[0] == 0 and lcount[0] == 1


def test_sah_packet_bvh_matches_brute():
    """End-to-end: SAH-built PacketBVH arrays must describe the same scene
    (structure check; on-device traversal equality runs on TPU)."""
    import jax.numpy as jnp
    from pt.accel.pallas_bvh import build_packet_bvh_sah
    from pt.scene.examples import make_heightfield_scene
    from pt.scene.flatten import flatten_scene, world_vertices

    scene = make_heightfield_scene(64)       # ~8k tris
    ds = flatten_scene(scene)
    wpos = np.asarray(world_vertices(ds)[0])
    pbvh = build_packet_bvh_sah(wpos, np.asarray(ds.tri_idx))
    assert pbvh is not None
    import jax
    b = pbvh.block
    ids = np.asarray(jax.lax.bitcast_convert_type(
        pbvh.pages[:, 0, 6 * b:7 * b], jnp.int32)).ravel()
    valid = np.sort(ids[ids >= 0])
    assert (valid == np.arange(ds.tri_idx.shape[0])).all()
    # root covers the scene
    assert (np.asarray(pbvh.top_lo[0]) <= wpos.min(0) + 1e-3).all()
    assert (np.asarray(pbvh.top_hi[0]) >= wpos.max(0) - 1e-3).all()
    # SMEM budget respected
    assert pbvh.n_top <= 2 * 2048 - 1
