"""Stackless threaded-BVH traversal (XLA backend).

TPU replacement of the reference's hardware traceRayEXT: all rays advance a
single preorder cursor in lockstep inside batched while_loops; hit →
cursor+1 (preorder child), miss → precomputed skip link. Per-ray state is
(cursor, parked flag, best t/tri/u/v) — no stack, the cheapest divergence
footprint for vectorized traversal.

Two-phase structure keeps the expensive part off the common path:

* inner loop — *walk*: rays step through internal nodes (one node-AABB
  gather + slab test per step) until each live ray parks at a leaf whose
  box it hit, or finishes. Parked rays idle.
* outer loop — *leaf round*: all parked rays run the K-triangle
  Möller–Trumbore batch at once, then advance past their leaf.

This way the (gather-heavy) triangle tests run only once per leaf visit
per ray, amortized across the batch in lockstep, instead of every step.
Slab tests prune against the current best t, recovering most of the
benefit of ordered traversal that a threaded layout gives up.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pt.accel.intersect import Hit
from pt.accel.lbvh import ThreadedBVH


def _slab_test(lo, hi, o, inv_d, t_best):
    """Ray-AABB slab test; returns bool hit given current best t."""
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    t_near = jnp.max(tmin, axis=-1)
    t_far = jnp.min(tmax, axis=-1)
    return (t_near <= t_far) & (t_far > 0.0) & (t_near < t_best)


def _leaf_test(positions, tri_idx, leaf_tris_row, o, d, tmin, t_best,
               tri_best, u_best, v_best):
    """Möller–Trumbore over one leaf's K triangles for each ray."""
    ts = leaf_tris_row                                    # (..., K)
    safe = jnp.maximum(ts, 0)
    v0 = positions[tri_idx[safe, 0]]                      # (..., K, 3)
    e1 = positions[tri_idx[safe, 1]] - v0
    e2 = positions[tri_idx[safe, 2]] - v0
    ox = o[..., None, :]
    dx = d[..., None, :]
    pvec = jnp.cross(dx, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0,
                        1.0 / jnp.where(det == 0, 1.0, det))
    tvec = ox - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(dx * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    ok = ((ts >= 0) & (jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
          & (u + v <= 1.0) & (t > tmin) & (t < t_best[..., None]))
    t = jnp.where(ok, t, jnp.inf)
    k = jnp.argmin(t, axis=-1)
    t_k = jnp.take_along_axis(t, k[..., None], axis=-1)[..., 0]
    better = jnp.isfinite(t_k)
    pick = lambda arr: jnp.take_along_axis(arr, k[..., None], axis=-1)[..., 0]
    return (jnp.where(better, t_k, t_best),
            jnp.where(better, pick(ts), tri_best),
            jnp.where(better, pick(u), u_best),
            jnp.where(better, pick(v), v_best))


def _walk_to_leaves(bvh: ThreadedBVH, origins, inv_d, cursor, t_limit):
    """Advance every live ray until it parks at a hit leaf or finishes.
    Returns (cursor, parked)."""
    n_nodes = bvh.n_nodes

    def cond(s):
        cursor, parked = s
        return jnp.any((cursor < n_nodes) & ~parked)

    def body(s):
        cursor, parked = s
        live = (cursor < n_nodes) & ~parked
        c = jnp.minimum(cursor, n_nodes - 1)
        hit_box = _slab_test(bvh.aabb_lo[c], bvh.aabb_hi[c], origins, inv_d,
                             t_limit) & live
        leaf = bvh.leaf_id[c]
        park_now = hit_box & (leaf >= 0)
        descend = hit_box & (leaf < 0)
        next_cursor = jnp.where(descend, cursor + 1, bvh.miss_next[c])
        cursor = jnp.where(live & ~park_now, next_cursor, cursor)
        parked = parked | park_now
        return cursor, parked

    return jax.lax.while_loop(cond, body,
                              (cursor, jnp.zeros(cursor.shape, bool)))


def bvh_closest(bvh: ThreadedBVH, positions: jax.Array, tri_idx: jax.Array,
                origins: jax.Array, dirs: jax.Array,
                tmin: float = 1e-5, tmax=1e4) -> Hit:
    """Closest hit via two-phase threaded traversal. origins/dirs (N, 3)."""
    n = origins.shape[0]
    n_nodes = bvh.n_nodes
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    inv_d = 1.0 / jnp.where(jnp.abs(dirs) < 1e-12,
                            jnp.where(dirs < 0, -1e-12, 1e-12), dirs)

    def cond(state):
        return jnp.any(state[0] < n_nodes)

    def body(state):
        cursor, t_best, tri_best, u_best, v_best = state
        cursor, parked = _walk_to_leaves(bvh, origins, inv_d, cursor, t_best)

        c = jnp.minimum(cursor, n_nodes - 1)
        leaf = jnp.maximum(bvh.leaf_id[c], 0)
        row = bvh.leaf_tris[leaf]
        t2, tri2, u2, v2 = _leaf_test(positions, tri_idx, row, origins, dirs,
                                      tmin, t_best, tri_best, u_best, v_best)
        t_best = jnp.where(parked, t2, t_best)
        tri_best = jnp.where(parked, tri2, tri_best)
        u_best = jnp.where(parked, u2, u_best)
        v_best = jnp.where(parked, v2, v_best)
        cursor = jnp.where(parked, bvh.miss_next[c], cursor)
        return cursor, t_best, tri_best, u_best, v_best

    init = (jnp.zeros((n,), jnp.int32), tmax,
            jnp.full((n,), -1, jnp.int32),
            jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32))
    _, t, tri, u, v = jax.lax.while_loop(cond, body, init)
    return Hit(t, tri, u, v)


def bvh_occluded(bvh: ThreadedBVH, positions: jax.Array, tri_idx: jax.Array,
                 origins: jax.Array, dirs: jax.Array, dist,
                 tmin: float = 1e-5) -> jax.Array:
    """Any-hit query with first-hit early-out per ray (≙ the occlusion
    traceRay with TerminateOnFirstHit, raygen.rgen:31)."""
    n = origins.shape[0]
    n_nodes = bvh.n_nodes
    dist = jnp.broadcast_to(jnp.asarray(dist, jnp.float32), (n,))
    inv_d = 1.0 / jnp.where(jnp.abs(dirs) < 1e-12,
                            jnp.where(dirs < 0, -1e-12, 1e-12), dirs)
    sentinel_tri = jnp.full((n,), -1, jnp.int32)
    zeros = jnp.zeros((n,), jnp.float32)

    def cond(state):
        cursor, occluded = state
        return jnp.any((cursor < n_nodes) & ~occluded)

    def body(state):
        cursor, occluded = state
        # occluded rays are done: snap their cursor to the end
        cursor = jnp.where(occluded, n_nodes, cursor)
        cursor, parked = _walk_to_leaves(bvh, origins, inv_d, cursor, dist)

        c = jnp.minimum(cursor, n_nodes - 1)
        leaf = jnp.maximum(bvh.leaf_id[c], 0)
        row = bvh.leaf_tris[leaf]
        _, tri2, _, _ = _leaf_test(positions, tri_idx, row, origins, dirs,
                                   tmin, dist, sentinel_tri, zeros, zeros)
        occluded = occluded | (parked & (tri2 >= 0))
        cursor = jnp.where(parked, bvh.miss_next[c], cursor)
        return cursor, occluded

    init = (jnp.zeros((n,), jnp.int32), jnp.zeros((n,), bool))
    _, occluded = jax.lax.while_loop(cond, body, init)
    return occluded
