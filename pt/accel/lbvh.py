"""LBVH build: Morton-ordered implicit binary tree with threaded traversal
links.

TPU-native replacement for the reference's Vulkan BLAS/TLAS
(Renderer/AccelerationStructure.cpp: BLAS per model, TLAS over instances,
per-frame update builds for animated geometry). Design choices driven by
the hardware:

* **Implicit complete binary tree over Morton-sorted triangles.** Leaves
  hold K triangles; internal-node AABBs are computed by log2(L) dense
  pairwise min/max reductions — the entire build (and per-frame refit for
  animation, ≙ the reference's BLAS update mode,
  AccelerationStructure.cpp:251-257) is a handful of reshape+reduce ops
  plus one sort. No pointer chasing, no atomics, perfectly dense.

* **Threaded (stackless) layout.** Nodes are stored in preorder with a
  precomputed `miss` link (skip-subtree index), so traversal needs one
  cursor per ray instead of a stack — one int of state per lane, the
  cheapest possible divergence footprint for vectorized traversal.
  Hit-next is always cursor+1 by construction.

The topology (preorder permutation, miss links, leaf ids) depends only on
the leaf count, so it is computed once per tree size on the host and
cached; device-side build only computes AABBs and the Morton sort.

Tree quality is below a binned-SAH build (no adaptive splits); the planned
native C++ builder upgrades static scenes later, while this build remains
the animated-refit path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_TOPOLOGY_CACHE: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray]] = {}


def _subtree_sizes(n_leaves: int) -> None:
    pass  # (sizes are closed-form; kept for clarity of _topology below)


def _topology(n_leaves: int):
    """Preorder arrays for a complete binary tree with n_leaves leaves
    (power of two). Returns (heap_of_preorder, miss_next, leaf_id):

    - heap_of_preorder[p]: heap index of the node at preorder position p
    - miss_next[p]: preorder position to jump to when the node is missed
      (p + subtree size); == n_nodes when the traversal is done
    - leaf_id[p]: Morton-order leaf index, or -1 for internal nodes
    """
    if n_leaves in _TOPOLOGY_CACHE:
        return _TOPOLOGY_CACHE[n_leaves]
    n_nodes = 2 * n_leaves - 1
    heap_of_preorder = np.zeros(n_nodes, np.int32)
    miss_next = np.zeros(n_nodes, np.int32)
    leaf_id = np.full(n_nodes, -1, np.int32)

    # iterative preorder with explicit stack of (heap_idx, leaves_below)
    p = 0
    stack = [(0, n_leaves)]
    while stack:
        heap, leaves = stack.pop()
        heap_of_preorder[p] = heap
        miss_next[p] = p + (2 * leaves - 1)
        if leaves == 1:
            leaf_id[p] = heap - (n_leaves - 1)
        else:
            # push right first so left is visited next (preorder)
            stack.append((2 * heap + 2, leaves // 2))
            stack.append((2 * heap + 1, leaves // 2))
        p += 1

    _TOPOLOGY_CACHE[n_leaves] = (heap_of_preorder, miss_next, leaf_id)
    return _TOPOLOGY_CACHE[n_leaves]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ThreadedBVH:
    """Device BVH in threaded preorder layout."""
    aabb_lo: jax.Array       # (n_nodes, 3) f32, preorder
    aabb_hi: jax.Array       # (n_nodes, 3) f32
    miss_next: jax.Array     # (n_nodes,) i32 preorder skip links
    leaf_id: jax.Array       # (n_nodes,) i32 leaf index or -1
    leaf_tris: jax.Array     # (n_leaves, K) i32 triangle ids, -1 padding
    leaf_count: int = dataclasses.field(metadata=dict(static=True), default=0)
    leaf_size: int = dataclasses.field(metadata=dict(static=True), default=4)

    @property
    def n_nodes(self) -> int:
        return self.aabb_lo.shape[0]


def _expand_bits_10(x: jax.Array) -> jax.Array:
    """Spread the low 10 bits of x so there are two zero bits between each
    (standard Morton magic numbers), uint32."""
    x = x.astype(jnp.uint32) & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def morton_codes(centroids: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """30-bit Morton codes of points quantized to a 1024³ grid over [lo, hi]."""
    extent = jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip((centroids - lo) / extent * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    return (_expand_bits_10(q[:, 0]) << 2 | _expand_bits_10(q[:, 1]) << 1
            | _expand_bits_10(q[:, 2]))


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def build_bvh(positions: jax.Array, tri_idx: jax.Array,
              leaf_size: int = 4) -> ThreadedBVH:
    """Build the threaded LBVH over world-space triangles.

    positions: (V, 3); tri_idx: (T, 3). Fully jittable; re-running it each
    frame on skinned/instanced motion is the animated-BLAS-update analogue
    (and re-sorting keeps tree quality, unlike refit-only updates).
    """
    t_count = tri_idx.shape[0]
    v0 = positions[tri_idx[:, 0]]
    v1 = positions[tri_idx[:, 1]]
    v2 = positions[tri_idx[:, 2]]
    centroids = (v0 + v1 + v2) / 3.0
    scene_lo = jnp.min(jnp.minimum(jnp.minimum(v0, v1), v2), axis=0)
    scene_hi = jnp.max(jnp.maximum(jnp.maximum(v0, v1), v2), axis=0)

    codes = morton_codes(centroids, scene_lo, scene_hi)
    order = jnp.argsort(codes).astype(jnp.int32)           # (T,)

    n_leaves = _next_pow2(max(1, -(-t_count // leaf_size)))
    pad = n_leaves * leaf_size - t_count
    sorted_tris = jnp.concatenate(
        [order, jnp.full((pad,), -1, jnp.int32)]).reshape(n_leaves, leaf_size)

    # leaf AABBs (padding → +inf/-inf so empty slots never hit)
    def tri_aabb(ts):
        safe = jnp.maximum(ts, 0)
        a = positions[tri_idx[safe, 0]]
        b = positions[tri_idx[safe, 1]]
        c = positions[tri_idx[safe, 2]]
        valid = (ts >= 0)[..., None]
        lo = jnp.where(valid, jnp.minimum(jnp.minimum(a, b), c), jnp.inf)
        hi = jnp.where(valid, jnp.maximum(jnp.maximum(a, b), c), -jnp.inf)
        return lo.min(axis=-2), hi.max(axis=-2)

    leaf_lo, leaf_hi = tri_aabb(sorted_tris)               # (L, 3) each

    # bottom-up pyramid: heap order is [level0(root) | level1 | ... | leaves]
    levels_lo, levels_hi = [leaf_lo], [leaf_hi]
    while levels_lo[-1].shape[0] > 1:
        lo2 = levels_lo[-1].reshape(-1, 2, 3)
        hi2 = levels_hi[-1].reshape(-1, 2, 3)
        levels_lo.append(lo2.min(axis=1))
        levels_hi.append(hi2.max(axis=1))
    heap_lo = jnp.concatenate(levels_lo[::-1], axis=0)     # (2L-1, 3)
    heap_hi = jnp.concatenate(levels_hi[::-1], axis=0)

    heap_of_preorder, miss_next, leaf_id = _topology(n_leaves)
    return ThreadedBVH(
        aabb_lo=heap_lo[heap_of_preorder],
        aabb_hi=heap_hi[heap_of_preorder],
        miss_next=jnp.asarray(miss_next),
        leaf_id=jnp.asarray(leaf_id),
        leaf_tris=sorted_tris,
        leaf_count=n_leaves,
        leaf_size=leaf_size,
    )


def refit_bvh(bvh: ThreadedBVH, positions: jax.Array,
              tri_idx: jax.Array) -> ThreadedBVH:
    """Recompute AABBs for unchanged topology (cheap per-frame update when
    motion is small; ≙ BLAS update mode without rebuild)."""
    ts = bvh.leaf_tris
    safe = jnp.maximum(ts, 0)
    a = positions[tri_idx[safe, 0]]
    b = positions[tri_idx[safe, 1]]
    c = positions[tri_idx[safe, 2]]
    valid = (ts >= 0)[..., None]
    leaf_lo = jnp.where(valid, jnp.minimum(jnp.minimum(a, b), c), jnp.inf).min(-2)
    leaf_hi = jnp.where(valid, jnp.maximum(jnp.maximum(a, b), c), -jnp.inf).max(-2)

    levels_lo, levels_hi = [leaf_lo], [leaf_hi]
    while levels_lo[-1].shape[0] > 1:
        levels_lo.append(levels_lo[-1].reshape(-1, 2, 3).min(axis=1))
        levels_hi.append(levels_hi[-1].reshape(-1, 2, 3).max(axis=1))
    heap_lo = jnp.concatenate(levels_lo[::-1], axis=0)
    heap_hi = jnp.concatenate(levels_hi[::-1], axis=0)
    heap_of_preorder, _, _ = _topology(bvh.leaf_count)
    return dataclasses.replace(bvh,
                               aabb_lo=heap_lo[heap_of_preorder],
                               aabb_hi=heap_hi[heap_of_preorder])
