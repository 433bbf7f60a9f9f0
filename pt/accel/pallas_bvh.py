"""Packet BVH traversal as Pallas TPU kernels (MXU leaf tests).

The production replacement for the reference's hardware ray-tracing pipeline
(traceRaysKHR over the TLAS, AccelerationStructure.cpp). The XLA while-loop
traversal (pt.accel.traverse) is gather-bound and pathological to compile at
scale on TPU; these kernels map the problem onto what the hardware has:

* **Scalar core + SMEM — tree walk.** A shallow "top tree" over triangle
  *blocks* lives in SMEM, where dynamic scalar indexing is native. Packets
  of rays walk it together (coherent packet traversal).

* **MXU + DMA — leaf tests.** Ray-triangle intersection is phrased as a
  matmul (Woop affine form): per triangle, the build precomputes the
  inverse-basis transform W = [e1 e2 n]^-1 and offset b = -W*v0, packed so
  that ONE dot_general — page (8, 6B+pad) contracted with the packet's
  ray matrix (8, L) [rows ox,oy,oz,1,dx,dy,dz,tlim] — yields all six
  unit-space quantities (o', d') for every (triangle, ray) pair. FLOPs land
  on the systolic array; leaf pages DMA from HBM so scene size is
  unbounded. f32 accuracy comes from a manual 3-bf16-pass hi/lo split.

This module holds the two PRODUCTION generations; every superseded or
tested-negative generation (v1/v2/v3/v6/v6k2/v7/bf8w) lives in
pt.accel.pallas_bvh_archive as the measured A/B record
(benches/bvh_kernels.py selects them by name):

  v4 `packet_closest_v4`   phase-split rounds: all slab tests + packed
                           reduces issued unconditionally BEFORE any scalar
                           consumption, scalar-only branches, leaf DMAs
                           prefetched from pure-scalar classification.
                           (A pop->slab->reduce->branch chain costs ~2.5 us
                           of scalar<->vector latency; vector ops inside
                           cond branches force a vector-queue sync.)
                           Production for the animated/jittable Morton path.
  BF8 `packet_closest_bf8` v4 phases over a branching-factor-8 collapse of
                           a fine (block 32) tree: one visit tests 8
                           children, a scalar 8-sort network orders pushes.
                           Production for static scenes (host-side collapse).

Production dispatch (pt.render.integrator.trace_closest/trace_occluded):
BF8 for static scenes (host-side collapse, build_bf8), v4 for the
animated/jittable Morton path.

Shapes: N rays are padded to a power of two and processed in programs of
n_sub*1024 rays; per-ray quantities are full (8, 128) vregs via the cube
layout, while the ray matrix stays lane-major for the MXU.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pt.accel.intersect import Hit
from pt.accel.lbvh import _topology, morton_codes

RAYS_PER_PACKET = 1024
TRIS_PER_BLOCK = 64         # B: triangles per leaf block (multiple of 32;
                            # pages are lane-padded to 128 for the DMA).
                            # Small blocks win: the post-matmul per-pair
                            # VPU work (~B*L/128 vregs x ~25 ops per leaf
                            # visit) dominates traversal cost.
MAX_TOP_LEAVES = 8192       # SMEM budget: 2*8192-1 nodes x 8 scalars ~512 KiB
                            # (the real Mosaic SMEM ceiling probes at
                            # ~768 KiB on v5e; 1 MiB fails to compile)
MAX_TOP_NODES = 2 * MAX_TOP_LEAVES - 1

# page column layout: six (8, B) operand groups then one id group (lanes)
#   [o'x | o'y | o'z | d'x | d'y | d'z | ids]  -> width 7B
_PAGE_GROUPS = 7


def _page_cols(block: int) -> int:
    """Lane-padded page width: 7*block rounded up to a 128 multiple
    (Mosaic requires lane-aligned HBM DMA slice shapes)."""
    cols = _PAGE_GROUPS * block
    return cols + (-cols) % 128


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PacketBVH:
    """Device arrays for the packet kernel."""
    top_lo: jax.Array        # (n_top, 3) f32 — split per axis at call site
    top_hi: jax.Array        # (n_top, 3) f32
    top_miss: jax.Array      # (n_top,) i32 preorder skip links
    top_leaf: jax.Array      # (n_top,) i32 leaf-block id or -1
    pages: jax.Array         # (n_leaves, 8, 7B) f32 matmul operands + ids
    n_top: int = dataclasses.field(metadata=dict(static=True), default=0)
    block: int = dataclasses.field(metadata=dict(static=True),
                                   default=TRIS_PER_BLOCK)


LEAF_BIT = 1 << 24           # BF8 child-entry tag (leaf id in low bits)
ALPHA_TRI_BIT = 1 << 30      # page-id tag: triangle is NOT opaque (alpha-
                             # tested); lets occlusion kernels skip alpha
                             # surfaces (≙ the any-hit ignore, occlusion
                             # shaders) without a second structure


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BF8BVH:
    """Branching-factor-8 top tree for the wide traversal kernel: the
    binary tree collapsed 3 levels at a time, so one visit slab-tests all
    8 (grand)children at once — fewer lockstep rounds for the same
    pruning. Child entries encode leaves as (LEAF_BIT | leaf_id)."""
    c_lo: jax.Array          # (n8*8, 3) f32 child bounds (1e30 pt = empty)
    c_hi: jax.Array          # (n8*8, 3) f32
    c_ent: jax.Array         # (n8*8,) i32 child entry (-1 empty)
    l_lo: jax.Array          # (n_leaves, 3) f32 leaf-block bounds
    l_hi: jax.Array          # (n_leaves, 3) f32
    pages: jax.Array         # as PacketBVH.pages
    n8: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_leaves: int = dataclasses.field(metadata=dict(static=True), default=0)
    block: int = dataclasses.field(metadata=dict(static=True),
                                   default=TRIS_PER_BLOCK)
    # whether the leaf-bounds SMEM tables fit (enables the pop retest
    # that gates leaf intersects; without it leaves intersect always)
    leaf_retest: bool = dataclasses.field(metadata=dict(static=True),
                                          default=True)
    # scene root AABB, recorded at build time so traced consumers
    # (dead-lane degeneration, shadow-distance clamps) don't re-reduce
    # the child-bounds table (None on structures built before the field)
    root_lo: jax.Array | None = None     # (3,) f32
    root_hi: jax.Array | None = None     # (3,) f32


def build_bf8(pbvh: PacketBVH):
    """Collapse a (host-materialised) PacketBVH binary top tree into a
    BF8BVH. Returns None if the result would blow the SMEM budget.

    Binary children in the preorder/miss representation: left = i+1,
    right = miss[i+1] (both exist for every internal node — the builders
    emit full binary trees)."""
    lo = np.asarray(pbvh.top_lo)
    hi = np.asarray(pbvh.top_hi)
    miss = np.asarray(pbvh.top_miss)
    leaf = np.asarray(pbvh.top_leaf)
    n = pbvh.n_top
    n_leaves = int((leaf >= 0).sum())

    # leaf-block bounds table (indexed by leaf id)
    l_lo = np.full((n_leaves, 3), 1e30, np.float32)
    l_hi = np.full((n_leaves, 3), 1e30, np.float32)
    for i in range(n):
        if leaf[i] >= 0:
            l_lo[leaf[i]] = lo[i]
            l_hi[leaf[i]] = hi[i]

    def expand(i, depth):
        """Children of binary node i, collapsed to depth 3."""
        if leaf[i] >= 0 or depth == 3:
            return [i]
        left = i + 1
        right = miss[left]
        return expand(left, depth + 1) + expand(right, depth + 1)

    # BFS over bf8 nodes (rooted at binary node 0, which may be a leaf)
    if leaf[0] >= 0:
        return None                          # single-leaf scene: use v4
    bf8_of_binary = {0: 0}
    order = [0]
    children: list[list[int]] = []
    for bi in order:
        kids = expand(bi, 0)
        row = []
        for k in kids:
            if leaf[k] >= 0:
                row.append(("leaf", int(leaf[k]), k))
            else:
                if k not in bf8_of_binary:
                    bf8_of_binary[k] = len(order)
                    order.append(k)
                row.append(("node", bf8_of_binary[k], k))
        children.append(row)

    n8 = len(order)
    # SMEM budget: child bounds 6*(n8*8) + entries (+ leaf bounds);
    # the measured Mosaic SMEM ceiling is ~768 KiB — leave headroom for
    # the stacks and control state
    base_kb = 7 * n8 * 8 * 4 / 1024
    leaf_kb = 6 * n_leaves * 4 / 1024
    if base_kb > 600:
        return None
    leaf_retest = base_kb + leaf_kb <= 640

    # empty slots: a degenerate far-away box (lo == hi == 1e30), NOT an
    # inverted inf box — (inf - o) * inv products make inverted-inf boxes
    # register as hits in the slab arithmetic
    c_lo = np.full((n8 * 8, 3), 1e30, np.float32)
    c_hi = np.full((n8 * 8, 3), 1e30, np.float32)
    c_ent = np.full((n8 * 8,), -1, np.int32)
    for i8, row in enumerate(children):
        for c, (kind, idx, bi) in enumerate(row):
            c_lo[i8 * 8 + c] = lo[bi]
            c_hi[i8 * 8 + c] = hi[bi]
            c_ent[i8 * 8 + c] = (LEAF_BIT | idx) if kind == "leaf" else idx
    return BF8BVH(c_lo=jnp.asarray(c_lo), c_hi=jnp.asarray(c_hi),
                  c_ent=jnp.asarray(c_ent),
                  l_lo=jnp.asarray(l_lo), l_hi=jnp.asarray(l_hi),
                  pages=pbvh.pages, n8=n8, n_leaves=n_leaves,
                  block=pbvh.block, leaf_retest=leaf_retest,
                  root_lo=jnp.asarray(lo[0]), root_hi=jnp.asarray(hi[0]))


def _woop_pages(v0, e1, e2, tri_ids, n_leaves, block, xp=np,
                tri_alpha=None):
    """Pack per-leaf matmul operand pages from (T_pad, 3) triangle data in
    leaf order. tri_ids: (T_pad,) int32 with -1 padding; `tri_alpha`
    (T_pad,) bool marks non-opaque triangles (ALPHA_TRI_BIT is OR-ed into
    their ids; -1 padding is left untouched). Returns
    (n_leaves, 8, 7B) f32. Pure array ops — works traced (xp=jnp, the
    jittable Morton rebuild path) or on host (xp=np, the SAH path).

    Per triangle: W = inv([e1 e2 n]) (rows Wx, Wy, Wz), b = -W v0. Unit-
    space coords of a point p are W p + b; a ray (o, d) maps to
    o' = W o + b, d' = W d; hit iff t = -o'z/d'z in (tmin, tmax),
    u = o'x + t d'x >= 0, v = o'y + t d'y >= 0, u + v <= 1.
    Degenerate (padding) triangles get W = 0 -> d'z = 0 -> no hit.
    """
    f64 = xp.float64 if xp is np else jnp.float32   # device stays f32
    e1 = xp.asarray(e1, f64)
    e2 = xp.asarray(e2, f64)
    v0 = xp.asarray(v0, f64)
    n = xp.cross(e1, e2)
    # closed-form inverse of M = [e1 e2 n] (columns): det = n·(e1×e2) =
    # |n|²; rows of M⁻¹ are (e2×n)/det, (n×e1)/det, n/det. Vectorized
    # cross products beat batched LAPACK inv ~10x on host at Sponza scale
    # (and need no det()/stack() passes).
    det = xp.sum(n * n, axis=-1)
    ok = xp.abs(det) > 1e-30
    inv_det = xp.where(ok, 1.0 / xp.where(ok, det, 1.0), 0.0)[:, None]
    w = xp.stack([xp.cross(e2, n) * inv_det,
                  xp.cross(n, e1) * inv_det,
                  n * inv_det], axis=1)                  # (T, 3, 3) rows
    b = -xp.einsum("tij,tj->ti", w, v0)
    # degenerate/padding triangles: W = 0 and b'z = 1e30 so the kernel's
    # unguarded t = -o'z/d'z gives -inf (rejected by t > tmin) instead of
    # the NaN that 0/0 would produce
    b = xp.where(ok[:, None], b,
                 xp.asarray([0.0, 0.0, 1e30], f64)[None])
    w = xp.where(ok[:, None, None], w, 0.0)   # guard inf*0 on weird input
    w = w.astype(xp.float32)                             # (T, 3, 3)
    b = b.astype(xp.float32)                             # (T, 3)

    t_pad = v0.shape[0]
    ids32 = tri_ids.astype(np.int32 if xp is np else jnp.int32)
    if tri_alpha is not None:
        mark = (ids32 >= 0) & xp.asarray(tri_alpha, bool)
        ids32 = xp.where(mark, ids32 | ALPHA_TRI_BIT, ids32)

    if xp is np:
        # host fast path: write each (row, group) stripe straight into the
        # preallocated page tensor — the generic stack→transpose→reshape
        # chain below does three full copies with gather strides, which
        # dominated big static builds (benches/instancing_budget.py)
        id_bits = np.ascontiguousarray(ids32).view(np.float32)
        pages = np.zeros((n_leaves, 8, _page_cols(block)), np.float32)
        wl = w.reshape(n_leaves, block, 3, 3)
        bl = b.reshape(n_leaves, block, 3)
        for k in range(3):       # o'_k operand: rows [Wk(3), bk, 0...]
            col = slice(k * block, (k + 1) * block)
            for j in range(3):
                pages[:, j, col] = wl[:, :, k, j]
            pages[:, 3, col] = bl[:, :, k]
        for k in range(3):       # d'_k operand: rows [0,0,0,0, Wk(3), 0]
            col = slice((3 + k) * block, (4 + k) * block)
            for j in range(3):
                pages[:, 4 + j, col] = wl[:, :, k, j]
        pages[:, 0, 6 * block:7 * block] = \
            id_bits.reshape(n_leaves, block)
        return pages

    zeros1 = xp.zeros((t_pad, 1), xp.float32)
    zeros4 = xp.zeros((t_pad, 4), xp.float32)
    groups = []
    for k in range(3):       # o'_k operand: [Wk(3), bk, 0,0,0,0]
        groups.append(xp.concatenate([w[:, k, :], b[:, k:k + 1], zeros4],
                                     axis=-1))
    for k in range(3):       # d'_k operand: [0,0,0,0, Wk(3), 0]
        groups.append(xp.concatenate([zeros4, w[:, k, :], zeros1], axis=-1))
    id_bits = jax.lax.bitcast_convert_type(ids32, jnp.float32)
    groups.append(xp.concatenate([id_bits[:, None],
                                  xp.zeros((t_pad, 7), xp.float32)],
                                 axis=-1))
    page_cols = xp.stack(groups, axis=1)                 # (T, 7, 8)
    pages = page_cols.reshape(n_leaves, block, _PAGE_GROUPS, 8)
    pages = jnp.transpose(pages, (0, 3, 2, 1))
    pages = pages.reshape(n_leaves, 8, _PAGE_GROUPS * block)
    # pad the last dim to a 128 multiple: Mosaic requires lane-aligned
    # shapes for the per-leaf HBM DMA slice (pages_ref.at[leaf])
    pad = _page_cols(block) - _PAGE_GROUPS * block
    if pad:
        pages = xp.concatenate(
            [pages, xp.zeros((n_leaves, 8, pad), xp.float32)], axis=-1)
    return pages


def _finish_build(blo, bhi, n_leaves, pages, block):
    levels_lo, levels_hi = [blo], [bhi]
    while levels_lo[-1].shape[0] > 1:
        levels_lo.append(levels_lo[-1].reshape(-1, 2, 3).min(axis=1))
        levels_hi.append(levels_hi[-1].reshape(-1, 2, 3).max(axis=1))
    heap_lo = jnp.concatenate(levels_lo[::-1], axis=0)
    heap_hi = jnp.concatenate(levels_hi[::-1], axis=0)
    # Empty subtrees (leaf-count round-up padding) carry inverted
    # +inf/-inf boxes — the correct identity for the min/max unions above,
    # but the slab test reads an inverted box as ALWAYS-HIT, so every ray
    # would walk and DMA the whole padding subtree. Replace them with the
    # far-away degenerate point box AFTER the unions (same recipe as
    # build_bf8's empty child slots).
    empty = heap_lo[:, :1] > heap_hi[:, :1]
    heap_lo = jnp.where(empty, 1e30, heap_lo)
    heap_hi = jnp.where(empty, 1e30, heap_hi)
    heap_of_preorder, miss_next, leaf_id = _topology(n_leaves)
    return PacketBVH(
        top_lo=heap_lo[heap_of_preorder],
        top_hi=heap_hi[heap_of_preorder],
        top_miss=jnp.asarray(miss_next),
        top_leaf=jnp.asarray(leaf_id),
        pages=pages,
        n_top=2 * n_leaves - 1,
        block=block,
    )


def build_packet_bvh(positions: jax.Array, tri_idx: jax.Array,
                     block: int = TRIS_PER_BLOCK,
                     tri_opaque=None) -> PacketBVH:
    """Morton-block build — fully jittable (device sort + traced Woop-page
    packing; ≙ the ALLOW_UPDATE animated-BLAS path,
    AccelerationStructure.cpp:251-257). `tri_opaque` (T,) bool marks
    opaque triangles for the occlusion fast path (page-id alpha bit)."""
    block = max(32, -(-block // 32) * 32)   # page-group granularity
    t_count = tri_idx.shape[0]
    v0 = positions[tri_idx[:, 0]]
    v1 = positions[tri_idx[:, 1]]
    v2 = positions[tri_idx[:, 2]]
    centroids = (v0 + v1 + v2) / 3.0
    scene_lo = jnp.min(jnp.minimum(jnp.minimum(v0, v1), v2), axis=0)
    scene_hi = jnp.max(jnp.maximum(jnp.maximum(v0, v1), v2), axis=0)
    order = jnp.argsort(morton_codes(centroids, scene_lo, scene_hi))

    n_leaves = 1 << max(0, (max(1, -(-t_count // block)) - 1).bit_length())
    while n_leaves > MAX_TOP_LEAVES:
        block *= 2
        n_leaves = 1 << max(0, (max(1, -(-t_count // block)) - 1).bit_length())
    t_pad = n_leaves * block
    pad = t_pad - t_count
    order_p = jnp.concatenate([order.astype(jnp.int32),
                               jnp.full((pad,), -1, jnp.int32)])
    safe = jnp.maximum(order_p, 0)
    valid = (order_p >= 0)[:, None]
    sv0 = jnp.where(valid, v0[safe], 0.0)
    se1 = jnp.where(valid, (v1 - v0)[safe], 0.0)
    se2 = jnp.where(valid, (v2 - v0)[safe], 0.0)

    bv0 = sv0.reshape(n_leaves, block, 3)
    bv1 = (sv0 + se1).reshape(n_leaves, block, 3)
    bv2 = (sv0 + se2).reshape(n_leaves, block, 3)
    bvalid = valid.reshape(n_leaves, block, 1)
    blo = jnp.where(bvalid, jnp.minimum(jnp.minimum(bv0, bv1), bv2),
                    jnp.inf).min(axis=1)
    bhi = jnp.where(bvalid, jnp.maximum(jnp.maximum(bv0, bv1), bv2),
                    -jnp.inf).max(axis=1)

    tri_alpha = None
    if tri_opaque is not None:
        tri_alpha = jnp.where(order_p >= 0,
                              ~jnp.asarray(tri_opaque, bool)[safe], False)
    pages = _woop_pages(sv0, se1, se2, order_p, n_leaves, block, xp=jnp,
                        tri_alpha=tri_alpha)
    return _finish_build(blo, bhi, n_leaves, pages, block)


def build_packet_bvh_sah(positions_np, tri_idx_np,
                         block: int = TRIS_PER_BLOCK,
                         max_leaves: int = None,
                         tri_opaque_np=None,
                         spatial: bool = False,
                         ref_budget: float = 1.75,
                         alpha: float = 1e-5,
                         presplit_mult: float = 0.0,
                         spatial_min_count: int = 0):
    """Host-side build using the native binned-SAH builder
    (csrc/sah_bvh.cpp) — higher-quality trees for static scenes
    (≙ PREFER_FAST_TRACE builds). Returns None when the native library is
    unavailable. The block size grows until the tree fits the SMEM budget.

    `spatial=True` uses the SBVH variant (spatial splits): triangles may
    be referenced by several leaves with clipped bounds, tightening leaf
    boxes around large/thin geometry at the cost of up to
    `ref_budget`·T references.
    """
    from pt.accel.native import OVERFLOW, build_sah, build_sbvh

    max_nodes = 2 * (max_leaves or MAX_TOP_LEAVES) - 1
    block = max(32, -(-block // 32) * 32)   # page-group granularity
    positions_np = np.asarray(positions_np, np.float32)
    tri_idx_np = np.asarray(tri_idx_np, np.int64)
    v0 = positions_np[tri_idx_np[:, 0]]
    v1 = positions_np[tri_idx_np[:, 1]]
    v2 = positions_np[tri_idx_np[:, 2]]
    tri_lo = np.minimum(np.minimum(v0, v1), v2)
    tri_hi = np.maximum(np.maximum(v0, v1), v2)
    centroids = (v0 + v1 + v2) / 3.0

    # any block < T/max_leaves is mathematically guaranteed to blow the
    # node budget (leaves >= ceil(T/block) > max_leaves → nodes >
    # max_nodes), so start the doubling loop at the first feasible size —
    # skipping up to ~log2(T/max_leaves) full builds on large scenes with
    # identical output (benches/instancing_budget.py measured the old
    # loop at ~N^1.5 wall time from exactly these wasted rebuilds)
    max_leaf_budget = max_leaves or MAX_TOP_LEAVES
    min_feasible = -(-len(tri_idx_np) // max_leaf_budget)
    while block < min_feasible:
        block *= 2

    result = None
    while block <= 1024:
        # max_nodes makes an over-budget build abort mid-recursion
        # (distinct OVERFLOW sentinel) instead of paying for the full
        # infeasible tree before the coarser-block retry — the courtyard's
        # wasted block-32 SBVH was 1.85 s of a 3.3 s total build
        if spatial:
            result = build_sbvh(v0, v1, v2, block, ref_budget,
                                alpha=alpha, max_nodes=max_nodes,
                                presplit_mult=presplit_mult,
                                spatial_min_count=spatial_min_count)
        else:
            result = build_sah(tri_lo, tri_hi, centroids, block,
                               max_nodes=max_nodes)
        if result is None:
            return None
        if result is not OVERFLOW and len(result[3]) <= max_nodes:
            break
        block *= 2
        result = None
    if result is None:
        return None
    order, node_lo, node_hi, miss, leaf_start, leaf_count = result
    if leaf_count.max(initial=0) > block:
        return None

    n_top = len(miss)
    is_leaf = leaf_start >= 0
    leaf_nodes = np.nonzero(is_leaf)[0]
    n_leaves = len(leaf_nodes)
    top_leaf = np.full(n_top, -1, np.int32)
    top_leaf[leaf_nodes] = np.arange(n_leaves, dtype=np.int32)

    t_pad = n_leaves * block
    sv0 = np.zeros((t_pad, 3), np.float32)
    se1 = np.zeros((t_pad, 3), np.float32)
    se2 = np.zeros((t_pad, 3), np.float32)
    ids = np.full(t_pad, -1, np.int32)
    page_alpha = np.zeros(t_pad, bool)   # NOT the SBVH `alpha` gate param
    # vectorized leaf packing (the per-leaf python loop recomputed the
    # full (T,3) edge arrays once PER LEAF — O(leaves*T) wall time that
    # dominated big-scene builds; benches/instancing_budget.py)
    counts = leaf_count[leaf_nodes].astype(np.int64)
    starts = leaf_start[leaf_nodes].astype(np.int64)
    total = int(counts.sum())
    if total:
        leaf_of_ref = np.repeat(np.arange(n_leaves, dtype=np.int64), counts)
        within = (np.arange(total, dtype=np.int64)
                  - np.repeat(np.cumsum(counts) - counts, counts))
        slot = leaf_of_ref * block + within
        tris = order[np.repeat(starts, counts) + within]
        sv0[slot] = v0[tris]
        se1[slot] = v1[tris] - v0[tris]
        se2[slot] = v2[tris] - v0[tris]
        ids[slot] = tris
        if tri_opaque_np is not None:
            page_alpha[slot] = ~np.asarray(tri_opaque_np, bool)[tris]

    pages = _woop_pages(sv0, se1, se2, ids, n_leaves, block,
                        tri_alpha=page_alpha if tri_opaque_np is not None
                        else None)
    return PacketBVH(
        top_lo=jnp.asarray(node_lo),
        top_hi=jnp.asarray(node_hi),
        top_miss=jnp.asarray(miss),
        top_leaf=jnp.asarray(top_leaf),
        pages=jnp.asarray(pages),
        n_top=int(n_top),
        block=block,
    )


def _slab(lox, loy, loz, hix, hiy, hiz, ox, oy, oz, ix, iy, iz, t_limit):
    """Scalar AABB vs (1, 1024) ray rows; returns hit mask (1, 1024)."""
    t0x = (lox - ox) * ix
    t1x = (hix - ox) * ix
    t0y = (loy - oy) * iy
    t1y = (hiy - oy) * iy
    t0z = (loz - oz) * iz
    t1z = (hiz - oz) * iz
    tnear = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                    jnp.minimum(t0y, t1y)),
                        jnp.minimum(t0z, t1z))
    tfar = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                   jnp.maximum(t0y, t1y)),
                       jnp.maximum(t0z, t1z))
    return (tnear <= tfar) & (tfar > 0.0) & (tnear < t_limit)


def _leaf_intersect(page, rays_mat, tmin, t_limit, block=None):
    """MXU leaf test. page (8, >=7B) (lane-padded); rays_mat (8, L).
    Returns (t (B,L) inf-masked, u, v, ids (B,1))."""
    b = block if block is not None else page.shape[1] // _PAGE_GROUPS
    m = page[:, :6 * b]                                   # (8, 6B)
    # f32-accurate matmul in 3 bf16 MXU passes (vs 6 for
    # Precision.HIGHEST, which measured ~40% of traversal time; Mosaic
    # does not support Precision.HIGH): split both operands hi+lo and
    # drop only the lo*lo term (~2^-16 relative error).
    dot = lambda a, c: jax.lax.dot_general(
        a, c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_hi = m.astype(jnp.bfloat16)
    m_lo = (m - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    r_hi = rays_mat.astype(jnp.bfloat16)
    r_lo = (rays_mat - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = dot(m_hi, r_hi) + dot(m_hi, r_lo) + dot(m_lo, r_hi)
    o_x = out[0 * b:1 * b]                                # (B, L)
    o_y = out[1 * b:2 * b]
    o_z = out[2 * b:3 * b]
    d_x = out[3 * b:4 * b]
    d_y = out[4 * b:5 * b]
    d_z = out[5 * b:6 * b]
    # minimal per-pair op chain — this is the kernel's dominant VPU cost
    # (B*L/1024 vregs per op). No divide guard: degenerate/padding rows
    # are built with d'z = 0, b'z = 1e30 (see _woop_pages) so t = -inf;
    # any NaN in u/v (0 * inf paths) fails the >= comparison and rejects.
    t = -o_z / d_z
    u = o_x + t * d_x
    v = o_y + t * d_y
    edge = jnp.minimum(jnp.minimum(u, v), 1.0 - (u + v))
    tv = jnp.where(edge >= 0.0, t, jnp.inf)
    tv = jnp.where(t > tmin, tv, jnp.inf)
    tv = jnp.where(t < t_limit, tv, jnp.inf)
    ids = jax.lax.bitcast_convert_type(page[0:1, 6 * b:7 * b],
                                       jnp.int32).reshape(b, 1)
    return tv, u, v, ids


def _select_best_hit(t_cand, u_c, v_c, ids, t_lim):
    """Single-winner best-hit selection over a leaf-intersect result.

    t_cand (B, L) inf-masked candidate ts, u_c/v_c (B, L), ids (B, 1)
    page triangle ids, t_lim (1, L) the per-lane current limit. Returns
    (t_min, better, sel_id, sel_u, sel_v), each (1, L); outputs are only
    meaningful where `better` (callers keep prior state elsewhere).

    On an exact t tie between rows the SMALLEST triangle id wins —
    matching the brute oracle's argmin (first occurrence) — and u/v are
    taken from that same winning row. The previous per-component max
    over all tying rows could pair one triangle's id with another
    triangle's barycentrics (the "8/9216 shared-edge pixels" diff in
    BASELINE.md). All ops (broadcast compare/and, masked max-reduce) are
    shapes/types the kernels already lower; cost is +2 VPU ops per leaf
    visit.
    """
    t_min = jnp.min(t_cand, axis=0, keepdims=True)
    better = t_min < t_lim
    at_min = (t_cand == t_min) & (t_cand < 1e30)
    sel_id = jnp.min(jnp.where(at_min, ids, jnp.int32(0x7FFFFFFF)),
                     axis=0, keepdims=True)
    win = at_min & (ids == sel_id)
    selw = lambda a: jnp.max(jnp.where(win, a, -jnp.inf), axis=0,
                             keepdims=True)
    return t_min, better, sel_id, selw(u_c), selw(v_c)


def _slab_t(lox, loy, loz, hix, hiy, hiz, ox, oy, oz, ix, iy, iz,
            t_limit):
    """Slab test returning (hit (1,1024), tnear (1,1024))."""
    t0x = (lox - ox) * ix
    t1x = (hix - ox) * ix
    t0y = (loy - oy) * iy
    t1y = (hiy - oy) * iy
    t0z = (loz - oz) * iz
    t1z = (hiz - oz) * iz
    tnear = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                    jnp.minimum(t0y, t1y)),
                        jnp.minimum(t0z, t1z))
    tfar = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                   jnp.maximum(t0y, t1y)),
                       jnp.maximum(t0z, t1z))
    hit = (tnear <= tfar) & (tfar > 0.0) & (tnear < t_limit)
    return hit, tnear


def _make_closest_kernel_v4(n_top: int, block: int, tmin: float,
                            n_sub: int):
    """Phase-split full-vreg traversal (v4).

    Microbenchmarks showed a single pop->slab->reduce->branch chain costs
    ~2.5 us of scalar<->vector round-trip latency, and that vector ops
    INSIDE cond branches force a vector-queue sync per branch — while the
    vector work itself is nearly free. v4 therefore restructures each
    lockstep round into three phases so the n_sub chains overlap:

      0. scalar: pop each sub's node, classify leaf/internal from SMEM
         (pure scalar), and START the leaf DMAs immediately (per-sub
         buffers + semaphores) so they overlap the vector phase;
      1. vector, UNCONDITIONAL: all subs' node/left/right slab tests and
         their reduces, issued back-to-back before any consumption —
         flag pairs are packed into shared i32 sum-reduces (count>0 == any)
         to halve the reduce count;
      2. scalar: branch on the precomputed flags; internal nodes do
         scalar-only stack pushes, leaves wait their prefetched DMA and
         run the MXU intersect (the only remaining vector-in-branch).

    Layouts (cube input, lane-major best state in VMEM scratch) are as in
    v3 (_make_closest_kernel_v3)."""

    def kernel(lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
               miss_ref, leaf_ref, pages_ref, rays_ref, cube_ref,
               out_ref, leaf_vmem, dma_sems, stack, best_ref, tcube_ref):
        # leaf_vmem (n_sub, 8, page_cols); dma_sems (n_sub,)
        rays_mat = rays_ref[:]                   # (8, n_sub*1024)

        def safe_inv(a):
            return 1.0 / jnp.where(jnp.abs(a) < 1e-12,
                                   jnp.where(a < 0, -1e-12, 1e-12), a)

        sub_rays = []
        for s in range(n_sub):
            ox = cube_ref[s * 8 + 0]
            oy = cube_ref[s * 8 + 1]
            oz = cube_ref[s * 8 + 2]
            dx = cube_ref[s * 8 + 4]
            dy = cube_ref[s * 8 + 5]
            dz = cube_ref[s * 8 + 6]
            sub_rays.append((ox, oy, oz,
                             safe_inv(dx), safe_inv(dy), safe_inv(dz)))

        def lane_to_cube(x):                     # (1, 1024) -> (8, 128)
            return jnp.concatenate(
                [x[:, i * 128:(i + 1) * 128] for i in range(8)], axis=0)

        def slab_sub(c, s, t_limit_cube):
            ox, oy, oz, ix, iy, iz = sub_rays[s]
            return _slab_t(lox_ref[c], loy_ref[c], loz_ref[c],
                           hix_ref[c], hiy_ref[c], hiz_ref[c],
                           ox, oy, oz, ix, iy, iz, t_limit_cube)

        def cond(state):
            sps = state[0]
            total = sps[0]
            for s in range(1, n_sub):
                total = total + sps[s]
            return total > 0

        def body(state):
            sps, rounds = state

            # ---- phase 0: scalar classification + leaf DMA prefetch
            nodes, leaves, lefts, rights, lives = [], [], [], [], []
            for s in range(n_sub):
                live = sps[s] > 0
                sp = jnp.maximum(sps[s] - 1, 0)
                node = stack[s * 64 + sp]
                lf = leaf_ref[node]
                is_leaf = live & (lf >= 0)
                left = jnp.minimum(node + 1, n_top - 1)
                right = jnp.minimum(miss_ref[left], n_top - 1)
                nodes.append(node)
                leaves.append((is_leaf, lf))
                lefts.append(left)
                rights.append(right)
                lives.append(live)

                def start_dma(_, s=s, lf=lf):
                    dma = pltpu.make_async_copy(
                        pages_ref.at[lf], leaf_vmem.at[s], dma_sems.at[s])
                    dma.start()
                    return jnp.int32(0)

                jax.lax.cond(is_leaf, start_dma,
                             lambda q: q, jnp.int32(0))

            # ---- phase 1: unconditional vector tests, packed reduces
            flags = []
            for s in range(n_sub):
                t_cube = tcube_ref[s * 8:(s + 1) * 8, :]
                hit, _ = slab_sub(nodes[s], s, t_cube)
                hit_l, tn_l = slab_sub(lefts[s], s, t_cube)
                hit_r, tn_r = slab_sub(rights[s], s, t_cube)
                both = hit_l & hit_r
                # two packed i32 sum-reduces: low 12 bits and bits 12+
                # each hold a lane count (<= 1024), count>0 == any
                r_node_votes = jnp.sum(
                    jnp.where(hit, 1, 0)
                    + jnp.where(both & (tn_l <= tn_r), 4096, 0))
                r_lr = jnp.sum(jnp.where(hit_l, 1, 0)
                               + jnp.where(hit_r, 4096, 0))
                r_votes = jnp.sum(jnp.where(both, 1, 0))
                flags.append((r_node_votes, r_lr, r_votes))

            # ---- phase 2: scalar control (+ leaf intersect in branch)
            new_sps = []
            for s in range(n_sub):
                is_leaf, lf = leaves[s]
                r_node_votes, r_lr, r_votes = flags[s]
                any_hit = (r_node_votes & 4095) > 0
                votes_l = r_node_votes >> 12
                any_l = (r_lr & 4095) > 0
                any_r = r_lr >= 4096
                sp = jnp.maximum(sps[s] - 1, 0)
                lanes = slice(s * 1024, (s + 1) * 1024)
                brow = s * 4

                def do_leaf(sp, s=s, lf=lf, lanes=lanes, brow=brow,
                            any_hit=any_hit):
                    pltpu.make_async_copy(pages_ref.at[lf],
                                          leaf_vmem.at[s],
                                          dma_sems.at[s]).wait()

                    def intersect(q, s=s, lanes=lanes, brow=brow):
                        t_lane = best_ref[brow:brow + 1, :]
                        t_cand, u_c, v_c, ids = _leaf_intersect(
                            leaf_vmem[s], rays_mat[:, lanes], tmin,
                            t_lane, block)
                        t_min, better, sel_id, sel_u, sel_v = \
                            _select_best_hit(t_cand, u_c, v_c, ids, t_lane)
                        t_new = jnp.where(better, t_min, t_lane)
                        sel_bits = jax.lax.bitcast_convert_type(
                            sel_id, jnp.float32)
                        best_ref[brow:brow + 1, :] = t_new
                        best_ref[brow + 1:brow + 2, :] = jnp.where(
                            better, sel_bits,
                            best_ref[brow + 1:brow + 2, :])
                        best_ref[brow + 2:brow + 3, :] = jnp.where(
                            better, sel_u,
                            best_ref[brow + 2:brow + 3, :])
                        best_ref[brow + 3:brow + 4, :] = jnp.where(
                            better, sel_v,
                            best_ref[brow + 3:brow + 4, :])
                        tcube_ref[s * 8:(s + 1) * 8, :] = \
                            lane_to_cube(t_new)
                        return q

                    return jax.lax.cond(any_hit, intersect,
                                        lambda q: q, sp)

                def do_internal(sp, s=s, lefts=lefts, rights=rights,
                                any_l=any_l, any_r=any_r,
                                votes_l=votes_l, r_votes=r_votes):
                    near_is_left = jnp.where(r_votes > 0,
                                             2 * votes_l >= r_votes, True)
                    far_idx = jnp.where(near_is_left, rights[s], lefts[s])
                    near_idx = jnp.where(near_is_left, lefts[s], rights[s])
                    far_ok = jnp.where(near_is_left, any_r, any_l)
                    near_ok = jnp.where(near_is_left, any_l, any_r)
                    stack[s * 64 + sp] = far_idx
                    sp = sp + jnp.where(far_ok, 1, 0)
                    stack[s * 64 + sp] = near_idx
                    sp = sp + jnp.where(near_ok, 1, 0)
                    return sp

                def internal_if_hit(sp, any_hit=any_hit,
                                    do_internal=do_internal):
                    return jax.lax.cond(any_hit, do_internal,
                                        lambda q: q, sp)

                # leaves must always wait their prefetched DMA (semaphore
                # balance), even when the pop retest failed
                sp = jax.lax.cond(is_leaf, do_leaf, internal_if_hit, sp)
                new_sps.append(jnp.where(lives[s], sp, sps[s]))

            return (tuple(new_sps), rounds + 1)

        minus1 = jax.lax.bitcast_convert_type(
            jnp.full((1, 1024), -1, jnp.int32), jnp.float32)
        for s in range(n_sub):
            stack[s * 64] = jnp.int32(0)
            t0 = rays_mat[7:8, s * 1024:(s + 1) * 1024]
            best_ref[s * 4:s * 4 + 1, :] = t0
            best_ref[s * 4 + 1:s * 4 + 2, :] = minus1
            best_ref[s * 4 + 2:s * 4 + 3, :] = jnp.zeros((1, 1024),
                                                         jnp.float32)
            best_ref[s * 4 + 3:s * 4 + 4, :] = jnp.zeros((1, 1024),
                                                         jnp.float32)
            tcube_ref[s * 8:(s + 1) * 8, :] = cube_ref[s * 8 + 7]
        init = (tuple(jnp.int32(1) for _ in range(n_sub)), jnp.int32(0))
        _, rounds = jax.lax.while_loop(cond, body, init)
        cat = lambda i: jnp.concatenate(
            [best_ref[s * 4 + i:s * 4 + i + 1, :] for s in range(n_sub)],
            axis=1)
        width = n_sub * 1024
        out_ref[:] = jnp.concatenate(
            [cat(0), cat(1), cat(2), cat(3),
             jnp.full((1, width), rounds, jnp.float32),
             jnp.zeros((3, width), jnp.float32)], axis=0)

    return kernel


def _sort8_desc(pairs):
    """Scalar Batcher odd-even network: sort 8 (key, payload) scalar pairs
    descending by key. ~19 compare-exchanges, pure scalar ops."""
    net = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
           (1, 2), (5, 6), (0, 4), (1, 5), (2, 6), (3, 7), (2, 4), (3, 5),
           (1, 2), (3, 4), (5, 6)]
    arr = list(pairs)
    for a, b in net:
        ta, ea = arr[a]
        tb, eb = arr[b]
        swap = ta < tb
        arr[a] = (jnp.where(swap, tb, ta), jnp.where(swap, eb, ea))
        arr[b] = (jnp.where(swap, ta, tb), jnp.where(swap, ea, eb))
    return arr


def _make_closest_kernel_bf8(n8: int, n_leaves: int, block: int,
                             tmin: float, n_sub: int,
                             leaf_retest: bool = True):
    """Wide (branching-factor-8) phase-split traversal. One internal visit
    slab-tests all 8 collapsed (grand)children at once — replacing up to 3
    binary rounds with one — with per-child masked min-tnear reduces
    providing hit flags, near-first ordering (scalar 8-sort network), and
    no extra cost on the vector units. Leaf entries carry their own bounds
    table for the pop retest that gates the MXU intersect. Phases and
    layouts follow _make_closest_kernel_v4."""

    def kernel(clox, cloy, cloz, chix, chiy, chiz, cent, *rest):
        if leaf_retest:
            (llox, lloy, lloz, lhix, lhiy, lhiz,
             pages_ref, rays_ref, cube_ref,
             out_ref, leaf_vmem, dma_sems, stack,
             best_ref, tcube_ref) = rest
        else:
            (pages_ref, rays_ref, cube_ref,
             out_ref, leaf_vmem, dma_sems, stack,
             best_ref, tcube_ref) = rest
        rays_mat = rays_ref[:]                   # (8, n_sub*1024)

        def safe_inv(a):
            return 1.0 / jnp.where(jnp.abs(a) < 1e-12,
                                   jnp.where(a < 0, -1e-12, 1e-12), a)

        sub_rays = []
        for s in range(n_sub):
            ox = cube_ref[s * 8 + 0]
            oy = cube_ref[s * 8 + 1]
            oz = cube_ref[s * 8 + 2]
            dx = cube_ref[s * 8 + 4]
            dy = cube_ref[s * 8 + 5]
            dz = cube_ref[s * 8 + 6]
            sub_rays.append((ox, oy, oz,
                             safe_inv(dx), safe_inv(dy), safe_inv(dz)))

        def lane_to_cube(x):
            return jnp.concatenate(
                [x[:, i * 128:(i + 1) * 128] for i in range(8)], axis=0)

        def slab_gen(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z, s, t_cube):
            ox, oy, oz, ix, iy, iz = sub_rays[s]
            return _slab_t(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z,
                           ox, oy, oz, ix, iy, iz, t_cube)

        def cond(state):
            sps = state[0]
            total = sps[0]
            for s in range(1, n_sub):
                total = total + sps[s]
            return total > 0

        def body(state):
            sps, rounds, done_at = state

            # phase 0: scalar pop/classify + leaf DMA prefetch
            popped = []
            for s in range(n_sub):
                live = sps[s] > 0
                spp = jnp.maximum(sps[s] - 1, 0)
                ent = stack[s * 128 + spp]
                is_leaf = live & (ent >= LEAF_BIT)
                lid = jnp.clip(ent - LEAF_BIT, 0, n_leaves - 1)
                node8 = jnp.clip(ent, 0, n8 - 1)
                popped.append((spp, ent, is_leaf, lid, node8, live))

                def start_dma(q, s=s, lid=lid):
                    pltpu.make_async_copy(pages_ref.at[lid],
                                          leaf_vmem.at[s],
                                          dma_sems.at[s]).start()
                    return q
                jax.lax.cond(is_leaf, start_dma, lambda q: q, jnp.int32(0))

            # phase 1: unconditional vector tests
            #   8 child slabs (+min reduces) and one leaf retest per sub
            results = []
            for s in range(n_sub):
                _, _, _, lid, node8, _ = popped[s]
                t_cube = tcube_ref[s * 8:(s + 1) * 8, :]
                tmins = []
                for c in range(8):
                    k = node8 * 8 + c
                    h, tn = slab_gen(clox[k], cloy[k], cloz[k],
                                     chix[k], chiy[k], chiz[k], s, t_cube)
                    tmins.append(jnp.min(
                        jnp.where(h, jnp.maximum(tn, 0.0), jnp.inf)))
                if leaf_retest:
                    lh, _ = slab_gen(llox[lid], lloy[lid], lloz[lid],
                                     lhix[lid], lhiy[lid], lhiz[lid],
                                     s, t_cube)
                    leaf_any = jnp.sum(jnp.where(lh, 1, 0))
                else:
                    leaf_any = jnp.int32(1)
                results.append((tmins, leaf_any))

            # phase 2: scalar sort/push or leaf intersect
            new_sps = []
            for s in range(n_sub):
                spp, ent, is_leaf, lid, node8, live = popped[s]
                tmins, leaf_any = results[s]
                base = s * 128
                lanes = slice(s * 1024, (s + 1) * 1024)
                brow = s * 4

                def do_leaf(q, s=s, lid=lid, lanes=lanes, brow=brow,
                            leaf_any=leaf_any):
                    pltpu.make_async_copy(pages_ref.at[lid],
                                          leaf_vmem.at[s],
                                          dma_sems.at[s]).wait()

                    def intersect(q, s=s, lanes=lanes, brow=brow):
                        t_lane = best_ref[brow:brow + 1, :]
                        t_cand, u_c, v_c, ids = _leaf_intersect(
                            leaf_vmem[s], rays_mat[:, lanes], tmin,
                            t_lane, block)
                        t_min, better, sel_id, sel_u, sel_v = \
                            _select_best_hit(t_cand, u_c, v_c, ids, t_lane)
                        t_new = jnp.where(better, t_min, t_lane)
                        sel_bits = jax.lax.bitcast_convert_type(
                            sel_id, jnp.float32)
                        best_ref[brow:brow + 1, :] = t_new
                        best_ref[brow + 1:brow + 2, :] = jnp.where(
                            better, sel_bits,
                            best_ref[brow + 1:brow + 2, :])
                        best_ref[brow + 2:brow + 3, :] = jnp.where(
                            better, sel_u,
                            best_ref[brow + 2:brow + 3, :])
                        best_ref[brow + 3:brow + 4, :] = jnp.where(
                            better, sel_v,
                            best_ref[brow + 3:brow + 4, :])
                        tcube_ref[s * 8:(s + 1) * 8, :] = \
                            lane_to_cube(t_new)
                        return q
                    return jax.lax.cond(leaf_any > 0, intersect,
                                        lambda q: q, q)

                def do_internal(q, s=s, base=base, node8=node8,
                                tmins=tmins):
                    ents = [(tmins[c], cent[node8 * 8 + c])
                            for c in range(8)]
                    # push far-first so near pops first; inf (miss/empty)
                    # keys sort to the FRONT and are skipped by the
                    # conditional increment (overwritten by later pushes)
                    for t_c, e_c in _sort8_desc(ents):
                        stack[base + jnp.minimum(q, 126)] = e_c
                        q = q + jnp.where(t_c < jnp.inf, 1, 0)
                    return jnp.minimum(q, 126)

                res = jax.lax.cond(is_leaf, do_leaf, do_internal, spp)
                new_sps.append(jnp.where(live, res, jnp.int32(0)))

            new_done = tuple(
                jnp.where(popped[s][5], rounds + 1, done_at[s])
                for s in range(n_sub))  # last round each sub was live
            return (tuple(new_sps), rounds + 1, new_done)

        minus1 = jax.lax.bitcast_convert_type(
            jnp.full((1, 1024), -1, jnp.int32), jnp.float32)
        for s in range(n_sub):
            stack[s * 128] = jnp.int32(0)    # root bf8 node
            t0 = rays_mat[7:8, s * 1024:(s + 1) * 1024]
            best_ref[s * 4:s * 4 + 1, :] = t0
            best_ref[s * 4 + 1:s * 4 + 2, :] = minus1
            best_ref[s * 4 + 2:s * 4 + 3, :] = jnp.zeros((1, 1024),
                                                         jnp.float32)
            best_ref[s * 4 + 3:s * 4 + 4, :] = jnp.zeros((1, 1024),
                                                         jnp.float32)
            tcube_ref[s * 8:(s + 1) * 8, :] = cube_ref[s * 8 + 7]
        init = (tuple(jnp.int32(1) for _ in range(n_sub)), jnp.int32(0),
                tuple(jnp.int32(0) for _ in range(n_sub)))
        _, rounds, done_at = jax.lax.while_loop(cond, body, init)
        cat = lambda i: jnp.concatenate(
            [best_ref[s * 4 + i:s * 4 + i + 1, :] for s in range(n_sub)],
            axis=1)
        width = n_sub * 1024
        # row 5: per-sub completion round (diagnostic — the lockstep round
        # after which each 1024-ray sub's stack drained; rounds == max)
        done_row = jnp.concatenate(
            [jnp.full((1, 1024), done_at[s], jnp.float32)
             for s in range(n_sub)], axis=1)
        out_ref[:] = jnp.concatenate(
            [cat(0), cat(1), cat(2), cat(3),
             jnp.full((1, width), rounds, jnp.float32),
             done_row,
             jnp.zeros((2, width), jnp.float32)], axis=0)

    return kernel


def _make_occluded_kernel_bf8(n8: int, n_leaves: int, block: int,
                              tmin: float, n_sub: int,
                              leaf_retest: bool = True,
                              opaque_only: bool = False):
    """BF8 occlusion: stack-based wide traversal (order irrelevant, so hit
    children push unsorted), per-sub occlusion masks in VMEM scratch, and
    the all-occluded early exit packed into the same per-child reduces.
    Phases as in _make_closest_kernel_bf8. `opaque_only` ignores hits on
    alpha-tagged triangles (≙ the any-hit ignore in the occlusion
    shaders) — the fast first pass of alpha-aware shadow queries."""

    def kernel(clox, cloy, cloz, chix, chiy, chiz, cent, *rest):
        if leaf_retest:
            (llox, lloy, lloz, lhix, lhiy, lhiz,
             pages_ref, rays_ref, cube_ref,
             out_ref, leaf_vmem, dma_sems, stack,
             occ_ref, occub_ref) = rest
        else:
            (pages_ref, rays_ref, cube_ref,
             out_ref, leaf_vmem, dma_sems, stack,
             occ_ref, occub_ref) = rest
        rays_mat = rays_ref[:]

        def safe_inv(a):
            return 1.0 / jnp.where(jnp.abs(a) < 1e-12,
                                   jnp.where(a < 0, -1e-12, 1e-12), a)

        sub_rays = []
        for s in range(n_sub):
            ox = cube_ref[s * 8 + 0]
            oy = cube_ref[s * 8 + 1]
            oz = cube_ref[s * 8 + 2]
            dx = cube_ref[s * 8 + 4]
            dy = cube_ref[s * 8 + 5]
            dz = cube_ref[s * 8 + 6]
            sub_rays.append((ox, oy, oz,
                             safe_inv(dx), safe_inv(dy), safe_inv(dz),
                             cube_ref[s * 8 + 7]))

        def lane_to_cube_i(x):
            return jnp.concatenate(
                [x[:, i * 128:(i + 1) * 128] for i in range(8)], axis=0)

        def slab_gen(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z, s):
            ox, oy, oz, ix, iy, iz, dist = sub_rays[s]
            occ_c = occub_ref[s * 8:(s + 1) * 8, :]
            h, _ = _slab_t(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z,
                           ox, oy, oz, ix, iy, iz, dist)
            return h & (occ_c == 0)

        def cond(state):
            sps = state[0]
            total = sps[0]
            for s in range(1, n_sub):
                total = total + sps[s]
            return total > 0

        def body(state):
            sps, rounds = state

            popped = []
            for s in range(n_sub):
                live = sps[s] > 0
                spp = jnp.maximum(sps[s] - 1, 0)
                ent = stack[s * 128 + spp]
                is_leaf = live & (ent >= LEAF_BIT)
                lid = jnp.clip(ent - LEAF_BIT, 0, n_leaves - 1)
                node8 = jnp.clip(ent, 0, n8 - 1)
                popped.append((spp, is_leaf, lid, node8, live))

                def start_dma(q, s=s, lid=lid):
                    pltpu.make_async_copy(pages_ref.at[lid],
                                          leaf_vmem.at[s],
                                          dma_sems.at[s]).start()
                    return q
                jax.lax.cond(is_leaf, start_dma, lambda q: q, jnp.int32(0))

            results = []
            for s in range(n_sub):
                _, _, lid, node8, _ = popped[s]
                # packed reduces: child-hit counts in pairs, plus the
                # unoccluded-lane count for the early exit
                hits = []
                for c in range(8):
                    k = node8 * 8 + c
                    hits.append(slab_gen(clox[k], cloy[k], cloz[k],
                                         chix[k], chiy[k], chiz[k], s))
                packs = []
                for c in range(0, 8, 2):
                    packs.append(jnp.sum(
                        jnp.where(hits[c], 1, 0)
                        + jnp.where(hits[c + 1], 4096, 0)))
                occ_c = occub_ref[s * 8:(s + 1) * 8, :]
                if leaf_retest:
                    lh = slab_gen(llox[lid], lloy[lid], lloz[lid],
                                  lhix[lid], lhiy[lid], lhiz[lid], s)
                    lpack = jnp.sum(jnp.where(lh, 1, 0)
                                    + jnp.where(occ_c == 0, 4096, 0))
                else:
                    lpack = 1 + jnp.sum(jnp.where(occ_c == 0, 4096, 0))
                results.append((packs, lpack))

            new_sps = []
            for s in range(n_sub):
                spp, is_leaf, lid, node8, live = popped[s]
                packs, lpack = results[s]
                base = s * 128
                lanes = slice(s * 1024, (s + 1) * 1024)
                leaf_any = (lpack & 4095) > 0
                all_occ = (lpack >> 12) == 0

                def do_leaf(q, s=s, lid=lid, lanes=lanes,
                            leaf_any=leaf_any):
                    pltpu.make_async_copy(pages_ref.at[lid],
                                          leaf_vmem.at[s],
                                          dma_sems.at[s]).wait()

                    def intersect(q, s=s, lanes=lanes):
                        dist_lane = rays_mat[7:8, lanes]
                        t_cand, _, _, ids = _leaf_intersect(
                            leaf_vmem[s], rays_mat[:, lanes], tmin,
                            dist_lane, block)
                        hit_ok = t_cand < 1e30
                        if opaque_only:
                            hit_ok = hit_ok & (ids >= 0) \
                                & ((ids & ALPHA_TRI_BIT) == 0)
                        found = jnp.max(jnp.where(hit_ok, 1, 0),
                                        axis=0, keepdims=True)
                        occ = jnp.maximum(occ_ref[s:s + 1, :], found)
                        occ_ref[s:s + 1, :] = occ
                        occub_ref[s * 8:(s + 1) * 8, :] = \
                            lane_to_cube_i(occ)
                        return q
                    return jax.lax.cond(leaf_any, intersect,
                                        lambda q: q, q)

                def do_internal(q, s=s, base=base, node8=node8,
                                packs=packs):
                    for c in range(8):
                        cnt = (packs[c // 2] & 4095) if c % 2 == 0 \
                            else (packs[c // 2] >> 12)
                        stack[base + jnp.minimum(q, 126)] = \
                            cent[node8 * 8 + c]
                        q = q + jnp.where(cnt > 0, 1, 0)
                    return jnp.minimum(q, 126)

                res = jax.lax.cond(is_leaf, do_leaf, do_internal, spp)
                # all lanes occluded -> drop the whole stack (done)
                res = jnp.where(all_occ, jnp.int32(0), res)
                new_sps.append(jnp.where(live, res, jnp.int32(0)))

            return (tuple(new_sps), rounds + 1)

        for s in range(n_sub):
            stack[s * 128] = jnp.int32(0)
            occ_ref[s:s + 1, :] = jnp.zeros((1, 1024), jnp.int32)
            occub_ref[s * 8:(s + 1) * 8, :] = jnp.zeros((8, 128), jnp.int32)
        init = (tuple(jnp.int32(1) for _ in range(n_sub)), jnp.int32(0))
        _, rounds = jax.lax.while_loop(cond, body, init)
        width = n_sub * 1024
        out_ref[:] = jnp.concatenate(
            [jnp.concatenate([occ_ref[s:s + 1, :] for s in range(n_sub)],
                             axis=1),
             jnp.full((1, width), rounds, jnp.int32),
             jnp.zeros((6, width), jnp.int32)], axis=0)

    return kernel


def _make_occluded_kernel_v4(n_top: int, block: int, tmin: float,
                             n_sub: int):
    """Phase-split full-vreg occlusion kernel (v4 recipe, see
    _make_closest_kernel_v4). Each sub-packet of 1024 rays walks the
    threaded preorder with its own cursor (occlusion needs no ordering, so
    no stack): phase 0 classifies + prefetches leaf DMAs, phase 1 runs all
    slab tests with ONE packed reduce per sub (live-hit count in the low
    bits, unoccluded-lane count in the high bits — so the all-occluded
    early exit rides the same reduce), phase 2 is scalar cursor updates
    plus the MXU leaf test for leaf visits."""

    def kernel(lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
               miss_ref, leaf_ref, pages_ref, rays_ref, cube_ref,
               out_ref, leaf_vmem, dma_sems, occ_ref, occub_ref):
        # occ_ref (n_sub, 1024) i32 lane-major; occub_ref (n_sub*8, 128) i32
        rays_mat = rays_ref[:]                   # (8, n_sub*1024)

        def safe_inv(a):
            return 1.0 / jnp.where(jnp.abs(a) < 1e-12,
                                   jnp.where(a < 0, -1e-12, 1e-12), a)

        sub_rays = []
        for s in range(n_sub):
            ox = cube_ref[s * 8 + 0]
            oy = cube_ref[s * 8 + 1]
            oz = cube_ref[s * 8 + 2]
            dx = cube_ref[s * 8 + 4]
            dy = cube_ref[s * 8 + 5]
            dz = cube_ref[s * 8 + 6]
            sub_rays.append((ox, oy, oz,
                             safe_inv(dx), safe_inv(dy), safe_inv(dz),
                             cube_ref[s * 8 + 7]))

        def lane_to_cube_i(x):                   # (1, 1024) -> (8, 128) i32
            return jnp.concatenate(
                [x[:, i * 128:(i + 1) * 128] for i in range(8)], axis=0)

        def cond(state):
            curs = state[0]
            live = jnp.where(curs[0] < n_top, 1, 0)
            for s in range(1, n_sub):
                live = live + jnp.where(curs[s] < n_top, 1, 0)
            return live > 0

        def body(state):
            curs, rounds = state

            # phase 0: scalar classify + leaf DMA prefetch
            nodes, leaves = [], []
            for s in range(n_sub):
                node = jnp.minimum(curs[s], n_top - 1)
                lf = leaf_ref[node]
                is_leaf = (curs[s] < n_top) & (lf >= 0)
                nodes.append(node)
                leaves.append((is_leaf, lf))

                def start_dma(q, s=s, lf=lf):
                    pltpu.make_async_copy(pages_ref.at[lf],
                                          leaf_vmem.at[s],
                                          dma_sems.at[s]).start()
                    return q
                jax.lax.cond(is_leaf, start_dma, lambda q: q, jnp.int32(0))

            # phase 1: unconditional vector tests, one packed reduce/sub
            flags = []
            for s in range(n_sub):
                ox, oy, oz, ix, iy, iz, dist = sub_rays[s]
                occ_c = occub_ref[s * 8:(s + 1) * 8, :]
                hit = _slab(lox_ref[nodes[s]], loy_ref[nodes[s]],
                            loz_ref[nodes[s]], hix_ref[nodes[s]],
                            hiy_ref[nodes[s]], hiz_ref[nodes[s]],
                            ox, oy, oz, ix, iy, iz, dist) & (occ_c == 0)
                flags.append(jnp.sum(jnp.where(hit, 1, 0)
                                     + jnp.where(occ_c == 0, 4096, 0)))

            # phase 2: scalar cursor updates + leaf intersects
            new_curs = []
            for s in range(n_sub):
                is_leaf, lf = leaves[s]
                any_hit = (flags[s] & 4095) > 0
                node = nodes[s]
                miss = miss_ref[node]
                lanes = slice(s * 1024, (s + 1) * 1024)

                def do_leaf(q, s=s, lf=lf, lanes=lanes, any_hit=any_hit):
                    pltpu.make_async_copy(pages_ref.at[lf],
                                          leaf_vmem.at[s],
                                          dma_sems.at[s]).wait()

                    def intersect(q, s=s, lanes=lanes):
                        ox, oy, oz, ix, iy, iz, dist = sub_rays[s]
                        dist_lane = rays_mat[7:8, lanes]
                        t_cand, _, _, _ = _leaf_intersect(
                            leaf_vmem[s], rays_mat[:, lanes], tmin,
                            dist_lane, block)
                        found = jnp.max(jnp.where(t_cand < 1e30, 1, 0),
                                        axis=0, keepdims=True)
                        occ = jnp.maximum(occ_ref[s:s + 1, :], found)
                        occ_ref[s:s + 1, :] = occ
                        occub_ref[s * 8:(s + 1) * 8, :] = \
                            lane_to_cube_i(occ)
                        return q
                    return jax.lax.cond(any_hit, intersect, lambda q: q, q)

                jax.lax.cond(is_leaf, do_leaf, lambda q: q, jnp.int32(0))

                all_occ = (flags[s] >> 12) == 0
                descend = any_hit & jnp.logical_not(is_leaf)
                nxt = jnp.where(all_occ, n_top,
                                jnp.where(descend, node + 1, miss))
                new_curs.append(jnp.where(curs[s] < n_top, nxt, curs[s]))

            return (tuple(new_curs), rounds + 1)

        for s in range(n_sub):
            occ_ref[s:s + 1, :] = jnp.zeros((1, 1024), jnp.int32)
            occub_ref[s * 8:(s + 1) * 8, :] = jnp.zeros((8, 128), jnp.int32)
        init = (tuple(jnp.int32(0) for _ in range(n_sub)), jnp.int32(0))
        _, rounds = jax.lax.while_loop(cond, body, init)
        width = n_sub * 1024
        out_ref[:] = jnp.concatenate(
            [jnp.concatenate([occ_ref[s:s + 1, :] for s in range(n_sub)],
                             axis=1),
             jnp.full((1, width), rounds, jnp.int32),
             jnp.zeros((6, width), jnp.int32)], axis=0)

    return kernel


def _strip_alpha_bit(tri):
    """Drop the page-id alpha tag from closest-hit triangle ids
    (misses stay -1)."""
    return jnp.where(tri >= 0, tri & ~ALPHA_TRI_BIT, tri)


def _smem_spec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _mat_spec():
    """(8, 1024) block i of a (P*8, 1024) array."""
    return pl.BlockSpec((8, 1024), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _dispatch_size(n: int) -> int:
    """Round the ray count up to a power of two >= one packet so different
    film resolutions share compiled kernel shapes."""
    return max(RAYS_PER_PACKET, 1 << (n - 1).bit_length())


def _pack_inputs(origins, dirs, extra, extra_fill, n):
    """Build the (P*8, 1024) ray matrices: per packet rows
    [ox,oy,oz,1,dx,dy,dz,extra] (the constant-1 row feeds the b offset in
    the Woop matmul; the extra row multiplies all-zero operand rows, so it
    carries tmax/dist for free)."""
    pad = _dispatch_size(n) - n
    if pad:
        zpad = lambda a, c: jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], c, a.dtype)])
        # pad origins FAR outside any scene (+x heading away): an
        # origin-0 pad lane votes 'hit' on every node containing the
        # world origin, dragging its whole lockstep sub-packet through
        # those subtrees (leaf DMAs + MXU tests) for nothing
        origins = zpad(origins, 1e7)
        dirs = zpad(dirs, 1.0)
        extra = zpad(extra, extra_fill)
    np_rays = origins.shape[0]
    p = np_rays // RAYS_PER_PACKET
    ones = jnp.ones((np_rays,), jnp.float32)
    rays_mat = jnp.stack([origins[:, 0], origins[:, 1], origins[:, 2], ones,
                          dirs[:, 0], dirs[:, 1], dirs[:, 2], extra],
                         axis=0)                       # (8, N)
    rays_mat = rays_mat.reshape(8, p, RAYS_PER_PACKET) \
        .transpose(1, 0, 2).reshape(p * 8, RAYS_PER_PACKET)
    return rays_mat, p


def _pack_inputs_v3(origins, dirs, extra, extra_fill, n):
    """v3 ray packing: lane-major matrices for the MXU leaf test plus the
    (S*8, 8, 128) component cube for full-vreg slab tests. Programs cover
    n_sub = min(8, N/1024) sub-packets of 1024 rays each."""
    pad = _dispatch_size(n) - n
    if pad:
        zpad = lambda a, c: jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], c, a.dtype)])
        # far-away pad origins: see _pack_inputs
        origins = zpad(origins, 1e7)
        dirs = zpad(dirs, 1.0)
        extra = zpad(extra, extra_fill)
    np_rays = origins.shape[0]
    n_subs_total = np_rays // RAYS_PER_PACKET
    n_sub = min(8, n_subs_total)
    p = n_subs_total // n_sub
    ones = jnp.ones((np_rays,), jnp.float32)
    stacked = jnp.stack([origins[:, 0], origins[:, 1], origins[:, 2], ones,
                         dirs[:, 0], dirs[:, 1], dirs[:, 2], extra],
                        axis=0)                          # (8, N)
    rays_mat = stacked.reshape(8, p, n_sub * RAYS_PER_PACKET) \
        .transpose(1, 0, 2).reshape(p * 8, n_sub * RAYS_PER_PACKET)
    cube = stacked.reshape(8, n_subs_total, 8, 128) \
        .transpose(1, 0, 2, 3).reshape(n_subs_total * 8, 8, 128)
    return rays_mat, cube, p, n_sub


@functools.partial(jax.jit, static_argnames=("tmin",))
def packet_closest_v4(pbvh: PacketBVH, origins, dirs, tmax,
                      tmin=1e-5) -> Hit:
    """Closest-hit via the phase-split kernel (v4) — see
    _make_closest_kernel_v4."""
    n = origins.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    rays_mat, cube, p, n_sub = _pack_inputs_v3(origins, dirs, tmax, tmin, n)
    width = n_sub * RAYS_PER_PACKET

    kernel = _make_closest_kernel_v4(pbvh.n_top, pbvh.block, tmin, n_sub)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    mat = pl.BlockSpec((8, width), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    cub = pl.BlockSpec((n_sub * 8, 8, 128), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[_smem_spec()] * 8 + [hbm, mat, cub],
        out_specs=mat,
        out_shape=jax.ShapeDtypeStruct((p * 8, width), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_sub, 8, _page_cols(pbvh.block)),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA((n_sub,)),
                        pltpu.SMEM((512,), jnp.int32),
                        pltpu.VMEM((n_sub * 4, 1024), jnp.float32),
                        pltpu.VMEM((n_sub * 8, 128), jnp.float32)],
    )(pbvh.top_lo[:, 0], pbvh.top_lo[:, 1], pbvh.top_lo[:, 2],
      pbvh.top_hi[:, 0], pbvh.top_hi[:, 1], pbvh.top_hi[:, 2],
      pbvh.top_miss, pbvh.top_leaf, pbvh.pages, rays_mat, cube)
    out = out.reshape(p, 8, width)
    pick = lambda r: out[:, r, :].reshape(-1)[:n]
    return Hit(pick(0),
               _strip_alpha_bit(jax.lax.bitcast_convert_type(pick(1),
                                                             jnp.int32)),
               pick(2), pick(3))


@functools.partial(jax.jit, static_argnames=("tmin",))
def packet_closest_bf8(bvh8: BF8BVH, origins, dirs, tmax,
                       tmin=1e-5) -> Hit:
    """Closest-hit via the BF8 wide-node kernel — see
    _make_closest_kernel_bf8."""
    n = origins.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    rays_mat, cube, p, n_sub = _pack_inputs_v3(origins, dirs, tmax, tmin, n)
    width = n_sub * RAYS_PER_PACKET

    kernel = _make_closest_kernel_bf8(bvh8.n8, bvh8.n_leaves, bvh8.block,
                                      tmin, n_sub, bvh8.leaf_retest)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    mat = pl.BlockSpec((8, width), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    cub = pl.BlockSpec((n_sub * 8, 8, 128), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[_smem_spec()] * (13 if bvh8.leaf_retest else 7)
        + [hbm, mat, cub],
        out_specs=mat,
        out_shape=jax.ShapeDtypeStruct((p * 8, width), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_sub, 8, _page_cols(bvh8.block)),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA((n_sub,)),
                        pltpu.SMEM((1024,), jnp.int32),
                        pltpu.VMEM((n_sub * 4, 1024), jnp.float32),
                        pltpu.VMEM((n_sub * 8, 128), jnp.float32)],
    )(bvh8.c_lo[:, 0], bvh8.c_lo[:, 1], bvh8.c_lo[:, 2],
      bvh8.c_hi[:, 0], bvh8.c_hi[:, 1], bvh8.c_hi[:, 2], bvh8.c_ent,
      *((bvh8.l_lo[:, 0], bvh8.l_lo[:, 1], bvh8.l_lo[:, 2],
         bvh8.l_hi[:, 0], bvh8.l_hi[:, 1], bvh8.l_hi[:, 2])
        if bvh8.leaf_retest else ()),
      bvh8.pages, rays_mat, cube)
    out = out.reshape(p, 8, width)
    pick = lambda r: out[:, r, :].reshape(-1)[:n]
    return Hit(pick(0),
               _strip_alpha_bit(jax.lax.bitcast_convert_type(pick(1),
                                                             jnp.int32)),
               pick(2), pick(3))


@functools.partial(jax.jit, static_argnames=("tmin", "opaque_only"))
def packet_occluded_bf8(bvh8: BF8BVH, origins, dirs, dist, tmin=1e-5,
                        opaque_only: bool = False):
    """Occlusion via the BF8 wide-node kernel — see
    _make_occluded_kernel_bf8."""
    n = origins.shape[0]
    dist = jnp.broadcast_to(jnp.asarray(dist, jnp.float32), (n,))
    rays_mat, cube, p, n_sub = _pack_inputs_v3(origins, dirs, dist, tmin, n)
    width = n_sub * RAYS_PER_PACKET

    kernel = _make_occluded_kernel_bf8(bvh8.n8, bvh8.n_leaves, bvh8.block,
                                       tmin, n_sub, bvh8.leaf_retest,
                                       opaque_only)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    mat = pl.BlockSpec((8, width), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    cub = pl.BlockSpec((n_sub * 8, 8, 128), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[_smem_spec()] * (13 if bvh8.leaf_retest else 7)
        + [hbm, mat, cub],
        out_specs=mat,
        out_shape=jax.ShapeDtypeStruct((p * 8, width), jnp.int32),
        scratch_shapes=[pltpu.VMEM((n_sub, 8, _page_cols(bvh8.block)),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA((n_sub,)),
                        pltpu.SMEM((1024,), jnp.int32),
                        pltpu.VMEM((n_sub, 1024), jnp.int32),
                        pltpu.VMEM((n_sub * 8, 128), jnp.int32)],
    )(bvh8.c_lo[:, 0], bvh8.c_lo[:, 1], bvh8.c_lo[:, 2],
      bvh8.c_hi[:, 0], bvh8.c_hi[:, 1], bvh8.c_hi[:, 2], bvh8.c_ent,
      *((bvh8.l_lo[:, 0], bvh8.l_lo[:, 1], bvh8.l_lo[:, 2],
         bvh8.l_hi[:, 0], bvh8.l_hi[:, 1], bvh8.l_hi[:, 2])
        if bvh8.leaf_retest else ()),
      bvh8.pages, rays_mat, cube)
    occ = occ.reshape(p, 8, width)[:, 0, :].reshape(-1)[:n]
    return occ > 0


@functools.partial(jax.jit, static_argnames=("tmin",))
def packet_occluded_v4(pbvh: PacketBVH, origins, dirs, dist, tmin=1e-5):
    """Occlusion via the phase-split kernel (v4) — see
    _make_occluded_kernel_v4."""
    n = origins.shape[0]
    dist = jnp.broadcast_to(jnp.asarray(dist, jnp.float32), (n,))
    rays_mat, cube, p, n_sub = _pack_inputs_v3(origins, dirs, dist, tmin, n)
    width = n_sub * RAYS_PER_PACKET

    kernel = _make_occluded_kernel_v4(pbvh.n_top, pbvh.block, tmin, n_sub)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    mat = pl.BlockSpec((8, width), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    cub = pl.BlockSpec((n_sub * 8, 8, 128), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[_smem_spec()] * 8 + [hbm, mat, cub],
        out_specs=mat,
        out_shape=jax.ShapeDtypeStruct((p * 8, width), jnp.int32),
        scratch_shapes=[pltpu.VMEM((n_sub, 8, _page_cols(pbvh.block)),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA((n_sub,)),
                        pltpu.VMEM((n_sub, 1024), jnp.int32),
                        pltpu.VMEM((n_sub * 8, 128), jnp.int32)],
    )(pbvh.top_lo[:, 0], pbvh.top_lo[:, 1], pbvh.top_lo[:, 2],
      pbvh.top_hi[:, 0], pbvh.top_hi[:, 1], pbvh.top_hi[:, 2],
      pbvh.top_miss, pbvh.top_leaf, pbvh.pages, rays_mat, cube)
    occ = occ.reshape(p, 8, width)[:, 0, :].reshape(-1)[:n]
    return occ > 0


