"""Shared-BLAS instancing for the packet kernels (TLAS semantics).

≙ the reference's shared acceleration structures: one BLAS per Model
reused by every ModelInstance in the TLAS
(Renderer/AccelerationStructure.cpp:260-301, Scene.h:96-107). The flatten
layout (pt/scene/flatten.py) duplicates object-space vertices AND Woop
pages per (instance, mesh) segment — linear HBM and host-build cost in the
instance count (docs/perf_budget.md §8). This module keeps ONE object-space
page set per unique mesh and instances it at traversal time:

* **Build** (`build_instanced_bf8`): per unique mesh, the native SAH
  builder partitions object-space triangles into leaf blocks once (tight
  object AABBs + Woop pages with mesh-local triangle ids). The top
  structure is built over every (segment, mesh-leaf) pair's WORLD AABB
  (8-corner transform) with singleton leaves, then collapsed to BF8 by the
  production `build_bf8`. Two SMEM side tables map leaf id → page id and
  leaf id → segment; a (S, 12) table holds each segment's inverse
  transform rows [A | b] (A = M⁻¹ linear 3x3 row-major, b = translation).

* **Traversal** (`packet_closest_bf8i` / `packet_occluded_bf8i`): the BF8
  phase-split kernels with two changes at leaf visits — the packet's ray
  matrix is mapped into the instance's object space first (o' = A o + b,
  d' = A d: ~33 broadcast VPU MACs per visit; the hit parameter t is
  invariant under any affine map applied to o and d consistently, so
  t/tmin/tmax and the best-hit state all stay in world parameterization),
  and the winning page id gets the segment id OR-ed into bits
  [SEG_SHIFT, SEG_SHIFT+10) so shading can resolve the instance. Internal
  (world-AABB) phases are unchanged.

Capacity contract: mesh-local triangle ids < 2^SEG_SHIFT (1M tris per
unique mesh), segments < 1024, ALPHA_TRI_BIT (bit 30) preserved.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pt.accel.intersect import Hit
from pt.accel.pallas_bvh import (ALPHA_TRI_BIT, LEAF_BIT, MAX_TOP_LEAVES,
                                 RAYS_PER_PACKET, PacketBVH, _leaf_intersect,
                                 _pack_inputs_v3, _page_cols,
                                 _select_best_hit, _slab_t, _smem_spec,
                                 _sort8_desc, _strip_alpha_bit, _woop_pages,
                                 build_bf8)

SEG_SHIFT = 20                      # seg id lives in bits 20..29
SEG_MASK = 0x3FF << SEG_SHIFT
TRI_MASK = (1 << SEG_SHIFT) - 1
MAX_SEGS = 1 << 10
# instanced top trees get singleton leaves (1 page per leaf), so the
# leaf + page/seg tables all scale with the leaf count. This is a loose
# sanity cap only — the REAL gates are the byte-accurate SMEM budget
# check at the end of build_instanced_bf8 (base_kb <= 600, retest fit
# <= 640) and MAX_INST_BLOCK below. Raised 4096 -> 12288 in round 4:
# 256 instances x 6k tris needs ~8.7k pairs at block 256, and at 4096
# the block loop escalated to 512, which the kernel cannot compile (see
# MAX_INST_BLOCK).
MAX_INST_LEAVES = 12288
# blocks above 256 exceed the kernel's scoped-VMEM budget (measured on
# the v5e 2026-08-20: block 512 -> 25.8M scoped vs the 16M limit, both
# the flat AND instanced closest kernels fail to compile); the builder
# returns None instead of emitting an uncompilable structure
MAX_INST_BLOCK = 256


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BF8Instanced:
    """BF8 top tree whose leaves reference SHARED object-space pages
    through (page, segment) indirection. Carries the integrator duck
    protocol (closest/occluded/root_bounds), so `trace_closest` routes it
    without a dedicated isinstance branch."""
    c_lo: jax.Array          # (n8*8, 3) f32 world child bounds
    c_hi: jax.Array          # (n8*8, 3) f32
    c_ent: jax.Array         # (n8*8,) i32
    l_lo: jax.Array          # (n_leaves, 3) f32 world leaf bounds
    l_hi: jax.Array          # (n_leaves, 3) f32
    leaf_page: jax.Array     # (n_leaves,) i32 shared-page index
    leaf_seg: jax.Array      # (n_leaves,) i32 owning segment
    seg_inv: jax.Array       # (S * 12,) f32 flat [A row-major 9 | b 3]
    pages: jax.Array         # (n_pages, 8, 7B) f32 OBJECT-space pages
    n8: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_leaves: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_segs: int = dataclasses.field(metadata=dict(static=True), default=0)
    block: int = dataclasses.field(metadata=dict(static=True), default=32)
    leaf_retest: bool = dataclasses.field(metadata=dict(static=True),
                                          default=True)
    root_lo: jax.Array | None = None
    root_hi: jax.Array | None = None
    # when set ((S,) i32 — segment s's first triangle id in the flattened
    # global numbering, pt/scene/flatten.py shared_mesh_layout), closest()
    # remaps (segment, mesh-local) winning ids to GLOBAL flattened ids, so
    # the integrator's shading (tri_mat / tri_* row gathers) runs
    # unchanged on instanced hits
    seg_tri_base: jax.Array | None = None

    # integrator duck-dispatch protocol (pt.render.integrator
    # trace_closest / trace_occluded / _root_bounds)
    def closest(self, origins, dirs, tmax, tmin):
        hit = packet_closest_bf8i(self, origins, dirs, tmax, tmin)
        if self.seg_tri_base is not None:
            hit = hit._replace(tri=remap_global_tri(hit.tri,
                                                    self.seg_tri_base))
        return hit

    def occluded(self, origins, dirs, dist, tmin):
        return packet_occluded_bf8i(self, origins, dirs, dist, tmin)

    def root_bounds(self):
        return self.root_lo, self.root_hi


def decode_instanced_tri(tri):
    """Split a closest-hit id from the instanced kernel into
    (mesh-local triangle id, segment id); misses stay (-1, 0)."""
    seg = jnp.where(tri >= 0, (tri & SEG_MASK) >> SEG_SHIFT, 0)
    mesh_tri = jnp.where(tri >= 0, tri & TRI_MASK, tri)
    return mesh_tri, seg


def remap_global_tri(tri, seg_tri_base):
    """(segment, mesh-local) winning ids → flattened GLOBAL triangle ids
    (seg_tri_base[seg] + local), preserving the miss sentinel (-1) and
    ALPHA_TRI_BIT (bit 30 — the any-hit retest marker the flat kernels
    also return)."""
    alpha = tri & ALPHA_TRI_BIT
    mesh_tri, seg = decode_instanced_tri(tri)
    glob = jnp.asarray(seg_tri_base, jnp.int32)[seg] + mesh_tri
    return jnp.where(tri >= 0, glob | alpha, tri)


def _mesh_leaves(positions: np.ndarray, tri_idx: np.ndarray, block: int,
                 max_leaves: int, tri_opaque: Optional[np.ndarray],
                 id_base: int):
    """Partition one mesh's object-space triangles into ≤`block` leaf
    blocks via the native SAH builder; returns (pages, leaf_lo, leaf_hi)
    with mesh-local triangle ids offset by `id_base`, or None."""
    from pt.accel.native import OVERFLOW, build_sah

    positions = np.asarray(positions, np.float32)
    tri_idx = np.asarray(tri_idx, np.int64)
    v0 = positions[tri_idx[:, 0]]
    v1 = positions[tri_idx[:, 1]]
    v2 = positions[tri_idx[:, 2]]
    tri_lo = np.minimum(np.minimum(v0, v1), v2)
    tri_hi = np.maximum(np.maximum(v0, v1), v2)
    centroids = (v0 + v1 + v2) / 3.0
    result = build_sah(tri_lo, tri_hi, centroids, block,
                       max_nodes=2 * max_leaves - 1)
    if result is None or result is OVERFLOW:
        return None
    order, node_lo, node_hi, miss, leaf_start, leaf_count = result
    if leaf_count.max(initial=0) > block:
        return None
    leaf_nodes = np.nonzero(leaf_start >= 0)[0]
    n_leaves = len(leaf_nodes)

    t_pad = n_leaves * block
    sv0 = np.zeros((t_pad, 3), np.float32)
    se1 = np.zeros((t_pad, 3), np.float32)
    se2 = np.zeros((t_pad, 3), np.float32)
    ids = np.full(t_pad, -1, np.int32)
    page_alpha = np.zeros(t_pad, bool)
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
        ids[slot] = tris + id_base
        if tri_opaque is not None:
            page_alpha[slot] = ~np.asarray(tri_opaque, bool)[tris]
    pages = _woop_pages(sv0, se1, se2, ids, n_leaves, block,
                        tri_alpha=page_alpha if tri_opaque is not None
                        else None)
    return pages, node_lo[leaf_nodes], node_hi[leaf_nodes]


def _transform_boxes(lo: np.ndarray, hi: np.ndarray, m: np.ndarray):
    """World AABBs of object AABBs under a 4x4 transform (8 corners)."""
    corners = np.stack([np.where(np.array([(i >> a) & 1 for a in range(3)],
                                          bool), hi_, lo_)
                        for lo_, hi_ in [(lo, hi)]
                        for i in range(8)], axis=1)        # (L, 8, 3)
    w = corners @ m[:3, :3].T + m[:3, 3]
    return w.min(axis=1).astype(np.float32), w.max(axis=1).astype(np.float32)


def build_instanced_bf8(meshes: Sequence[Tuple[np.ndarray, np.ndarray,
                                               Optional[np.ndarray]]],
                        seg_mesh: Sequence[int],
                        seg_transform: np.ndarray,
                        block: int = 32,
                        seg_tri_base=None) -> Optional[BF8Instanced]:
    """Build the shared-page instanced structure.

    meshes: per unique mesh (positions (Vm,3), tri_idx (Tm,3),
    tri_opaque (Tm,) bool or None) in OBJECT space. seg_mesh: mesh index
    per segment. seg_transform: (S, 4, 4) world transforms. seg_tri_base
    ((S,) global tri offsets, optional): when given, closest() remaps hit
    ids to the flattened global numbering (production integrator mode).
    Returns None when the native builder is unavailable, a transform is
    singular, or the capacity contract cannot be met (callers fall back
    to flatten)."""
    from pt.accel.native import sah_available

    if not sah_available():
        return None
    seg_mesh = np.asarray(seg_mesh, np.int64)
    if len(seg_mesh) and not (0 <= seg_mesh.min()
                              and seg_mesh.max() < len(meshes)):
        raise ValueError("seg_mesh references a mesh index out of range")
    seg_transform = np.asarray(seg_transform, np.float64)
    n_segs = len(seg_mesh)
    if n_segs > MAX_SEGS:
        return None
    if any(np.asarray(m[1]).shape[0] > TRI_MASK for m in meshes):
        return None
    dets = np.linalg.det(seg_transform[:, :3, :3])
    if (np.abs(dets) < 1e-30).any():
        return None                      # singular instance transform

    # Grow the common block until the WHOLE structure fits every budget.
    # ceil(T/block) is only a LOWER bound on a mesh's leaf count (SAH
    # leaves are rarely full), and the BF8 collapse has its own SMEM gate
    # (7*n8*8 scalars <= 600 KiB) that only materialises after the top
    # tree exists — so feasibility is decided by ATTEMPTING the full
    # build per block and retrying coarser on any downstream overflow
    # (first hits, round 4: 6k tris x16 — the ceil bound said 3040 pairs
    # at block 32, the real tree had 4144; 6k x128 — the 8192-pair top
    # tree built fine but its collapse blew the 600 KiB SMEM gate, and
    # only block 256 fits).
    uses = np.bincount(seg_mesh, minlength=len(meshes))
    inv = np.linalg.inv(seg_transform)                     # (S, 4, 4)
    seg_inv = np.concatenate([inv[:, :3, :3].reshape(n_segs, 9),
                              inv[:, :3, 3]], axis=1).astype(np.float32)

    def _attempt(block: int) -> Optional[BF8Instanced]:
        worst = sum(int(uses[mi]) * -(-np.asarray(m[1]).shape[0] // block)
                    for mi, m in enumerate(meshes))
        if worst > MAX_INST_LEAVES:
            return None
        built = [_mesh_leaves(positions, tri_idx, block,
                              max_leaves=MAX_INST_LEAVES,
                              tri_opaque=tri_opaque, id_base=0)
                 for positions, tri_idx, tri_opaque in meshes]
        if not all(b is not None for b in built):
            return None
        if sum(int(uses[mi]) * len(b[1])
               for mi, b in enumerate(built)) > MAX_INST_LEAVES:
            return None

        mesh_pages, mesh_lo, mesh_hi, page_base = [], [], [], []
        base = 0
        for pages, llo, lhi in built:
            mesh_pages.append(pages)
            mesh_lo.append(llo)
            mesh_hi.append(lhi)
            page_base.append(base)
            base += pages.shape[0]
        page_table = np.concatenate(mesh_pages, axis=0)

        # (segment, mesh-leaf) pairs -> world boxes + (page, seg) tables
        prim_lo, prim_hi, prim_page, prim_seg = [], [], [], []
        for s in range(n_segs):
            mi = int(seg_mesh[s])
            wlo, whi = _transform_boxes(mesh_lo[mi], mesh_hi[mi],
                                        seg_transform[s])
            n = len(wlo)
            prim_lo.append(wlo)
            prim_hi.append(whi)
            prim_page.append(np.arange(page_base[mi], page_base[mi] + n,
                                       dtype=np.int32))
            prim_seg.append(np.full(n, s, np.int32))
        prim_lo = np.concatenate(prim_lo)
        prim_hi = np.concatenate(prim_hi)
        prim_page = np.concatenate(prim_page)
        prim_seg = np.concatenate(prim_seg)
        n_prim = len(prim_lo)
        if n_prim > MAX_INST_LEAVES:
            return None
        if n_prim < 2:
            return None                  # single-leaf scene: use flatten

        # top tree over the pair boxes, singleton leaves
        from pt.accel.native import OVERFLOW, build_sah
        result = build_sah(prim_lo, prim_hi, (prim_lo + prim_hi) * 0.5,
                           max_leaf=1, max_nodes=2 * n_prim - 1 + 8)
        if result is None or result is OVERFLOW:
            return None
        order, node_lo, node_hi, miss, leaf_start, leaf_count = result
        n_top = len(miss)
        leaf_nodes = np.nonzero(leaf_start >= 0)[0]
        n_leaves = len(leaf_nodes)
        top_leaf = np.full(n_top, -1, np.int32)
        top_leaf[leaf_nodes] = np.arange(n_leaves, dtype=np.int32)

        pbvh = PacketBVH(top_lo=jnp.asarray(node_lo),
                         top_hi=jnp.asarray(node_hi),
                         top_miss=jnp.asarray(miss),
                         top_leaf=jnp.asarray(top_leaf),
                         pages=jnp.asarray(page_table), n_top=int(n_top),
                         block=block)
        b8 = build_bf8(pbvh)
        if b8 is None:
            return None

        # leaf id (build_bf8 numbering == top_leaf numbering) -> prim
        prim_of_leaf = order[leaf_start[leaf_nodes]]
        leaf_page = prim_page[prim_of_leaf]
        leaf_seg = prim_seg[prim_of_leaf]

        # SMEM budget incl. the instancing tables decides the leaf retest
        n8 = b8.n8
        base_kb = (7 * n8 * 8 + 2 * n_leaves + 12 * n_segs) * 4 / 1024
        leaf_kb = 6 * n_leaves * 4 / 1024
        if base_kb > 600:
            return None
        leaf_retest = base_kb + leaf_kb <= 640

        return BF8Instanced(
            c_lo=b8.c_lo, c_hi=b8.c_hi, c_ent=b8.c_ent,
            l_lo=b8.l_lo, l_hi=b8.l_hi,
            leaf_page=jnp.asarray(leaf_page),
            leaf_seg=jnp.asarray(leaf_seg),
            seg_inv=jnp.asarray(seg_inv.reshape(-1)),
            pages=jnp.asarray(page_table),
            n8=n8, n_leaves=n_leaves, n_segs=n_segs, block=block,
            leaf_retest=leaf_retest,
            root_lo=b8.root_lo, root_hi=b8.root_hi,
            seg_tri_base=(None if seg_tri_base is None
                          else jnp.asarray(seg_tri_base, jnp.int32)))

    block = max(32, -(-block // 32) * 32)
    while block <= MAX_INST_BLOCK:
        out = _attempt(block)
        if out is not None:
            return out
        block *= 2
    return None


def build_instanced_split(meshes: Sequence[Tuple[np.ndarray, np.ndarray,
                                                 Optional[np.ndarray]]],
                          seg_mesh: Sequence[int],
                          seg_transform: np.ndarray,
                          seg_tri_base: np.ndarray,
                          block: int = 32):
    """Instanced acceleration for ALPHA-TESTED scenes (VERDICT r4 task 2
    ≙ the reference composing TLAS instancing with any-hit geometry for
    free: hardware instances carry the per-mesh opaque flags and the
    any-hit shader just runs, AccelerationStructure.cpp:260-301 +
    anyhit.rahit:52-64).

    The integrator's any-hit emulation wants the AlphaSplit scheme
    (pt.render.integrator): a closest/occlusion tree over the OPAQUE
    subset plus closest trees over the (small) ALPHA subset. Opacity is
    per-geometry (Scene.h:63-71 Geometry::IsOpaque ≙ flatten.py), so the
    split falls on whole meshes and each subset is itself a shared-BLAS
    instancing problem over its own (segment, mesh-leaf) pairs.

    Returns `(full, (tree_o, sel_o), (tree_a, sel_a))` or None when the
    FULL structure is infeasible (callers fall back to flatten):

    * `full` — BF8Instanced over every segment (global-id remap via
      `seg_tri_base`): stays `accel.bvh` for root-bounds clamps and the
      debug renderer's force-opaque trace.
    * `tree_o` / `tree_a` — BF8Instanced over only that subset's
      segments, returning SUBSET-RANK ids (its seg_tri_base counts
      within the subset), exactly the contract AlphaSplit's
      `_remap_subset_tri(sel, ...)` expects; None when that subset's
      instanced build is infeasible (e.g. a single-leaf subset) — the
      renderer then builds a flat subset tree instead (hybrid).
    * `sel_o` / `sel_a` — (K,) int32 GLOBAL flattened triangle ids of
      the subset in subset-rank order (the AlphaSplit sel arrays).

    Requires homogeneous per-mesh opacity (always true for
    shared_mesh_layout inputs); returns None otherwise."""
    seg_mesh = np.asarray(seg_mesh, np.int64)
    seg_transform = np.asarray(seg_transform, np.float64)
    seg_tri_base = np.asarray(seg_tri_base, np.int64)
    n_segs = len(seg_mesh)
    mesh_opaque = []
    for _, tris, opq in meshes:
        if opq is None:
            mesh_opaque.append(True)
            continue
        opq = np.asarray(opq, bool)
        if opq.any() and (~opq).any():
            return None                    # mixed-opacity mesh: flatten
        mesh_opaque.append(bool(opq.all()))
    counts = np.asarray([np.asarray(m[1]).shape[0] for m in meshes],
                        np.int64)

    full = build_instanced_bf8(meshes, seg_mesh, seg_transform, block,
                               seg_tri_base=seg_tri_base)
    if full is None:
        return None

    def subset(keep_opaque: bool):
        idx = [s for s in range(n_segs)
               if mesh_opaque[int(seg_mesh[s])] == keep_opaque]
        if not idx:
            return None, np.zeros((0,), np.int32)
        sub_gis: List[int] = []
        remap: dict = {}
        for s in idx:
            mi = int(seg_mesh[s])
            if mi not in remap:
                remap[mi] = len(sub_gis)
                sub_gis.append(mi)
        sub_counts = counts[seg_mesh[idx]]
        sub_base = np.concatenate([[0], np.cumsum(sub_counts)[:-1]]) \
            .astype(np.int32)
        sel = np.concatenate(
            [seg_tri_base[s] + np.arange(counts[seg_mesh[s]])
             for s in idx]).astype(np.int32)
        tree = build_instanced_bf8(
            [meshes[mi] for mi in sub_gis],
            np.asarray([remap[int(seg_mesh[s])] for s in idx], np.int64),
            seg_transform[idx], block, seg_tri_base=sub_base)
        return tree, sel

    return full, subset(True), subset(False)


def _xform_rays(sub, a):
    """Map a (8, L) packet ray matrix into instance space: o' = A o + b,
    d' = A d; rows 3 (the homogeneous 1) and 7 (tmax) pass through —
    the hit parameter t is invariant. `a` is 12 SMEM scalars."""
    ox, oy, oz = sub[0:1], sub[1:2], sub[2:3]
    dx, dy, dz = sub[4:5], sub[5:6], sub[6:7]
    rox = a[0] * ox + a[1] * oy + a[2] * oz + a[9]
    roy = a[3] * ox + a[4] * oy + a[5] * oz + a[10]
    roz = a[6] * ox + a[7] * oy + a[8] * oz + a[11]
    rdx = a[0] * dx + a[1] * dy + a[2] * dz
    rdy = a[3] * dx + a[4] * dy + a[5] * dz
    rdz = a[6] * dx + a[7] * dy + a[8] * dz
    return jnp.concatenate([rox, roy, roz, sub[3:4],
                            rdx, rdy, rdz, sub[7:8]], axis=0)


def _make_closest_kernel_bf8i(n8: int, n_leaves: int, block: int,
                              tmin: float, n_sub: int,
                              leaf_retest: bool = True):
    """_make_closest_kernel_bf8 (pt/accel/pallas_bvh.py) with shared-page
    instancing: leaf DMA through leaf_page, per-visit ray transform into
    the leaf segment's object space, segment id OR-ed into winning ids."""

    def kernel(clox, cloy, cloz, chix, chiy, chiz, cent, *rest):
        if leaf_retest:
            (llox, lloy, lloz, lhix, lhiy, lhiz,
             leaf_page, leaf_seg, seg_inv,
             pages_ref, rays_ref, cube_ref,
             out_ref, leaf_vmem, dma_sems, stack,
             best_ref, tcube_ref) = rest
        else:
            (leaf_page, leaf_seg, seg_inv,
             pages_ref, rays_ref, cube_ref,
             out_ref, leaf_vmem, dma_sems, stack,
             best_ref, tcube_ref) = rest
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
                    pltpu.make_async_copy(pages_ref.at[leaf_page[lid]],
                                          leaf_vmem.at[s],
                                          dma_sems.at[s]).start()
                    return q
                jax.lax.cond(is_leaf, start_dma, lambda q: q, jnp.int32(0))

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

            new_sps = []
            for s in range(n_sub):
                spp, ent, is_leaf, lid, node8, live = popped[s]
                tmins, leaf_any = results[s]
                base = s * 128
                lanes = slice(s * 1024, (s + 1) * 1024)
                brow = s * 4

                def do_leaf(q, s=s, lid=lid, lanes=lanes, brow=brow,
                            leaf_any=leaf_any):
                    pltpu.make_async_copy(pages_ref.at[leaf_page[lid]],
                                          leaf_vmem.at[s],
                                          dma_sems.at[s]).wait()

                    def intersect(q, s=s, lid=lid, lanes=lanes, brow=brow):
                        seg = leaf_seg[lid]
                        a = [seg_inv[seg * 12 + k] for k in range(12)]
                        rays_i = _xform_rays(rays_mat[:, lanes], a)
                        t_lane = best_ref[brow:brow + 1, :]
                        t_cand, u_c, v_c, ids = _leaf_intersect(
                            leaf_vmem[s], rays_i, tmin, t_lane, block)
                        t_min, better, sel_id, sel_u, sel_v = \
                            _select_best_hit(t_cand, u_c, v_c, ids, t_lane)
                        # brand the winning mesh-local id with the segment
                        sel_id = jnp.where(sel_id >= 0,
                                           sel_id | (seg << SEG_SHIFT),
                                           sel_id)
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
                    for t_c, e_c in _sort8_desc(ents):
                        stack[base + jnp.minimum(q, 126)] = e_c
                        q = q + jnp.where(t_c < jnp.inf, 1, 0)
                    return jnp.minimum(q, 126)

                res = jax.lax.cond(is_leaf, do_leaf, do_internal, spp)
                new_sps.append(jnp.where(live, res, jnp.int32(0)))

            new_done = tuple(
                jnp.where(popped[s][5], rounds + 1, done_at[s])
                for s in range(n_sub))
            return (tuple(new_sps), rounds + 1, new_done)

        minus1 = jax.lax.bitcast_convert_type(
            jnp.full((1, 1024), -1, jnp.int32), jnp.float32)
        for s in range(n_sub):
            stack[s * 128] = jnp.int32(0)
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
        done_row = jnp.concatenate(
            [jnp.full((1, 1024), done_at[s], jnp.float32)
             for s in range(n_sub)], axis=1)
        out_ref[:] = jnp.concatenate(
            [cat(0), cat(1), cat(2), cat(3),
             jnp.full((1, width), rounds, jnp.float32),
             done_row,
             jnp.zeros((2, width), jnp.float32)], axis=0)

    return kernel


def _make_occluded_kernel_bf8i(n8: int, n_leaves: int, block: int,
                               tmin: float, n_sub: int,
                               leaf_retest: bool = True,
                               opaque_only: bool = False):
    """_make_occluded_kernel_bf8 with shared-page instancing (see
    _make_closest_kernel_bf8i)."""

    def kernel(clox, cloy, cloz, chix, chiy, chiz, cent, *rest):
        if leaf_retest:
            (llox, lloy, lloz, lhix, lhiy, lhiz,
             leaf_page, leaf_seg, seg_inv,
             pages_ref, rays_ref, cube_ref,
             out_ref, leaf_vmem, dma_sems, stack,
             occ_ref, occub_ref) = rest
        else:
            (leaf_page, leaf_seg, seg_inv,
             pages_ref, rays_ref, cube_ref,
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
                    pltpu.make_async_copy(pages_ref.at[leaf_page[lid]],
                                          leaf_vmem.at[s],
                                          dma_sems.at[s]).start()
                    return q
                jax.lax.cond(is_leaf, start_dma, lambda q: q, jnp.int32(0))

            results = []
            for s in range(n_sub):
                _, _, lid, node8, _ = popped[s]
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
                    pltpu.make_async_copy(pages_ref.at[leaf_page[lid]],
                                          leaf_vmem.at[s],
                                          dma_sems.at[s]).wait()

                    def intersect(q, s=s, lid=lid, lanes=lanes):
                        seg = leaf_seg[lid]
                        a = [seg_inv[seg * 12 + k] for k in range(12)]
                        rays_i = _xform_rays(rays_mat[:, lanes], a)
                        dist_lane = rays_mat[7:8, lanes]
                        t_cand, _, _, ids = _leaf_intersect(
                            leaf_vmem[s], rays_i, tmin,
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


@functools.partial(jax.jit, static_argnames=("tmin", "raw_ids"))
def packet_closest_bf8i(bvh: BF8Instanced, origins, dirs, tmax,
                        tmin=1e-5, raw_ids: bool = False) -> Hit:
    """Closest-hit via the instanced BF8 kernel. Hit ids carry the
    segment in bits [SEG_SHIFT, SEG_SHIFT+10) and the mesh-local triangle
    id below (decode with decode_instanced_tri); `raw_ids=True` keeps the
    alpha bit (the integrator's alpha loops)."""
    n = origins.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    rays_mat, cube, p, n_sub = _pack_inputs_v3(origins, dirs, tmax, tmin, n)
    width = n_sub * RAYS_PER_PACKET

    kernel = _make_closest_kernel_bf8i(bvh.n8, bvh.n_leaves, bvh.block,
                                       tmin, n_sub, bvh.leaf_retest)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    mat = pl.BlockSpec((8, width), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    cub = pl.BlockSpec((n_sub * 8, 8, 128), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[_smem_spec()] * ((13 if bvh.leaf_retest else 7) + 3)
        + [hbm, mat, cub],
        out_specs=mat,
        out_shape=jax.ShapeDtypeStruct((p * 8, width), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_sub, 8, _page_cols(bvh.block)),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA((n_sub,)),
                        pltpu.SMEM((1024,), jnp.int32),
                        pltpu.VMEM((n_sub * 4, 1024), jnp.float32),
                        pltpu.VMEM((n_sub * 8, 128), jnp.float32)],
    )(bvh.c_lo[:, 0], bvh.c_lo[:, 1], bvh.c_lo[:, 2],
      bvh.c_hi[:, 0], bvh.c_hi[:, 1], bvh.c_hi[:, 2], bvh.c_ent,
      *((bvh.l_lo[:, 0], bvh.l_lo[:, 1], bvh.l_lo[:, 2],
         bvh.l_hi[:, 0], bvh.l_hi[:, 1], bvh.l_hi[:, 2])
        if bvh.leaf_retest else ()),
      bvh.leaf_page, bvh.leaf_seg, bvh.seg_inv,
      bvh.pages, rays_mat, cube)
    out = out.reshape(p, 8, width)
    pick = lambda r: out[:, r, :].reshape(-1)[:n]
    ids = jax.lax.bitcast_convert_type(pick(1), jnp.int32)
    if not raw_ids:
        ids = _strip_alpha_bit(ids)
    return Hit(pick(0), ids, pick(2), pick(3))


@functools.partial(jax.jit, static_argnames=("tmin", "opaque_only"))
def packet_occluded_bf8i(bvh: BF8Instanced, origins, dirs, dist, tmin=1e-5,
                         opaque_only: bool = False):
    """Occlusion via the instanced BF8 kernel."""
    n = origins.shape[0]
    dist = jnp.broadcast_to(jnp.asarray(dist, jnp.float32), (n,))
    rays_mat, cube, p, n_sub = _pack_inputs_v3(origins, dirs, dist, tmin, n)
    width = n_sub * RAYS_PER_PACKET

    kernel = _make_occluded_kernel_bf8i(bvh.n8, bvh.n_leaves, bvh.block,
                                        tmin, n_sub, bvh.leaf_retest,
                                        opaque_only)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    mat = pl.BlockSpec((8, width), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    cub = pl.BlockSpec((n_sub * 8, 8, 128), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[_smem_spec()] * ((13 if bvh.leaf_retest else 7) + 3)
        + [hbm, mat, cub],
        out_specs=mat,
        out_shape=jax.ShapeDtypeStruct((p * 8, width), jnp.int32),
        scratch_shapes=[pltpu.VMEM((n_sub, 8, _page_cols(bvh.block)),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA((n_sub,)),
                        pltpu.SMEM((1024,), jnp.int32),
                        pltpu.VMEM((n_sub, 1024), jnp.int32),
                        pltpu.VMEM((n_sub * 8, 128), jnp.int32)],
    )(bvh.c_lo[:, 0], bvh.c_lo[:, 1], bvh.c_lo[:, 2],
      bvh.c_hi[:, 0], bvh.c_hi[:, 1], bvh.c_hi[:, 2], bvh.c_ent,
      *((bvh.l_lo[:, 0], bvh.l_lo[:, 1], bvh.l_lo[:, 2],
         bvh.l_hi[:, 0], bvh.l_hi[:, 1], bvh.l_hi[:, 2])
        if bvh.leaf_retest else ()),
      bvh.leaf_page, bvh.leaf_seg, bvh.seg_inv,
      bvh.pages, rays_mat, cube)
    occ = occ.reshape(p, 8, width)[:, 0, :].reshape(-1)[:n]
    return occ > 0
