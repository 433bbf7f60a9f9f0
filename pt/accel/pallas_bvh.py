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

Four kernel generations are kept (v1..v4 + BF8) because each documents a
measured hardware lesson; benches/bvh_kernels.py A/Bs them:

  v1 `packet_closest`      monolithic 1024-ray packet, threaded preorder.
  v2 `packet_closest_sub`  8x128-lane sub-packets, per-sub SMEM stacks,
                           ordered near-child-first descent.
  v3 `packet_closest_v3`   sub-packet = 1024 rays as full (8,128) vregs
                           (a pre-transposed component cube input), best-hit
                           state in VMEM scratch.
  v4 `packet_closest_v4`   phase-split rounds: all slab tests + packed
                           reduces issued unconditionally BEFORE any scalar
                           consumption, scalar-only branches, leaf DMAs
                           prefetched from pure-scalar classification.
                           (A pop->slab->reduce->branch chain costs ~2.5 us
                           of scalar<->vector latency; vector ops inside
                           cond branches force a vector-queue sync.)
  BF8 `packet_closest_bf8` v4 phases over a branching-factor-8 collapse of
                           a fine (block 32) tree: one visit tests 8
                           children, a scalar 8-sort network orders pushes.

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


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BF8V6:
    """v6 wide-traversal structure: the BF8 collapse with (a) child and
    leaf bounds UNIFIED into one SMEM table (leaf rows after the n8*8
    child rows, so leaf pop-retests reuse the child slab path with a
    scalar base-row select), and (b) per-(node, octant) precomputed child
    push orders — farthest-first along the octant direction — replacing
    the per-visit tnear min-reduces + scalar 8-sort of the BF8 kernel
    (the CWBVH static-order trick). Measured motivation: each
    vector->scalar reduce costs a sync; BF8 paid 9 per sub-round, v6
    pays 1 (children any-flags packed as 8x 4-bit sublane-hit counts in
    one i32 sum-reduce)."""
    u_lo: jax.Array          # (n8*8 + n_leaves, 3) f32 (1e30 = empty)
    u_hi: jax.Array          # (n8*8 + n_leaves, 3) f32
    c_ent: jax.Array         # (n8*8,) i32 child entry (-1 empty)
    c_order: jax.Array       # (n8*8,) i32 packed perm per (node, octant)
    pages: jax.Array         # as PacketBVH.pages
    n8: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_leaves: int = dataclasses.field(metadata=dict(static=True), default=0)
    block: int = dataclasses.field(metadata=dict(static=True),
                                   default=TRIS_PER_BLOCK)
    # scene root AABB recorded at build time (see BF8BVH.root_lo)
    root_lo: jax.Array | None = None     # (3,) f32
    root_hi: jax.Array | None = None     # (3,) f32


def build_bf8_v6(pbvh: PacketBVH):
    """Derive the v6 structure from a PacketBVH (via the BF8 collapse).
    Returns None when the unified table would blow the SMEM budget."""
    b8 = build_bf8(pbvh)
    if b8 is None:
        return None
    c_lo = np.asarray(b8.c_lo)
    c_hi = np.asarray(b8.c_hi)
    l_lo = np.asarray(b8.l_lo)
    l_hi = np.asarray(b8.l_hi)
    n8, n_leaves = b8.n8, b8.n_leaves
    # SMEM: unified bounds 6 cols + entries + orders + stacks; measured
    # Mosaic ceiling ~768 KiB — keep below ~700
    rows = n8 * 8 + n_leaves
    kb = (rows * 6 + n8 * 8 * 2) * 4 / 1024
    if kb > 640:
        return None

    centers = (c_lo + c_hi) * 0.5                    # (n8*8, 3)
    orders = np.zeros((n8 * 8,), np.int32)
    for o in range(8):
        d = np.asarray([-1.0 if o & 4 else 1.0,
                        -1.0 if o & 2 else 1.0,
                        -1.0 if o & 1 else 1.0])
        key = centers @ d                            # (n8*8,)
        key = key.reshape(n8, 8)
        # farthest-first push order so nearest pops first
        perm = np.argsort(-key, axis=1, kind="stable")   # (n8, 8)
        packed = np.zeros(n8, np.int64)
        for j in range(8):
            packed |= perm[:, j].astype(np.int64) << (3 * j)
        # layout: c_order[node*8 + octant]
        orders[np.arange(n8) * 8 + o] = packed.astype(np.int32)
    u_lo = np.concatenate([c_lo, l_lo], axis=0)
    u_hi = np.concatenate([c_hi, l_hi], axis=0)
    return BF8V6(u_lo=jnp.asarray(u_lo), u_hi=jnp.asarray(u_hi),
                 c_ent=b8.c_ent, c_order=jnp.asarray(orders),
                 pages=b8.pages, n8=n8, n_leaves=n_leaves, block=b8.block,
                 root_lo=b8.root_lo, root_hi=b8.root_hi)


def _make_closest_kernel_v6k2(n8: int, n_leaves: int, block: int,
                              tmin: float, n_sub: int):
    """v6 with TWO pops per sub per round ('k2').

    Measurement showed the packet kernels run ~8.5 us per lockstep round
    regardless of what the round contains — each round is a serialized
    scalar<->vector latency chain (pop -> slab -> reduce -> branch), and
    neither trimming reduces (v6) nor batching leaves (v7) shortened it.
    k2 instead amortizes: each round pops up to TWO stack entries per sub
    (top entry e0 and the one below it e1), runs both entries' slab tests
    and packed reduces in one vector phase, and applies both actions in
    one scalar phase (e1 first so e0's children end on top — preserving
    near-first pop order). Two leaf-DMA slots per sub. Visits per
    latency-chain round double; both entries test against the same
    entry-t (e1 cannot see e0's same-round tightening — conservative,
    never wrong)."""

    def kernel(ulox, uloy, uloz, uhix, uhiy, uhiz, cent, corder,
               pages_ref, rays_ref, cube_ref,
               out_ref, leaf_vmem, dma_sems, stack, best_ref, tcube_ref,
               oct_ref):
        # leaf_vmem (n_sub, 2, 8, PC); dma_sems (n_sub, 2)
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
            nx = jnp.sum(jnp.where(dx < 0, 1, 0))
            ny = jnp.sum(jnp.where(dy < 0, 1, 0))
            nz = jnp.sum(jnp.where(dz < 0, 1, 0))
            oct_ref[s] = (jnp.where(nx > 512, 4, 0)
                          + jnp.where(ny > 512, 2, 0)
                          + jnp.where(nz > 512, 1, 0))

        def lane_to_cube(x):
            return jnp.concatenate(
                [x[:, i * 128:(i + 1) * 128] for i in range(8)], axis=0)

        def slab_row(k, s, t_cube):
            ox, oy, oz, ix, iy, iz = sub_rays[s]
            return _slab_t(ulox[k], uloy[k], uloz[k],
                           uhix[k], uhiy[k], uhiz[k],
                           ox, oy, oz, ix, iy, iz, t_cube)

        def classify(ent, valid):
            is_leaf = valid & (ent >= LEAF_BIT)
            lid = jnp.clip(ent - LEAF_BIT, 0, n_leaves - 1)
            node8 = jnp.clip(ent, 0, n8 - 1)
            base_row = jnp.where(is_leaf, n8 * 8 + lid, node8 * 8)
            child_step = jnp.where(is_leaf, 0, 1)
            return is_leaf, lid, node8, base_row, child_step

        def cond(state):
            sps = state[0]
            total = sps[0]
            for s in range(1, n_sub):
                total = total + sps[s]
            return total > 0

        def body(state):
            sps, rounds = state

            popped = []                        # per sub: two entries
            for s in range(n_sub):
                v0 = sps[s] > 0
                v1 = sps[s] > 1
                sp0 = jnp.maximum(sps[s] - 1, 0)
                sp1 = jnp.maximum(sps[s] - 2, 0)
                e0 = stack[s * 128 + sp0]
                e1 = stack[s * 128 + sp1]
                c0 = classify(e0, v0)
                c1 = classify(e1, v1)
                popped.append((sp1, v0, v1, c0, c1))
                for slot, (cl, v) in enumerate(((c0, v0), (c1, v1))):
                    is_leaf, lid = cl[0], cl[1]

                    def sd(q, s=s, lid=lid, slot=slot):
                        pltpu.make_async_copy(pages_ref.at[lid],
                                              leaf_vmem.at[s, slot],
                                              dma_sems.at[s, slot]).start()
                        return q
                    jax.lax.cond(is_leaf, sd, lambda q: q, jnp.int32(0))

            flags = []                         # (fl0, fl1) per sub
            for s in range(n_sub):
                _, _, _, c0, c1 = popped[s]
                t_cube = tcube_ref[s * 8:(s + 1) * 8, :]
                fl = []
                for cl in (c0, c1):
                    base_row, child_step = cl[3], cl[4]
                    pack = None
                    for c in range(8):
                        h, _ = slab_row(base_row + c * child_step, s, t_cube)
                        b = jnp.max(jnp.where(h, 1, 0), axis=1,
                                    keepdims=True)
                        term = b << (4 * c)
                        pack = term if pack is None else pack + term
                    fl.append(jnp.sum(pack))
                flags.append(tuple(fl))

            new_sps = []
            for s in range(n_sub):
                sp1, v0, v1, c0, c1 = popped[s]
                fl0, fl1 = flags[s]
                base = s * 128
                lanes = slice(s * 1024, (s + 1) * 1024)
                brow = s * 4

                def leaf_action(q, lid, slot, fl, s=s, lanes=lanes,
                                brow=brow):
                    pltpu.make_async_copy(pages_ref.at[lid],
                                          leaf_vmem.at[s, slot],
                                          dma_sems.at[s, slot]).wait()

                    def intersect(q, s=s, lanes=lanes, brow=brow, slot=slot):
                        t_lane = best_ref[brow:brow + 1, :]
                        t_cand, u_c, v_c, ids = _leaf_intersect(
                            leaf_vmem[s, slot], rays_mat[:, lanes], tmin,
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
                    return jax.lax.cond((fl & 0xF) > 0, intersect,
                                        lambda q: q, q)

                def internal_action(q, node8, fl, s=s, base=base):
                    perm = corder[node8 * 8 + oct_ref[s]]
                    for j in range(8):
                        c = (perm >> (3 * j)) & 7
                        cnt = (fl >> (4 * c)) & 0xF
                        stack[base + jnp.minimum(q, 126)] = \
                            cent[node8 * 8 + c]
                        q = q + jnp.where(cnt > 0, 1, 0)
                    return jnp.minimum(q, 126)

                q = sp1
                # e1 first (deeper entry), e0 last so its children pop first
                for (cl, v, fl, slot) in ((c1, v1, fl1, 1),
                                          (c0, v0, fl0, 0)):
                    is_leaf, lid, node8 = cl[0], cl[1], cl[2]

                    def act(q, is_leaf=is_leaf, lid=lid, node8=node8,
                            fl=fl, slot=slot):
                        return jax.lax.cond(
                            is_leaf,
                            lambda qq: leaf_action(qq, lid, slot, fl),
                            lambda qq: internal_action(qq, node8, fl), q)

                    # leaves must always drain their prefetched DMA;
                    # invalid entries did not prefetch, so full gate is OK
                    q = jax.lax.cond(v, act, lambda qq: qq, q)
                new_sps.append(q)

            return (tuple(new_sps), rounds + 1)

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


def _make_closest_kernel_v6(n8: int, n_leaves: int, block: int,
                            tmin: float, n_sub: int):
    """v6 closest-hit: BF8 phases with ONE packed reduce per sub-round and
    static octant-ordered pushes (see BF8V6). Per round and sub:
      phase 0 (scalar)  pop + classify + leaf DMA prefetch; unified-table
                        base row selects leaf vs child bounds
      phase 1 (vector)  8 slab tests; per-child (8,1) sublane-hit flags
                        packed 4 bits each into ONE i32 sum-reduce
      phase 2 (scalar)  leaf: DMA wait + MXU intersect when field 0 hits;
                        internal: push children in c_order[node, octant]
                        order, advancing only on hit fields
    The sub's direction octant is computed once at kernel start (majority
    vote, 3 reduces amortized over the whole traversal)."""

    def kernel(ulox, uloy, uloz, uhix, uhiy, uhiz, cent, corder,
               pages_ref, rays_ref, cube_ref,
               out_ref, leaf_vmem, dma_sems, stack, best_ref, tcube_ref,
               oct_ref):
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
            # majority direction octant for the static push order
            nx = jnp.sum(jnp.where(dx < 0, 1, 0))
            ny = jnp.sum(jnp.where(dy < 0, 1, 0))
            nz = jnp.sum(jnp.where(dz < 0, 1, 0))
            oct_ref[s] = (jnp.where(nx > 512, 4, 0)
                          + jnp.where(ny > 512, 2, 0)
                          + jnp.where(nz > 512, 1, 0))

        def lane_to_cube(x):
            return jnp.concatenate(
                [x[:, i * 128:(i + 1) * 128] for i in range(8)], axis=0)

        def slab_row(k, s, t_cube):
            ox, oy, oz, ix, iy, iz = sub_rays[s]
            return _slab_t(ulox[k], uloy[k], uloz[k],
                           uhix[k], uhiy[k], uhiz[k],
                           ox, oy, oz, ix, iy, iz, t_cube)

        def cond(state):
            sps = state[0]
            total = sps[0]
            for s in range(1, n_sub):
                total = total + sps[s]
            return total > 0

        def body(state):
            sps, rounds = state

            # phase 0: scalar pop/classify + DMA prefetch
            popped = []
            for s in range(n_sub):
                live = sps[s] > 0
                spp = jnp.maximum(sps[s] - 1, 0)
                ent = stack[s * 128 + spp]
                is_leaf = live & (ent >= LEAF_BIT)
                lid = jnp.clip(ent - LEAF_BIT, 0, n_leaves - 1)
                node8 = jnp.clip(ent, 0, n8 - 1)
                # unified-table base row: leaf rows start at n8*8
                base_row = jnp.where(is_leaf, n8 * 8 + lid, node8 * 8)
                child_step = jnp.where(is_leaf, 0, 1)
                popped.append((spp, is_leaf, lid, node8, base_row,
                               child_step, live))

                def start_dma(q, s=s, lid=lid):
                    pltpu.make_async_copy(pages_ref.at[lid],
                                          leaf_vmem.at[s],
                                          dma_sems.at[s]).start()
                    return q
                jax.lax.cond(is_leaf, start_dma, lambda q: q, jnp.int32(0))

            # phase 1: 8 slab tests + ONE packed reduce per sub
            flags = []
            for s in range(n_sub):
                _, _, _, _, base_row, child_step, _ = popped[s]
                t_cube = tcube_ref[s * 8:(s + 1) * 8, :]
                pack = None
                for c in range(8):
                    h, _ = slab_row(base_row + c * child_step, s, t_cube)
                    # per-sublane any: (8,128) -> (8,1), stays vector
                    b = jnp.max(jnp.where(h, 1, 0), axis=1, keepdims=True)
                    term = b << (4 * c)
                    pack = term if pack is None else pack + term
                # field c = sublane-hit count of child c (<= 8, 4 bits;
                # the c=7 field may carry into the sign bit — reads mask)
                flags.append(jnp.sum(pack))

            # phase 2: scalar control
            new_sps = []
            for s in range(n_sub):
                spp, is_leaf, lid, node8, _, _, live = popped[s]
                fl = flags[s]
                base = s * 128
                lanes = slice(s * 1024, (s + 1) * 1024)
                brow = s * 4

                def do_leaf(q, s=s, lid=lid, lanes=lanes, brow=brow, fl=fl):
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
                    return jax.lax.cond((fl & 0xF) > 0, intersect,
                                        lambda q: q, q)

                def do_internal(q, s=s, base=base, node8=node8, fl=fl):
                    perm = corder[node8 * 8 + oct_ref[s]]
                    for j in range(8):
                        c = (perm >> (3 * j)) & 7
                        cnt = (fl >> (4 * c)) & 0xF
                        stack[base + jnp.minimum(q, 126)] = \
                            cent[node8 * 8 + c]
                        q = q + jnp.where(cnt > 0, 1, 0)
                    return jnp.minimum(q, 126)

                res = jax.lax.cond(is_leaf, do_leaf, do_internal, spp)
                new_sps.append(jnp.where(live, res, jnp.int32(0)))

            return (tuple(new_sps), rounds + 1)

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


def _make_closest_kernel_v7(n8: int, n_leaves: int, block: int,
                            tmin: float, n_sub: int,
                            window: int = 8, qcap: int = 48):
    """v7: windowed leaf-queue traversal (the 'leaf-intersect phase
    batching' lever from the round-1 roadmap).

    The BF8/v6 kernels run the MXU leaf intersect inside a scalar branch —
    a vector-in-branch that forces a vector-queue sync per leaf visit.
    v7 splits each macro-iteration into:

      A. `window` traversal rounds that only PUSH leaf ids into a per-sub
         SMEM queue (pop + 8 slab tests + one packed reduce + scalar
         pushes; subs with a full queue stall);
      B. a branch-free drain: all queued leaves are intersected in a
         fori_loop with double-buffered page DMAs (issue j+1 while
         computing j) and UNCONDITIONAL vector work — lanes of exhausted
         queues are masked by a -inf t-limit select, never a branch.
         t_best tightens after every intersect (lane-major only); the
         slab-side (8,128) t mirror refreshes ONCE per drain.

    Cost model: leaf visits drop from ~(sync + VPU) to pipelined VPU;
    the t-prune feedback is delayed by up to `window` rounds + queue
    depth, which costs a few extra queued leaves on deep traversals —
    measured A/B against v6/BF8 in benches/bvh_kernels.py."""

    def kernel(ulox, uloy, uloz, uhix, uhiy, uhiz, cent, corder,
               pages_ref, rays_ref, cube_ref,
               out_ref, leaf_vmem, dma_sems, stack, queue, best_ref,
               tcube_ref, oct_ref):
        # leaf_vmem (n_sub, 2, 8, page_cols): double-buffered page slots
        # queue SMEM (n_sub * 64,): per-sub leaf-id queues
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
            nx = jnp.sum(jnp.where(dx < 0, 1, 0))
            ny = jnp.sum(jnp.where(dy < 0, 1, 0))
            nz = jnp.sum(jnp.where(dz < 0, 1, 0))
            oct_ref[s] = (jnp.where(nx > 512, 4, 0)
                          + jnp.where(ny > 512, 2, 0)
                          + jnp.where(nz > 512, 1, 0))

        def lane_to_cube(x):
            return jnp.concatenate(
                [x[:, i * 128:(i + 1) * 128] for i in range(8)], axis=0)

        def slab_row(k, s, t_cube):
            ox, oy, oz, ix, iy, iz = sub_rays[s]
            return _slab_t(ulox[k], uloy[k], uloz[k],
                           uhix[k], uhiy[k], uhiz[k],
                           ox, oy, oz, ix, iy, iz, t_cube)

        def traverse_round(sps, qls):
            """One lockstep traversal round over all subs (phase A body).
            Leaf pops append to the queue; internal pops push children."""
            popped = []
            for s in range(n_sub):
                # stall when the queue is (nearly) full: popping a leaf
                # must always have queue space
                can = (sps[s] > 0) & (qls[s] < qcap)
                spp = jnp.maximum(sps[s] - 1, 0)
                ent = stack[s * 128 + spp]
                is_leaf = can & (ent >= LEAF_BIT)
                lid = jnp.clip(ent - LEAF_BIT, 0, n_leaves - 1)
                node8 = jnp.clip(ent, 0, n8 - 1)
                base_row = jnp.where(is_leaf, n8 * 8 + lid, node8 * 8)
                child_step = jnp.where(is_leaf, 0, 1)
                popped.append((spp, is_leaf, lid, node8, base_row,
                               child_step, can))

            flags = []
            for s in range(n_sub):
                _, _, _, _, base_row, child_step, _ = popped[s]
                t_cube = tcube_ref[s * 8:(s + 1) * 8, :]
                pack = None
                for c in range(8):
                    h, _ = slab_row(base_row + c * child_step, s, t_cube)
                    b = jnp.max(jnp.where(h, 1, 0), axis=1, keepdims=True)
                    term = b << (4 * c)
                    pack = term if pack is None else pack + term
                flags.append(jnp.sum(pack))

            new_sps, new_qls = [], []
            for s in range(n_sub):
                spp, is_leaf, lid, node8, _, _, can = popped[s]
                fl = flags[s]
                base = s * 128

                def do_leaf(args, s=s, lid=lid, fl=fl):
                    q, ql = args
                    queue[s * 64 + jnp.minimum(ql, 63)] = lid
                    return q, ql + jnp.where((fl & 0xF) > 0, 1, 0)

                def do_internal(args, s=s, base=base, node8=node8, fl=fl):
                    q, ql = args
                    perm = corder[node8 * 8 + oct_ref[s]]
                    for j in range(8):
                        c = (perm >> (3 * j)) & 7
                        cnt = (fl >> (4 * c)) & 0xF
                        stack[base + jnp.minimum(q, 126)] = \
                            cent[node8 * 8 + c]
                        q = q + jnp.where(cnt > 0, 1, 0)
                    return jnp.minimum(q, 126), ql

                def active(args, is_leaf=is_leaf, do_leaf=do_leaf,
                           do_internal=do_internal):
                    return jax.lax.cond(is_leaf, do_leaf, do_internal, args)

                # stalled/dead subs must not touch their stack or queue
                # (their pop is replayed next round)
                res = jax.lax.cond(can, active, lambda a: a,
                                   (spp, qls[s]))
                new_sps.append(jnp.where(can, res[0], sps[s]))
                new_qls.append(jnp.where(can, res[1], qls[s]))
            return tuple(new_sps), tuple(new_qls)

        def drain(qls):
            """Phase B: branch-free pipelined intersect of all queues."""
            def start_dma(s, j, ql, slot):
                # clamp: queues shorter than max_q re-fetch their last
                # entry; empty queues may read uninitialized SMEM, so the
                # lid itself is clamped to a valid page
                lid = queue[s * 64 + jnp.minimum(j, jnp.maximum(ql - 1, 0))]
                lid = jnp.clip(lid, 0, n_leaves - 1)
                pltpu.make_async_copy(pages_ref.at[lid],
                                      leaf_vmem.at[s, slot],
                                      dma_sems.at[s, slot]).start()

            max_q = qls[0]
            for s in range(1, n_sub):
                max_q = jnp.maximum(max_q, qls[s])

            def warm(_):
                for s in range(n_sub):
                    start_dma(s, jnp.int32(0), qls[s], jnp.int32(0))
                return jnp.int32(0)
            jax.lax.cond(max_q > 0, warm, lambda q: q, jnp.int32(0))

            def body(j, _):
                slot = j % 2
                nxt = (j + 1) % 2

                def prefetch(q):
                    for s in range(n_sub):
                        start_dma(s, j + 1, qls[s], nxt)
                    return q
                jax.lax.cond(j + 1 < max_q, prefetch, lambda q: q,
                             jnp.int32(0))

                for s in range(n_sub):
                    lanes = slice(s * 1024, (s + 1) * 1024)
                    brow = s * 4
                    # wait amount is the (constant) page size; index 0
                    # keeps the descriptor shape identical to the start
                    pltpu.make_async_copy(
                        pages_ref.at[jnp.int32(0)],
                        leaf_vmem.at[s, slot],
                        dma_sems.at[s, slot]).wait()
                    live = j < qls[s]
                    t_lane = best_ref[brow:brow + 1, :]
                    # masked t-limit: exhausted queues intersect against
                    # -inf and can never improve (no branch)
                    t_lim = jnp.where(live, t_lane,
                                      jnp.full((1, 1024), -jnp.inf))
                    t_cand, u_c, v_c, ids = _leaf_intersect(
                        leaf_vmem[s, slot], rays_mat[:, lanes], tmin,
                        t_lim, block)
                    t_min, better, sel_id, sel_u, sel_v = \
                        _select_best_hit(t_cand, u_c, v_c, ids, t_lim)
                    sel_bits = jax.lax.bitcast_convert_type(sel_id,
                                                            jnp.float32)
                    best_ref[brow:brow + 1, :] = jnp.where(
                        better, t_min, t_lane)
                    best_ref[brow + 1:brow + 2, :] = jnp.where(
                        better, sel_bits, best_ref[brow + 1:brow + 2, :])
                    best_ref[brow + 2:brow + 3, :] = jnp.where(
                        better, sel_u, best_ref[brow + 2:brow + 3, :])
                    best_ref[brow + 3:brow + 4, :] = jnp.where(
                        better, sel_v, best_ref[brow + 3:brow + 4, :])
                return jnp.int32(0)

            jax.lax.fori_loop(0, max_q, body, jnp.int32(0))
            # refresh the slab-side t mirror once per drain
            for s in range(n_sub):
                tcube_ref[s * 8:(s + 1) * 8, :] = lane_to_cube(
                    best_ref[s * 4:s * 4 + 1, :])

        def cond(state):
            sps, rounds = state
            total = sps[0]
            for s in range(1, n_sub):
                total = total + sps[s]
            return total > 0

        def macro(state):
            sps, rounds = state
            qls = tuple(jnp.int32(0) for _ in range(n_sub))
            for _ in range(window):
                sps, qls = traverse_round(sps, qls)
            any_q = qls[0]
            for s in range(1, n_sub):
                any_q = any_q + qls[s]
            jax.lax.cond(any_q > 0, lambda q: (drain(qls), q)[1],
                         lambda q: q, jnp.int32(0))
            return sps, rounds + window

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
        init = (tuple(jnp.int32(1) for _ in range(n_sub)), jnp.int32(0))
        _, rounds = jax.lax.while_loop(cond, macro, init)
        cat = lambda i: jnp.concatenate(
            [best_ref[s * 4 + i:s * 4 + i + 1, :] for s in range(n_sub)],
            axis=1)
        width = n_sub * 1024
        out_ref[:] = jnp.concatenate(
            [cat(0), cat(1), cat(2), cat(3),
             jnp.full((1, width), rounds, jnp.float32),
             jnp.zeros((3, width), jnp.float32)], axis=0)

    return kernel


def _make_occluded_kernel_v6(n8: int, n_leaves: int, block: int,
                             tmin: float, n_sub: int):
    """v6 occlusion: unified table + TWO reduces per sub-round (packed
    child flags, unoccluded-lane count for the all-occluded early exit);
    no ordering (occlusion is order-independent, children push unsorted)."""

    def kernel(ulox, uloy, uloz, uhix, uhiy, uhiz, cent,
               pages_ref, rays_ref, cube_ref,
               out_ref, leaf_vmem, dma_sems, stack, occ_ref, occub_ref):
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

        def slab_row(k, s):
            ox, oy, oz, ix, iy, iz, dist = sub_rays[s]
            occ_c = occub_ref[s * 8:(s + 1) * 8, :]
            h, _ = _slab_t(ulox[k], uloy[k], uloz[k],
                           uhix[k], uhiy[k], uhiz[k],
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
                base_row = jnp.where(is_leaf, n8 * 8 + lid, node8 * 8)
                child_step = jnp.where(is_leaf, 0, 1)
                popped.append((spp, is_leaf, lid, node8, base_row,
                               child_step, live))

                def start_dma(q, s=s, lid=lid):
                    pltpu.make_async_copy(pages_ref.at[lid],
                                          leaf_vmem.at[s],
                                          dma_sems.at[s]).start()
                    return q
                jax.lax.cond(is_leaf, start_dma, lambda q: q, jnp.int32(0))

            flags = []
            for s in range(n_sub):
                _, _, _, _, base_row, child_step, _ = popped[s]
                pack = None
                for c in range(8):
                    h = slab_row(base_row + c * child_step, s)
                    b = jnp.max(jnp.where(h, 1, 0), axis=1, keepdims=True)
                    term = b << (4 * c)
                    pack = term if pack is None else pack + term
                occ_c = occub_ref[s * 8:(s + 1) * 8, :]
                flags.append((jnp.sum(pack),
                              jnp.sum(jnp.where(occ_c == 0, 1, 0))))

            new_sps = []
            for s in range(n_sub):
                spp, is_leaf, lid, node8, _, _, live = popped[s]
                fl, unocc = flags[s]
                base = s * 128
                lanes = slice(s * 1024, (s + 1) * 1024)

                def do_leaf(q, s=s, lid=lid, lanes=lanes, fl=fl):
                    pltpu.make_async_copy(pages_ref.at[lid],
                                          leaf_vmem.at[s],
                                          dma_sems.at[s]).wait()

                    def intersect(q, s=s, lanes=lanes):
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
                    return jax.lax.cond((fl & 0xF) > 0, intersect,
                                        lambda q: q, q)

                def do_internal(q, s=s, base=base, node8=node8, fl=fl):
                    for c in range(8):
                        cnt = (fl >> (4 * c)) & 0xF
                        stack[base + jnp.minimum(q, 126)] = \
                            cent[node8 * 8 + c]
                        q = q + jnp.where(cnt > 0, 1, 0)
                    return jnp.minimum(q, 126)

                res = jax.lax.cond(is_leaf, do_leaf, do_internal, spp)
                res = jnp.where(unocc == 0, jnp.int32(0), res)
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


def _make_closest_kernel(n_top: int, block: int, tmin: float):
    def kernel(lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
               miss_ref, leaf_ref, pages_ref, rays_ref,
               out_ref, leaf_vmem, dma_sem):
        rays_mat = rays_ref[:]                            # (8, 1024)
        # rows: ox,oy,oz,1,dx,dy,dz,tmax (row 7 multiplies zero operands)
        ox, oy, oz = rays_mat[0:1], rays_mat[1:2], rays_mat[2:3]
        dx, dy, dz = rays_mat[4:5], rays_mat[5:6], rays_mat[6:7]
        tmax = rays_mat[7:8]

        def safe_inv(a):
            return 1.0 / jnp.where(jnp.abs(a) < 1e-12,
                                   jnp.where(a < 0, -1e-12, 1e-12), a)
        ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

        def cond(s):
            return s[0] < n_top

        def body(s):
            cursor, t_best, tri_best, u_best, v_best = s
            hit = _slab(lox_ref[cursor], loy_ref[cursor], loz_ref[cursor],
                        hix_ref[cursor], hiy_ref[cursor], hiz_ref[cursor],
                        ox, oy, oz, ix, iy, iz, t_best)
            miss = miss_ref[cursor]
            leaf = leaf_ref[cursor]
            any_hit = jnp.max(jnp.where(hit, 1, 0)) > 0
            is_leaf = leaf >= 0

            def do_leaf(args):
                t_best, tri_best, u_best, v_best = args
                dma = pltpu.make_async_copy(
                    pages_ref.at[leaf], leaf_vmem, dma_sem)
                dma.start()
                dma.wait()
                t_cand, u_c, v_c, ids = _leaf_intersect(
                    leaf_vmem[:, :], rays_mat, tmin, t_best, block)
                t_min, better, sel_id, sel_u, sel_v = \
                    _select_best_hit(t_cand, u_c, v_c, ids, t_best)
                return (jnp.where(better, t_min, t_best),
                        jnp.where(better, sel_id, tri_best),
                        jnp.where(better, sel_u, u_best),
                        jnp.where(better, sel_v, v_best))

            t_best, tri_best, u_best, v_best = jax.lax.cond(
                any_hit & is_leaf, do_leaf, lambda a: a,
                (t_best, tri_best, u_best, v_best))

            descend = any_hit & jnp.logical_not(is_leaf)
            cursor = jnp.where(descend, cursor + 1, miss)
            return cursor, t_best, tri_best, u_best, v_best

        init = (jnp.int32(0), tmax,
                jnp.full((1, 1024), -1, jnp.int32),
                jnp.zeros((1, 1024), jnp.float32),
                jnp.zeros((1, 1024), jnp.float32))
        _, t, tri, u, v = jax.lax.while_loop(cond, body, init)
        # packed output rows: t | tri bits | u | v | pad
        out_ref[:] = jnp.concatenate(
            [t, jax.lax.bitcast_convert_type(tri, jnp.float32), u, v,
             jnp.zeros((4, 1024), jnp.float32)], axis=0)

    return kernel


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


def _make_closest_kernel_ordered(n_top: int, block: int, tmin: float):
    """Ordered (near-child-first) stack traversal: children are tested on
    push and visited nearest-first by packet majority vote, and every pop
    re-tests against the tightened t_best — substantially stronger pruning
    than the threaded preorder walk. Stack lives in SMEM scratch (scalar
    memory, the TPU-native place for control state)."""

    def kernel(lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
               miss_ref, leaf_ref, pages_ref, rays_ref,
               out_ref, leaf_vmem, dma_sem, stack):
        rays_mat = rays_ref[:]
        ox, oy, oz = rays_mat[0:1], rays_mat[1:2], rays_mat[2:3]
        dx, dy, dz = rays_mat[4:5], rays_mat[5:6], rays_mat[6:7]
        tmax = rays_mat[7:8]

        def safe_inv(a):
            return 1.0 / jnp.where(jnp.abs(a) < 1e-12,
                                   jnp.where(a < 0, -1e-12, 1e-12), a)
        ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

        def slab(c, t_limit):
            return _slab_t(lox_ref[c], loy_ref[c], loz_ref[c],
                           hix_ref[c], hiy_ref[c], hiz_ref[c],
                           ox, oy, oz, ix, iy, iz, t_limit)

        def cond(s):
            return s[0] > 0

        def body(s):
            sp, t_best, tri_best, u_best, v_best = s
            sp = sp - 1
            node = stack[sp]
            hit, _ = slab(node, t_best)          # pop retest: prune by
            any_hit = jnp.max(jnp.where(hit, 1, 0)) > 0   # tightened t_best
            leaf = leaf_ref[node]
            is_leaf = leaf >= 0

            def do_leaf(args):
                sp, t_best, tri_best, u_best, v_best = args
                dma = pltpu.make_async_copy(
                    pages_ref.at[leaf], leaf_vmem, dma_sem)
                dma.start()
                dma.wait()
                t_cand, u_c, v_c, ids = _leaf_intersect(
                    leaf_vmem[:, :], rays_mat, tmin, t_best, block)
                t_min, better, sel_id, sel_u, sel_v = \
                    _select_best_hit(t_cand, u_c, v_c, ids, t_best)
                return (sp,
                        jnp.where(better, t_min, t_best),
                        jnp.where(better, sel_id, tri_best),
                        jnp.where(better, sel_u, u_best),
                        jnp.where(better, sel_v, v_best))

            def do_internal(args):
                sp, t_best, tri_best, u_best, v_best = args
                left = node + 1
                right = miss_ref[left]           # == left's subtree end
                hit_l, tn_l = slab(left, t_best)
                hit_r, tn_r = slab(right, t_best)
                any_l = jnp.max(jnp.where(hit_l, 1, 0)) > 0
                any_r = jnp.max(jnp.where(hit_r, 1, 0)) > 0
                both = hit_l & hit_r
                votes_l = jnp.sum(jnp.where(both & (tn_l <= tn_r), 1, 0))
                votes = jnp.sum(jnp.where(both, 1, 0))
                near_is_left = jnp.where(votes > 0, 2 * votes_l >= votes,
                                         True)
                far_idx = jnp.where(near_is_left, right, left)
                near_idx = jnp.where(near_is_left, left, right)
                far_ok = jnp.where(near_is_left, any_r, any_l)
                near_ok = jnp.where(near_is_left, any_l, any_r)
                # push far first so near pops first; unconditional stores
                # beyond the live top are harmless
                stack[sp] = far_idx
                sp = sp + jnp.where(far_ok, 1, 0)
                stack[sp] = near_idx
                sp = sp + jnp.where(near_ok, 1, 0)
                return sp, t_best, tri_best, u_best, v_best

            def skip(args):
                return args

            args = (sp, t_best, tri_best, u_best, v_best)
            args = jax.lax.cond(
                any_hit,
                lambda a: jax.lax.cond(is_leaf, do_leaf, do_internal, a),
                skip, args)
            return args

        stack[0] = jnp.int32(0)
        init = (jnp.int32(1), tmax,
                jnp.full((1, 1024), -1, jnp.int32),
                jnp.zeros((1, 1024), jnp.float32),
                jnp.zeros((1, 1024), jnp.float32))
        _, t, tri, u, v = jax.lax.while_loop(cond, body, init)
        out_ref[:] = jnp.concatenate(
            [t, jax.lax.bitcast_convert_type(tri, jnp.float32), u, v,
             jnp.zeros((4, 1024), jnp.float32)], axis=0)

    return kernel


def _make_closest_kernel_subpacket(n_top: int, block: int, tmin: float):
    """Sub-packet ordered traversal: the 1024-ray program is split into 8
    independent 128-ray sub-packets (lane slices), each with its own SMEM
    stack and cursor. Diffuse-bounce rays fan over the hemisphere, so a
    1024-wide packet visits near the union of all leaves; after the
    integrator's octant+Morton sort, 128 consecutive rays form a much
    narrower cone — sub-packets turn that sorting into traversal savings.
    Sub-packets step in lockstep rounds; finished ones idle."""

    SUB = 8
    LANES = 1024 // SUB

    def kernel(lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
               miss_ref, leaf_ref, pages_ref, rays_ref,
               out_ref, leaf_vmem, dma_sem, stack):
        rays_mat = rays_ref[:]
        ox, oy, oz = rays_mat[0:1], rays_mat[1:2], rays_mat[2:3]
        dx, dy, dz = rays_mat[4:5], rays_mat[5:6], rays_mat[6:7]
        tmax = rays_mat[7:8]

        def safe_inv(a):
            return 1.0 / jnp.where(jnp.abs(a) < 1e-12,
                                   jnp.where(a < 0, -1e-12, 1e-12), a)
        ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

        def slab_sub(c, p, t_limit_s):
            s = slice(p * LANES, (p + 1) * LANES)
            t0x = (lox_ref[c] - ox[:, s]) * ix[:, s]
            t1x = (hix_ref[c] - ox[:, s]) * ix[:, s]
            t0y = (loy_ref[c] - oy[:, s]) * iy[:, s]
            t1y = (hiy_ref[c] - oy[:, s]) * iy[:, s]
            t0z = (loz_ref[c] - oz[:, s]) * iz[:, s]
            t1z = (hiz_ref[c] - oz[:, s]) * iz[:, s]
            tnear = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                            jnp.minimum(t0y, t1y)),
                                jnp.minimum(t0z, t1z))
            tfar = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                           jnp.maximum(t0y, t1y)),
                               jnp.maximum(t0z, t1z))
            hit = (tnear <= tfar) & (tfar > 0.0) & (tnear < t_limit_s)
            return hit, tnear

        def make_step(p):
            s = slice(p * LANES, (p + 1) * LANES)
            base = p * 64                       # stack segment for p

            def step(args):
                sp, t_best, tri_best, u_best, v_best = args
                sp = sp - 1
                node = stack[base + sp]
                t_b = t_best[:, s]
                hit, _ = slab_sub(node, p, t_b)
                any_hit = jnp.max(jnp.where(hit, 1, 0)) > 0
                leaf = leaf_ref[node]
                is_leaf = leaf >= 0

                def do_leaf(args):
                    sp, t_best, tri_best, u_best, v_best = args
                    dma = pltpu.make_async_copy(
                        pages_ref.at[leaf], leaf_vmem, dma_sem)
                    dma.start()
                    dma.wait()
                    t_cand, u_c, v_c, ids = _leaf_intersect(
                        leaf_vmem[:, :], rays_mat[:, s], tmin, t_best[:, s], block)
                    t_min, better, sel_id, sel_u, sel_v = \
                        _select_best_hit(t_cand, u_c, v_c, ids, t_best[:, s])
                    def upd(full, new):
                        # static-offset splice (Mosaic has no
                        # dynamic_update_slice; offsets are lane-tile
                        # aligned multiples of 128)
                        parts = ([full[:, : p * LANES]] if p else []) \
                            + [new] \
                            + ([full[:, (p + 1) * LANES:]]
                               if p < SUB - 1 else [])
                        return jnp.concatenate(parts, axis=1) \
                            if len(parts) > 1 else new
                    return (sp,
                            upd(t_best, jnp.where(better, t_min, t_best[:, s])),
                            upd(tri_best, jnp.where(better, sel_id,
                                                    tri_best[:, s])),
                            upd(u_best, jnp.where(better, sel_u,
                                                  u_best[:, s])),
                            upd(v_best, jnp.where(better, sel_v,
                                                  v_best[:, s])))

                def do_internal(args):
                    sp, t_best, tri_best, u_best, v_best = args
                    left = node + 1
                    right = miss_ref[left]
                    hit_l, tn_l = slab_sub(left, p, t_best[:, s])
                    hit_r, tn_r = slab_sub(right, p, t_best[:, s])
                    any_l = jnp.max(jnp.where(hit_l, 1, 0)) > 0
                    any_r = jnp.max(jnp.where(hit_r, 1, 0)) > 0
                    both = hit_l & hit_r
                    votes_l = jnp.sum(jnp.where(both & (tn_l <= tn_r), 1, 0))
                    votes = jnp.sum(jnp.where(both, 1, 0))
                    near_is_left = jnp.where(votes > 0,
                                             2 * votes_l >= votes, True)
                    far_idx = jnp.where(near_is_left, right, left)
                    near_idx = jnp.where(near_is_left, left, right)
                    far_ok = jnp.where(near_is_left, any_r, any_l)
                    near_ok = jnp.where(near_is_left, any_l, any_r)
                    stack[base + sp] = far_idx
                    sp = sp + jnp.where(far_ok, 1, 0)
                    stack[base + sp] = near_idx
                    sp = sp + jnp.where(near_ok, 1, 0)
                    return sp, t_best, tri_best, u_best, v_best

                args = (sp, t_best, tri_best, u_best, v_best)
                return jax.lax.cond(
                    any_hit,
                    lambda a: jax.lax.cond(is_leaf, do_leaf, do_internal, a),
                    lambda a: a, args)

            return step

        steps = [make_step(p) for p in range(SUB)]

        def cond(state):
            sps = state[0]
            total = sps[0]
            for p in range(1, SUB):
                total = total + sps[p]
            return total > 0

        def body(state):
            sps, t_best, tri_best, u_best, v_best, rounds = state
            new_sps = []
            for p in range(SUB):
                args = (sps[p], t_best, tri_best, u_best, v_best)
                args = jax.lax.cond(sps[p] > 0, steps[p], lambda a: a, args)
                sp_p, t_best, tri_best, u_best, v_best = args
                new_sps.append(sp_p)
            return (tuple(new_sps), t_best, tri_best, u_best, v_best,
                    rounds + 1)

        for p in range(SUB):
            stack[p * 64] = jnp.int32(0)
        init = (tuple(jnp.int32(1) for _ in range(SUB)),
                tmax,
                jnp.full((1, 1024), -1, jnp.int32),
                jnp.zeros((1, 1024), jnp.float32),
                jnp.zeros((1, 1024), jnp.float32),
                jnp.int32(0))
        _, t, tri, u, v, rounds = jax.lax.while_loop(cond, body, init)
        # row 4 carries the lockstep round count (diagnostic; wrapper
        # ignores rows 4-7)
        out_ref[:] = jnp.concatenate(
            [t, jax.lax.bitcast_convert_type(tri, jnp.float32), u, v,
             jnp.full((1, 1024), rounds, jnp.float32),
             jnp.zeros((3, 1024), jnp.float32)], axis=0)

    return kernel


def _make_closest_kernel_v3(n_top: int, block: int, tmin: float,
                            n_sub: int):
    """Full-vreg sub-packet traversal (v3, the production closest-hit).

    The v2 sub-packet kernel held each ray quantity as a (1, 128) slice —
    one sublane of an (8, 128) vreg, wasting 7/8 of the VPU — and its
    per-round cond/reduce scalar-vector sync dominated (measured 4.5 us
    per lockstep round vs ~1 us of vector work). v3 instead makes each
    sub-packet 1024 rays held as FULL (8, 128) vregs: 8x the rays per
    vector op and per round, so the fixed round overhead (branches,
    cross-core reductions, DMA issue) amortizes over 8x more work.
    `n_sub` sub-packets (each with its own SMEM stack and ordered
    near-child-first descent) run per program in lockstep rounds.

    Ray data arrives in two layouts: `rays_ref` (8, n_sub*1024) lane-major
    for the MXU leaf matmul, and `cube_ref` (n_sub*8, 8, 128) with each
    component pre-reshaped to vreg form for slab tests. Best-hit state is
    kept lane-major (matmul side); only its (8, 128) mirror used as the
    slab t-limit is re-laid out, and only on leaf improvements."""

    def kernel(lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
               miss_ref, leaf_ref, pages_ref, rays_ref, cube_ref,
               out_ref, leaf_vmem, dma_sem, stack, best_ref, tcube_ref):
        # best_ref (n_sub*4, 1024): rows s*4+{0..3} = t, tri(bits), u, v of
        # sub s. tcube_ref (n_sub*8, 128): (8,128) t-limit mirror of sub s.
        # All best-hit state lives in VMEM scratch mutated in place — the
        # while loop carries only scalars, so cond branches stay cheap
        # (an earlier draft carried 5 arrays per sub and ran 2.7x SLOWER
        # than v2 from re-materializing them every round).
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

        def make_step(s):
            lanes = slice(s * 1024, (s + 1) * 1024)
            base = s * 64                        # stack segment for s
            brow = s * 4

            def step(sp):
                sp = sp - 1
                node = stack[base + sp]
                t_cube = tcube_ref[s * 8:(s + 1) * 8, :]
                hit, _ = slab_sub(node, s, t_cube)   # pop retest
                any_hit = jnp.max(jnp.where(hit, 1, 0)) > 0
                leaf = leaf_ref[node]
                is_leaf = leaf >= 0

                def do_leaf(sp):
                    dma = pltpu.make_async_copy(
                        pages_ref.at[leaf], leaf_vmem, dma_sem)
                    dma.start()
                    dma.wait()
                    t_lane = best_ref[brow:brow + 1, :]
                    t_cand, u_c, v_c, ids = _leaf_intersect(
                        leaf_vmem[:, :], rays_mat[:, lanes], tmin, t_lane, block)
                    t_min, better, sel_id, sel_u, sel_v = \
                        _select_best_hit(t_cand, u_c, v_c, ids, t_lane)
                    t_new = jnp.where(better, t_min, t_lane)
                    tri_lane = best_ref[brow + 1:brow + 2, :]
                    u_lane = best_ref[brow + 2:brow + 3, :]
                    v_lane = best_ref[brow + 3:brow + 4, :]
                    sel_bits = jax.lax.bitcast_convert_type(sel_id,
                                                            jnp.float32)
                    best_ref[brow:brow + 1, :] = t_new
                    best_ref[brow + 1:brow + 2, :] = jnp.where(
                        better, sel_bits, tri_lane)
                    best_ref[brow + 2:brow + 3, :] = jnp.where(
                        better, sel_u, u_lane)
                    best_ref[brow + 3:brow + 4, :] = jnp.where(
                        better, sel_v, v_lane)
                    tcube_ref[s * 8:(s + 1) * 8, :] = lane_to_cube(t_new)
                    return sp

                def do_internal(sp):
                    left = node + 1
                    right = miss_ref[left]
                    hit_l, tn_l = slab_sub(left, s, t_cube)
                    hit_r, tn_r = slab_sub(right, s, t_cube)
                    any_l = jnp.max(jnp.where(hit_l, 1, 0)) > 0
                    any_r = jnp.max(jnp.where(hit_r, 1, 0)) > 0
                    both = hit_l & hit_r
                    votes_l = jnp.sum(jnp.where(both & (tn_l <= tn_r), 1, 0))
                    votes = jnp.sum(jnp.where(both, 1, 0))
                    near_is_left = jnp.where(votes > 0,
                                             2 * votes_l >= votes, True)
                    far_idx = jnp.where(near_is_left, right, left)
                    near_idx = jnp.where(near_is_left, left, right)
                    far_ok = jnp.where(near_is_left, any_r, any_l)
                    near_ok = jnp.where(near_is_left, any_l, any_r)
                    stack[base + sp] = far_idx
                    sp = sp + jnp.where(far_ok, 1, 0)
                    stack[base + sp] = near_idx
                    sp = sp + jnp.where(near_ok, 1, 0)
                    return sp

                return jax.lax.cond(
                    any_hit,
                    lambda q: jax.lax.cond(is_leaf, do_leaf, do_internal, q),
                    lambda q: q, sp)

            return step

        steps = [make_step(s) for s in range(n_sub)]

        def cond(state):
            sps = state[0]
            total = sps[0]
            for s in range(1, n_sub):
                total = total + sps[s]
            return total > 0

        def body(state):
            sps, rounds = state
            new_sps = tuple(
                jax.lax.cond(sps[s] > 0, steps[s], lambda q: q, sps[s])
                for s in range(n_sub))
            return (new_sps, rounds + 1)

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


def _make_closest_kernel_bf8w(n8: int, n_leaves: int, block: int,
                              tmin: float, n_sub: int, r_sub: int,
                              leaf_retest: bool = True):
    """BF8 phase-split traversal with WIDE subs: each of the `n_sub`
    walkers owns r_sub*1024 rays (r_sub full (8,128) vreg groups per
    quantity) instead of 1024.

    Rationale (docs/perf_budget.md §2/§12): the leaf-visit union of a
    cone grows ~3x per 8x rays, so ONE 8192-ray walker performs ~3x a
    single 1024-ray sub's node visits where eight 1024-ray walkers
    perform 8x (bounded by the max/laggard sub, skew 1.9x) — while the
    per-round VECTOR volume is identical (n_sub*r_sub*8 box-vreg slab
    tests either way) and everything else shrinks by the merge factor:
    scalar pop/sort/push phases, DMA conditionals, and — because the
    r_sub per-group slab results fold elementwise in vector-land before
    ONE masked min-reduce per child — the scalar<->vector reduce syncs
    (9 per walker per round, the v4 note's ~2.5 us round-trip cost).
    Whether the union growth or the round-cost shrink wins is workload-
    dependent; both directions are measured in benches/widesub_ab.py.

    Layouts are exactly _make_closest_kernel_bf8's with sub s owning
    cube groups s*r_sub..s*r_sub+r_sub-1 and lane slice
    [s*W, (s+1)*W), W = r_sub*1024."""
    W = r_sub * RAYS_PER_PACKET

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
        rays_mat = rays_ref[:]                   # (8, n_sub*W)

        def safe_inv(a):
            return 1.0 / jnp.where(jnp.abs(a) < 1e-12,
                                   jnp.where(a < 0, -1e-12, 1e-12), a)

        sub_rays = []                            # [s][g] ray components
        for s in range(n_sub):
            groups = []
            for g in range(r_sub):
                q = (s * r_sub + g) * 8
                ox = cube_ref[q + 0]
                oy = cube_ref[q + 1]
                oz = cube_ref[q + 2]
                dx = cube_ref[q + 4]
                dy = cube_ref[q + 5]
                dz = cube_ref[q + 6]
                groups.append((ox, oy, oz,
                               safe_inv(dx), safe_inv(dy), safe_inv(dz)))
            sub_rays.append(groups)

        def lane_to_cube_g(x, g):                # (1, W) group g -> (8,128)
            seg = x[:, g * 1024:(g + 1) * 1024]
            return jnp.concatenate(
                [seg[:, i * 128:(i + 1) * 128] for i in range(8)], axis=0)

        def slab_wide(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z, s):
            """Masked tnear over ALL of sub s's groups, folded elementwise
            to ONE (8, 128) array so the caller pays a single scalar
            reduce (inf where no hit)."""
            tn_comb = None
            for g in range(r_sub):
                ox, oy, oz, ix, iy, iz = sub_rays[s][g]
                t_cube = tcube_ref[(s * r_sub + g) * 8:
                                   (s * r_sub + g + 1) * 8, :]
                h, tn = _slab_t(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z,
                                ox, oy, oz, ix, iy, iz, t_cube)
                v = jnp.where(h, jnp.maximum(tn, 0.0), jnp.inf)
                tn_comb = v if tn_comb is None else jnp.minimum(tn_comb, v)
            return tn_comb

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

            # phase 1: unconditional vector tests (one scalar reduce per
            # child / leaf retest, over the group-folded arrays)
            results = []
            for s in range(n_sub):
                _, _, _, lid, node8, _ = popped[s]
                tmins = []
                for c in range(8):
                    k = node8 * 8 + c
                    tn = slab_wide(clox[k], cloy[k], cloz[k],
                                   chix[k], chiy[k], chiz[k], s)
                    tmins.append(jnp.min(tn))
                if leaf_retest:
                    ln = slab_wide(llox[lid], lloy[lid], lloz[lid],
                                   lhix[lid], lhiy[lid], lhiz[lid], s)
                    leaf_any = jnp.sum(jnp.where(ln < jnp.inf, 1, 0))
                else:
                    leaf_any = jnp.int32(1)
                results.append((tmins, leaf_any))

            # phase 2: scalar sort/push or leaf intersect
            new_sps = []
            for s in range(n_sub):
                spp, ent, is_leaf, lid, node8, live = popped[s]
                tmins, leaf_any = results[s]
                base = s * 128
                lanes = slice(s * W, (s + 1) * W)
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
                        for g in range(r_sub):
                            tcube_ref[(s * r_sub + g) * 8:
                                      (s * r_sub + g + 1) * 8, :] = \
                                lane_to_cube_g(t_new, g)
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
            jnp.full((1, W), -1, jnp.int32), jnp.float32)
        for s in range(n_sub):
            stack[s * 128] = jnp.int32(0)
            t0 = rays_mat[7:8, s * W:(s + 1) * W]
            best_ref[s * 4:s * 4 + 1, :] = t0
            best_ref[s * 4 + 1:s * 4 + 2, :] = minus1
            best_ref[s * 4 + 2:s * 4 + 3, :] = jnp.zeros((1, W),
                                                         jnp.float32)
            best_ref[s * 4 + 3:s * 4 + 4, :] = jnp.zeros((1, W),
                                                         jnp.float32)
            for g in range(r_sub):
                tcube_ref[(s * r_sub + g) * 8:
                          (s * r_sub + g + 1) * 8, :] = \
                    cube_ref[(s * r_sub + g) * 8 + 7]
        init = (tuple(jnp.int32(1) for _ in range(n_sub)), jnp.int32(0),
                tuple(jnp.int32(0) for _ in range(n_sub)))
        _, rounds, done_at = jax.lax.while_loop(cond, body, init)
        cat = lambda i: jnp.concatenate(
            [best_ref[s * 4 + i:s * 4 + i + 1, :] for s in range(n_sub)],
            axis=1)
        width = n_sub * W
        done_row = jnp.concatenate(
            [jnp.full((1, W), done_at[s], jnp.float32)
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


def _make_occluded_kernel(n_top: int, block: int, tmin: float):
    def kernel(lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
               miss_ref, leaf_ref, pages_ref, rays_ref,
               out_ref, leaf_vmem, dma_sem):
        rays_mat = rays_ref[:]                            # (8, 1024)
        ox, oy, oz = rays_mat[0:1], rays_mat[1:2], rays_mat[2:3]
        dx, dy, dz = rays_mat[4:5], rays_mat[5:6], rays_mat[6:7]
        dist = rays_mat[7:8]

        def safe_inv(a):
            return 1.0 / jnp.where(jnp.abs(a) < 1e-12,
                                   jnp.where(a < 0, -1e-12, 1e-12), a)
        ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

        def cond(s):
            return s[0] < n_top

        def body(s):
            # i32 occlusion mask end-to-end: i1 vectors cannot cross
            # while/cond boundaries on this Mosaic version
            cursor, occluded_i = s
            hit = _slab(lox_ref[cursor], loy_ref[cursor], loz_ref[cursor],
                        hix_ref[cursor], hiy_ref[cursor], hiz_ref[cursor],
                        ox, oy, oz, ix, iy, iz, dist) & (occluded_i == 0)
            miss = miss_ref[cursor]
            leaf = leaf_ref[cursor]
            any_hit = jnp.max(jnp.where(hit, 1, 0)) > 0
            is_leaf = leaf >= 0

            def do_leaf(occluded_i):
                dma = pltpu.make_async_copy(
                    pages_ref.at[leaf], leaf_vmem, dma_sem)
                dma.start()
                dma.wait()
                t_cand, _, _, _ = _leaf_intersect(
                    leaf_vmem[:, :], rays_mat, tmin, dist, block)
                found = jnp.max(jnp.where(t_cand < 1e30, 1, 0),
                                axis=0, keepdims=True)
                return jnp.maximum(occluded_i, found)

            occluded_i = jax.lax.cond(any_hit & is_leaf, do_leaf,
                                      lambda o: o, occluded_i)
            all_occ = jnp.min(occluded_i) > 0
            descend = any_hit & jnp.logical_not(is_leaf)
            cursor = jnp.where(all_occ, n_top,
                               jnp.where(descend, cursor + 1, miss))
            return cursor, occluded_i

        init = (jnp.int32(0), jnp.zeros((1, 1024), jnp.int32))
        _, occluded_i = jax.lax.while_loop(cond, body, init)
        out_ref[:] = jnp.concatenate(
            [occluded_i, jnp.zeros((7, 1024), jnp.int32)], axis=0)

    return kernel


def _make_occluded_kernel_subpacket(n_top: int, block: int, tmin: float):
    """Sub-packet occlusion: 8 independent 128-lane sub-packets walk the
    threaded preorder with their own cursors. Finer-grained than the
    monolithic kernel on both axes: a sub-packet only visits nodes its own
    narrow cone touches, and it early-exits the moment its 128 lanes are
    all occluded (vs all 1024)."""
    SUB = 8
    LANES = 1024 // SUB

    def kernel(lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
               miss_ref, leaf_ref, pages_ref, rays_ref,
               out_ref, leaf_vmem, dma_sem):
        rays_mat = rays_ref[:]
        ox, oy, oz = rays_mat[0:1], rays_mat[1:2], rays_mat[2:3]
        dx, dy, dz = rays_mat[4:5], rays_mat[5:6], rays_mat[6:7]
        dist = rays_mat[7:8]

        def safe_inv(a):
            return 1.0 / jnp.where(jnp.abs(a) < 1e-12,
                                   jnp.where(a < 0, -1e-12, 1e-12), a)
        ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

        def splice(full, new, p):
            parts = ([full[:, : p * LANES]] if p else []) \
                + [new] \
                + ([full[:, (p + 1) * LANES:]] if p < SUB - 1 else [])
            return jnp.concatenate(parts, axis=1) if len(parts) > 1 else new

        def make_step(p):
            s = slice(p * LANES, (p + 1) * LANES)

            def step(args):
                cursor, occ = args
                hit = _slab(lox_ref[cursor], loy_ref[cursor],
                            loz_ref[cursor], hix_ref[cursor],
                            hiy_ref[cursor], hiz_ref[cursor],
                            ox[:, s], oy[:, s], oz[:, s],
                            ix[:, s], iy[:, s], iz[:, s],
                            dist[:, s]) & (occ[:, s] == 0)
                miss = miss_ref[cursor]
                leaf = leaf_ref[cursor]
                any_hit = jnp.max(jnp.where(hit, 1, 0)) > 0
                is_leaf = leaf >= 0

                def do_leaf(occ):
                    dma = pltpu.make_async_copy(
                        pages_ref.at[leaf], leaf_vmem, dma_sem)
                    dma.start()
                    dma.wait()
                    t_cand, _, _, _ = _leaf_intersect(
                        leaf_vmem[:, :], rays_mat[:, s], tmin, dist[:, s], block)
                    found = jnp.max(jnp.where(t_cand < 1e30, 1, 0),
                                    axis=0, keepdims=True)
                    return splice(occ, jnp.maximum(occ[:, s], found), p)

                occ = jax.lax.cond(any_hit & is_leaf, do_leaf,
                                   lambda o: o, occ)
                all_occ = jnp.min(occ[:, s]) > 0
                descend = any_hit & jnp.logical_not(is_leaf)
                cursor = jnp.where(all_occ, n_top,
                                   jnp.where(descend, cursor + 1, miss))
                return cursor, occ

            return step

        steps = [make_step(p) for p in range(SUB)]

        def cond(state):
            curs = state[0]
            live = jnp.where(curs[0] < n_top, 1, 0)
            for p in range(1, SUB):
                live = live + jnp.where(curs[p] < n_top, 1, 0)
            return live > 0

        def body(state):
            curs, occ = state
            new_curs = []
            for p in range(SUB):
                args = (curs[p], occ)
                args = jax.lax.cond(curs[p] < n_top, steps[p],
                                    lambda a: a, args)
                c_p, occ = args
                new_curs.append(c_p)
            return (tuple(new_curs), occ)

        init = (tuple(jnp.int32(0) for _ in range(SUB)),
                jnp.zeros((1, 1024), jnp.int32))
        _, occluded_i = jax.lax.while_loop(cond, body, init)
        out_ref[:] = jnp.concatenate(
            [occluded_i, jnp.zeros((7, 1024), jnp.int32)], axis=0)

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
def packet_closest_v3(pbvh: PacketBVH, origins, dirs, tmax,
                      tmin=1e-5) -> Hit:
    """Closest-hit via the full-vreg sub-packet kernel (v3) — see
    _make_closest_kernel_v3."""
    n = origins.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    rays_mat, cube, p, n_sub = _pack_inputs_v3(origins, dirs, tmax, tmin, n)
    width = n_sub * RAYS_PER_PACKET

    kernel = _make_closest_kernel_v3(pbvh.n_top, pbvh.block, tmin, n_sub)
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
        scratch_shapes=[pltpu.VMEM((8, _page_cols(pbvh.block)),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
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


@functools.partial(jax.jit, static_argnames=("tmin", "r_sub"))
def packet_closest_bf8w(bvh8: BF8BVH, origins, dirs, tmax,
                        tmin=1e-5, r_sub: int = 8) -> Hit:
    """Closest-hit via the wide-sub BF8 kernel — see
    _make_closest_kernel_bf8w. `r_sub` 1024-ray vreg groups per walker
    (clipped to the dispatch's group count; r_sub=1 == packet_closest_bf8
    modulo the fold)."""
    n = origins.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    rays_mat, cube, p, n_groups = _pack_inputs_v3(origins, dirs, tmax,
                                                  tmin, n)
    r = min(r_sub, n_groups)
    while n_groups % r:
        r -= 1
    n_sub = n_groups // r
    width = n_groups * RAYS_PER_PACKET

    kernel = _make_closest_kernel_bf8w(bvh8.n8, bvh8.n_leaves, bvh8.block,
                                       tmin, n_sub, r, bvh8.leaf_retest)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    mat = pl.BlockSpec((8, width), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    cub = pl.BlockSpec((n_groups * 8, 8, 128), lambda i: (i, 0, 0),
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
                        pltpu.SMEM((n_sub * 128,), jnp.int32),
                        pltpu.VMEM((n_sub * 4, r * RAYS_PER_PACKET),
                                   jnp.float32),
                        pltpu.VMEM((n_groups * 8, 128), jnp.float32)],
    )(bvh8.c_lo[:, 0], bvh8.c_lo[:, 1], bvh8.c_lo[:, 2],
      bvh8.c_hi[:, 0], bvh8.c_hi[:, 1], bvh8.c_hi[:, 2], bvh8.c_ent,
      *((bvh8.l_lo[:, 0], bvh8.l_lo[:, 1], bvh8.l_lo[:, 2],
         bvh8.l_hi[:, 0], bvh8.l_hi[:, 1], bvh8.l_hi[:, 2])
        if bvh8.leaf_retest else ()),
      bvh8.pages, rays_mat, cube)
    out = out.reshape(p, 8, width)
    pick = lambda r_: out[:, r_, :].reshape(-1)[:n]
    return Hit(pick(0),
               _strip_alpha_bit(jax.lax.bitcast_convert_type(pick(1),
                                                             jnp.int32)),
               pick(2), pick(3))


@functools.partial(jax.jit, static_argnames=("tmin",))
def packet_closest_v6(bvh6: BF8V6, origins, dirs, tmax, tmin=1e-5) -> Hit:
    """Closest-hit via the v6 kernel — see _make_closest_kernel_v6."""
    n = origins.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    rays_mat, cube, p, n_sub = _pack_inputs_v3(origins, dirs, tmax, tmin, n)
    width = n_sub * RAYS_PER_PACKET

    kernel = _make_closest_kernel_v6(bvh6.n8, bvh6.n_leaves, bvh6.block,
                                     tmin, n_sub)
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
        scratch_shapes=[pltpu.VMEM((n_sub, 8, _page_cols(bvh6.block)),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA((n_sub,)),
                        pltpu.SMEM((1024,), jnp.int32),
                        pltpu.VMEM((n_sub * 4, 1024), jnp.float32),
                        pltpu.VMEM((n_sub * 8, 128), jnp.float32),
                        pltpu.SMEM((n_sub,), jnp.int32)],
    )(bvh6.u_lo[:, 0], bvh6.u_lo[:, 1], bvh6.u_lo[:, 2],
      bvh6.u_hi[:, 0], bvh6.u_hi[:, 1], bvh6.u_hi[:, 2],
      bvh6.c_ent, bvh6.c_order, bvh6.pages, rays_mat, cube)
    out = out.reshape(p, 8, width)
    pick = lambda r: out[:, r, :].reshape(-1)[:n]
    return Hit(pick(0),
               _strip_alpha_bit(jax.lax.bitcast_convert_type(pick(1),
                                                             jnp.int32)),
               pick(2), pick(3))


@functools.partial(jax.jit, static_argnames=("tmin",))
def packet_closest_v6k2(bvh6: BF8V6, origins, dirs, tmax, tmin=1e-5) -> Hit:
    """Closest-hit via the two-pop v6 kernel — see
    _make_closest_kernel_v6k2."""
    n = origins.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    rays_mat, cube, p, n_sub = _pack_inputs_v3(origins, dirs, tmax, tmin, n)
    width = n_sub * RAYS_PER_PACKET

    kernel = _make_closest_kernel_v6k2(bvh6.n8, bvh6.n_leaves, bvh6.block,
                                       tmin, n_sub)
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
        scratch_shapes=[pltpu.VMEM((n_sub, 2, 8, _page_cols(bvh6.block)),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA((n_sub, 2)),
                        pltpu.SMEM((1024,), jnp.int32),
                        pltpu.VMEM((n_sub * 4, 1024), jnp.float32),
                        pltpu.VMEM((n_sub * 8, 128), jnp.float32),
                        pltpu.SMEM((n_sub,), jnp.int32)],
    )(bvh6.u_lo[:, 0], bvh6.u_lo[:, 1], bvh6.u_lo[:, 2],
      bvh6.u_hi[:, 0], bvh6.u_hi[:, 1], bvh6.u_hi[:, 2],
      bvh6.c_ent, bvh6.c_order, bvh6.pages, rays_mat, cube)
    out = out.reshape(p, 8, width)
    pick = lambda r: out[:, r, :].reshape(-1)[:n]
    return Hit(pick(0),
               _strip_alpha_bit(jax.lax.bitcast_convert_type(pick(1),
                                                             jnp.int32)),
               pick(2), pick(3))


@functools.partial(jax.jit, static_argnames=("tmin", "window"))
def packet_closest_v7(bvh6: BF8V6, origins, dirs, tmax, tmin=1e-5,
                      window: int = 8) -> Hit:
    """Closest-hit via the windowed leaf-queue kernel (v7) — see
    _make_closest_kernel_v7."""
    n = origins.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    rays_mat, cube, p, n_sub = _pack_inputs_v3(origins, dirs, tmax, tmin, n)
    width = n_sub * RAYS_PER_PACKET

    kernel = _make_closest_kernel_v7(bvh6.n8, bvh6.n_leaves, bvh6.block,
                                     tmin, n_sub, window)
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
        scratch_shapes=[pltpu.VMEM((n_sub, 2, 8, _page_cols(bvh6.block)),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA((n_sub, 2)),
                        pltpu.SMEM((1024,), jnp.int32),
                        pltpu.SMEM((n_sub * 64,), jnp.int32),
                        pltpu.VMEM((n_sub * 4, 1024), jnp.float32),
                        pltpu.VMEM((n_sub * 8, 128), jnp.float32),
                        pltpu.SMEM((n_sub,), jnp.int32)],
    )(bvh6.u_lo[:, 0], bvh6.u_lo[:, 1], bvh6.u_lo[:, 2],
      bvh6.u_hi[:, 0], bvh6.u_hi[:, 1], bvh6.u_hi[:, 2],
      bvh6.c_ent, bvh6.c_order, bvh6.pages, rays_mat, cube)
    out = out.reshape(p, 8, width)
    pick = lambda r: out[:, r, :].reshape(-1)[:n]
    return Hit(pick(0),
               _strip_alpha_bit(jax.lax.bitcast_convert_type(pick(1),
                                                             jnp.int32)),
               pick(2), pick(3))


@functools.partial(jax.jit, static_argnames=("tmin",))
def packet_occluded_v6(bvh6: BF8V6, origins, dirs, dist, tmin=1e-5):
    """Occlusion via the v6 kernel — see _make_occluded_kernel_v6."""
    n = origins.shape[0]
    dist = jnp.broadcast_to(jnp.asarray(dist, jnp.float32), (n,))
    rays_mat, cube, p, n_sub = _pack_inputs_v3(origins, dirs, dist, tmin, n)
    width = n_sub * RAYS_PER_PACKET

    kernel = _make_occluded_kernel_v6(bvh6.n8, bvh6.n_leaves, bvh6.block,
                                      tmin, n_sub)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    mat = pl.BlockSpec((8, width), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    cub = pl.BlockSpec((n_sub * 8, 8, 128), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[_smem_spec()] * 7 + [hbm, mat, cub],
        out_specs=mat,
        out_shape=jax.ShapeDtypeStruct((p * 8, width), jnp.int32),
        scratch_shapes=[pltpu.VMEM((n_sub, 8, _page_cols(bvh6.block)),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA((n_sub,)),
                        pltpu.SMEM((1024,), jnp.int32),
                        pltpu.VMEM((n_sub, 1024), jnp.int32),
                        pltpu.VMEM((n_sub * 8, 128), jnp.int32)],
    )(bvh6.u_lo[:, 0], bvh6.u_lo[:, 1], bvh6.u_lo[:, 2],
      bvh6.u_hi[:, 0], bvh6.u_hi[:, 1], bvh6.u_hi[:, 2],
      bvh6.c_ent, bvh6.pages, rays_mat, cube)
    occ = occ.reshape(p, 8, width)[:, 0, :].reshape(-1)[:n]
    return occ > 0


@functools.partial(jax.jit, static_argnames=("tmin",))
def packet_closest(pbvh: PacketBVH, origins, dirs, tmax, tmin=1e-5) -> Hit:
    """Closest-hit for N rays (padded internally to the packet size)."""
    n = origins.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    rays_mat, p = _pack_inputs(origins, dirs, tmax, tmin, n)

    kernel = _make_closest_kernel_ordered(pbvh.n_top, pbvh.block, tmin)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    out = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[_smem_spec()] * 8 + [hbm, _mat_spec()],
        out_specs=_mat_spec(),
        out_shape=jax.ShapeDtypeStruct((p * 8, 1024), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, _page_cols(pbvh.block)),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SMEM((128,), jnp.int32)],
    )(pbvh.top_lo[:, 0], pbvh.top_lo[:, 1], pbvh.top_lo[:, 2],
      pbvh.top_hi[:, 0], pbvh.top_hi[:, 1], pbvh.top_hi[:, 2],
      pbvh.top_miss, pbvh.top_leaf, pbvh.pages, rays_mat)
    out = out.reshape(p, 8, 1024)
    pick = lambda r: out[:, r, :].reshape(-1)[:n]
    return Hit(pick(0),
               _strip_alpha_bit(jax.lax.bitcast_convert_type(pick(1),
                                                             jnp.int32)),
               pick(2), pick(3))


@functools.partial(jax.jit, static_argnames=("tmin",))
def packet_occluded(pbvh: PacketBVH, origins, dirs, dist, tmin=1e-5):
    n = origins.shape[0]
    dist = jnp.broadcast_to(jnp.asarray(dist, jnp.float32), (n,))
    rays_mat, p = _pack_inputs(origins, dirs, dist, tmin, n)

    kernel = _make_occluded_kernel(pbvh.n_top, pbvh.block, tmin)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    occ = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[_smem_spec()] * 8 + [hbm, _mat_spec()],
        out_specs=_mat_spec(),
        out_shape=jax.ShapeDtypeStruct((p * 8, 1024), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, _page_cols(pbvh.block)),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(pbvh.top_lo[:, 0], pbvh.top_lo[:, 1], pbvh.top_lo[:, 2],
      pbvh.top_hi[:, 0], pbvh.top_hi[:, 1], pbvh.top_hi[:, 2],
      pbvh.top_miss, pbvh.top_leaf, pbvh.pages, rays_mat)
    occ = occ.reshape(p, 8, 1024)[:, 0, :].reshape(-1)[:n]
    return occ > 0


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


@functools.partial(jax.jit, static_argnames=("tmin",))
def packet_occluded_sub(pbvh: PacketBVH, origins, dirs, dist, tmin=1e-5):
    """Sub-packet (8x128) occlusion variant — see
    _make_occluded_kernel_subpacket."""
    n = origins.shape[0]
    dist = jnp.broadcast_to(jnp.asarray(dist, jnp.float32), (n,))
    rays_mat, p = _pack_inputs(origins, dirs, dist, tmin, n)

    kernel = _make_occluded_kernel_subpacket(pbvh.n_top, pbvh.block, tmin)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    occ = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[_smem_spec()] * 8 + [hbm, _mat_spec()],
        out_specs=_mat_spec(),
        out_shape=jax.ShapeDtypeStruct((p * 8, 1024), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, _page_cols(pbvh.block)),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(pbvh.top_lo[:, 0], pbvh.top_lo[:, 1], pbvh.top_lo[:, 2],
      pbvh.top_hi[:, 0], pbvh.top_hi[:, 1], pbvh.top_hi[:, 2],
      pbvh.top_miss, pbvh.top_leaf, pbvh.pages, rays_mat)
    occ = occ.reshape(p, 8, 1024)[:, 0, :].reshape(-1)[:n]
    return occ > 0


@functools.partial(jax.jit, static_argnames=("tmin",))
def packet_closest_sub(pbvh: PacketBVH, origins, dirs, tmax,
                       tmin=1e-5) -> Hit:
    """Sub-packet (8x128) closest-hit variant — see
    _make_closest_kernel_subpacket."""
    n = origins.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    rays_mat, p = _pack_inputs(origins, dirs, tmax, tmin, n)

    kernel = _make_closest_kernel_subpacket(pbvh.n_top, pbvh.block, tmin)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    out = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[_smem_spec()] * 8 + [hbm, _mat_spec()],
        out_specs=_mat_spec(),
        out_shape=jax.ShapeDtypeStruct((p * 8, 1024), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, _page_cols(pbvh.block)),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SMEM((512,), jnp.int32)],
    )(pbvh.top_lo[:, 0], pbvh.top_lo[:, 1], pbvh.top_lo[:, 2],
      pbvh.top_hi[:, 0], pbvh.top_hi[:, 1], pbvh.top_hi[:, 2],
      pbvh.top_miss, pbvh.top_leaf, pbvh.pages, rays_mat)
    out = out.reshape(p, 8, 1024)
    pick = lambda r: out[:, r, :].reshape(-1)[:n]
    return Hit(pick(0),
               _strip_alpha_bit(jax.lax.bitcast_convert_type(pick(1),
                                                             jnp.int32)),
               pick(2), pick(3))
