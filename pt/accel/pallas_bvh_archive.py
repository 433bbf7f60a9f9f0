"""Archived packet-kernel generations (measured A/B record).

Split out of pt/accel/pallas_bvh.py (round 4, VERDICT r3 task 8): the
production module keeps the shipping BF8 + v4 paths; every superseded or
tested-negative generation lives here, each load-bearing as the measured
record benches select by name (benches/bvh_kernels.py, benches/widesub_ab.py,
docs/perf_budget.md §3/§12):

  v1 `packet_closest`/`packet_occluded`      monolithic 1024-ray packet.
  v2 `packet_closest_sub`/`packet_occluded_sub`  8x128-lane sub-packets,
                                              ordered near-child-first.
  ordered `_make_closest_kernel_ordered`      near-child-first descent (v1.5).
  v3 `packet_closest_v3`                      full-vreg cube layout.
  v6 `packet_closest_v6`/`packet_occluded_v6` unified-table BF8 w/ static
                                              octant child order (-5% vs BF8).
  v6k2 `packet_closest_v6k2`                  two-pop rounds (-70%).
  v7 `packet_closest_v7`                      leaf queues (-47%).
  bf8w `packet_closest_bf8w`                  wide-sub merge (negative,
                                              monotone; perf_budget §12).

All are bit-exact vs the production kernels (benches assert it). Nothing in
pt/ imports this module; the BF8V6 structure carries its own `closest`/
`occluded`/`root_bounds` methods so the integrator's duck dispatch
(trace_closest/trace_occluded) routes it without a production->archive
import.
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
from pt.accel.pallas_bvh import (ALPHA_TRI_BIT, LEAF_BIT, MAX_TOP_LEAVES,
                                 MAX_TOP_NODES, RAYS_PER_PACKET,
                                 TRIS_PER_BLOCK, _PAGE_GROUPS, BF8BVH,
                                 PacketBVH, _dispatch_size, _finish_build,
                                 _leaf_intersect, _mat_spec, _pack_inputs,
                                 _pack_inputs_v3, _page_cols, _select_best_hit,
                                 _slab, _slab_t, _smem_spec, _sort8_desc,
                                 _strip_alpha_bit, _woop_pages, build_bf8)

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

    # Duck-dispatch protocol consumed by pt.render.integrator
    # (trace_closest / trace_occluded / _root_bounds): the production
    # integrator routes any accel structure that carries these methods,
    # so archived structures stay selectable for A/B work without a
    # production -> archive import.
    def closest(self, origins, dirs, tmax, tmin):
        return packet_closest_v6(self, origins, dirs, tmax, tmin)

    def occluded(self, origins, dirs, dist, tmin):
        return packet_occluded_v6(self, origins, dirs, dist, tmin)

    def root_bounds(self):
        if self.root_lo is not None:
            return self.root_lo, self.root_hi
        valid = self.u_lo[:, 0] < 1e29
        lo = jnp.min(jnp.where(valid[:, None], self.u_lo, jnp.inf), axis=0)
        hi = jnp.max(jnp.where(valid[:, None], self.u_hi, -jnp.inf),
                     axis=0)
        return lo, hi


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

