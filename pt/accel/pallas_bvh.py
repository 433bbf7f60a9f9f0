"""Packet BVH traversal as a Pallas TPU kernel.

The production replacement for the reference's hardware ray-tracing pipeline
(traceRaysKHR over the TLAS). The XLA while-loop traversal
(pt.accel.traverse) is gather-bound and pathological to compile at scale on
TPU; this kernel maps the problem onto what the hardware actually has:

* **Scalar core + SMEM — tree walk.** A shallow "top tree" (threaded
  preorder nodes over Morton-ordered triangle *blocks*) lives in SMEM,
  where dynamic scalar indexing is native. One packet of 1024 rays walks
  the tree together (coherent packet traversal): hit-any → descend, else →
  skip link. Per step: 8 scalar loads + one slab test on (8,128) vregs.

* **DMA + VPU — leaf tests.** A leaf is a contiguous block of B
  Morton-sorted triangles stored row-SoA as (T_pad, 16) f32 in HBM
  (cols: v0.xyz, e1.xyz, e2.xyz, id bits). Leaf visits DMA an aligned
  (B, 16) tile into VMEM scratch and run a dense Möller–Trumbore with
  triangles on sublanes × 128 rays on lanes — fat, regular vector work
  with no gathers anywhere.

Divergence story: a packet visits the union of its rays' nodes. Primary
rays are coherent by construction; secondary-ray coherence is recovered by
ray sorting in the integrator (planned). Occlusion queries early-out when
every lane in the packet is occluded.

Shapes: N rays are processed in packets of RAYS_PER_PACKET=1024, each
stored as (8, 128) f32 per component (one vreg). Ray count is padded by
the dispatchers.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pt.accel.intersect import Hit
from pt.accel.lbvh import _topology, morton_codes

RAYS_PER_PACKET = 1024      # 8 sublanes x 128 lanes per component
TRIS_PER_BLOCK = 64         # B: triangles per leaf block (sublane axis)
MAX_TOP_LEAVES = 2048       # SMEM budget: 2*2048-1 nodes x 8 scalars ≈ 128 KiB


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PacketBVH:
    """Device arrays for the packet kernel."""
    top_lo: jax.Array        # (n_top, 3) f32 — split per axis at call site
    top_hi: jax.Array        # (n_top, 3) f32
    top_miss: jax.Array      # (n_top,) i32 preorder skip links
    top_leaf: jax.Array      # (n_top,) i32 leaf-block id or -1
    tris: jax.Array          # (n_leaves, B, 128) f32: v0,e1,e2,id_bits,pad
    n_top: int = dataclasses.field(metadata=dict(static=True), default=0)
    block: int = dataclasses.field(metadata=dict(static=True),
                                   default=TRIS_PER_BLOCK)


def build_packet_bvh(positions: jax.Array, tri_idx: jax.Array,
                     block: int = TRIS_PER_BLOCK) -> PacketBVH:
    """Morton-sort triangles into B-sized blocks, build the threaded top
    tree over block AABBs, pack triangle SoA rows. Fully jittable —
    per-frame rebuild is the animated-AS update path
    (≙ AccelerationStructure::BuildBlases update mode)."""
    t_count = tri_idx.shape[0]
    v0 = positions[tri_idx[:, 0]]
    v1 = positions[tri_idx[:, 1]]
    v2 = positions[tri_idx[:, 2]]
    centroids = (v0 + v1 + v2) / 3.0
    scene_lo = jnp.min(jnp.minimum(jnp.minimum(v0, v1), v2), axis=0)
    scene_hi = jnp.max(jnp.maximum(jnp.maximum(v0, v1), v2), axis=0)
    order = jnp.argsort(morton_codes(centroids, scene_lo, scene_hi))

    # grow the block size until the top tree fits the SMEM budget
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
    se1 = jnp.where(valid, (v1 - v0)[safe], 0.0)   # zero edges → no hit
    se2 = jnp.where(valid, (v2 - v0)[safe], 0.0)
    id_bits = jax.lax.bitcast_convert_type(order_p, jnp.float32)

    # one DMA page per leaf; lanes padded to 128 (TPU tile width) — the
    # 8x HBM overhead buys aligned whole-page DMAs with no reshuffling
    tris = jnp.concatenate(
        [sv0, se1, se2, id_bits[:, None],
         jnp.zeros((t_pad, 118), jnp.float32)],
        axis=1).reshape(n_leaves, block, 128)

    bv0 = sv0.reshape(n_leaves, block, 3)
    bv1 = (sv0 + se1).reshape(n_leaves, block, 3)
    bv2 = (sv0 + se2).reshape(n_leaves, block, 3)
    bvalid = valid.reshape(n_leaves, block, 1)
    blo = jnp.where(bvalid, jnp.minimum(jnp.minimum(bv0, bv1), bv2),
                    jnp.inf).min(axis=1)
    bhi = jnp.where(bvalid, jnp.maximum(jnp.maximum(bv0, bv1), bv2),
                    -jnp.inf).max(axis=1)

    levels_lo, levels_hi = [blo], [bhi]
    while levels_lo[-1].shape[0] > 1:
        levels_lo.append(levels_lo[-1].reshape(-1, 2, 3).min(axis=1))
        levels_hi.append(levels_hi[-1].reshape(-1, 2, 3).max(axis=1))
    heap_lo = jnp.concatenate(levels_lo[::-1], axis=0)
    heap_hi = jnp.concatenate(levels_hi[::-1], axis=0)
    heap_of_preorder, miss_next, leaf_id = _topology(n_leaves)

    return PacketBVH(
        top_lo=heap_lo[heap_of_preorder],
        top_hi=heap_hi[heap_of_preorder],
        top_miss=jnp.asarray(miss_next),
        top_leaf=jnp.asarray(leaf_id),
        tris=tris,
        n_top=2 * n_leaves - 1,
        block=block,
    )


def _slab(lox, loy, loz, hix, hiy, hiz, ox, oy, oz, ix, iy, iz, t_limit):
    """Scalar AABB vs (8,128) ray tiles; returns hit mask (8,128)."""
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


def _mt_rows(leaf, ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, tmin, t_limit_r):
    """Möller–Trumbore: B triangles (sublanes) × 128 rays (lanes).

    leaf: (B, 16) VMEM tile; ray components (1, 128). Returns
    (t (B,128) inf-masked, u, v, ids (B,1) i32)."""
    v0x, v0y, v0z = leaf[:, 0:1], leaf[:, 1:2], leaf[:, 2:3]
    e1x, e1y, e1z = leaf[:, 3:4], leaf[:, 4:5], leaf[:, 5:6]
    e2x, e2y, e2z = leaf[:, 6:7], leaf[:, 7:8], leaf[:, 8:9]
    ids = jax.lax.bitcast_convert_type(leaf[:, 9:10], jnp.int32)

    px = dy_r * e2z - dz_r * e2y
    py = dz_r * e2x - dx_r * e2z
    pz = dx_r * e2y - dy_r * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0,
                        1.0 / jnp.where(det == 0.0, 1.0, det))
    tx = ox_r - v0x
    ty = oy_r - v0y
    tz = oz_r - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx_r * qx + dy_r * qy + dz_r * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t > tmin) & (t < t_limit_r))
    return jnp.where(ok, t, jnp.inf), u, v, ids


def _make_closest_kernel(n_top: int, block: int, tmin: float):
    def kernel(lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
               miss_ref, leaf_ref, tris_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               t_ref, tri_ref, u_ref, v_ref, leaf_vmem, dma_sem):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]      # (8, 128)
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

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
                    tris_ref.at[leaf], leaf_vmem, dma_sem)
                dma.start()
                dma.wait()
                lf = leaf_vmem[:, :]
                t_rows, tri_rows, u_rows, v_rows = [], [], [], []
                for r in range(8):                      # ray sub-rows
                    t_cand, u_c, v_c, ids = _mt_rows(
                        lf, ox[r:r + 1], oy[r:r + 1], oz[r:r + 1],
                        dx[r:r + 1], dy[r:r + 1], dz[r:r + 1],
                        tmin, t_best[r:r + 1])
                    t_min = jnp.min(t_cand, axis=0, keepdims=True)  # (1,128)
                    better = t_min < t_best[r:r + 1]
                    at_min = (t_cand == t_min) & (t_cand < 1e30)
                    sel = lambda a: jnp.max(jnp.where(at_min, a, -jnp.inf),
                                            axis=0, keepdims=True)
                    sel_id = jnp.max(jnp.where(at_min, ids, -1), axis=0,
                                     keepdims=True)
                    t_rows.append(jnp.where(better, t_min, t_best[r:r + 1]))
                    tri_rows.append(jnp.where(better, sel_id,
                                              tri_best[r:r + 1]))
                    u_rows.append(jnp.where(better, sel(u_c), u_best[r:r + 1]))
                    v_rows.append(jnp.where(better, sel(v_c), v_best[r:r + 1]))
                return (jnp.concatenate(t_rows, axis=0),
                        jnp.concatenate(tri_rows, axis=0),
                        jnp.concatenate(u_rows, axis=0),
                        jnp.concatenate(v_rows, axis=0))

            t_best, tri_best, u_best, v_best = jax.lax.cond(
                any_hit & is_leaf, do_leaf, lambda a: a,
                (t_best, tri_best, u_best, v_best))

            descend = any_hit & jnp.logical_not(is_leaf)
            cursor = jnp.where(descend, cursor + 1, miss)
            return cursor, t_best, tri_best, u_best, v_best

        init = (jnp.int32(0), tmax_ref[:],
                jnp.full((8, 128), -1, jnp.int32),
                jnp.zeros((8, 128), jnp.float32),
                jnp.zeros((8, 128), jnp.float32))
        _, t, tri, u, v = jax.lax.while_loop(cond, body, init)
        t_ref[:] = t
        tri_ref[:] = tri
        u_ref[:] = u
        v_ref[:] = v

    return kernel


def _make_occluded_kernel(n_top: int, block: int, tmin: float):
    def kernel(lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
               miss_ref, leaf_ref, tris_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, dist_ref,
               occ_ref, leaf_vmem, dma_sem):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        dist = dist_ref[:]

        def safe_inv(a):
            return 1.0 / jnp.where(jnp.abs(a) < 1e-12,
                                   jnp.where(a < 0, -1e-12, 1e-12), a)
        ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

        def cond(s):
            return s[0] < n_top

        def body(s):
            # the occlusion mask stays i32 end-to-end: i1 vectors cannot
            # cross while/cond boundaries on this Mosaic version
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
                    tris_ref.at[leaf], leaf_vmem, dma_sem)
                dma.start()
                dma.wait()
                lf = leaf_vmem[:, :]
                rows = []
                for r in range(8):
                    t_cand, _, _, _ = _mt_rows(
                        lf, ox[r:r + 1], oy[r:r + 1], oz[r:r + 1],
                        dx[r:r + 1], dy[r:r + 1], dz[r:r + 1],
                        tmin, dist[r:r + 1])
                    found = jnp.max(jnp.where(t_cand < 1e30, 1, 0),
                                    axis=0, keepdims=True)
                    rows.append(jnp.maximum(occluded_i[r:r + 1], found))
                return jnp.concatenate(rows, axis=0)

            occluded_i = jax.lax.cond(any_hit & is_leaf, do_leaf,
                                      lambda o: o, occluded_i)
            all_occ = jnp.min(occluded_i) > 0
            descend = any_hit & jnp.logical_not(is_leaf)
            cursor = jnp.where(all_occ, n_top,
                               jnp.where(descend, cursor + 1, miss))
            return cursor, occluded_i

        init = (jnp.int32(0), jnp.zeros((8, 128), jnp.int32))
        _, occluded_i = jax.lax.while_loop(cond, body, init)
        occ_ref[:] = occluded_i

    return kernel


def _smem_spec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _tile_spec():
    """(8, 128) packet tile i of a (P*8, 128) array."""
    return pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _dispatch_size(n: int) -> int:
    """Round the ray count up to a power of two ≥ one packet so different
    film resolutions share compiled kernel shapes (compiles on this
    platform are slow; ≙ pipeline-variant reuse)."""
    return max(RAYS_PER_PACKET, 1 << (n - 1).bit_length())


def _pad_rays(origins, dirs, extra, extra_fill, n):
    pad = _dispatch_size(n) - n
    if pad:
        zpad = lambda a, c: jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], c, a.dtype)])
        origins = zpad(origins, 0.0)
        dirs = zpad(dirs, 1.0)
        extra = zpad(extra, extra_fill)
    return origins, dirs, extra, origins.shape[0]


@functools.partial(jax.jit, static_argnames=("tmin",))
def packet_closest(pbvh: PacketBVH, origins, dirs, tmax, tmin=1e-5) -> Hit:
    """Closest-hit for N rays (padded internally to the packet size)."""
    n = origins.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    origins, dirs, tmax, np_rays = _pad_rays(origins, dirs, tmax, tmin, n)

    kernel = _make_closest_kernel(pbvh.n_top, pbvh.block, tmin)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    tt = lambda a: a.reshape(np_rays // 128, 128)
    t, tri, u, v = pl.pallas_call(
        kernel,
        grid=(np_rays // RAYS_PER_PACKET,),
        in_specs=[_smem_spec()] * 8 + [hbm] + [_tile_spec()] * 7,
        out_specs=[_tile_spec()] * 4,
        out_shape=[jax.ShapeDtypeStruct((np_rays // 128, 128), jnp.float32),
                   jax.ShapeDtypeStruct((np_rays // 128, 128), jnp.int32),
                   jax.ShapeDtypeStruct((np_rays // 128, 128), jnp.float32),
                   jax.ShapeDtypeStruct((np_rays // 128, 128), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((pbvh.block, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(pbvh.top_lo[:, 0], pbvh.top_lo[:, 1], pbvh.top_lo[:, 2],
      pbvh.top_hi[:, 0], pbvh.top_hi[:, 1], pbvh.top_hi[:, 2],
      pbvh.top_miss, pbvh.top_leaf, pbvh.tris,
      tt(origins[:, 0]), tt(origins[:, 1]), tt(origins[:, 2]),
      tt(dirs[:, 0]), tt(dirs[:, 1]), tt(dirs[:, 2]), tt(tmax))
    flat = lambda a: a.reshape(-1)[:n]
    return Hit(flat(t), flat(tri), flat(u), flat(v))


@functools.partial(jax.jit, static_argnames=("tmin",))
def packet_occluded(pbvh: PacketBVH, origins, dirs, dist, tmin=1e-5):
    n = origins.shape[0]
    dist = jnp.broadcast_to(jnp.asarray(dist, jnp.float32), (n,))
    origins, dirs, dist, np_rays = _pad_rays(origins, dirs, dist, tmin, n)

    kernel = _make_occluded_kernel(pbvh.n_top, pbvh.block, tmin)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    tt = lambda a: a.reshape(np_rays // 128, 128)
    occ = pl.pallas_call(
        kernel,
        grid=(np_rays // RAYS_PER_PACKET,),
        in_specs=[_smem_spec()] * 8 + [hbm] + [_tile_spec()] * 7,
        out_specs=_tile_spec(),
        out_shape=jax.ShapeDtypeStruct((np_rays // 128, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((pbvh.block, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(pbvh.top_lo[:, 0], pbvh.top_lo[:, 1], pbvh.top_lo[:, 2],
      pbvh.top_hi[:, 0], pbvh.top_hi[:, 1], pbvh.top_hi[:, 2],
      pbvh.top_miss, pbvh.top_leaf, pbvh.tris,
      tt(origins[:, 0]), tt(origins[:, 1]), tt(origins[:, 2]),
      tt(dirs[:, 0]), tt(dirs[:, 1]), tt(dirs[:, 2]), tt(dist))
    return occ.reshape(-1)[:n] > 0


MAX_TOP_NODES = 2 * MAX_TOP_LEAVES - 1


def build_packet_bvh_sah(positions_np, tri_idx_np,
                         block: int = TRIS_PER_BLOCK):
    """Host-side packet-BVH build using the native binned-SAH builder
    (csrc/sah_bvh.cpp) — higher-quality trees for static scenes
    (≙ PREFER_FAST_TRACE builds, AccelerationStructure.cpp:319-324).

    Returns a PacketBVH or None when the native library is unavailable.
    The SAH leaf cap grows until the node count fits the SMEM budget.
    """
    import numpy as np
    from pt.accel.native import build_sah

    positions_np = np.asarray(positions_np, np.float32)
    tri_idx_np = np.asarray(tri_idx_np, np.int64)
    v0 = positions_np[tri_idx_np[:, 0]]
    v1 = positions_np[tri_idx_np[:, 1]]
    v2 = positions_np[tri_idx_np[:, 2]]
    tri_lo = np.minimum(np.minimum(v0, v1), v2)
    tri_hi = np.maximum(np.maximum(v0, v1), v2)
    centroids = (v0 + v1 + v2) / 3.0

    result = None
    while block <= 1024:
        result = build_sah(tri_lo, tri_hi, centroids, block)
        if result is None:
            return None
        if len(result[3]) <= MAX_TOP_NODES:
            break
        block *= 2            # bigger pages → fewer nodes → fits SMEM
        result = None
    if result is None:
        return None
    order, node_lo, node_hi, miss, leaf_start, leaf_count = result
    if leaf_count.max(initial=0) > block:
        return None       # couldn't fit SMEM budget with leaves ≤ block

    n_top = len(miss)
    is_leaf = leaf_start >= 0
    leaf_nodes = np.nonzero(is_leaf)[0]
    n_leaves = len(leaf_nodes)
    top_leaf = np.full(n_top, -1, np.int32)
    top_leaf[leaf_nodes] = np.arange(n_leaves, dtype=np.int32)

    # leaf pages: (n_leaves, block, 128) with v0,e1,e2,id rows; -1 padding
    pages = np.zeros((n_leaves, block, 128), np.float32)
    pad_id = np.full(block, -1, np.int32)
    for li, node in enumerate(leaf_nodes):
        s, c = leaf_start[node], leaf_count[node]
        tris = order[s:s + c]
        pages[li, :c, 0:3] = v0[tris]
        pages[li, :c, 3:6] = (v1 - v0)[tris]
        pages[li, :c, 6:9] = (v2 - v0)[tris]
        ids = pad_id.copy()
        ids[:c] = tris
        pages[li, :, 9] = ids.view(np.float32)

    return PacketBVH(
        top_lo=jnp.asarray(node_lo),
        top_hi=jnp.asarray(node_hi),
        top_miss=jnp.asarray(miss),
        top_leaf=jnp.asarray(top_leaf),
        tris=jnp.asarray(pages),
        n_top=int(n_top),
        block=block,
    )
