"""Kernel budget measurement: where does a bench frame actually go?

Produces the numbers behind docs/perf_budget.md (VERDICT round-2 task 1:
"close the perf gap with a budget, not vibes"). Measures, on real TPU:

  1. per-bounce ray populations of the production bench frame
     (512x512, heightfield 99k tris, 5 bounces) and the wall time of each
     stage in isolation: closest trace, shade, occlusion trace, sort,
     compaction;
  2. the BF8 kernel's lockstep ROUND counts per program (the kernel's own
     diagnostic output row) for each bounce's real ray set → time/round;
  3. leaf-visit waste: per-ray oracle visit counts (leaves whose AABB the
     ray enters closer than its final hit t) vs the per-sub-packet union
     that the packet kernel actually pays for.

Run: python benches/budget.py [--width 512] [--samples-bounces 5]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import pt  # noqa: F401
from pt.render.integrator import (PathTracingSettings, prepare_accel,
                                  raygen, start_carry, bounce_once,
                                  init_rng_state, trace_closest,
                                  trace_occluded, _shade_hit,
                                  _coherence_keys, _aabb_exit_t,
                                  _skybox_emissive)
from pt.render.rays import TMAX, TMIN
from pt.render.shading import _normalize
from pt.render.textures import default_texture_pool
from pt.scene.examples import make_heightfield_scene
from pt.scene.flatten import flatten_scene
from pt.run.renderer import _tile_order


def timed(fn, *args, reps=5, warmup=2, label=""):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / reps * 1000
    if label:
        print(f"  {label}: {dt:.2f} ms", flush=True)
    return dt, out


def rounds_of(bvh8, origins, dirs, tmax=TMAX):
    """BF8 closest-hit rounds per program (diagnostic row 4)."""
    from pt.accel.pallas_bvh import (_make_closest_kernel_bf8,
                                     _pack_inputs_v3, _page_cols,
                                     RAYS_PER_PACKET)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = origins.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    rays_mat, cube, p, n_sub = _pack_inputs_v3(origins, dirs, tmax, TMIN, n)
    width = n_sub * RAYS_PER_PACKET
    kernel = _make_closest_kernel_bf8(bvh8.n8, bvh8.n_leaves, bvh8.block,
                                      TMIN, n_sub, bvh8.leaf_retest)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    mat = pl.BlockSpec((8, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cub = pl.BlockSpec((n_sub * 8, 8, 128), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel, grid=(p,),
        in_specs=[smem] * (13 if bvh8.leaf_retest else 7) + [hbm, mat, cub],
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
    return np.asarray(out.reshape(p, 8, width)[:, 4, 0]).astype(np.int64)


@jax.jit
def _leaf_visit_counts(l_lo, l_hi, origins, dirs, t_final):
    """Per-ray oracle leaf visits: leaves whose box the ray enters with
    tnear <= t_final (what a perfect per-ray ordered traversal intersects),
    and per-leaf ray-hit masks for union stats. Chunked over leaves."""
    def one_leaf(carry, lohi):
        lo, hi = lohi
        inv = 1.0 / jnp.where(jnp.abs(dirs) < 1e-12, 1e-12, dirs)
        t0 = (lo[None] - origins) * inv
        t1 = (hi[None] - origins) * inv
        tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hit = (tnear <= tfar) & (tfar > 0.0) & (tnear <= t_final)
        return carry + hit.astype(jnp.int32), hit
    counts, hits = jax.lax.scan(one_leaf,
                                jnp.zeros(origins.shape[0], jnp.int32),
                                (l_lo, l_hi))
    return counts, hits


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--bounces", type=int, default=5)
    ap.add_argument("--skip-stages", action="store_true",
                    help="skip the per-bounce stage timing table")
    args = ap.parse_args()
    W = H = args.width

    settings = PathTracingSettings(sample_count=1, bounce_count=args.bounces,
                                   backend="pallas")
    scene = make_heightfield_scene(224)
    ds = flatten_scene(scene)
    tex = default_texture_pool()
    cam = scene.cameras[0]
    cam.on_resize(W, H)
    inv_view = jnp.asarray(cam.inv_view, jnp.float32)
    inv_proj = jnp.asarray(cam.inv_proj, jnp.float32)

    # production accel (BF8 over fine SAH tree)
    from pt.accel.pallas_bvh import build_bf8, build_packet_bvh_sah
    from pt.scene.flatten import world_vertices
    wpos = jax.jit(lambda d: world_vertices(d)[0])(ds)
    fine = build_packet_bvh_sah(np.asarray(wpos), np.asarray(ds.tri_idx),
                                block=32, max_leaves=8192)
    bvh8 = build_bf8(fine)
    accel = jax.jit(lambda d: prepare_accel(
        d, PathTracingSettings(backend="brute")))(ds)
    accel = accel._replace(bvh=bvh8)
    print(f"tree: {bvh8.n8} bf8 nodes, {bvh8.n_leaves} leaves, "
          f"block {bvh8.block}, retest {bvh8.leaf_retest}", flush=True)

    # ---- capture real per-bounce ray populations --------------------------
    order = _tile_order(W, H)
    ys, xs = np.meshgrid(np.arange(H, dtype=np.uint32),
                         np.arange(W, dtype=np.uint32), indexing="ij")
    px = jnp.asarray(xs.reshape(-1)[order])
    py = jnp.asarray(ys.reshape(-1)[order])

    @jax.jit
    def gen(frame):
        state = init_rng_state(px, py, W, frame)
        state, o, d, diff = raygen(px, py, W, H, inv_view, inv_proj,
                                   state, settings)
        return start_carry(state, o, d, diff)

    @jax.jit
    def one_bounce(carry):
        return bounce_once(ds, tex, accel, carry, settings, True)

    carry = gen(jnp.uint32(0))
    states = [carry]
    for b in range(args.bounces):
        carry = jax.block_until_ready(one_bounce(carry))
        states.append(carry)

    # ---- stage timings per bounce -----------------------------------------
    shadow_cache = {}

    @jax.jit
    def stage_trace(o, d):
        return trace_closest(accel.bvh, accel.wpos, ds.tri_idx, o, d)

    @jax.jit
    def stage_shade(hit, o, d, state, alive, mr, diff):
        return _shade_hit(ds, tex, accel, hit, o, d, state, alive, mr,
                          None, diff)

    @jax.jit
    def stage_occl(o, d, dist):
        return trace_occluded(accel.bvh, accel.wpos, ds.tri_idx, o, d, dist)

    @jax.jit
    def stage_sortkeys(o, d, alive):
        # _coherence_keys wants the binary PacketBVH (scene bounds at node 0)
        keys = _coherence_keys(fine, o, d, alive)
        return jnp.argsort(keys)

    total_est = 0.0
    print("\nper-bounce stage times (full 262k-lane batch, no compaction):",
          flush=True)
    for b in range(args.bounces if not args.skip_stages else 0):
        c = states[b]
        alive = int(jnp.sum(c.alive))
        dt_tr, hit = timed(stage_trace, c.origin, c.direction)
        dt_sh, payload = timed(stage_shade, hit, c.origin, c.direction,
                               c.state, c.alive, c.max_roughness, c.diff)
        sdir = -_normalize(payload["light_dir"])
        sdist = jnp.minimum(payload["light_dist"],
                            _aabb_exit_t(bvh8.c_lo.min(axis=0),
                                         bvh8.c_hi.max(axis=0),
                                         payload["next_origin"], sdir) + 1e-3)
        dt_oc, _ = timed(stage_occl, payload["next_origin"], sdir, sdist)
        dt_so, _ = timed(stage_sortkeys, c.origin, c.direction, c.alive)
        rounds = rounds_of(bvh8, c.origin, c.direction)
        print(f"  bounce {b}: alive {alive:7d}  closest {dt_tr:7.2f} ms  "
              f"shade {dt_sh:6.2f} ms  occl {dt_oc:7.2f} ms  "
              f"sortkeys+argsort {dt_so:6.2f} ms  "
              f"rounds/prog p50 {int(np.median(rounds))} "
              f"max {int(rounds.max())} (x{len(rounds)} progs)", flush=True)
        total_est += dt_tr + dt_sh + dt_oc

    print(f"\nsum of stages (1 sample, no compaction): {total_est:.1f} ms",
          flush=True)

    # ---- leaf-visit waste: oracle vs packet union -------------------------
    print("\nleaf-visit oracle vs packet union (bounce 1 rays):", flush=True)
    c = states[1]
    n_sample = 65536
    o = c.origin[:n_sample]
    d = c.direction[:n_sample]
    hit = stage_trace(o, d)
    t_fin = jnp.where(hit.t < 1e30, hit.t, TMAX)
    counts, hits = jax.block_until_ready(_leaf_visit_counts(
        jnp.asarray(bvh8.l_lo), jnp.asarray(bvh8.l_hi), o, d, t_fin))
    counts = np.asarray(counts)
    hits = np.asarray(hits)                      # (n_leaves, n_sample)
    # per-sub union: leaves hit by ANY ray of each 1024-lane sub-packet
    subs = hits.reshape(hits.shape[0], -1, 1024)
    union = subs.any(axis=2).sum(axis=0)         # (n_subs,)
    print(f"  oracle visits/ray: mean {counts.mean():.1f} "
          f"p50 {np.median(counts):.0f} p95 {np.percentile(counts, 95):.0f}",
          flush=True)
    print(f"  per-1024-sub union visits: mean {union.mean():.1f} "
          f"(waste factor {union.mean() / max(counts.mean(), 1e-9):.1f}x)",
          flush=True)
    key_perm = np.asarray(stage_sortkeys(o, d, c.alive[:n_sample]))
    hits_s = hits[:, key_perm]
    subs_s = hits_s.reshape(hits.shape[0], -1, 1024)
    union_s = subs_s.any(axis=2).sum(axis=0)
    print(f"  sorted union visits: mean {union_s.mean():.1f} "
          f"(waste {union_s.mean() / max(counts.mean(), 1e-9):.1f}x)",
          flush=True)

    # ---- union vs sub size x sort key (kernel design matrix) --------------
    o_np = np.asarray(o)
    d_np = np.asarray(d)
    lo = np.asarray(bvh8.c_lo).min(axis=0)
    hi = np.asarray(bvh8.c_hi)
    hi = hi[hi[:, 0] < 1e29].max(axis=0)
    ext = np.maximum(hi - lo, 1e-9)

    def morton(q, bits):
        out = np.zeros(q.shape[0], np.uint64)
        for b in range(bits):
            for a in range(3):
                out |= ((q[:, a].astype(np.uint64) >> b) & 1) << \
                    np.uint64(3 * b + (2 - a))
        return out

    def key_variant(name):
        qo = np.clip((o_np - lo) / ext * 512, 0, 511).astype(np.uint64)
        octant = ((d_np[:, 0] < 0).astype(np.uint64) * np.uint64(4)
                  + (d_np[:, 1] < 0).astype(np.uint64) * np.uint64(2)
                  + (d_np[:, 2] < 0).astype(np.uint64))
        dmorton = morton(np.clip((d_np * 0.5 + 0.5) * 32, 0,
                                 31).astype(np.uint64), 5)
        omorton = morton(qo, 9)
        if name == "none":
            return None
        if name == "octant|omorton":           # current production key
            return (octant << np.uint64(27)) | omorton
        if name == "omorton|octant":
            return (omorton << np.uint64(3)) | octant
        if name == "omorton|dmorton":
            return (omorton << np.uint64(15)) | dmorton
        if name == "coarse-o|dmorton":         # 6-bit/axis origin cell
            qoc = morton((qo >> np.uint64(3)).astype(np.uint64), 6)
            return (qoc << np.uint64(15)) | dmorton

    print("\nper-sub union by sub size x sort key:", flush=True)
    print(f"  {'key':>16} " + "".join(f"{s:>8}" for s in
                                      (128, 256, 512, 1024)), flush=True)
    for name in ("none", "octant|omorton", "omorton|octant",
                 "omorton|dmorton", "coarse-o|dmorton"):
        k = key_variant(name)
        hh = hits if k is None else hits[:, np.argsort(k, kind="stable")]
        row = []
        for size in (128, 256, 512, 1024):
            u = hh.reshape(hh.shape[0], -1, size).any(axis=2).sum(axis=0)
            row.append(f"{u.mean():8.1f}")
        print(f"  {name:>16} " + "".join(row), flush=True)

    # ---- shade internals ---------------------------------------------------
    print("\nshade breakdown (bounce-1 rays, 262k lanes):", flush=True)
    c = states[1]
    hit = jax.block_until_ready(stage_trace(c.origin, c.direction))

    from pt.render.materials import sample_material
    from pt.render.sampling import compute_tangent_space, sample_light
    from pt.render.bsdf import evaluate_bsdf, sample_bsdf
    from pt.render.differentials import (compute_dp_dxy, compute_dpn_duv,
                                         compute_uv_derivatives)

    tri = jnp.maximum(hit.tri, 0)

    @jax.jit
    def part_gather(hit):
        tri = jnp.maximum(hit.tri, 0)
        return (accel.tri_pos[tri], accel.tri_nrm[tri], accel.tri_tan[tri],
                accel.tri_bit[tri], accel.tri_uv[tri], ds.tri_mat[tri])

    rp, rn, rt, rb, ru, rowm = jax.block_until_ready(part_gather(hit))
    bary = jnp.stack([1.0 - hit.u - hit.v, hit.u, hit.v], axis=-1)
    uv = (ru[:, 0:2] * bary[:, 0:1] + ru[:, 2:4] * bary[:, 1:2]
          + ru[:, 4:6] * bary[:, 2:3])

    @jax.jit
    def part_diff(diff):
        p0, p1, p2 = rp[:, 0:3], rp[:, 3:6], rp[:, 6:9]
        n0, n1, n2 = rn[:, 0:3], rn[:, 3:6], rn[:, 6:9]
        pos = p0 * bary[:, 0:1] + p1 * bary[:, 1:2] + p2 * bary[:, 2:3]
        nrm = n0 * bary[:, 0:1] + n1 * bary[:, 1:2] + n2 * bary[:, 2:3]
        dpdu, dpdv, dndu, dndv = compute_dpn_duv(
            p0, p1, p2, ru[:, 0:2], ru[:, 2:4], ru[:, 4:6],
            n0, n1, n2, rt[:, 0:3], rb[:, 0:3])
        dpdx, dpdy = compute_dp_dxy(pos, diff, nrm)
        return compute_uv_derivatives(dpdx, dpdy, dpdu, dpdv)

    @jax.jit
    def part_material(uv, duv):
        return sample_material(ds, tex, rowm, uv, jnp.zeros(uv.shape[0],
                                                            bool), *duv)

    @jax.jit
    def part_bsdf(mat, state):
        tbn = compute_tangent_space(rn[:, 0:3])
        v_local = jnp.einsum("...ji,...j->...i", tbn, -c.direction)
        st, bs = sample_bsdf(mat, v_local, state)
        lb, _ = evaluate_bsdf(mat, v_local, v_local)
        return st, bs.pdf, lb

    timed(part_gather, hit, label="attribute gathers (6 fat rows)")
    duv = timed(part_diff, c.diff, label="ray differentials -> duv")[1]
    mat = timed(part_material, uv, duv, label="sample_material (textures)")[1]
    timed(part_bsdf, mat, c.state, label="bsdf sample+eval")

    # ---- stage cost vs batch size (compaction effectiveness) ---------------
    print("\nfull bounce stage vs lane count (compaction size classes):",
          flush=True)
    from pt.run.renderer import _bounce_jit
    for k in (262144, 65536, 16384, 4096):
        sub = jax.tree_util.tree_map(
            lambda a: a[:k] if getattr(a, "ndim", 0) else a, c)
        dt, _ = timed(lambda s: _bounce_jit(ds, tex, accel, s, settings,
                                            True)[0], sub)
        print(f"  {k:7d} lanes: {dt:7.2f} ms "
              f"({k / dt / 1e3:.2f} Mlanes/s)", flush=True)


if __name__ == "__main__":
    main()
