"""Opportunity sizing for a round-budget 'drain' traversal scheme.

The BF8 packet kernel runs each program until its slowest 1024-ray sub
finishes (measured laggard skew ~1.9x max/mean, docs/perf_budget.md §2).
A drain scheme would stop every program after B lockstep rounds, save the
unfinished subs' traversal state (SMEM stacks + per-lane best records),
repack those subs densely into fresh programs, and continue — converting
per-program max-cost toward mean-cost. Before building it (kernel state
save/restore + host repacking), this bench computes the exact upper
bound on the win from the production kernel's own per-sub completion
rounds (diagnostic row 5, written by _make_closest_kernel_bf8):

  current    = sum_p max_s done[p,s]          (what the kernel pays)
  two-pass B = sum_p min(max_s, B) + cost of the >B remainders packed
               8-per-program in descending order (zero-overhead model)
  lower bnd  = max(sum_s done_s / 8, max_s done_s)   (perfect balance)

Run on a TPU host: python benches/drain_sim.py [--scene courtyard]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import pt  # noqa: F401
from pt.render.integrator import (PathTracingSettings, bounce_once,
                                  init_rng_state, prepare_accel, raygen,
                                  start_carry)
from pt.render.textures import default_texture_pool
from pt.run.renderer import _tile_order
from pt.scene.flatten import flatten_scene, world_vertices


def done_rounds_of(bvh8, origins, dirs, tmax=1e30):
    """(per-program rounds, per-sub completion rounds) from diagnostic
    rows 4/5 of the production BF8 closest kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pt.accel.pallas_bvh import (RAYS_PER_PACKET,
                                     _make_closest_kernel_bf8, _page_cols,
                                     _pack_inputs_v3)
    n = origins.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    rays_mat, cube, p, n_sub = _pack_inputs_v3(origins, dirs, tmax, 1e-5, n)
    width = n_sub * RAYS_PER_PACKET
    kernel = _make_closest_kernel_bf8(bvh8.n8, bvh8.n_leaves, bvh8.block,
                                      1e-5, n_sub, bvh8.leaf_retest)
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
    out = np.asarray(out.reshape(p, 8, width))
    rounds = out[:, 4, 0].astype(np.int64)                   # (p,)
    done = out[:, 5, ::1024][:, :n_sub].astype(np.int64)     # (p, n_sub)
    return rounds, done


def simulate(done):
    """Drain-model costs from per-sub completion rounds (p, n_sub)."""
    p, n_sub = done.shape
    current = int(done.max(axis=1).sum())
    flat = np.sort(done.reshape(-1))[::-1]
    lower = max(int(np.ceil(flat.sum() / n_sub)), int(flat[0]))

    def packed_cost(rem):
        rem = np.sort(rem[rem > 0])[::-1]
        if rem.size == 0:
            return 0
        # descending LPT into groups of n_sub: group max = every n_sub-th
        return int(rem[::n_sub].sum())

    rows = []
    for b_q in (0.5, 0.6, 0.7, 0.8, 0.9):
        B = int(np.quantile(done.reshape(-1), b_q))
        pass1 = int(np.minimum(done.max(axis=1), B).sum())
        pass2 = packed_cost((done - B).reshape(-1))
        rows.append((B, pass1, pass2, pass1 + pass2))
    return current, lower, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="heightfield",
                    choices=["heightfield", "courtyard"])
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--bounces", type=int, default=3)
    args = ap.parse_args()
    W = H = args.width
    if args.scene == "heightfield":
        from pt.scene.examples import make_heightfield_scene
        scene = make_heightfield_scene(224)
    else:
        from pt.scene.standin import make_courtyard_scene
        scene = make_courtyard_scene()

    settings = PathTracingSettings(sample_count=1, bounce_count=5,
                                   backend="pallas")
    ds = flatten_scene(scene)
    tex = default_texture_pool()
    cam = scene.cameras[0]
    cam.on_resize(W, H)
    inv_view = jnp.asarray(cam.inv_view, jnp.float32)
    inv_proj = jnp.asarray(cam.inv_proj, jnp.float32)

    from pt.accel.pallas_bvh import build_bf8, build_packet_bvh_sah
    wpos = jax.jit(lambda d: world_vertices(d)[0])(ds)
    fine = build_packet_bvh_sah(np.asarray(wpos), np.asarray(ds.tri_idx),
                                block=32 if args.scene == "heightfield"
                                else 64,
                                max_leaves=8192, spatial=True)
    bvh8 = build_bf8(fine)
    accel = jax.jit(lambda d: prepare_accel(
        d, PathTracingSettings(backend="brute")))(ds)
    accel = accel._replace(bvh=bvh8)
    print(f"{args.scene}: {bvh8.n8} bf8 nodes, {bvh8.n_leaves} leaves",
          flush=True)

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
    for b in range(args.bounces):
        rounds, done = done_rounds_of(bvh8, carry.origin, carry.direction)
        alive = int(jnp.sum(carry.alive))
        d = done.reshape(-1)
        current, lower, rows = simulate(done)
        print(f"\nbounce {b} (alive {alive}): per-sub rounds "
              f"mean {d.mean():.0f} p50 {int(np.median(d))} "
              f"p95 {int(np.quantile(d, 0.95))} max {int(d.max())}; "
              f"per-prog max p50 {int(np.median(done.max(axis=1)))}",
              flush=True)
        print(f"  current {current} rounds; perfect-balance bound {lower} "
              f"({current / max(lower, 1):.2f}x headroom)", flush=True)
        for B, p1, p2, tot in rows:
            print(f"  two-pass B={B:4d}: pass1 {p1:6d} + packed pass2 "
                  f"{p2:6d} = {tot:6d}  ({current / max(tot, 1):.2f}x)",
                  flush=True)
        carry = jax.block_until_ready(one_bounce(carry))


if __name__ == "__main__":
    main()
