"""TPU micro-benchmark: packet vs sub-packet BVH traversal kernels.

A/B harness for the Pallas closest-hit kernels on an incoherent ray
workload (the integrator's real secondary-bounce distribution), with and
without the coherence sort. Checks correctness against the brute oracle
first, then times `REPS` chained on-device traversals per variant.

Run on a TPU host: `python benches/bvh_kernels.py`.

Measured 2026-08-16 (v5e, heightfield 224 -> 99k tris, 65k rays):
  v1 monolithic  sorted ~105 ms   unsorted ~323 ms   (block=128, HIGHEST)
  v2 sub-packet  sorted  ~83 ms   unsorted ~209 ms   (block=128, HIGHEST)
  v3 full-vreg   sorted  ~72 ms   unsorted ~190 ms   (block=64, 3-pass)
  v4 phase-split sorted  ~51 ms   unsorted ~125 ms   (production)
v4 adds phase separation: a pop->slab->reduce->branch chain costs ~2.5 us
of scalar<->vector round-trip latency, and vector ops inside cond branches
force a vector-queue sync per branch, so v4 issues every sub-packet's slab
tests and packed reduces unconditionally before any scalar consumption,
keeps branches scalar-only, and prefetches leaf DMAs from pure-scalar
classification. v3 notes: full-(8,128)-vreg sub-packets + lane-padded block-64
pages + 3-bf16-pass matmul (the HIGHEST-precision matmul measured ~40%
of v3 runtime; 3-pass keeps t within ~2^-16 relative).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import pt  # noqa: F401  (enables the persistent compile cache)
from pt.accel.intersect import intersect_brute
from pt.accel.pallas_bvh import (build_packet_bvh_sah, packet_closest_v4,
                                 packet_occluded_v4)
from pt.accel.pallas_bvh_archive import (packet_closest, packet_closest_sub,
                                         packet_closest_v3, packet_occluded,
                                         packet_occluded_sub)
from pt.render.integrator import _coherence_keys
from pt.scene.examples import make_heightfield_scene
from pt.scene.flatten import flatten_scene, world_vertices

N_RAYS = 65536
REPS = 10


def main():
    scene = make_heightfield_scene(224)
    ds = flatten_scene(scene)
    wpos = jax.jit(lambda d: world_vertices(d)[0])(ds)
    sah = build_packet_bvh_sah(np.asarray(wpos), np.asarray(ds.tri_idx))
    assert sah is not None, "native SAH builder unavailable"

    rng = np.random.default_rng(0)
    o_np = rng.uniform(-9, 9, (N_RAYS, 3)).astype(np.float32)
    o_np[:, 1] = rng.uniform(0, 3, (N_RAYS,))
    d_np = rng.normal(size=(N_RAYS, 3))
    d_np /= np.linalg.norm(d_np, axis=-1, keepdims=True)
    o, d = jnp.asarray(o_np), jnp.asarray(d_np.astype(np.float32))
    keys = _coherence_keys(sah, o, d, jnp.ones((N_RAYS,), bool))
    perm = jnp.argsort(keys)
    o_s, d_s = o[perm], d[perm]

    # correctness vs oracle before timing anything
    hit = packet_closest_sub(sah, o_s, d_s, 1e4)
    jax.block_until_ready(hit.t)
    m = 4096
    hb = jax.jit(intersect_brute)(wpos, ds.tri_idx, o_s[:m], d_s[:m])
    bad = int((np.abs(np.asarray(hb.t) - np.asarray(hit.t)[:m]) > 1e-3).sum())
    print(f"subpacket mismatches vs oracle: {bad}/{m}", flush=True)

    def timed(fn, o, d, label):
        @jax.jit
        def loop(pbvh, o, d):
            def body(i, acc):
                hit = fn(pbvh, o, d, acc)
                return hit.t * 0 + 1e4      # chain: dependence, fresh tmax
            return jax.lax.fori_loop(0, REPS, body,
                                     jnp.full((N_RAYS,), 1e4))
        jax.block_until_ready(loop(sah, o, d))          # warmup/compile
        t0 = time.time()
        jax.block_until_ready(loop(sah, o, d))
        dt = (time.time() - t0) / REPS * 1000
        mrays = N_RAYS / (dt * 1e3)
        print(f"{label}: {dt:.2f} ms  ({mrays:.1f} Mrays/s)", flush=True)

    timed(packet_closest, o_s, d_s, "closest v1 monolithic sorted")
    timed(packet_closest_sub, o_s, d_s, "closest v2 sub-packet sorted")
    timed(packet_closest_v3, o_s, d_s, "closest v3 full-vreg  sorted")
    timed(packet_closest_v4, o_s, d_s, "closest v4 phase-split sorted")
    timed(packet_closest, o, d, "closest v1 monolithic unsorted")
    timed(packet_closest_sub, o, d, "closest v2 sub-packet unsorted")
    timed(packet_closest_v3, o, d, "closest v3 full-vreg  unsorted")
    timed(packet_closest_v4, o, d, "closest v4 phase-split unsorted")

    # occlusion: shadow-like rays from surface points toward one light
    light = jnp.asarray([0.0, -8.0, 0.0])
    hit_t = jnp.where(jnp.isfinite(hit.t) & (hit.t < 1e3), hit.t, 2.0)
    sp = o_s + d_s * (hit_t[:, None] * 0.99)
    to_l = light[None, :] - sp
    dist = jnp.linalg.norm(to_l, axis=-1)
    d_sh = to_l / dist[:, None]

    occ_a = packet_occluded(sah, sp, d_sh, dist)
    for name, fn in (("sub-packet", packet_occluded_sub),
                     ("v4", packet_occluded_v4)):
        occ_b = fn(sah, sp, d_sh, dist)
        bad = int((np.asarray(occ_a) != np.asarray(occ_b)).sum())
        print(f"occlusion {name} disagreements: {bad}/{N_RAYS}", flush=True)

    def timed_occ(fn, label):
        @jax.jit
        def loop(pbvh, o, d, dist):
            def body(i, acc):
                occ = fn(pbvh, o, d, dist * jnp.minimum(acc[0] + 1.0, 1.0))
                return acc * 0 + occ.astype(jnp.float32)
            return jax.lax.fori_loop(0, REPS, body,
                                     jnp.zeros((N_RAYS,), jnp.float32))
        jax.block_until_ready(loop(sah, sp, d_sh, dist))
        t0 = time.time()
        jax.block_until_ready(loop(sah, sp, d_sh, dist))
        dt = (time.time() - t0) / REPS * 1000
        print(f"{label}: {dt:.2f} ms  ({N_RAYS / (dt * 1e3):.1f} Mrays/s)",
              flush=True)

    timed_occ(packet_occluded, "occluded v1 monolithic shadow")
    timed_occ(packet_occluded_sub, "occluded v2 sub-packet shadow")
    timed_occ(packet_occluded_v4, "occluded v4 phase-split shadow")


if __name__ == "__main__":
    main()
