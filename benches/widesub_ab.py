"""TPU A/B: BF8 wide-sub traversal (packet_closest_bf8w) vs production.

docs/perf_budget.md §2 measured the leaf-visit union growing ~3x per 8x
rays (128-sub 28.5 / 1024-sub 86.5). Merging the 8 independent 1024-ray
walkers of a program into fewer, wider walkers therefore trades ~3x MORE
rounds per walker against 8x FEWER scalar phases, reduce syncs, and DMA
conditionals per round — the per-round vector slab volume is identical.
Round 2's A/Bs covered the opposite directions only (more subs, narrower
cones, two pops/round); this measures the merge direction.

Run on a TPU host: `python benches/widesub_ab.py [heightfield|courtyard]`.
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
from pt.accel.pallas_bvh import (build_bf8, build_packet_bvh_sah,
                                 packet_closest_bf8)
from pt.accel.pallas_bvh_archive import packet_closest_bf8w
from pt.scene.flatten import flatten_scene, world_vertices

N_RAYS = 65536
REPS = 10


def make_scene(name):
    if name == "heightfield":
        from pt.scene.examples import make_heightfield_scene
        return make_heightfield_scene(224), (-9, 9, 0, 3)
    from pt.scene.standin import make_courtyard_scene
    return make_courtyard_scene(tex_scale=1 / 16), (-18, 18, 0.2, 8)


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "heightfield"
    scene, (lo, hi, ylo, yhi) = make_scene(scene_name)
    ds = flatten_scene(scene)
    wpos = jax.jit(lambda d: world_vertices(d)[0])(ds)
    fine = build_packet_bvh_sah(np.asarray(wpos), np.asarray(ds.tri_idx),
                                block=32, max_leaves=8192,
                                tri_opaque_np=np.asarray(ds.tri_opaque),
                                spatial=True)
    assert fine is not None
    bvh = build_bf8(fine)
    assert bvh is not None
    print(f"{scene_name}: {ds.tri_idx.shape[0]} tris, "
          f"pages {bvh.pages.shape}", flush=True)

    rng = np.random.default_rng(0)
    o_np = rng.uniform(lo, hi, (N_RAYS, 3)).astype(np.float32)
    o_np[:, 1] = rng.uniform(ylo, yhi, (N_RAYS,))
    d_np = rng.normal(size=(N_RAYS, 3))
    d_np /= np.linalg.norm(d_np, axis=-1, keepdims=True)
    o, d = jnp.asarray(o_np), jnp.asarray(d_np.astype(np.float32))

    # correctness first: every arm vs the brute oracle
    m = 4096
    hb = jax.jit(intersect_brute)(wpos, ds.tri_idx, o[:m], d[:m])
    jax.block_until_ready(hb.t)

    arms = [("bf8 (production, 8x1024)",
             lambda b, o, d, t: packet_closest_bf8(b, o, d, t))]
    for r in (2, 4, 8):
        arms.append((f"bf8w r={r} ({8 // r}x{r * 1024})",
                     lambda b, o, d, t, r=r: packet_closest_bf8w(
                         b, o, d, t, r_sub=r)))

    for label, fn in arms:
        h = fn(bvh, o, d, 1e4)
        jax.block_until_ready(h.t)
        bad = int((np.abs(np.asarray(hb.t) - np.asarray(h.t)[:m])
                   > 1e-3).sum())
        print(f"{label}: mismatches vs oracle {bad}/{m}", flush=True)

    def timed(fn, label):
        @jax.jit
        def loop(bvh, o, d):
            def body(i, acc):
                h = fn(bvh, o, d, acc)
                return h.t * 0 + 1e4
            return jax.lax.fori_loop(0, REPS, body,
                                     jnp.full((N_RAYS,), 1e4))
        jax.block_until_ready(loop(bvh, o, d))
        t0 = time.time()
        jax.block_until_ready(loop(bvh, o, d))
        dt = (time.time() - t0) / REPS * 1000
        print(f"{label}: {dt:.2f} ms  ({N_RAYS / (dt * 1e3):.2f} Mrays/s)",
              flush=True)

    for label, fn in arms:
        timed(fn, label)
    for label, fn in arms:          # repeat round (contention guard)
        timed(fn, label + " (rep)")


if __name__ == "__main__":
    main()
