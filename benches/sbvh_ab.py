"""TPU A/B: SAH vs SBVH (spatial splits) trees under the production BF8
packet kernel.

Lever 2 of docs/perf_budget.md §6: spatial splits tighten leaf boxes
around large/thin triangles, attacking the leaf-overlap component of the
packet kernel's leaf-visit union waste. Host-side surface-area cost says
SBVH is ~1.17-1.20x cheaper on the courtyard; this measures what the
kernel actually sees.

Run on a TPU host: `python benches/sbvh_ab.py [courtyard|heightfield]
[alpha]`. The optional third arm builds the SBVH with a raised Stich
overlap gate (e.g. 1e-3) — fewer spatial tries, faster host build — and
times it against the default 1e-5 tree to price the quality loss.
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
from pt.accel.pallas_bvh import build_bf8, build_packet_bvh_sah
from pt.scene.flatten import flatten_scene, world_vertices

N_RAYS = 65536
REPS = 10


def make_scene(name):
    if name == "heightfield":
        from pt.scene.examples import make_heightfield_scene
        return make_heightfield_scene(224), (-9, 9, 0, 3)
    from pt.scene.standin import make_courtyard_scene
    # tex_scale: traversal never reads textures; skip 4k authoring
    return make_courtyard_scene(tex_scale=1 / 16), (-18, 18, 0.2, 8)


def build(ds, wpos, spatial, alpha=1e-5, presplit=0.0, min_count=0):
    fine = build_packet_bvh_sah(np.asarray(wpos), np.asarray(ds.tri_idx),
                                block=32, max_leaves=8192,
                                tri_opaque_np=np.asarray(ds.tri_opaque),
                                spatial=spatial, alpha=alpha,
                                presplit_mult=presplit,
                                spatial_min_count=min_count)
    assert fine is not None
    bvh = build_bf8(fine)
    assert bvh is not None, "BF8 collapse failed (SMEM budget)"
    return bvh


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "courtyard"
    scene, (lo, hi, ylo, yhi) = make_scene(scene_name)
    ds = flatten_scene(scene)
    wpos = jax.jit(lambda d: world_vertices(d)[0])(ds)
    t0 = time.time()
    sah = build(ds, wpos, spatial=False)
    t1 = time.time()
    sbvh = build(ds, wpos, spatial=True)
    t2 = time.time()
    print(f"{scene_name}: {ds.tri_idx.shape[0]} tris; build "
          f"SAH {t1 - t0:.2f}s SBVH {t2 - t1:.2f}s; pages "
          f"SAH {sah.pages.shape} SBVH {sbvh.pages.shape}", flush=True)

    rng = np.random.default_rng(0)
    o_np = rng.uniform(lo, hi, (N_RAYS, 3)).astype(np.float32)
    o_np[:, 1] = rng.uniform(ylo, yhi, (N_RAYS,))
    d_np = rng.normal(size=(N_RAYS, 3))
    d_np /= np.linalg.norm(d_np, axis=-1, keepdims=True)
    o, d = jnp.asarray(o_np), jnp.asarray(d_np.astype(np.float32))

    # correctness: both trees must match the brute oracle
    from pt.render.integrator import trace_closest
    m = 4096
    hb = jax.jit(intersect_brute)(wpos, ds.tri_idx, o[:m], d[:m])
    jax.block_until_ready(hb.t)
    for label, bvh in (("SAH", sah), ("SBVH", sbvh)):
        h = trace_closest(bvh, None, None, o, d)
        jax.block_until_ready(h.t)
        bad = int((np.abs(np.asarray(hb.t) - np.asarray(h.t)[:m]) > 1e-3).sum())
        print(f"{label} mismatches vs oracle: {bad}/{m}", flush=True)

    def timed(bvh, label):
        @jax.jit
        def loop(bvh, o, d):
            def body(i, acc):
                h = trace_closest(bvh, None, None, o, d, acc)
                return h.t * 0 + 1e4
            return jax.lax.fori_loop(0, REPS, body,
                                     jnp.full((N_RAYS,), 1e4))
        jax.block_until_ready(loop(bvh, o, d))
        t0 = time.time()
        jax.block_until_ready(loop(bvh, o, d))
        dt = (time.time() - t0) / REPS * 1000
        print(f"{label}: {dt:.2f} ms  ({N_RAYS / (dt * 1e3):.2f} Mrays/s)",
              flush=True)

    timed(sah, "closest BF8/SAH  incoherent")
    timed(sbvh, "closest BF8/SBVH incoherent")
    # second round to confirm (contention guard)
    timed(sah, "closest BF8/SAH  incoherent (rep)")
    timed(sbvh, "closest BF8/SBVH incoherent (rep)")

    if len(sys.argv) > 2 and sys.argv[2] == "followons":
        # round-3 restricted-spatial follow-ons (perf_budget §7 tail):
        # pre-split of huge tris, and top-level-only spatial tries
        t = ds.tri_idx.shape[0]
        for label, kw in (
                ("SBVH+presplit16", dict(presplit=16.0)),
                ("SBVH+presplit64", dict(presplit=64.0)),
                ("SBVH top-only T/64", dict(min_count=max(1, t // 64))),
                ("presplit16+top-only", dict(presplit=16.0,
                                             min_count=max(1, t // 64)))):
            t0 = time.time()
            arm = build(ds, wpos, spatial=True, **kw)
            bt = time.time() - t0
            h = trace_closest(arm, None, None, o, d)
            jax.block_until_ready(h.t)
            bad = int((np.abs(np.asarray(hb.t) - np.asarray(h.t)[:m])
                       > 1e-3).sum())
            print(f"{label}: build {bt:.2f}s pages {arm.pages.shape} "
                  f"mismatches {bad}/{m}", flush=True)
            timed(arm, f"closest BF8/{label} incoherent")
        return

    if len(sys.argv) > 2:
        alpha = float(sys.argv[2])
        t0 = time.time()
        gated = build(ds, wpos, spatial=True, alpha=alpha)
        print(f"SBVH alpha={alpha:g}: build {time.time() - t0:.2f}s; "
              f"pages {gated.pages.shape}", flush=True)
        h = trace_closest(gated, None, None, o, d)
        jax.block_until_ready(h.t)
        bad = int((np.abs(np.asarray(hb.t) - np.asarray(h.t)[:m])
                   > 1e-3).sum())
        print(f"alpha={alpha:g} mismatches vs oracle: {bad}/{m}", flush=True)
        timed(gated, f"closest BF8/SBVH(alpha={alpha:g}) incoherent")


if __name__ == "__main__":
    main()
