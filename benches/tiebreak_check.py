"""Chip validation for the single-winner leaf tie-break
(`_select_best_hit`, pt/accel/pallas_bvh.py).

Two checks on real TPU (the kernels don't lower on CPU):

1. **id/u/v consistency**: for every pallas closest hit, re-intersect
   the *reported* triangle with the ray (Möller–Trumbore on XLA) and
   compare the reported u/v. Before the fix, an exact t tie between two
   triangles in one leaf page could pair one triangle's id with the
   other's barycentrics (per-component max over tying rows); now one
   winning row supplies all three.
2. **film diff vs the brute oracle**: BASELINE.md recorded 8/9216
   differing pixels (shared-edge tie-breaks only) for a 96x96 Default
   render. The winner now matches `intersect_brute`'s argmin (smallest
   id), so ties resolved differently should shrink to the cases where
   the 3-bf16-pass Woop t and the Möller–Trumbore t disagree about the
   tie itself.

Run: python benches/tiebreak_check.py   (one TPU process at a time)
"""

import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp


def recompute_uv(wpos, tri_idx, o, d, tri):
    """Möller–Trumbore u/v of ray (o, d) against its reported triangle."""
    idx = tri_idx[np.maximum(tri, 0)]
    v0 = wpos[idx[:, 0]]
    e1 = wpos[idx[:, 1]] - v0
    e2 = wpos[idx[:, 2]] - v0
    pvec = np.cross(d, e2)
    det = np.sum(e1 * pvec, axis=-1)
    inv = np.where(np.abs(det) < 1e-12, 0.0, 1.0 / np.where(det == 0, 1, det))
    tvec = o - v0
    u = np.sum(tvec * pvec, -1) * inv
    qvec = np.cross(tvec, e1)
    v = np.sum(d * qvec, -1) * inv
    return u, v


def main() -> None:
    import pt  # noqa: F401  (compile cache)
    from pt.accel.intersect import intersect_brute
    from pt.accel.pallas_bvh import build_packet_bvh_sah
    from pt.render.integrator import trace_closest
    from pt.scene.examples import TEST_SCENES, make_heightfield_scene
    from pt.scene.flatten import flatten_scene, world_vertices

    for name, scene in (("heightfield", make_heightfield_scene(96)),
                        ("default", TEST_SCENES["Default"]())):
        ds = flatten_scene(scene)
        wpos = np.asarray(jax.jit(lambda d: world_vertices(d)[0])(ds))
        tri_idx = np.asarray(ds.tri_idx)
        bvh = build_packet_bvh_sah(wpos, tri_idx, block=32,
                                   tri_opaque_np=np.asarray(ds.tri_opaque),
                                   spatial=True)

        rng = np.random.default_rng(7)
        n = 9216
        lo, hi = wpos.min(0) - 1, wpos.max(0) + 1
        o = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)

        h = trace_closest(bvh, None, None, jnp.asarray(o), jnp.asarray(d))
        jax.block_until_ready(h.t)
        t_p = np.asarray(h.t)
        tri_p = np.asarray(h.tri)
        u_p, v_p = np.asarray(h.u), np.asarray(h.v)

        # 1. consistency: u/v belong to the reported triangle
        hit = tri_p >= 0
        u_r, v_r = recompute_uv(wpos, tri_idx, o, d, tri_p)
        du = np.abs(u_p - u_r)[hit]
        dv = np.abs(v_p - v_r)[hit]
        bad_uv = int(((du > 2e-2) | (dv > 2e-2)).sum())
        print(f"{name}: {int(hit.sum())} hits; "
              f"id/u/v inconsistent: {bad_uv} "
              f"(u p99 {np.percentile(du, 99):.2e})", flush=True)

        # 2. agreement vs brute (t, id)
        hb = jax.jit(intersect_brute)(jnp.asarray(wpos),
                                      jnp.asarray(tri_idx),
                                      jnp.asarray(o), jnp.asarray(d))
        jax.block_until_ready(hb.t)
        t_b, tri_b = np.asarray(hb.t), np.asarray(hb.tri)
        dt = int((np.abs(t_p - t_b) > 1e-3).sum())
        did = int((tri_p != tri_b).sum())
        print(f"{name}: vs brute: t mismatches {dt}/{n}, "
              f"id mismatches {did}/{n}", flush=True)


if __name__ == "__main__":
    main()
