"""Shared-BLAS instancing vs flatten-by-duplication: build + trace A/B.

VERDICT r3 task 4's measurement: an N-instance scene (one grid mesh
instanced N times with random rigid+scale transforms) built two ways —

  flat   the production path: world-space duplicated triangles →
         build_packet_bvh_sah → build_bf8 (duplicated Woop pages)
  inst   pt/accel/instanced.py: ONE object-space page set + world
         (segment, mesh-leaf) top tree + per-visit ray transform

and traced with 65k incoherent rays + 65k coherent (camera-ish) rays.
Reports host build seconds, device bytes (pages + per-vertex state),
closest/occluded wall ms, and agreement (t within 1e-3 rel, decoded ids
equal where unambiguous). Run: python benches/instancing_ab.py [N...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

import pt  # noqa: F401
from pt.accel.instanced import (build_instanced_bf8, decode_instanced_tri,
                                packet_closest_bf8i, packet_occluded_bf8i)
from pt.accel.pallas_bvh import (build_bf8, build_packet_bvh_sah,
                                 packet_closest_bf8, packet_occluded_bf8)

N_RAYS = 65536
REPS = 5


def grid_mesh(n=56, seed=0):
    xs = np.linspace(-1, 1, n, dtype=np.float32)
    gx, gz = np.meshgrid(xs, xs, indexing="ij")
    gy = 0.2 * np.sin(gx * 5) * np.cos(gz * 4)
    pos = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)
    idx = np.arange(n * n).reshape(n, n)
    a, c = idx[:-1, :-1].ravel(), idx[1:, 1:].ravel()
    b, d = idx[1:, :-1].ravel(), idx[:-1, 1:].ravel()
    tris = np.concatenate([np.stack([a, c, b], -1),
                           np.stack([c, a, d], -1)]).astype(np.int32)
    return pos, tris


def transforms(n, seed=1, spread=40.0):
    rng = np.random.default_rng(seed)
    ts = []
    for _ in range(n):
        s = rng.uniform(0.6, 1.8)
        ang = rng.uniform(0, 2 * np.pi)
        c, sn = np.cos(ang), np.sin(ang)
        m = np.eye(4, dtype=np.float64)
        m[:3, :3] = s * np.asarray([[c, 0, sn], [0, 1, 0], [-sn, 0, c]])
        m[:3, 3] = rng.uniform(-spread, spread, 3)
        ts.append(m)
    return np.stack(ts)


def rays(seg_t, seed=2):
    rng = np.random.default_rng(seed)
    spread = np.abs(seg_t[:, :3, 3]).max() + 3
    o_inc = rng.uniform(-spread, spread, (N_RAYS, 3)).astype(np.float32)
    d_inc = rng.normal(size=(N_RAYS, 3)).astype(np.float32)
    d_inc /= np.linalg.norm(d_inc, axis=-1, keepdims=True)
    # coherent: one eye point, directions toward jittered instance centers
    eye = np.asarray([0.0, spread * 1.5, 0.0], np.float32)
    tgt = seg_t[rng.integers(0, len(seg_t), N_RAYS), :3, 3] \
        + rng.normal(0, 1.5, (N_RAYS, 3))
    d_coh = (tgt - eye).astype(np.float32)
    d_coh /= np.linalg.norm(d_coh, axis=-1, keepdims=True)
    o_coh = np.broadcast_to(eye, (N_RAYS, 3)).copy()
    return (jnp.asarray(o_inc), jnp.asarray(d_inc),
            jnp.asarray(o_coh), jnp.asarray(d_coh))


def timed(fn, *args, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / REPS * 1e3


def run(n_inst):
    pos, tris = grid_mesh()
    n_tri = len(tris)
    seg_t = transforms(n_inst)
    o_inc, d_inc, o_coh, d_coh = rays(seg_t)
    print(f"\n=== {n_inst} instances x {n_tri} tris "
          f"({n_inst * n_tri} total) ===", flush=True)

    # ---- flatten arm -------------------------------------------------
    t0 = time.perf_counter()
    wpos = np.concatenate([pos @ m[:3, :3].T.astype(np.float32)
                           + m[:3, 3].astype(np.float32) for m in seg_t])
    wtris = np.concatenate([tris + s * len(pos) for s in range(n_inst)])
    flat_host_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    fine = build_packet_bvh_sah(wpos, wtris, block=32)
    flat8 = build_bf8(fine)
    flat_build_s = time.perf_counter() - t0
    flat_bytes = int(flat8.pages.nbytes) + wpos.nbytes * 4  # pages + attrs
    print(f"flat : build {flat_build_s:6.2f}s (+{flat_host_s:.2f}s dup)  "
          f"pages {flat8.pages.nbytes/2**20:7.1f} MiB  "
          f"n_leaves {flat8.n_leaves}", flush=True)

    # ---- instanced arm ----------------------------------------------
    t0 = time.perf_counter()
    inst = build_instanced_bf8([(pos, tris, None)], [0] * n_inst, seg_t)
    inst_build_s = time.perf_counter() - t0
    if inst is None:
        # capacity ceiling, not a bug: singleton-leaf pairs are bounded
        # by the BF8 collapse's 600 KiB SMEM gate (~8k pairs) and blocks
        # by the kernel's scoped-VMEM limit (<= 256) — production falls
        # back to flatten here (pt/run/renderer.py _ensure_accel)
        print(f"inst : INFEASIBLE at {n_inst} instances "
              f"(pairs > SMEM budget at block <= 256) -> flatten fallback",
              flush=True)
        return {"n_inst": n_inst, "inst_feasible": False}
    inst_bytes = int(inst.pages.nbytes) + pos.nbytes * 4
    print(f"inst : build {inst_build_s:6.2f}s           "
          f"pages {inst.pages.nbytes/2**20:7.1f} MiB  "
          f"n_leaves {inst.n_leaves} block {inst.block}", flush=True)
    print(f"bytes ratio (pages+attrs): "
          f"{inst_bytes / flat_bytes:.3f}x", flush=True)

    # ---- trace A/B ----------------------------------------------------
    out = {"n_inst": n_inst, "flat_build_s": flat_build_s,
           "inst_build_s": inst_build_s,
           "bytes_ratio": inst_bytes / flat_bytes}
    for tag, (o, d) in (("incoh", (o_inc, d_inc)),
                        ("coh", (o_coh, d_coh))):
        # either arm can exceed the kernel's scoped-VMEM budget when the
        # leaf cap forces giant blocks (first seen: flat at 256x6050 tris
        # -> block 512 -> 25.8M scoped vs the 16M limit). Report the
        # failure as a datum instead of dying: a flat tree that cannot
        # even compile IS the flatten ceiling the instanced path removes.
        hf = hi = None
        try:
            hf, t_f = timed(packet_closest_bf8, flat8, o, d, 1e9)
        except Exception as e:
            print(f"closest[{tag:5s}]: flat COMPILE-FAIL "
                  f"(block {flat8.block}): {str(e)[:120]}", flush=True)
        try:
            hi, t_i = timed(packet_closest_bf8i, inst, o, d, 1e9)
        except Exception as e:
            print(f"closest[{tag:5s}]: inst COMPILE-FAIL "
                  f"(block {inst.block}): {str(e)[:120]}", flush=True)
        if hi is not None and hf is None:
            print(f"closest[{tag:5s}]: inst {t_i:7.2f} ms "
                  f"(flat arm uncompilable)", flush=True)
        if hf is None or hi is None:
            out[f"closest_{tag}_ratio"] = None
            continue
        mesh_tri, seg = decode_instanced_tri(hi.tri)
        glob = jnp.where(mesh_tri >= 0, seg * n_tri + mesh_tri, -1)
        tf = np.asarray(hf.t)
        ti = np.asarray(hi.t)
        hit_f = np.asarray(hf.tri) >= 0
        hit_i = np.asarray(glob) >= 0
        both = hit_f & hit_i
        t_agree = np.abs(tf[both] - ti[both]) <= 1e-3 * np.maximum(
            1.0, np.abs(tf[both]))
        id_agree = (np.asarray(hf.tri)[both] == np.asarray(glob)[both])
        miss_match = (hit_f == hit_i).mean()
        # disagreement counted over ALL rays (an incoherent set can have
        # few both-hit rays, making subset percentages meaningless —
        # round-5 finding: 6/65536 absolute disagreements read as "0.9%
        # of both" on the sparse incoherent set)
        n_all = len(tf)
        bad = ((np.asarray(hf.tri) != np.asarray(glob))
               | (both & (np.abs(tf - ti) > 1e-3 * np.maximum(
                   1.0, np.abs(tf)))))
        print(f"closest[{tag:5s}]: flat {t_f:7.2f} ms  inst {t_i:7.2f} ms "
              f"({t_i/t_f:5.2f}x)  hit-mask agree {miss_match*100:.3f}%  "
              f"t agree {t_agree.mean()*100:.3f}%  "
              f"id agree {id_agree.mean()*100:.3f}%  "
              f"abs disagree {bad.sum()}/{n_all}", flush=True)
        # correctness GATE, not prints (VERDICT r4 task 3): a silent
        # regression in _xform_rays / seg-id packing must fail this
        # bench non-interactively. Threshold from the round-5
        # float64-oracle audit (BASELINE.md r5): every flip on this
        # bench is a silhouette-grazing hit (median barycentric edge
        # distance 0.003) where the two valid f32 formulations (world
        # Woop vs object Woop + ray transform — the latter is the
        # reference's own hardware TLAS semantics) round differently,
        # and the oracle faults them EVENLY (incoh: flat 4 / inst 2 of
        # 6; coh: flat 167 / inst 175 of 312 = 0.48%). Gate at 1% of
        # ALL rays — a real indexing/transform bug flips orders of
        # magnitude more.
        assert bad.sum() <= 0.01 * n_all, \
            f"absolute disagreement {bad.sum()}/{n_all}"
        out[f"closest_{tag}_ratio"] = t_i / t_f

        try:
            of, tof = timed(packet_occluded_bf8, flat8, o, d, 30.0)
            oi, toi = timed(packet_occluded_bf8i, inst, o, d, 30.0)
        except Exception as e:
            print(f"occl   [{tag:5s}]: COMPILE-FAIL: {str(e)[:120]}",
                  flush=True)
            out[f"occl_{tag}_ratio"] = None
            continue
        occ_agree = (np.asarray(of) == np.asarray(oi)).mean()
        print(f"occl   [{tag:5s}]: flat {tof:7.2f} ms  inst {toi:7.2f} ms "
              f"({toi/tof:5.2f}x)  agree {occ_agree*100:.3f}%", flush=True)
        assert occ_agree >= 0.998, f"occlusion agreement {occ_agree}"
        out[f"occl_{tag}_ratio"] = toi / tof
    return out


def warmup():
    """Tiny untimed builds of both arms so the timed builds below pay
    host work only, not the backend's first-compile of the page-packing
    and collapse jits (observed ~150 s on the axon tunnel)."""
    pos, tris = grid_mesh(n=8)
    seg_t = transforms(2)
    wpos = np.concatenate([pos @ m[:3, :3].T.astype(np.float32)
                           + m[:3, 3].astype(np.float32) for m in seg_t])
    wtris = np.concatenate([tris + s * len(pos) for s in range(2)])
    build_bf8(build_packet_bvh_sah(wpos, wtris, block=32))
    build_instanced_bf8([(pos, tris, None)], [0, 0], seg_t)


if __name__ == "__main__":
    counts = [int(a) for a in sys.argv[1:]] or [16, 64, 128, 256]
    warmup()
    for n in counts:
        run(n)
