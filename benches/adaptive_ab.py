"""Adaptive-film A/B: wall time to a converged (MSE < 1e-3) Courtyard
frame, uniform progressive accumulation vs render_adaptive's noise-driven
per-pixel stopping.

Protocol (matches benches/convergence.py): 256² film, 5 bounces, pallas
backend; reference film = 1024-spp uniform accumulation from the same
renderer. The uniform arm times a warm run to spp* = 128 (the first mark
under 1e-3, BASELINE.md); the adaptive arm times warm render_adaptive
runs over a tolerance sweep and reports {wall, mean spp, film MSE}. Each
timed arm runs twice and reports the second (jit cache warm — adaptive
visits several wavefront size classes, each a one-time compile).

Run on a TPU host: `python benches/adaptive_ab.py [--size 256]`.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import pt  # noqa: F401
from pt.post.pipeline import PostProcessSettings
from pt.render.integrator import PathTracingSettings
from pt.run.renderer import Renderer
from pt.scene.standin import make_courtyard_scene

SET = None
TEX = None           # scene texture pool, built ONCE (2.1 GiB at full scale)


def _fresh(scene, size):
    r = Renderer(SET)
    r.set_scene(scene, tex=TEX, stream_textures=False)
    r.on_resize(size, size)
    return r


def main():
    global SET
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--ref-spp", type=int, default=1024)
    ap.add_argument("--uniform-spp", type=int, default=128)
    ap.add_argument("--bounces", type=int, default=5)
    ap.add_argument("--tols", type=float, nargs="*",
                    default=[0.06, 0.04])
    ap.add_argument("--ref-cache", default="/tmp/adaptive_ab_ref.npz",
                    help="reference-film cache (keyed by size/spp inside)")
    ap.add_argument("--scene", default="courtyard",
                    choices=["courtyard", "heightfield"])
    ap.add_argument("--target-mses", type=float, nargs="+",
                    default=[8.5e-4, 7e-4])
    args = ap.parse_args()
    SET = PathTracingSettings(sample_count=4, bounce_count=args.bounces,
                              backend="pallas")
    if args.scene == "heightfield":
        from pt.scene.examples import make_heightfield_scene
        scene = make_heightfield_scene()
    else:
        scene = make_courtyard_scene()
    if scene.textures:
        global TEX
        from pt.scene.textures import build_scene_textures
        t0 = time.perf_counter()
        TEX = build_scene_textures(scene)
        print(f"texture pool build {time.perf_counter()-t0:.1f}s "
              f"({TEX.data.nbytes/2**30:.2f} GiB)", flush=True)

    # reference film (deep uniform accumulation), cached across runs
    key = f"{args.scene}_{args.size}_{args.ref_spp}_{args.bounces}"
    ref = None
    if args.ref_cache and os.path.exists(args.ref_cache):
        data = np.load(args.ref_cache)
        if "key" in data and str(data["key"]) == key:
            ref = data["ref"]
    if ref is None:
        r = _fresh(scene, args.size)
        while r.total_samples < args.ref_spp:
            r.render()
        ref = r.snapshot()
        if args.ref_cache:
            np.savez(args.ref_cache, ref=ref, key=key)
    print(f"reference: {args.ref_spp} spp uniform", flush=True)

    # uniform arm (second run timed; first warms every jit)
    for attempt in range(2):
        r = _fresh(scene, args.size)
        t0 = time.perf_counter()
        while r.total_samples < args.uniform_spp:
            r.render()
        _ = r.rays_traced
        uni_t = time.perf_counter() - t0
    uni_mse = float(np.mean((r.snapshot() - ref) ** 2))
    print(f"uniform  {args.uniform_spp:4d} spp: {uni_t:7.1f} s  "
          f"MSE {uni_mse:.3e}", flush=True)

    for tol in args.tols:
        for attempt in range(2):
            r = _fresh(scene, args.size)
            t0 = time.perf_counter()
            stats = r.render_adaptive(tol=tol, max_spp=512, min_spp=16,
                                      check_every=16)
            _ = r.rays_traced
            ada_t = time.perf_counter() - t0
        mse = float(np.mean((r.snapshot() - ref) ** 2))
        mark = "PASS" if mse < 1e-3 else "    "
        print(f"adaptive tol={tol:.3f}: {ada_t:7.1f} s  MSE {mse:.3e} {mark}"
              f"  spp mean {stats['spp_mean']:.1f} "
              f"min {stats['spp_min']} max {stats['spp_max']}"
              f"  vs uniform {uni_t / ada_t:.2f}x", flush=True)

    for tm in args.target_mses:
        for attempt in range(2):
            r = _fresh(scene, args.size)
            t0 = time.perf_counter()
            stats = r.render_adaptive(target_mse=tm, max_spp=512,
                                      min_spp=16, check_every=16)
            _ = r.rays_traced
            ada_t = time.perf_counter() - t0
        mse = float(np.mean((r.snapshot() - ref) ** 2))
        mark = "PASS" if mse < 1e-3 else "    "
        print(f"adaptive mse<{tm:.1e}: {ada_t:7.1f} s  MSE {mse:.3e} {mark}"
              f"  spp mean {stats['spp_mean']:.1f} "
              f"min {stats['spp_min']} max {stats['spp_max']}"
              f"  vs uniform {uni_t / ada_t:.2f}x", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
