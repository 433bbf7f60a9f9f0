"""Convergence trajectory of the Courtyard: establishes the spp count at
which a frame is "converged" for the time-to-converged-frame headline
metric (BASELINE.json "metric": time-to-converged frame; SURVEY §6).

Criterion: MSE of the tonemapped film at N spp against the same
renderer's deep-accumulation film (default 1024 spp) drops below the
1e-3 contract threshold (the same threshold BASELINE.json's north-star
MSE uses). The reference film's own residual noise makes this slightly
conservative (measured MSE ≈ var/N + var/N_ref).

Run on a TPU host: `python benches/convergence.py [--size 256]
[--ref-spp 1024]`. Writes the table to stdout; the chosen spp* is
recorded in BASELINE.md and baked into bench.py's derived
time-to-converged field.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import pt  # noqa: F401
from pt.render.integrator import PathTracingSettings
from pt.run.renderer import Renderer
from pt.scene.standin import make_courtyard_scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--ref-spp", type=int, default=1024)
    ap.add_argument("--bounces", type=int, default=5)
    args = ap.parse_args()
    W = H = args.size

    r = Renderer(PathTracingSettings(sample_count=4,
                                     bounce_count=args.bounces,
                                     backend="pallas"))
    r.set_scene(make_courtyard_scene(), stream_textures=False)
    r.on_resize(W, H)

    marks = [m for m in (16, 32, 64, 128, 256, 512)
             if m < args.ref_spp]
    snaps = {}
    t0 = time.perf_counter()
    while r.total_samples < args.ref_spp:
        r.render()
        if r.total_samples in marks:
            snaps[r.total_samples] = r.snapshot()
    _ = r.rays_traced                       # sync before the clock
    dt = time.perf_counter() - t0
    ref = r.snapshot()
    spp_s = r.total_samples / dt
    print(f"courtyard {W}x{H} {args.bounces} bounces: "
          f"{spp_s:.2f} spp/s over {r.total_samples} spp", flush=True)

    spp_star = None
    for m in marks:
        mse = float(np.mean((snaps[m] - ref) ** 2))
        mark = "PASS" if mse < 1e-3 else "    "
        if mse < 1e-3 and spp_star is None:
            spp_star = m
        print(f"  {m:5d} spp  MSE vs {args.ref_spp}spp = {mse:.3e}  {mark}",
              flush=True)
    if spp_star is None:
        print("no mark reached MSE < 1e-3; raise --ref-spp", flush=True)
    else:
        print(f"spp* = {spp_star} (first mark with MSE < 1e-3); "
              f"time-to-converged at this size = {spp_star / spp_s:.1f} s",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
