#!/usr/bin/env python
"""RR tail truncation + spp-major grouping: the honest round-3 gate.

Part A (heightfield): throughput per arm, isolating
  - grouping on/off at bounces=5 and bounces=1 (the bounce-0-only run
    directly measures the per-program traversal-floor penalty 4x more
    programs pay when 4 spp share each packet)
  - rr_scale in {1, 1.5, 2, 3} with grouping off
Part B: time-to-contract — wall time for the tonemapped film MSE vs an
  rr=1 deep reference to drop below 1e-3 (the BASELINE.json quality
  contract). RR truncation is unbiased but adds variance: it only counts
  if TTC improves too.
Part C/D: same for the courtyard (Sponza-class textures, round 3).

Run: python benches/rr_ttc.py [heightfield|courtyard]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import pt  # noqa: F401


def _renderer(scene, tex, rr, group, bounces=5, spp=4, rr_start=0):
    import pt.run.renderer as R
    from pt.render.integrator import PathTracingSettings
    R._MAX_GROUP_LANES = (1 << 20) if group else 0
    r = R.Renderer(PathTracingSettings(
        sample_count=spp, bounce_count=bounces, backend="pallas",
        reverse_point_shadows=False, rr_scale=rr, rr_start_bounce=rr_start))
    r.set_scene(scene, tex=tex, stream_textures=False)
    return r


def measure(scene, tex, rr, group, bounces=5, steps=3, size=512,
            rr_start=0):
    r = _renderer(scene, tex, rr, group, bounces, rr_start=rr_start)
    r.on_resize(size, size)
    r.render(1)
    r.render()
    r.render()
    start = r.rays_traced
    t0 = time.perf_counter()
    for _ in range(steps):
        r.render()
    rays = r.rays_traced - start
    dt = time.perf_counter() - t0
    return rays / dt / 1e6, dt / steps * 1e3


def tonemapped(film_mean):
    return 1.0 - np.exp(-np.asarray(film_mean))


def ttc(scene, tex, rr, ref_tm, target=1e-3, chunk=8, max_spp=1024,
        size=256, rr_start=0, group=True):
    """Wall time + spp for the tonemapped film MSE vs `ref_tm` to pass
    `target`. Warm (all compiles) before the clock."""
    r = _renderer(scene, tex, rr, group=group, rr_start=rr_start)
    r.on_resize(size, size)
    r.render(1)
    r.render(chunk)
    _ = r.rays_traced
    r.reset_accumulation()
    t0 = time.perf_counter()
    spp = 0
    while spp < max_spp:
        r.render(chunk)
        spp += chunk
        mse = float(np.mean((tonemapped(r.film_mean()) - ref_tm) ** 2))
        if mse < target:
            return time.perf_counter() - t0, spp, mse
    return time.perf_counter() - t0, spp, mse


def reference_film(scene, tex, size=256, spp=1024):
    r = _renderer(scene, tex, rr=1.0, group=False)
    r.on_resize(size, size)
    for _ in range(spp // 16):
        r.render(16)
    return tonemapped(r.film_mean())


def run_heightfield() -> None:
    from pt.scene.examples import make_heightfield_scene
    scene = make_heightfield_scene(224)
    print("== heightfield throughput (512^2, 4 spp/step) ==", flush=True)
    for label, rr, group, bounces, rr_start in [
            ("flat rr1 b5", 1.0, False, 5, 0),
            ("hybrid rr1 b5", 1.0, True, 5, 0),
            ("hybrid rr1 b1", 1.0, True, 1, 0),
            ("hybrid rr2 s2", 2.0, True, 5, 2),
            ("hybrid rr2 s3", 2.0, True, 5, 3),
            ("hybrid rr3 s3", 3.0, True, 5, 3)]:
        mr, ms = measure(scene, None, rr, group, bounces,
                         rr_start=rr_start)
        print(f"  {label:18s} {mr:7.3f} Mrays/s {ms:8.1f} ms/step",
              flush=True)
    print("== heightfield TTC (256^2, MSE<1e-3 vs rr1@512) ==", flush=True)
    ref = reference_film(scene, None, spp=512)
    for rr, rr_start in ((1.0, 0), (2.0, 2), (2.0, 3), (3.0, 3)):
        wall, spp, mse = ttc(scene, None, rr, ref, rr_start=rr_start)
        print(f"  rr{rr} s{rr_start}: {wall:6.2f} s  spp*={spp} "
              f" mse={mse:.2e}", flush=True)


def run_courtyard() -> None:
    from pt.scene.standin import make_courtyard_scene
    from pt.scene.textures import build_scene_textures
    scene = make_courtyard_scene()
    tex = build_scene_textures(scene)
    print("== courtyard throughput (512^2, Sponza-class textures) ==",
          flush=True)
    for label, rr, group, rr_start in [
            ("flat rr1", 1.0, False, 0),
            ("hybrid rr1", 1.0, True, 0),
            ("hybrid rr2 s2", 2.0, True, 2),
            ("hybrid rr2 s3", 2.0, True, 3),
            ("hybrid rr2 s0", 2.0, True, 0)]:
        mr, ms = measure(scene, tex, rr, group=group, rr_start=rr_start)
        print(f"  {label:14s} {mr:7.3f} Mrays/s {ms:8.1f} ms/step",
              flush=True)
    print("== courtyard TTC (256^2, MSE<1e-3 vs rr1@1024) ==", flush=True)
    ref = reference_film(scene, tex, spp=1024)
    for rr, rr_start in ((1.0, 0), (2.0, 2), (2.0, 3)):
        wall, spp, mse = ttc(scene, tex, rr, ref, chunk=16,
                             rr_start=rr_start)
        print(f"  rr{rr} s{rr_start}: {wall:6.1f} s  spp*={spp} "
              f" mse={mse:.2e}", flush=True)


def main() -> None:
    only = sys.argv[1] if len(sys.argv) > 1 else None
    if only in (None, "heightfield"):
        run_heightfield()
    if only in (None, "courtyard"):
        run_courtyard()


if __name__ == "__main__":
    main()
