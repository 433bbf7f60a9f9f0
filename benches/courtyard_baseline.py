"""BASELINE protocol on the Courtyard (Sponza-class stand-in) scene.

Records the rows VERDICT round-2 task 4 asks for:
  1. throughput of the production renderer on representative content
     (213k tris, 23 textured materials, alpha foliage, braziers + sun);
  2. a correctness MSE between two INDEPENDENT traversal backends
     (Pallas BF8 packet kernels vs the XLA threaded-LBVH path) at
     accumulation depth — the backends share shading but disagree on
     every traversal detail, so agreement validates both;
  3. a converged gallery frame (docs/gallery/courtyard.png).

Run on a TPU host: `python benches/courtyard_baseline.py [--spp N]`.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

import pt  # noqa: F401
from pt.render.integrator import PathTracingSettings
from pt.run.renderer import Renderer
from pt.scene.standin import make_courtyard_scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--gallery", action="store_true",
                    help="also render the 512x512 gallery frame")
    args = ap.parse_args()
    W = H = args.size
    scene = make_courtyard_scene()
    # ONE shared device pool: the round-5 quad layout is ~4 GiB resident
    # for this scene — per-renderer pool builds (the old pattern) OOM the
    # 16 GiB chip at three live renderers
    from pt.scene.textures import build_scene_textures
    tex = build_scene_textures(scene)

    # --- 1. throughput (production pallas path) ----------------------------
    r = Renderer(PathTracingSettings(sample_count=4, bounce_count=5,
                                     backend="pallas"))
    r.set_scene(scene, tex=tex, stream_textures=False)
    r.on_resize(512, 512)
    r.render(1)
    r.render()
    start = r.rays_traced
    t0 = time.perf_counter()
    for _ in range(3):
        r.render()
    rays = r.rays_traced - start        # device sync BEFORE reading the
    dt = time.perf_counter() - t0       # clock (render() is async!)
    mrays = rays / dt / 1e6
    print(f"courtyard 512x512 4spp/step 5 bounces: {mrays:.3f} Mrays/s",
          flush=True)

    # --- 2. MSE vs the brute-force oracle -----------------------------------
    # identical RNG streams + shading; only traversal differs, so this
    # validates the Pallas BF8 kernels (incl. the alpha any-hit loops) on
    # real content. Brute tests every ray against all 213k triangles —
    # affordable only on a small crop.
    del r                               # free its accel/film before arm 2
    films = {}
    for backend in ("pallas", "brute"):
        rr = Renderer(PathTracingSettings(sample_count=4, bounce_count=3,
                                          backend=backend))
        rr.set_scene(scene, tex=tex, stream_textures=False)
        rr.on_resize(W, H)
        while rr.total_samples < args.spp:
            rr.render()
        films[backend] = rr.snapshot()
        print(f"{backend}: {rr.total_samples} spp accumulated", flush=True)
        del rr
    a, b = films["pallas"], films["brute"]
    mse = float(np.mean((a - b) ** 2))
    print(f"MSE pallas-vs-brute @{args.spp}spp {W}x{H}: {mse:.3e} "
          f"({'PASS' if mse < 1e-3 else 'FAIL'} vs the 1e-3 contract)",
          flush=True)

    if args.gallery:
        from pt.out.saver import write_image
        g = Renderer(PathTracingSettings(sample_count=4, bounce_count=5,
                                         backend="pallas"))
        g.set_scene(scene, tex=tex, stream_textures=False)
        g.on_resize(512, 512)
        while g.total_samples < 256:
            g.render()
        write_image("docs/gallery/courtyard.png", g.snapshot())
        print("wrote docs/gallery/courtyard.png", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
