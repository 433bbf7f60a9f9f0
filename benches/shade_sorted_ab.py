"""Material-sorted shading A/B (perf_budget §14 lever 4 — VERDICT r4
task 7 asked for the measurement even if negative).

Arms on the Sponza-class courtyard (512², 4 spp, production pool
defaults — quad rows + bf16 + nearest tail):

  base    round-5 production (film-tile lane order into _shade_hit)
  sorted  PathTracingSettings(shade_sorted=True): lanes permuted to
          material-major order around _shade_hit inside the stage jit,
          payload inverse-permuted — texture gathers of consecutive
          lanes then share a texture set

Film must agree to ulp level (pure permutation; per-lane RNG travels
with its lane; the arms are separately compiled XLA programs). Result decides whether shade_sorted becomes a default; lands in
docs/perf_budget.md §14.6.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import pt  # noqa
from pt.render.integrator import PathTracingSettings
from pt.run.renderer import Renderer
from pt.scene.standin import make_courtyard_scene
from pt.scene.textures import build_scene_textures

TEX_SCALE = float(os.environ.get("TEX_SCALE", "1.0"))


def run_arm(name, scene, tex, sorted_):
    out = {"name": name}
    for bounces in (5, 1):
        s = PathTracingSettings(sample_count=4, bounce_count=bounces,
                                backend="pallas", shade_sorted=sorted_)
        r = Renderer(s)
        r.set_scene(scene, tex=tex, stream_textures=False)
        r.on_resize(512, 512)
        r.render(1); r.render(); r.render()
        _ = r.rays_traced
        t0 = time.perf_counter()
        for _ in range(2):
            r.render()
        _ = r.rays_traced
        dt = (time.perf_counter() - t0) / 2
        out[f"b{bounces}_ms"] = dt * 1e3
        print(f"  {name} b{bounces}: {dt*1e3:7.1f} ms/step", flush=True)
        if bounces == 5:
            r.reset_accumulation()
            r.render(8)
            out["film"] = np.asarray(r.film_mean())
        del r
    return out


def main():
    t0 = time.perf_counter()
    scene = make_courtyard_scene(tex_scale=TEX_SCALE)
    tex = build_scene_textures(scene)
    print(f"scene+pool build {time.perf_counter()-t0:.1f}s  "
          f"rows {tex.data.shape} {tex.data.dtype}", flush=True)
    base = run_arm("base", scene, tex, False)
    srt = run_arm("sorted", scene, tex, True)
    d = np.abs(base["film"] - srt["film"]).max()
    exact = bool(d <= 1e-5)
    print(f"\nbase b5 {base['b5_ms']:.1f} ms  sorted b5 {srt['b5_ms']:.1f}"
          f" ms  ({srt['b5_ms']/base['b5_ms']:.3f}x)", flush=True)
    print(f"base b1 {base['b1_ms']:.1f} ms  sorted b1 {srt['b1_ms']:.1f}"
          f" ms  ({srt['b1_ms']/base['b1_ms']:.3f}x)", flush=True)
    print(f"film max abs diff: {d:.2e} (ulp-level expected: the arms "
          f"are separately compiled programs)", flush=True)
    assert exact, f"shade_sorted must be a pure permutation (diff {d})"


if __name__ == "__main__":
    main()
