"""§13 texture-gather lever A/B on the Sponza-class (2.1 GiB) courtyard.

Arms (512x512, 4 spp, pallas backend, 5-bounce full path + 1-bounce
preview ms/step), then a same-RNG quality gate (the 512² film after
16 spp, tonemapped, MSE vs the base arm):

  base    round-3 production: trilinear everywhere, f32 rows, unpaired
  near    + tex_nearest_tail (nearest-mip material sampling, bounces>=1)
  bf16    + bfloat16 pool rows (half footprint/bytes per gather)
  paired  + stride-(w+1) pool rows: (x0,x0+1) fetched as one (2,4) slice
  all     near + bf16 + paired

`paired` must be bit-exact (same texels, same weights). Results land in
docs/perf_budget.md §14.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp

import pt  # noqa
from pt.scene.standin import make_courtyard_scene
from pt.scene.textures import build_scene_textures
from pt.render.integrator import PathTracingSettings
from pt.run.renderer import Renderer

TEX_SCALE = float(os.environ.get("TEX_SCALE", "1.0"))
QUALITY_SPP = 16


def to_bf16(tex):
    return dataclasses.replace(tex, data=tex.data.astype(jnp.bfloat16))


def run_arm(name, scene, tex, nearest):
    out = {"name": name}
    for bounces in (5, 1):
        s = PathTracingSettings(sample_count=4, bounce_count=bounces,
                                backend="pallas", tex_nearest_tail=nearest)
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
            # same-RNG quality film: fresh accumulation, QUALITY_SPP spp
            r.reset_accumulation()
            done = 0
            while done < QUALITY_SPP:
                r.render(4)
                done += 4
            film = np.asarray(r.film_mean())
            out["film"] = 1.0 - np.exp(-film)          # tonemapped
        del r
    return out


def main():
    t0 = time.perf_counter()
    scene = make_courtyard_scene(tex_scale=TEX_SCALE)
    print(f"scene build {time.perf_counter()-t0:.1f}s", flush=True)

    results = []

    t0 = time.perf_counter()
    pool = build_scene_textures(scene, paired=False, dtype=None)
    print(f"f32 pool build {time.perf_counter()-t0:.1f}s "
          f"rows {pool.data.shape[0]}", flush=True)
    results.append(run_arm("base", scene, pool, nearest=False))
    results.append(run_arm("near", scene, pool, nearest=True))
    results.append(run_arm("bf16", scene, to_bf16(pool), nearest=False))
    del pool

    t0 = time.perf_counter()
    pool_p = build_scene_textures(scene, paired=True, dtype=None)
    print(f"paired pool build {time.perf_counter()-t0:.1f}s "
          f"rows {pool_p.data.shape[0]}", flush=True)
    results.append(run_arm("paired", scene, pool_p, nearest=False))
    results.append(run_arm("all", scene, to_bf16(pool_p), nearest=True))
    del pool_p

    base_film = results[0]["film"]
    print("\narm      b5 ms/step  b1 ms/step   film MSE vs base")
    for r in results:
        mse = float(np.mean((r["film"] - base_film) ** 2))
        print(f"{r['name']:8s} {r['b5_ms']:10.1f} {r['b1_ms']:11.1f}"
              f"   {mse:.3e}", flush=True)


if __name__ == "__main__":
    main()
