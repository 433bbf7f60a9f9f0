"""§13 texture-gather lever A/B on the Sponza-class (2.1 GiB) courtyard.

Arms (512x512, 4 spp, pallas backend, 5-bounce full path + 1-bounce
preview ms/step), then a same-RNG quality gate (the 512² film after
QUALITY_SPP spp, tonemapped, MSE vs the base arm):

  base       round-3 production: trilinear everywhere, f32 rows, unpaired
  near       + tex_nearest_tail (nearest-mip material sampling, bounces>=1)
  bf16       + bfloat16 pool rows (half footprint/bytes per gather)
  pair       + pair-duplicated (P, 8) rows: both bilinear x-corners in ONE
               row gather (storage x2; MUST be bit-exact vs base)
  near+bf16  levers 1+3 stacked
  all        near + bf16 + pair stacked

Results stream to stdout per arm and land in docs/perf_budget.md §14.
(A stride-(w+1) dynamic-slice pair variant OOMed: XLA copies the pool to
a T(8,128) lane-padded layout for the vmapped slice — 32x HBM.)
"""
import dataclasses
import json
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
OUT_JSON = os.environ.get("TEXLEVERS_JSON", "/tmp/texlevers.json")


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


def report(results):
    base_film = results[0]["film"]
    rows = []
    print("\narm        b5 ms/step  b1 ms/step   film MSE vs base")
    for r in results:
        mse = float(np.mean((r["film"] - base_film) ** 2))
        rows.append({"name": r["name"], "b5_ms": r["b5_ms"],
                     "b1_ms": r["b1_ms"], "mse_vs_base": mse})
        print(f"{r['name']:10s} {r['b5_ms']:10.1f} {r['b1_ms']:11.1f}"
              f"   {mse:.3e}", flush=True)
    with open(OUT_JSON, "w") as f:
        json.dump(rows, f, indent=1)


def main():
    t0 = time.perf_counter()
    scene = make_courtyard_scene(tex_scale=TEX_SCALE)
    print(f"scene build {time.perf_counter()-t0:.1f}s", flush=True)

    results = []

    t0 = time.perf_counter()
    # explicit f32 flat rows: the round-3 baseline layout (dtype=None
    # now auto-selects bf16 and large pools auto-quad since round 5)
    pool = build_scene_textures(scene, paired=False, quad=False,
                                dtype=jnp.float32)
    print(f"f32 pool build {time.perf_counter()-t0:.1f}s "
          f"rows {pool.data.shape[0]}", flush=True)
    results.append(run_arm("base", scene, pool, nearest=False))
    results.append(run_arm("near", scene, pool, nearest=True))
    results.append(run_arm("bf16", scene, to_bf16(pool), nearest=False))
    results.append(run_arm("near+bf16", scene, to_bf16(pool), nearest=True))
    report(results)
    del pool

    t0 = time.perf_counter()
    pool_p = build_scene_textures(scene, paired=True, quad=False,
                                  dtype=jnp.float32)
    print(f"paired pool build {time.perf_counter()-t0:.1f}s "
          f"rows {pool_p.data.shape[0]} width {pool_p.data.shape[1]}",
          flush=True)
    results.append(run_arm("pair", scene, pool_p, nearest=False))
    results.append(run_arm("all", scene, to_bf16(pool_p), nearest=True))
    del pool_p

    report(results)
    # the pair arm must be bit-exact: same texels, same filter weights
    pair = next(r for r in results if r["name"] == "pair")
    exact = bool(np.array_equal(pair["film"], results[0]["film"]))
    print(f"pair bit-exact vs base: {exact}", flush=True)


if __name__ == "__main__":
    main()
