"""Round-5 quad-row texture layout A/B on the Sponza-class courtyard.

The round-4 pair lever (both bilinear x-corners in one (8,) row gather)
measured −21.6% full-step on the 2.1 GiB pool — evidence that texture
gathers are row-LATENCY-bound, not byte-bound. The quad layout bakes all
FOUR wrap-neighbor corners into one (16,) row, halving gathers again
(bilinear 2→1, trilinear 4→2, nearest-mip tail 2→1) at 4x base storage
(2x net under bf16 rows). Both layouts are bit-exact vs flat rows (same
texels, same weights — pinned by tests/test_textures.py).

Arms (both with bf16 rows + tex_nearest_tail, i.e. the rest of the
round-4 production stack):

  pair   (P, 8) rows — the round-4 production default for large pools
  quad   (P, 16) rows — the round-5 candidate default

512x512, 4 spp, pallas backend; b5 full path + b1 preview ms/step, and a
same-RNG 16-spp film equality check (must be EXACTLY equal: identical
texels and weights). Result decides POOL_QUAD_DEFAULT's auto rule and
lands in docs/perf_budget.md §14.5.
"""
import json
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
QUALITY_SPP = 16
OUT_JSON = os.environ.get("QUAD_JSON", "/tmp/quad_ab.json")


def run_arm(name, scene, tex):
    out = {"name": name}
    for bounces in (5, 1):
        s = PathTracingSettings(sample_count=4, bounce_count=bounces,
                                backend="pallas")
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
            done = 0
            while done < QUALITY_SPP:
                r.render(4)
                done += 4
            out["film"] = np.asarray(r.film_mean())
        del r
    return out


def main():
    t0 = time.perf_counter()
    scene = make_courtyard_scene(tex_scale=TEX_SCALE)
    print(f"scene build {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    pool_p = build_scene_textures(scene, paired=True, quad=False)
    print(f"pair pool build {time.perf_counter()-t0:.1f}s  "
          f"rows {pool_p.data.shape} {pool_p.data.dtype} "
          f"({pool_p.data.nbytes/2**30:.2f} GiB)", flush=True)
    pair = run_arm("pair", scene, pool_p)
    del pool_p

    t0 = time.perf_counter()
    pool_q = build_scene_textures(scene, quad=True)
    print(f"quad pool build {time.perf_counter()-t0:.1f}s  "
          f"rows {pool_q.data.shape} {pool_q.data.dtype} "
          f"({pool_q.data.nbytes/2**30:.2f} GiB)", flush=True)
    quad = run_arm("quad", scene, pool_q)
    del pool_q

    exact = bool(np.array_equal(pair["film"], quad["film"]))
    print(f"\npair b5 {pair['b5_ms']:.1f} ms  quad b5 {quad['b5_ms']:.1f} ms"
          f"  ({quad['b5_ms']/pair['b5_ms']:.3f}x)", flush=True)
    print(f"pair b1 {pair['b1_ms']:.1f} ms  quad b1 {quad['b1_ms']:.1f} ms"
          f"  ({quad['b1_ms']/pair['b1_ms']:.3f}x)", flush=True)
    print(f"film bit-exact: {exact}", flush=True)
    assert exact, "quad film must be bit-identical to pair"
    with open(OUT_JSON, "w") as f:
        json.dump({"pair_b5_ms": pair["b5_ms"], "quad_b5_ms": quad["b5_ms"],
                   "pair_b1_ms": pair["b1_ms"], "quad_b1_ms": quad["b1_ms"],
                   "bit_exact": exact}, f, indent=1)


if __name__ == "__main__":
    main()
