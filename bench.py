#!/usr/bin/env python
"""Headline benchmark: path-tracing throughput in Mrays/sec on one chip.

Renders the built-in Default scene (Cornell box + glass/mirror cubes — the
reference's boot scene, ExampleScenes.cpp:320) progressively and reports
useful rays traced per second (live closest-hit rays + NEE shadow rays, the
standard path-tracer metric). Baseline is the BASELINE.json north-star
target of 200 Mrays/s per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_MRAYS = 200.0


def main() -> None:
    from pt.render.integrator import PathTracingSettings, render_image_stats
    from pt.render.textures import default_texture_pool
    from pt.scene.examples import make_default_scene
    from pt.scene.flatten import flatten_scene

    width = height = 512
    settings = PathTracingSettings(sample_count=8, bounce_count=5)

    scene = make_default_scene()
    ds = flatten_scene(scene)
    tex = default_texture_pool()
    cam = scene.cameras[0]
    cam.on_resize(width, height)

    # compile + warmup
    img, rays = render_image_stats(ds, tex, cam.inv_view, cam.inv_proj,
                                   width, height, 0, settings)
    img.block_until_ready()

    steps = 4
    total_rays = 0
    t0 = time.perf_counter()
    for i in range(steps):
        img, rays = render_image_stats(ds, tex, cam.inv_view, cam.inv_proj,
                                       width, height,
                                       (i + 1) * settings.sample_count,
                                       settings)
        total_rays += int(rays)
    img.block_until_ready()
    dt = time.perf_counter() - t0

    mrays = total_rays / dt / 1e6
    print(json.dumps({
        "metric": "path_tracing_throughput",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
