#!/usr/bin/env python
"""Headline benchmark: path-tracing throughput in Mrays/sec on one chip.

Renders the procedural 100k-triangle heightfield scene (stand-in for the
Sponza-class imported scenes until asset import lands) through the
production host-orchestrated wavefront renderer (pt.run.renderer: Pallas
packet traversal + per-stage jits) and reports useful rays traced per
second (live closest-hit + NEE shadow rays). Baseline is the BASELINE.json
north-star target of 200 Mrays/s per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

BASELINE_MRAYS = 200.0


def main() -> None:
    import pt  # noqa: F401  (configures the persistent compile cache)
    from pt.render.integrator import PathTracingSettings
    from pt.run.renderer import Renderer
    from pt.scene.examples import make_heightfield_scene

    width = height = 512
    renderer = Renderer(PathTracingSettings(sample_count=4, bounce_count=5,
                                            backend="pallas"))
    renderer.set_scene(make_heightfield_scene(224))
    renderer.on_resize(width, height)

    # warmup: compiles the kernels AND the compaction size classes the
    # plan discovers after the first step (each class is a cached variant)
    renderer.render(1)
    renderer.render()
    renderer.render()
    start_rays = renderer.rays_traced

    steps = 4
    t0 = time.perf_counter()
    for _ in range(steps):
        renderer.render()
    total_rays = renderer.rays_traced - start_rays
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
