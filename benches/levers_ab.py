#!/usr/bin/env python
"""Round-3 structural-lever A/B (VERDICT round-2 task 1).

Arms, cumulative:
  base(r2)   — round-2 production behavior (per-sample dispatch, forward
               shadow rays, reference Russian roulette)
  group      — spp-major grouped dispatch (Renderer merges the step's
               samples into ONE wavefront; each 1024-ray packet covers a
               G× smaller pixel footprint → smaller per-cone leaf-visit
               unions, the one legal 'sort' per docs/perf_budget.md §2)
  group+rev  — + reversed point-light shadow rays (light→surface:
               reversed cones share one origin per light)
  group+rev+rrX — + RR tail truncation (survival = min(maxtp/X, 1));
               unbiased, costs variance — check TTC separately before
               adopting any X > 1 (benches/convergence.py)

Usage: python benches/levers_ab.py [heightfield|courtyard]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(scene, settings, width=512, height=512, steps=3, group=True):
    import pt.run.renderer as R
    from pt.run.renderer import Renderer
    old = R._MAX_GROUP_LANES
    R._MAX_GROUP_LANES = (1 << 20) if group else 1
    try:
        r = Renderer(settings)
        r.set_scene(scene, stream_textures=False)
        r.on_resize(width, height)
        r.render(1)
        r.render()
        r.render()
        start = r.rays_traced
        t0 = time.perf_counter()
        for _ in range(steps):
            r.render()
        rays = r.rays_traced - start
        dt = time.perf_counter() - t0
        return rays / dt / 1e6, dt / steps
    finally:
        R._MAX_GROUP_LANES = old


def main() -> None:
    from pt.render.integrator import PathTracingSettings
    from pt.scene.examples import make_heightfield_scene
    from pt.scene.standin import make_courtyard_scene
    arms = [
        ("base(r2)", dict(reverse_point_shadows=False), False),
        ("group", dict(reverse_point_shadows=False), True),
        ("group+rev", dict(), True),
        ("group+rev+rr1.5", dict(rr_scale=1.5), True),
        ("group+rev+rr2", dict(rr_scale=2.0), True),
    ]
    scenes = [("heightfield", lambda: make_heightfield_scene(224)),
              ("courtyard", lambda: make_courtyard_scene())]
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for sname, make in scenes:
        if only and only != sname:
            continue
        for aname, kw, grp in arms:
            st = PathTracingSettings(sample_count=4, bounce_count=5,
                                     backend="pallas", **kw)
            mr, ms = measure(make(), st, group=grp)
            print(f"{sname:12s} {aname:18s} {mr:7.3f} Mrays/s"
                  f"  {ms * 1e3:8.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
