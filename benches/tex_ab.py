"""End-to-end courtyard A/B: placeholder-size vs Sponza-class textures.

Full production render steps (512x512, 4 spp, pallas backend) at
tex_scale=1/16 vs 1.0, at 5 bounces and 1 bounce (preview), pricing the
texture-gather share of a real step. Results: docs/perf_budget.md §13.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pt  # noqa
from pt.scene.standin import make_courtyard_scene
from pt.scene.textures import build_scene_textures
from pt.render.integrator import PathTracingSettings
from pt.run.renderer import Renderer

def arms(tex_scale):
    t0 = time.perf_counter()
    scene = make_courtyard_scene(tex_scale=tex_scale)
    tex = build_scene_textures(scene)
    print(f"tex={tex_scale}: scene+pool build {time.perf_counter()-t0:.1f}s "
          f"pool rows {tex.data.shape[0]}", flush=True)
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
        print(f"  b{bounces}: {dt*1e3:7.1f} ms/step", flush=True)

arms(1 / 16)
arms(1.0)
