"""Stage decomposition of texture-gather cost at Sponza-class pool sizes.

Times raygen + the first three full-width bounce stages on the courtyard
at tex_scale=1/16 (~10 MiB pool) vs 1.0 (~2.1 GiB), isolating what the
pool's HBM footprint adds per stage. Results: docs/perf_budget.md §13.
(A standalone gather microbench is NOT valid here: XLA constant-folds
gathers from a freshly-built constant pool — measure inside the real
stage jits, as this script does.)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
import pt  # noqa
from pt.scene.standin import make_courtyard_scene
from pt.scene.textures import build_scene_textures
from pt.render.integrator import PathTracingSettings
import pt.run.renderer as R

def stages(tex_scale):
    scene = make_courtyard_scene(tex_scale=tex_scale)
    tex = build_scene_textures(scene)
    s = PathTracingSettings(sample_count=1, bounce_count=5,
                            backend="pallas")
    r = R.Renderer(s)
    r.set_scene(scene, tex=tex, stream_textures=False)
    r.on_resize(512, 512)
    r.render(1); r.render(); r.render()   # warm all classes
    _ = r.rays_traced
    jset = r._jit_settings()
    inv_view, inv_proj = r._camera_mats()
    px, py = r._px, r._py
    n_full = 512 * 512

    def t(label, fn, reps=3):
        out = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        print(f"  {label:24s} {(time.perf_counter()-t0)/reps*1e3:8.1f} ms",
              flush=True)
        return out

    print(f"tex={tex_scale} pool rows {tex.data.shape[0]}", flush=True)
    state = R._init_state_jit(px, py, 512, jnp.uint32(0))
    carry = t("raygen", lambda: R._raygen_jit(
        px, py, 512, 512, inv_view, inv_proj, state, jset))
    c0 = t("bounce0 (full width)", lambda: R._bounce_jit(
        r.ds, r.tex, r.accel, carry, jset, False, 1.0)[0])
    c1 = t("bounce1 (full width)", lambda: R._bounce_jit(
        r.ds, r.tex, r.accel, c0, jset, True, 1.0)[0])
    t("bounce2 (full width)", lambda: R._bounce_jit(
        r.ds, r.tex, r.accel, c1, jset, True, 1.0)[0])

stages(1 / 16)
stages(1.0)
