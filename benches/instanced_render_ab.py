"""End-to-end render A/B: shared-BLAS instanced accel vs flatten.

The production proof for Renderer(instancing=...): the SAME instanced
scene (one ~6k-tri wavy grid instanced N times over a ground slab, all
opaque) rendered through the full wavefront renderer twice —

  flatten  Renderer(instancing="flatten"): duplicated world tris,
           production BF8 (the r3 default path)
  shared   Renderer(instancing="shared"): pt/accel/instanced.py pages +
           global-id remap; shading/NEE/postprocess identical code

and compared on accel build seconds, steady-state step ms, and linear
film MSE (tonemap-free film_mean). Tie-order and instance-transform
rounding make the films statistically—not bit—equal; MSE must sit far
under the 1e-3 convergence contract. Run: python
benches/instanced_render_ab.py [N_INSTANCES] (default 64).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import pt  # noqa: F401
from pt.core.camera import InputCamera
from pt.render.integrator import PathTracingSettings
from pt.run.renderer import Renderer
from pt.scene.builder import SceneBuilder
from pt.scene.types import (DirectionalLight, Geometry, MeshInfo,
                            MetallicRoughnessMaterial, PointLight)

WIDTH = HEIGHT = 256
SPP = 8
BOUNCES = 3
STEPS = 3


def _grid(n=56):
    xs = np.linspace(-1, 1, n, dtype=np.float32)
    gx, gz = np.meshgrid(xs, xs, indexing="ij")
    gy = 0.25 * np.sin(gx * 5) * np.cos(gz * 4)
    pos = np.stack([gx, gy + 0.3, gz], -1).reshape(-1, 3)
    nrm = np.tile(np.asarray([0, 1, 0], np.float32), (len(pos), 1))
    uv = (pos[:, [0, 2]] + 1) * 0.5
    idx = np.arange(n * n).reshape(n, n)
    a, c = idx[:-1, :-1].ravel(), idx[1:, 1:].ravel()
    b, d = idx[1:, :-1].ravel(), idx[:-1, 1:].ravel()
    tris = np.concatenate([np.stack([a, c, b], -1),
                           np.stack([c, a, d], -1)]).astype(np.int64)
    return pos.astype(np.float32), nrm, uv.astype(np.float32), tris


def make_scene(n_inst, seed=3):
    b = SceneBuilder("InstancedAB")
    rng = np.random.default_rng(seed)

    pos, nrm, uv, tris = _grid()
    vb = b.add_vertices(pos, uv, nrm)
    ib = b.add_indices((tris + 0).ravel().tolist())
    geo = b.add_geometry(Geometry(vb, len(pos), ib, tris.size))
    mat = b.add_material("grid", MetallicRoughnessMaterial(
        color=(0.75, 0.55, 0.35, 1.0), roughness=0.4, metalness=0.2))
    grid_model = b.add_model([MeshInfo(geo, mat)])

    side = int(np.ceil(np.sqrt(n_inst)))
    ext = side * 3.0
    gpos = np.asarray([[-ext, 0, -ext], [ext, 0, -ext],
                       [ext, 0, ext], [-ext, 0, ext]], np.float32)
    gnrm = np.tile(np.asarray([0, 1, 0], np.float32), (4, 1))
    guv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    gvb = b.add_vertices(gpos, guv, gnrm)
    gib = b.add_indices([0, 2, 1, 2, 0, 3])
    ggeo = b.add_geometry(Geometry(gvb, 4, gib, 6))
    gmat = b.add_material("ground", MetallicRoughnessMaterial(
        color=(0.55, 0.58, 0.6, 1.0), roughness=0.85, metalness=0.0))
    ground_model = b.add_model([MeshInfo(ggeo, gmat)])

    root = b.add_scene_node(0, np.eye(4))
    b.add_model_instance(ground_model, b.add_scene_node(root, np.eye(4)))
    for i in range(n_inst):
        gx = (i % side - (side - 1) / 2) * 2.6
        gz = (i // side - (side - 1) / 2) * 2.6
        s = rng.uniform(0.7, 1.4)
        ang = rng.uniform(0, 2 * np.pi)
        c, sn = np.cos(ang), np.sin(ang)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = s * np.asarray([[c, 0, sn], [0, 1, 0], [-sn, 0, c]],
                                   np.float32)
        m[:3, 3] = (gx, rng.uniform(0, 0.4), gz)
        b.add_model_instance(grid_model, b.add_scene_node(root, m))

    b.add_point_light(PointLight(color=(600.0, 580.0, 540.0),
                                 position=(0.0, ext * 0.6, 0.0)))
    b.set_directional_light(DirectionalLight(color=(2.5, 2.5, 2.3),
                                             direction=(0.3, 0.9, 0.2)))
    b.add_camera(InputCamera(50.0, ext * 6, 0.05,
                             (0.0, ext * 0.5, -ext * 0.9),
                             (0.0, -0.45, 1.0)))
    return b.create_scene()


def run_arm(scene, instancing):
    r = Renderer(PathTracingSettings(sample_count=SPP,
                                     bounce_count=BOUNCES,
                                     backend="pallas"),
                 instancing=instancing)
    r.set_scene(scene, stream_textures=False)
    r.on_resize(WIDTH, HEIGHT)
    t0 = time.perf_counter()
    r._ensure_accel()
    build_s = time.perf_counter() - t0
    kind = type(r.accel.bvh).__name__
    r.render(1)
    r.render()
    r.render()
    _ = r.rays_traced
    t0 = time.perf_counter()
    for _ in range(STEPS):
        r.render()
    _ = r.rays_traced
    step_ms = (time.perf_counter() - t0) / STEPS * 1e3
    return r.film_mean(), build_s, step_ms, kind


def main():
    n_inst = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    print(f"=== instanced render A/B: {n_inst} instances, "
          f"{WIDTH}x{HEIGHT}, spp {SPP}, bounces {BOUNCES} ===",
          flush=True)
    scene = make_scene(n_inst)
    # independent Renderer instances share the class-level accel LRU;
    # keys differ by arm so there is no cross-contamination
    film_f, build_f, ms_f, kind_f = run_arm(scene, "flatten")
    print(f"flatten: accel {kind_f:14s} build {build_f:6.2f}s  "
          f"step {ms_f:7.1f} ms", flush=True)
    film_i, build_i, ms_i, kind_i = run_arm(scene, "shared")
    print(f"shared : accel {kind_i:14s} build {build_i:6.2f}s  "
          f"step {ms_i:7.1f} ms", flush=True)
    assert kind_i == "BF8Instanced", kind_i
    mse = float(np.mean((film_f - film_i) ** 2))
    rel = abs(film_f.mean() - film_i.mean()) / max(film_f.mean(), 1e-9)
    print(f"film MSE {mse:.3e}  mean rel diff {rel:.5f}  "
          f"build {build_f/max(build_i,1e-9):.1f}x faster  "
          f"step {ms_i/ms_f:.2f}x", flush=True)


if __name__ == "__main__":
    main()
