#!/usr/bin/env python
"""Headline benchmark: path-tracing throughput in Mrays/sec on one chip.

Headline scene: the Courtyard — the procedural Sponza-class stand-in
(213k triangles, 23 textured materials, alpha-tested foliage, instanced
colonnade, 4 point + 1 directional light; pt/scene/standin.py). The
BASELINE.json north star (200 Mrays/s) is defined on Intel Sponza;
enclosed multi-material content like this is the representative load.
The open-landscape heightfield (worst case for packet traversal: diffuse
cones sweep the whole scene — see docs/perf_budget.md §2) is reported as
a secondary field.

Throughput counts useful rays (live closest-hit + NEE shadow rays) through
the production host-orchestrated wavefront renderer (Pallas BF8 packet
kernels + per-stage jits + wavefront compaction).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import time

BASELINE_MRAYS = 200.0
# Courtyard spp at which the tonemapped film's MSE vs deep accumulation
# drops below the 1e-3 contract threshold (measured trajectory:
# benches/convergence.py, 2026-08-17 — 128 spp → 8.4e-4; BASELINE.md)
SPP_CONVERGED = 128

# Per-scene adaptive estimator targets (VERDICT r3 weak-item 5: the old
# hard-coded 7e-4 silently measured a different true-MSE point on any
# other scene). Each entry is CALIBRATED so render_adaptive's pooled-
# variance stop lands at true film MSE ≈ 1e-3 vs a 1024-spp reference —
# the same contract SPP_CONVERGED encodes. Calibration procedure:
# benches/convergence.py (spp* for the scene) + benches/adaptive_ab.py
# --target-mses sweep; the ~1.4x estimator/true gap is the pooled-variance
# firefly bias + the reference's own noise floor (perf_budget §9.3).
# Scenes without an entry get no adaptive-TTC rider rather than a number
# measured against an uncalibrated quality point.
TARGET_MSE_CALIBRATION = {
    "Courtyard": 7e-4,        # r2 calibration, re-validated on the 2.1 GiB
                              # pool in round 4 (adaptive_ab re-run)
}


def _make(scene, width, height, bounces, spp=4, tex=None):
    from pt.render.integrator import PathTracingSettings
    from pt.run.renderer import Renderer

    renderer = Renderer(PathTracingSettings(sample_count=spp,
                                            bounce_count=bounces,
                                            backend="pallas"))
    renderer.set_scene(scene, tex=tex, stream_textures=False)
    renderer.on_resize(width, height)
    return renderer


def _warm(renderer) -> None:
    """Compile everything a steady-state step touches BEFORE any clock
    starts: render(1) compiles the kernels and observes the live counts;
    the second render applies the discovered compaction plan (compiling
    each size-class variant of bounce/compact/scatter); the third
    confirms steady state. Round 2's spp/TTC riders warmed with ONE
    render, so their timed steps paid those first-compiles — the
    20x-adaptive-speedup inconsistency VERDICT round-2 task 2 flagged."""
    renderer.render(1)
    renderer.render()
    renderer.render()
    _ = renderer.rays_traced                 # sync before any clock


def measure(scene, width=512, height=512, steps=3, bounces=5,
            tex=None) -> float:
    renderer = _make(scene, width, height, bounces, tex=tex)
    _warm(renderer)
    start_rays = renderer.rays_traced
    t0 = time.perf_counter()
    for _ in range(steps):
        renderer.render()
    total_rays = renderer.rays_traced - start_rays
    dt = time.perf_counter() - t0
    return total_rays / dt / 1e6


def measure_spp_rate(scene, width, height, steps=2, spp=1,
                     tex=None) -> float:
    """Samples-per-pixel per second (the BASELINE.json 'spp/sec' metric).
    Warmed identically to measure(): all compaction size classes compile
    before the clock, so TTC(uniform) = SPP_CONVERGED / rate is a warm
    number comparable to the adaptive TTC below."""
    renderer = _make(scene, width, height, bounces=5, spp=spp, tex=tex)
    _warm(renderer)
    t0 = time.perf_counter()
    for _ in range(steps):
        renderer.render()
    _ = renderer.rays_traced
    dt = time.perf_counter() - t0
    return steps * spp / dt


def measure_adaptive_ttc(scene, width=256, height=256, tex=None) -> float:
    """Measured wall time of a global-MSE-targeted adaptive render at the
    scene's CALIBRATED estimator target (TARGET_MSE_CALIBRATION — the
    per-scene point where render_adaptive's pooled-variance stop lands at
    true film MSE ≈ 1e-3, the SPP_CONVERGED contract). Raises KeyError
    for uncalibrated scenes: an adaptive TTC against an arbitrary target
    is not comparable to the uniform TTC (the round-3 defect class).
    Second run timed (first compiles; reset clears the compaction plan,
    so the timed run pays re-observation syncs but no compiles — same as
    uniform's steady state)."""
    target = TARGET_MSE_CALIBRATION[scene.name]
    renderer = _make(scene, width, height, bounces=5, spp=4, tex=tex)
    renderer.render_adaptive(target_mse=target, max_spp=512, min_spp=16)
    renderer.reset_accumulation()
    t0 = time.perf_counter()
    renderer.render_adaptive(target_mse=target, max_spp=512, min_spp=16)
    _ = renderer.rays_traced
    return time.perf_counter() - t0


def _device_probe_ok(timeout_s: float = 180.0) -> bool:
    """The axon TPU tunnel can wedge so hard that jax.devices() blocks
    forever (observed 2026-08-18 and again 08-19 — even a trivial matmul
    never returns). Probe device discovery in a SUBPROCESS with a timeout
    so this process never touches a hung backend; on failure the caller
    pins jax to CPU and emits a clearly-flagged tiny-config JSON line
    instead of hanging the driver with no BENCH output at all."""
    import os
    import subprocess
    import sys
    if os.environ.get("PT_BENCH_FORCE_CPU"):      # fallback-path testing
        return False
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _cpu_fallback() -> None:
    """Tiny-config CPU bench: NOT comparable to the TPU headline (the
    packet kernels resolve to the threaded-LBVH XLA path off-TPU); exists
    only so the driver records an honest JSON line when the TPU tunnel is
    unreachable at bench time."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import pt  # noqa: F401
    from pt.scene.examples import make_heightfield_scene

    value = measure(make_heightfield_scene(64), width=128, height=128,
                    steps=2, bounces=3)
    print(json.dumps({
        "metric": "path_tracing_throughput",
        "value": round(value, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(value / BASELINE_MRAYS, 4),
        "scene": "heightfield-8k-tris-cpu-fallback",
        "platform": "cpu-fallback",
        "note": ("TPU (axon tunnel) unreachable at bench time - device "
                 "discovery probe timed out; tiny 128x128 CPU config on "
                 "the XLA LBVH fallback path, NOT comparable to TPU "
                 "rounds (see BASELINE.md round-3 table for the last "
                 "on-chip numbers)"),
    }))


def main() -> None:
    if not _device_probe_ok():
        _cpu_fallback()
        return
    import pt  # noqa: F401  (configures the persistent compile cache)
    from pt.scene.standin import make_courtyard_scene
    from pt.scene.examples import make_heightfield_scene
    from pt.scene.textures import build_scene_textures

    heightfield = measure(make_heightfield_scene(224))
    # FROZEN round-over-round comparability arm (VERDICT r3 task 2): the
    # round-2 courtyard exactly — tex_scale=1/16 (9.9 MiB pool). Scene-
    # hardness changes (like round 3's 2.1 GiB Sponza-class pool) land in
    # the scene_version field; THIS number only moves when the renderer
    # moves. r2 measured 0.604, r3-era renderer ~0.58 on it.
    r2_scene = make_courtyard_scene(tex_scale=1.0 / 16.0)
    courtyard_r2pool = measure(r2_scene, tex=build_scene_textures(r2_scene))
    del r2_scene
    # the courtyard's Sponza-class texture set (2x4k + 2k/1k mix, ~2 GiB
    # pool) is expensive to author + upload — build scene and pool ONCE
    # and share across the riders (cameras are re-resized per measure)
    courtyard_scene = make_courtyard_scene()
    courtyard_tex = build_scene_textures(courtyard_scene)
    cy = lambda: courtyard_scene  # noqa: E731

    courtyard = measure(cy(), tex=courtyard_tex)
    # preview mode (≙ the reference's interactive low-bounce setting):
    # coherent primary+NEE work, where packet traversal runs near its
    # coherent rate — the user-facing interactive number
    preview = measure(cy(), bounces=1, tex=courtyard_tex)
    # the other two BASELINE.json headline metrics: spp/s at 1080p on the
    # Sponza-class scene, and time-to-converged frame (MSE < 1e-3 vs deep
    # accumulation at SPP_CONVERGED samples; trajectory in BASELINE.md)
    spp_1080 = measure_spp_rate(cy(), 1920, 1080, tex=courtyard_tex)
    spp_256 = measure_spp_rate(cy(), 256, 256, spp=4, tex=courtyard_tex)
    extra = {}
    try:
        extra["courtyard_ttc_adaptive_256_s"] = round(
            measure_adaptive_ttc(cy(), tex=courtyard_tex), 1)
    except Exception:
        pass                              # rider field only; never break
    try:
        # host-side static accel build (native SBVH + BF8 collapse +
        # Woop pages; ≙ the reference's blocking BLAS/TLAS build submit,
        # AccelerationStructure.cpp:26-35) — second run timed, the first
        # pays the one-time g++ of csrc/sah_bvh.cpp
        import numpy as np

        from pt.accel.pallas_bvh import build_packet_bvh_sah
        from pt.scene.flatten import flatten_scene
        ds = flatten_scene(courtyard_scene)
        pos = np.asarray(ds.obj_positions)
        rows = np.asarray(ds.tri_idx)
        opq = np.asarray(ds.tri_opaque)
        build_packet_bvh_sah(pos, rows, block=32, tri_opaque_np=opq,
                             spatial=True)
        t0 = time.perf_counter()
        build_packet_bvh_sah(pos, rows, block=32, tri_opaque_np=opq,
                             spatial=True)
        extra["courtyard_accel_build_s"] = round(time.perf_counter() - t0,
                                                 2)
    except Exception:
        pass                              # rider field only; never break


    # headline stays the heightfield for cross-round comparability
    # (round 1 measured 2.96 on it); the Sponza-class courtyard (213k
    # tris, textures, alpha foliage) rides along as the representative-
    # content secondary (see BASELINE.md round-2 table + perf budget)
    print(json.dumps({
        "metric": "path_tracing_throughput",
        "value": round(heightfield, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(heightfield / BASELINE_MRAYS, 4),
        "scene": "heightfield-100k-tris",
        # courtyard fields below measure the r3+ Sponza-class config
        # (2.1 GiB authored-mip pool); the r2pool arm is the frozen
        # renderer-comparability number (9.9 MiB pool, the r2 scene)
        "courtyard_scene_version": "r3-sponza-pool-2.1GiB",
        "courtyard_r2pool_mrays": round(courtyard_r2pool, 3),
        "courtyard_sponza_class_mrays": round(courtyard, 3),
        "courtyard_preview_1bounce_mrays": round(preview, 3),
        "courtyard_spp_per_s_1080p": round(spp_1080, 4),
        "courtyard_time_to_converged_256_s": round(SPP_CONVERGED / spp_256,
                                                   1),
        **extra,
    }))


if __name__ == "__main__":
    main()
