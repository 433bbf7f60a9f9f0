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

Failure containment (VERDICT r4 task 1 — BENCH_r04.json was lost to one
transient remote-compile error in the LAST arm): fields accumulate into
the output dict AS EACH ARM COMPLETES, every arm runs under its own
try/except (recorded in an "errors" field), transient tunnel errors are
retried (arm-level here + per-stage in pt.core.compilewatch), and the
JSON line prints from a `finally:` — a mid-run infrastructure flake can
no longer erase the arms that already finished.

Test knobs: PT_BENCH_TINY=1 runs a seconds-scale CPU-sized configuration
(arm structure identical, numbers meaningless); PT_BENCH_FAIL_ARM=<name>
injects a failure into that arm (the kill-the-tunnel-mid-bench test,
tests/test_watchdog.py).
"""

import json
import os
import sys
import time
import traceback

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

TINY = bool(os.environ.get("PT_BENCH_TINY"))


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
    if not TINY:          # tiny CPU mode: skip the compaction-class
        renderer.render()  # warm renders (each class is an XLA compile)
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
                     tex=None, bounces=5) -> float:
    """Samples-per-pixel per second (the BASELINE.json 'spp/sec' metric).
    Warmed identically to measure(): all compaction size classes compile
    before the clock, so TTC(uniform) = SPP_CONVERGED / rate is a warm
    number comparable to the adaptive TTC below."""
    renderer = _make(scene, width, height, bounces=bounces, spp=spp, tex=tex)
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
    import subprocess
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


def _cpu_fallback(result: dict) -> None:
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
    result.update({
        "value": round(value, 3),
        "vs_baseline": round(value / BASELINE_MRAYS, 4),
        "scene": "heightfield-8k-tris-cpu-fallback",
        "platform": "cpu-fallback",
        "note": ("TPU (axon tunnel) unreachable at bench time - device "
                 "discovery probe timed out; tiny 128x128 CPU config on "
                 "the XLA LBVH fallback path, NOT comparable to TPU "
                 "rounds (see BASELINE.md round-3 table for the last "
                 "on-chip numbers)"),
    })


def _run_arm(errors: dict, name: str, fn, *args, **kwargs):
    """Run one bench arm in isolation: an injected-failure knob for
    tests, one transient-error retry (the per-STAGE retries live in
    pt.core.compilewatch; this catches transients in build/upload code
    outside any stage jit), and error capture instead of propagation.
    Returns the arm's value or None on failure."""
    from pt.core.compilewatch import is_transient
    if os.environ.get("PT_BENCH_FAIL_ARM") == name:
        errors[name] = ("RuntimeError: injected failure "
                        "(PT_BENCH_FAIL_ARM)")
        return None
    for attempt in range(2):
        try:
            return fn(*args, **kwargs)
        except Exception as exc:          # noqa: BLE001 — recorded
            if is_transient(exc) and attempt == 0:
                time.sleep(10.0)
                continue
            tb = traceback.format_exception_only(type(exc), exc)
            errors[name] = "".join(tb).strip()[:400]
            return None
    return None


def _run(result: dict, errors: dict) -> None:
    import pt  # noqa: F401  (configures the persistent compile cache)
    from pt.scene.standin import make_courtyard_scene
    from pt.scene.examples import make_heightfield_scene
    from pt.scene.textures import build_scene_textures

    if TINY:
        hf_n, hf_wh, hf_steps, hf_bounces = 16, 64, 1, 2
    else:
        hf_n, hf_wh, hf_steps, hf_bounces = 224, 512, 3, 5

    heightfield = _run_arm(errors, "heightfield", measure,
                           make_heightfield_scene(hf_n),
                           width=hf_wh, height=hf_wh, steps=hf_steps,
                           bounces=hf_bounces)
    if heightfield is not None:
        # headline stays the heightfield for cross-round comparability
        # (round 1 measured 2.96 on it); the Sponza-class courtyard (213k
        # tris, textures, alpha foliage) rides as the representative-
        # content secondary (BASELINE.md round-2 table + perf budget)
        result["value"] = round(heightfield, 3)
        result["vs_baseline"] = round(heightfield / BASELINE_MRAYS, 4)

    # FROZEN round-over-round comparability arm (VERDICT r3 task 2): the
    # round-2 courtyard exactly — tex_scale=1/16 (9.9 MiB pool). Scene-
    # hardness changes (like round 3's 2.1 GiB Sponza-class pool) land in
    # the scene_version field; THIS number only moves when the renderer
    # moves. r2 measured 0.604, r3-era renderer ~0.58, r4 0.553 (the
    # paired-rows small-pool cost — gated by pool size in round 5).
    def r2pool_arm():
        if TINY:
            return measure(make_heightfield_scene(16), width=64, height=64,
                           steps=1, bounces=2)
        r2_scene = make_courtyard_scene(tex_scale=1.0 / 16.0)
        return measure(r2_scene, tex=build_scene_textures(r2_scene))

    r2pool = _run_arm(errors, "r2pool", r2pool_arm)
    if r2pool is not None:
        result["courtyard_r2pool_mrays"] = round(r2pool, 3)

    # the courtyard's Sponza-class texture set (2x4k + 2k/1k mix, ~2 GiB
    # pool) is expensive to author + upload — build scene and pool ONCE
    # and share across the riders (cameras are re-resized per measure)
    def build_courtyard():
        if TINY:
            scene = make_heightfield_scene(16)
            return scene, None
        scene = make_courtyard_scene()
        return scene, build_scene_textures(scene)

    built = _run_arm(errors, "courtyard_build", build_courtyard)
    if built is None:
        return
    courtyard_scene, courtyard_tex = built
    result["courtyard_scene_version"] = ("tiny" if TINY
                                         else "r3-sponza-pool-2.1GiB")
    small = 64 if TINY else 512
    bounces = 2 if TINY else 5

    courtyard = _run_arm(errors, "courtyard_full", measure,
                         courtyard_scene, width=small, height=small,
                         bounces=bounces, tex=courtyard_tex)
    if courtyard is not None:
        result["courtyard_sponza_class_mrays"] = round(courtyard, 3)

    # preview mode (≙ the reference's interactive low-bounce setting):
    # coherent primary+NEE work, where packet traversal runs near its
    # coherent rate — the user-facing interactive number
    preview = _run_arm(errors, "courtyard_preview", measure,
                       courtyard_scene, width=small, height=small,
                       bounces=1, tex=courtyard_tex)
    if preview is not None:
        result["courtyard_preview_1bounce_mrays"] = round(preview, 3)

    # the other two BASELINE.json headline metrics: spp/s at 1080p on the
    # Sponza-class scene, and time-to-converged frame (MSE < 1e-3 vs deep
    # accumulation at SPP_CONVERGED samples; trajectory in BASELINE.md)
    # steps=3 (round 5): the big-pool courtyard arms measure with ±2.5%
    # run-to-run spread at steps=2 (BASELINE.md r5 two-run record) —
    # one more averaged step costs ~40 s and narrows the two axes whose
    # targets sit inside that band (spp@1080p, uniform TTC)
    w1080, h1080 = (64, 64) if TINY else (1920, 1080)
    spp_1080 = _run_arm(errors, "courtyard_spp_1080p", measure_spp_rate,
                        courtyard_scene, w1080, h1080, tex=courtyard_tex,
                        bounces=bounces, steps=2 if TINY else 3)
    if spp_1080 is not None:
        result["courtyard_spp_per_s_1080p"] = round(spp_1080, 4)

    w256 = 64 if TINY else 256
    spp_256 = _run_arm(errors, "courtyard_ttc", measure_spp_rate,
                       courtyard_scene, w256, w256, spp=4,
                       tex=courtyard_tex, bounces=bounces,
                       steps=2 if TINY else 3)
    if spp_256 is not None and spp_256 > 0:
        result["courtyard_time_to_converged_256_s"] = round(
            SPP_CONVERGED / spp_256, 1)

    if not TINY:
        ttc_a = _run_arm(errors, "courtyard_ttc_adaptive",
                         measure_adaptive_ttc, courtyard_scene,
                         tex=courtyard_tex)
        if ttc_a is not None:
            result["courtyard_ttc_adaptive_256_s"] = round(ttc_a, 1)

        def accel_arm():
            # host-side static accel build (native SBVH + BF8 collapse +
            # Woop pages; ≙ the reference's blocking BLAS/TLAS build
            # submit, AccelerationStructure.cpp:26-35) — second run timed,
            # the first pays the one-time g++ of csrc/sah_bvh.cpp
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
            return time.perf_counter() - t0

        accel_s = _run_arm(errors, "courtyard_accel_build", accel_arm)
        if accel_s is not None:
            result["courtyard_accel_build_s"] = round(accel_s, 2)


def main() -> None:
    result = {
        "metric": "path_tracing_throughput",
        "value": 0.0,
        "unit": "Mrays/s",
        "vs_baseline": 0.0,
    }
    errors: dict = {}
    rc = 0
    # SIGTERM (driver timeout / CI kill) must still flush the JSON line:
    # raise through the arm machinery so the finally below runs
    import signal

    def _term(signum, frame):
        raise KeyboardInterrupt("SIGTERM")

    try:
        signal.signal(signal.SIGTERM, _term)
    except Exception:
        pass
    try:
        if not TINY and not _device_probe_ok():
            _cpu_fallback(result)
        else:
            _run(result, errors)
    except BaseException as exc:           # noqa: BLE001 — record + emit
        errors["bench"] = repr(exc)[:400]
        rc = 1
    finally:
        if errors:
            result["errors"] = errors
        print(json.dumps(result), flush=True)
    # partial results are a SUCCESS (the point of the restructure); only
    # a run that produced no headline at all exits non-zero
    if rc == 0 and result["value"] == 0.0 and errors:
        rc = 1
    sys.exit(rc)


if __name__ == "__main__":
    main()
