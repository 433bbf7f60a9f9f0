"""pt — a TPU-native path-tracing framework (JAX / XLA / Pallas).

A from-scratch rebuild of the capabilities of the Vulkan ray-tracing-pipeline
path tracer `piotrprzybyszdev/Path-Tracing` (reference mounted at
/root/reference), re-designed for TPU hardware:

* The Vulkan RT pipeline (raygen/closest-hit/any-hit/miss SPIR-V shaders
  dispatched per pixel) becomes a **wavefront integrator** over megabatches of
  rays: flat SoA ray arrays, masked live lanes, `lax.scan` bounce loop
  (reference: Shaders/raygen.rgen:36-118, Shaders/closestHit.rchit:52-161).
* The TLAS/BLAS acceleration structures (Renderer/AccelerationStructure.cpp)
  become a JAX-built LBVH over a world-space flattened triangle soup with a
  vectorized stackless traversal (pure-XLA and Pallas backends).
* The GLSL compute post stack (postprocess/bloom/toneMapping .comp shaders)
  becomes fused jnp image ops.
* The GLFW/ImGui swapchain is replaced by a headless accumulation film
  streamed to PNG/JPEG/TGA/HDR files or an FFmpeg pipe.
* Multi-chip scaling shards film tiles over a `jax.sharding.Mesh` and merges
  with XLA collectives (pt.dist).

Layer map (mirrors SURVEY.md of the reference):
  pt.core   — config, stats/timers, cache, threads, cameras      (L1)
  pt.scene  — scene data model, builder, graph, importers        (L4)
  pt.accel  — LBVH build + traversal                             (L2/L0)
  pt.render — RNG, rays, BSDF, lights, integrator, skinning      (L0)
  pt.post   — bloom, tone mapping, composition                   (L0)
  pt.out    — image/video output                                 (L2)
  pt.run    — frame orchestrator, offline rendering, CLI, app    (L3/L5)
  pt.dist   — device-mesh film sharding                          (L2)
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compilation cache: kernel compiles on this platform are slow
# (tens of seconds) and the remote compile service is intermittently flaky —
# caching successful compiles makes every later run fast and deterministic
# (≙ the reference's on-disk SPIR-V + vk::PipelineCache, ShaderLibrary.cpp:
# 106-120, Pipeline.cpp:349-377).
#
# The cache dir is scoped by a HOST-CPU fingerprint: XLA:CPU cache keys do
# not include host machine features, so a cache written on one VM loads
# foreign AOT code on the next ("Target machine feature +prefer-no-scatter
# is not supported on the host machine ... could lead to SIGILL") and —
# observed in round 5 — makes cache-hit vs freshly-compiled jits
# bit-DIFFERENT, breaking every bit-exactness contract between separately
# compiled stages. One subdir per CPU-feature set keeps reuse within a
# machine and isolation across machines (≙ the reference's per-config
# shader-cache extensions, Config.cpp:38-53).
_cache_dir = _os.environ.get("PT_COMPILE_CACHE")
if _cache_dir is None:
    import hashlib as _hashlib
    try:
        with open("/proc/cpuinfo") as _f:
            _flags = next((ln for ln in _f if ln.startswith("flags")), "")
    except OSError:
        import platform as _platform
        _flags = _platform.processor() + _platform.machine()
    _fp = _hashlib.md5(_flags.encode()).hexdigest()[:10]
    _cache_dir = _os.path.join(_os.path.dirname(__file__), "..",
                               ".jax_cache", _fp)
try:
    _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache_dir))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:  # cache is an optimization, never fatal
    pass
