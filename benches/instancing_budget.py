"""Instancing-by-duplication break-even measurement.

The flatten layout duplicates object-space vertices per (instance, mesh)
segment and recomputes world space on the MXU each frame
(pt/scene/flatten.py module doc). This script measures what that costs as
instance reuse grows — flatten wall time, per-vertex device bytes, and
native SAH/SBVH build time — so the duplication warning threshold in
flatten_scene (8x reuse AND >4M duplicated verts) is backed by numbers
rather than vibes.

Host-side by design (flatten + native builder are host work); pins the
CPU backend so it can run alongside a TPU job. Run:

    python benches/instancing_budget.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

# per-vertex device state in the flattened SoA: positions/normals/
# tangents/bitangents (3 f32 each) + uvs (2 f32) + vert_seg (i32) ≈ 60 B
BYTES_PER_VERT = 60


def make_instanced_scene(n_instances: int, grid: int = 56):
    """One grid mesh (~2*(grid-1)^2 tris) instanced n times in a row."""
    from pt.core.camera import InputCamera
    from pt.scene.builder import SceneBuilder
    from pt.scene.types import (DirectionalLight, Geometry, MeshInfo,
                                MetallicRoughnessMaterial)

    b = SceneBuilder("inst")
    xs = np.linspace(-1, 1, grid, dtype=np.float32)
    gx, gz = np.meshgrid(xs, xs, indexing="ij")
    gy = 0.2 * np.sin(gx * 5) * np.cos(gz * 4)
    pos = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    nrm = np.tile(np.asarray([[0, 1, 0]], np.float32), (grid * grid, 1))
    uv = np.stack([(gx + 1) / 2, (gz + 1) / 2], -1).reshape(-1, 2)
    idx = np.arange(grid * grid).reshape(grid, grid)
    a, c = idx[:-1, :-1].ravel(), idx[1:, 1:].ravel()
    bq, d = idx[1:, :-1].ravel(), idx[:-1, 1:].ravel()
    tris = np.concatenate([np.stack([a, c, bq], -1), np.stack([c, a, d], -1)])
    vb = b.add_vertices(pos, uv, nrm)
    ib = b.add_indices(tris.ravel())
    geo = b.add_geometry(Geometry(vb, grid * grid, ib, tris.size, True))
    mat = b.add_material("m", MetallicRoughnessMaterial(roughness=0.8))
    model = b.add_model([MeshInfo(geo, mat)])
    for i in range(n_instances):
        t = np.eye(4)
        t[0, 3] = 2.5 * (i % 32)
        t[2, 3] = 2.5 * (i // 32)
        b.add_model_instance(model, b.add_scene_node(0, t))
    b.set_directional_light(DirectionalLight(color=(1, 1, 1),
                                             direction=(0.3, -0.8, 0.2)))
    b.add_camera(InputCamera(45.0, 100.0, 0.1, (0.0, 3.0, -4.0),
                             (0.2, -0.3, 1.0)))
    return b.create_scene()


def main():
    from pt.accel.pallas_bvh import build_packet_bvh_sah
    from pt.scene.flatten import flatten_scene

    print(f"{'inst':>5} {'verts':>9} {'tris':>9} {'MB':>7} "
          f"{'flatten s':>9} {'sah s':>7} {'sbvh s':>7}")
    rows = []
    for n in (1, 4, 16, 64, 256):
        scene = make_instanced_scene(n)
        t0 = time.perf_counter()
        ds = flatten_scene(scene)
        t_flat = time.perf_counter() - t0
        nv = int(ds.obj_positions.shape[0])
        nt = int(ds.tri_idx.shape[0])
        mb = nv * BYTES_PER_VERT / 2**20

        # world positions for the builder (same path the renderer uses)
        from pt.scene.flatten import world_vertices
        wpos = np.asarray(world_vertices(ds)[0])
        tri_np = np.asarray(ds.tri_idx)

        t0 = time.perf_counter()
        build_packet_bvh_sah(wpos, tri_np, spatial=False)
        t_sah = time.perf_counter() - t0
        t0 = time.perf_counter()
        build_packet_bvh_sah(wpos, tri_np, spatial=True)
        t_sbvh = time.perf_counter() - t0
        rows.append((n, nv, nt, mb, t_flat, t_sah, t_sbvh))
        print(f"{n:>5} {nv:>9} {nt:>9} {mb:>7.1f} "
              f"{t_flat:>9.2f} {t_sah:>7.2f} {t_sbvh:>7.2f}")

    n0 = rows[0]
    nN = rows[-1]
    print(f"\nscaling {nN[0]}x instances: verts {nN[1]/n0[1]:.0f}x "
          f"(linear — no reuse), flatten {nN[4]/max(n0[4],1e-9):.0f}x, "
          f"sah build {nN[5]/max(n0[5],1e-9):.0f}x.")
    hbm_gb = 16
    verts_at_budget = hbm_gb * 2**30 * 0.25 / BYTES_PER_VERT
    print(f"HBM check: 25% of a {hbm_gb} GB chip holds "
          f"~{verts_at_budget/1e6:.0f}M duplicated verts "
          f"(~{verts_at_budget/ (n0[1]):.0f} instances of this mesh); the "
          f"flatten warning fires at 8x reuse AND >4M verts.")


if __name__ == "__main__":
    main()
