"""Host Scene → device SoA arrays (DeviceScene).

This replaces the reference's GPU scene-upload path
(Renderer::UpdateSceneData, Renderer.cpp:238-439: vertex/index/transform/
material/geometry buffers + SBT records) with a TPU-first layout:

* Instancing is flattened: every (instance, mesh) pair becomes a *segment*
  with its own transform slot. Object-space vertices are duplicated per
  segment once at build time; per-frame world-space positions/normals are
  recomputed on device as one batched matmul (`world_vertices`), which
  replaces both the TLAS instance transforms and the closest-hit
  per-vertex transform math (Shaders/sampling.glsl:5-15). Recompute is
  nearly free on the MXU; divergent two-level BVH traversal is not.
  CEILING: duplicated per-vertex state is ~60 B/vert → ~72M verts/chip
  (16 GB HBM), and the host SAH build is linear in duplicated tris
  (benches/instancing_budget.py). For heavy-reuse static scenes
  (Bistro/Emerald-Square-class) the shared-BLAS path in
  pt/accel/instanced.py keeps ONE object-space page set per mesh and
  instances it at traversal time (per-visit ray transform; A/B in
  benches/instancing_ab.py) — shared TLAS semantics,
  AccelerationStructure.cpp:260-301.

* The three material models are packed into one unified SoA table
  (type-dispatch becomes vector selects instead of the reference's SBT
  switch, Shaders/material.glsl:147-176).

* Per-triangle arrays (material row, opaqueness) replace SBT records
  (ShaderBindingTable.cpp:43-52 inline record data).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pt.scene.builder import Scene
from pt.scene.types import (MAX_LIGHT_COUNT, MaterialType, MetallicRoughnessMaterial,
                            SkyboxKind, unpack_material_id)

# Unified material float-field layout (columns of DeviceScene.mat_params).
F_EMISSIVE = 0          # ..3  emissive rgb
F_EMISSIVE_INT = 3
F_COLOR = 4             # ..8  base color rgba
F_IOR = 8
F_TRANSMISSION = 9
F_ATTEN_COLOR = 10      # ..13 attenuation rgb
F_ATTEN_DIST = 13
F_ROUGHNESS = 14        # MR roughness factor
F_METALNESS = 15        # MR metalness factor
F_SPECULAR = 16         # ..19 SG/Phong specular rgb
F_GLOSS = 19            # SG glossiness / Phong shininess factor
NUM_MAT_FIELDS = 20

# Texture-slot columns of DeviceScene.mat_tex.
T_EMISSIVE, T_COLOR, T_NORMAL, T_A, T_B = 0, 1, 2, 3, 4
NUM_MAT_TEX = 5


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceScene:
    """Device-resident flattened scene (a JAX pytree)."""

    # object-space duplicated-per-segment vertex SoA
    obj_positions: jax.Array        # (V, 3) f32
    obj_normals: jax.Array          # (V, 3) f32
    obj_tangents: jax.Array         # (V, 3) f32
    obj_bitangents: jax.Array       # (V, 3) f32
    tex_coords: jax.Array           # (V, 2) f32
    vert_seg: jax.Array             # (V,) i32 segment id per vertex

    tri_idx: jax.Array              # (T, 3) i32 absolute vertex indices
    tri_mat: jax.Array              # (T,) i32 unified material row
    tri_opaque: jax.Array           # (T,) bool

    seg_transform: jax.Array        # (S, 4, 4) f32 world transform per segment
    seg_instance: jax.Array         # (S,) i32 owning instance id (debug view)

    # unified material table
    mat_params: jax.Array           # (M, NUM_MAT_FIELDS) f32
    mat_tex: jax.Array              # (M, NUM_MAT_TEX) i32 texture-table indices
    mat_type: jax.Array             # (M,) i32 MaterialType

    # lights
    point_light_color: jax.Array    # (MAX_LIGHT_COUNT, 3) f32
    point_light_pos: jax.Array      # (MAX_LIGHT_COUNT, 3) f32
    point_light_atten: jax.Array    # (MAX_LIGHT_COUNT, 3) f32 const/lin/quad
    point_light_count: jax.Array    # () i32
    dir_light_color: jax.Array      # (3,) f32
    dir_light_dir: jax.Array        # (3,) f32

    # skinning (≙ AnimatedVertex bone data + the bone-palette UBO,
    # ShaderTypes.incl:52-59, skinning.comp): zero weights = unskinned
    bone_idx: jax.Array             # (V, 4) i32
    bone_weight: jax.Array          # (V, 4) f32 (rows sum to 1 or 0)
    bone_palette: jax.Array         # (B, 4, 4) f32 world @ inverse-bind

    skybox_color: jax.Array         # (3,) f32 (CLEAR kind)
    skybox_image: jax.Array         # EQUIRECT: (H, W, 3); CUBE: (6, H, W, 3);
                                    # (1, 1, 3) dummy otherwise

    # static (hashable) metadata — jit specializes on these like the
    # reference's pipeline specialization constants (Renderer.cpp:676-709)
    skybox_kind: int = dataclasses.field(metadata=dict(static=True),
                                         default=int(SkyboxKind.CLEAR))
    flip_normal_y: bool = dataclasses.field(metadata=dict(static=True),
                                            default=False)
    has_skinning: bool = dataclasses.field(metadata=dict(static=True),
                                           default=False)
    # any non-opaque triangles → the integrator runs the alpha-test/decal
    # re-trace loops (≙ the any-hit shaders; opaque-only scenes skip them)
    has_alpha: bool = dataclasses.field(metadata=dict(static=True),
                                        default=False)

    @property
    def num_triangles(self) -> int:
        return self.tri_idx.shape[0]

    @property
    def num_segments(self) -> int:
        return self.seg_transform.shape[0]


def world_vertices(ds: DeviceScene):
    """Per-frame world-space flatten: positions via point transform, normal
    frame via inverse-transpose (≙ closest-hit `transform`,
    Shaders/sampling.glsl:5-15), with linear-blend skinning for vertices
    carrying bone weights (≙ skinning.comp:21-50 — LBS over a ≤4-bone
    palette; glTF semantics: skinned vertices ignore the node transform).

    Returns (positions, normals, tangents, bitangents), each (V, 3) f32.
    Batched contractions — MXU/VPU friendly.
    """
    t = ds.seg_transform[ds.vert_seg]                     # (V, 4, 4)
    p = ds.obj_positions
    pos = (jnp.einsum("vij,vj->vi", t[:, :3, :3], p, preferred_element_type=jnp.float32)
           + t[:, :3, 3])
    # normal matrix: inverse-transpose of the 3x3 block, computed per segment
    # on host-sized data (S is small) then gathered per vertex
    seg_nrm = _normal_matrices(ds.seg_transform)          # (S, 3, 3)
    nt = seg_nrm[ds.vert_seg]
    def xfr(v):
        return jnp.einsum("vij,vj->vi", t[:, :3, :3], v,
                          preferred_element_type=jnp.float32)
    nrm = jnp.einsum("vij,vj->vi", nt, ds.obj_normals,
                     preferred_element_type=jnp.float32)
    tan = xfr(ds.obj_tangents)
    bit = xfr(ds.obj_bitangents)

    if ds.has_skinning:
        # blended bone matrix per vertex: (V, 4, 4) = Σ w_k palette[idx_k]
        mats = ds.bone_palette[ds.bone_idx]               # (V, 4, 4, 4)
        blend = jnp.einsum("vk,vkij->vij", ds.bone_weight, mats,
                           preferred_element_type=jnp.float32)
        wsum = jnp.sum(ds.bone_weight, axis=1)
        skinned = wsum > 0.0
        spos = (jnp.einsum("vij,vj->vi", blend[:, :3, :3], p,
                           preferred_element_type=jnp.float32)
                + blend[:, :3, 3])
        sx = lambda v: jnp.einsum("vij,vj->vi", blend[:, :3, :3], v,
                                  preferred_element_type=jnp.float32)
        sel = skinned[:, None]
        pos = jnp.where(sel, spos, pos)
        nrm = jnp.where(sel, sx(ds.obj_normals), nrm)
        tan = jnp.where(sel, sx(ds.obj_tangents), tan)
        bit = jnp.where(sel, sx(ds.obj_bitangents), bit)

    unit = lambda v: v / jnp.maximum(
        jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)
    return pos, unit(nrm), unit(tan), unit(bit)


def _normal_matrices(transforms: jax.Array) -> jax.Array:
    """Normal matrix of the upper-left 3x3 of each 4x4: the cofactor
    matrix times sign(det) — identical direction to the inverse-transpose
    after the downstream unit-normalization (inv(A)^T = cof(A)/det), but
    finite for singular transforms (scale-to-zero animation frames would
    otherwise flood the frame with NaN-sentinel pixels) and cheaper than
    an inverse."""
    a = transforms[:, :3, :3]
    r0, r1, r2 = a[:, 0], a[:, 1], a[:, 2]
    cof = jnp.stack([jnp.cross(r1, r2), jnp.cross(r2, r0),
                     jnp.cross(r0, r1)], axis=1)
    det = jnp.einsum("vi,vi->v", r0, cof[:, 0])
    return jnp.where(det[:, None, None] < 0, -cof, cof)


def shared_dup_ratio(scene: Scene):
    """Counts-only duplication ratio (flattened tris / unique tris) for
    the instancing policy — no vertex/index copies, so the policy check
    costs O(instances) even on scenes it will reject (ADVICE r4: the
    full shared_mesh_layout copied every unique geometry's buffers on
    each accel rebuild before the policy ran). Returns
    (dup_ratio, flattened_tri_count), or None when any instanced
    geometry is animated (mirrors shared_mesh_layout's gate) or the
    scene has no segments."""
    seen = set()
    unique = total = 0
    for inst in scene.instances:
        for mesh in scene.models[inst.model_index].meshes:
            gi = mesh.geometry_index
            geo = scene.geometries[gi]
            if geo.is_animated:
                return None
            tcount = geo.index_count // 3
            if gi not in seen:
                seen.add(gi)
                unique += tcount
            total += tcount
    if not total:
        return None
    return total / max(unique, 1), total


def shared_mesh_layout(scene: Scene):
    """Shared-BLAS build inputs for pt/accel/instanced.py (TLAS semantics,
    ≙ AccelerationStructure.cpp:260-301: one BLAS per Model reused by
    every ModelInstance).

    Walks instances/meshes in EXACTLY flatten_scene's segment order and
    dedupes by geometry index. Returns None when any geometry is animated
    (skinned/animated paths rebuild per frame on the Morton path), else
    `(meshes, seg_mesh, seg_tri_base, dup_ratio)`:

    * meshes       one (object positions, mesh-local tris, tri_opaque)
                   per UNIQUE geometry
    * seg_mesh     (S,) unique-mesh index per flatten segment
    * seg_tri_base (S,) segment's first triangle id in the flattened
                   global numbering — `BF8Instanced.seg_tri_base` remaps
                   instanced hits back to global ids with it, so shading
                   (tri_mat / tri_* rows) is untouched
    * dup_ratio    flattened tris / unique tris (the instancing win)
    """
    geo_to_mesh: dict = {}
    meshes: list = []
    seg_mesh: List[int] = []
    seg_tri_base: List[int] = []
    tri_base = 0
    for inst in scene.instances:
        model = scene.models[inst.model_index]
        for mesh in model.meshes:
            gi = mesh.geometry_index
            geo = scene.geometries[gi]
            if geo.is_animated:
                return None
            mi = geo_to_mesh.get(gi)
            if mi is None:
                mi = len(meshes)
                geo_to_mesh[gi] = mi
                s, n = geo.vertex_offset, geo.vertex_count
                pos = np.asarray(scene.vertices.positions[s:s + n],
                                 np.float32)
                idx = scene.indices[geo.index_offset:
                                    geo.index_offset + geo.index_count]
                tris = np.asarray(idx, np.int64).reshape(-1, 3) \
                    .astype(np.int32)
                opq = np.full(len(tris), geo.is_opaque, bool)
                meshes.append((pos, tris, opq))
            seg_mesh.append(mi)
            seg_tri_base.append(tri_base)
            tri_base += meshes[mi][1].shape[0]
    if not seg_mesh:
        return None
    unique_tris = sum(m[1].shape[0] for m in meshes)
    dup_ratio = tri_base / max(unique_tris, 1)
    return (meshes, np.asarray(seg_mesh, np.int64),
            np.asarray(seg_tri_base, np.int32), dup_ratio)


def flatten_scene(scene: Scene) -> DeviceScene:
    """Flatten a host Scene into device arrays.

    Replaces Renderer::UpdateSceneData's buffer building + SBT record
    emission (Renderer.cpp:250-399).
    """
    positions, normals, tangents, bitangents, uvs = [], [], [], [], []
    vert_seg, tri_idx, tri_mat, tri_opaque = [], [], [], []
    seg_transforms: List[np.ndarray] = []
    seg_instances: List[int] = []

    mat_rows, mid_to_row = _build_material_table(scene)

    # instancing-by-duplication accounting: flag Bistro/Zero-Day-class
    # reuse before it blows HBM (the documented tradeoff of this layout —
    # recompute-over-traversal — is measured against small-to-moderate
    # duplication; see module docstring)
    unique_verts = len(scene.vertices) + len(scene.animated_vertices)
    dup_verts = sum(scene.geometries[m.geometry_index].vertex_count
                    for inst in scene.instances
                    for m in scene.models[inst.model_index].meshes)
    if unique_verts and dup_verts > 8 * unique_verts \
            and dup_verts > 4_000_000:
        import logging
        logging.getLogger("pt.scene").warning(
            "instancing duplication: %d unique verts expand to %d "
            "(%.1fx, ~%.2f GB of per-vertex device state). Heavy-reuse "
            "scenes may exceed HBM; consider reducing instances or "
            "splitting the scene.", unique_verts, dup_verts,
            dup_verts / unique_verts, dup_verts * 60 * 4 / 2**30)

    bone_idx, bone_weight = [], []
    vbase = 0
    for inst_i, inst in enumerate(scene.instances):
        model = scene.models[inst.model_index]
        inst_t = scene.instance_transforms[inst_i].astype(np.float64)
        for mesh in model.meshes:
            geo = scene.geometries[mesh.geometry_index]
            seg = len(seg_transforms)
            seg_transforms.append((inst_t @ np.asarray(mesh.transform, np.float64))
                                  .astype(np.float32))
            seg_instances.append(inst_i)
            v = scene.animated_vertices if geo.is_animated else scene.vertices
            indices_src = (scene.animated_indices if geo.is_animated
                           else scene.indices)
            s, n = geo.vertex_offset, geo.vertex_count
            positions.append(v.positions[s:s + n])
            normals.append(v.normals[s:s + n])
            tangents.append(v.tangents[s:s + n])
            bitangents.append(v.bitangents[s:s + n])
            uvs.append(v.tex_coords[s:s + n])
            if geo.is_animated:
                bone_idx.append(v.bone_indices[s:s + n])
                bone_weight.append(v.bone_weights[s:s + n])
            else:
                bone_idx.append(np.zeros((n, 4), np.int32))
                bone_weight.append(np.zeros((n, 4), np.float32))
            vert_seg.append(np.full(n, seg, np.int32))
            idx = indices_src[geo.index_offset:geo.index_offset + geo.index_count]
            tris = np.asarray(idx, np.int64).reshape(-1, 3) + vbase
            tri_idx.append(tris.astype(np.int32))
            row = mid_to_row[mesh.material_id]
            tri_mat.append(np.full(len(tris), row, np.int32))
            tri_opaque.append(np.full(len(tris), geo.is_opaque, bool))
            vbase += n

    if vbase == 0:
        raise ValueError("scene has no instanced geometry")

    cat = lambda xs: np.concatenate(xs, axis=0)
    lights = _build_lights(scene)

    return DeviceScene(
        obj_positions=jnp.asarray(cat(positions)),
        obj_normals=jnp.asarray(cat(normals)),
        obj_tangents=jnp.asarray(cat(tangents)),
        obj_bitangents=jnp.asarray(cat(bitangents)),
        tex_coords=jnp.asarray(cat(uvs)),
        vert_seg=jnp.asarray(cat(vert_seg)),
        tri_idx=jnp.asarray(cat(tri_idx)),
        tri_mat=jnp.asarray(cat(tri_mat)),
        tri_opaque=jnp.asarray(cat(tri_opaque)),
        seg_transform=jnp.asarray(np.stack(seg_transforms)),
        seg_instance=jnp.asarray(np.asarray(seg_instances, np.int32)),
        mat_params=jnp.asarray(mat_rows["params"]),
        mat_tex=jnp.asarray(mat_rows["tex"]),
        mat_type=jnp.asarray(mat_rows["type"]),
        **lights,
        bone_idx=jnp.asarray(cat(bone_idx)),
        bone_weight=jnp.asarray(cat(bone_weight)),
        bone_palette=jnp.asarray(np.asarray(scene.bone_transforms, np.float32)),
        skybox_color=jnp.asarray(np.asarray(scene.skybox.color, np.float32)),
        skybox_image=_skybox_image(scene),
        skybox_kind=int(scene.skybox.kind),
        flip_normal_y=bool(scene.texture_mapping.get("dx_normals", False)),
        has_skinning=any(g.is_animated for g in scene.geometries),
        has_alpha=bool((~cat(tri_opaque)).any()),
    )


def update_seg_transforms(ds: DeviceScene, scene: Scene) -> DeviceScene:
    """Per-frame refresh of the segment transform palette from the host
    scene graph (small upload; ≙ transform-buffer update for animated
    instances). Only valid while the instance/mesh structure is unchanged."""
    seg_transforms = []
    for inst_i, inst in enumerate(scene.instances):
        inst_t = scene.instance_transforms[inst_i].astype(np.float64)
        for mesh in scene.models[inst.model_index].meshes:
            seg_transforms.append((inst_t @ np.asarray(mesh.transform, np.float64))
                                  .astype(np.float32))
    lights = _build_lights(scene)
    return dataclasses.replace(
        ds, seg_transform=jnp.asarray(np.stack(seg_transforms)),
        bone_palette=jnp.asarray(np.asarray(scene.bone_transforms, np.float32)),
        **lights)


def _skybox_image(scene: Scene):
    img = scene.skybox.image
    if img is None:
        return jnp.zeros((1, 1, 3), jnp.float32)
    return jnp.asarray(np.asarray(img, np.float32)[..., :3])


def _build_material_table(scene: Scene):
    """Pack all three material pools into the unified table; returns the
    table plus the packed-MaterialId → row lookup."""
    params, tex, types = [], [], []
    mid_to_row = {}

    def add(m, mtype: MaterialType, index: int):
        row = np.zeros(NUM_MAT_FIELDS, np.float32)
        trow = np.zeros(NUM_MAT_TEX, np.int32)
        row[F_EMISSIVE:F_EMISSIVE + 3] = m.emissive_color
        row[F_EMISSIVE_INT] = m.emissive_intensity
        row[F_COLOR:F_COLOR + 4] = m.color
        row[F_IOR] = m.ior
        row[F_TRANSMISSION] = m.transmission
        row[F_ATTEN_COLOR:F_ATTEN_COLOR + 3] = m.attenuation_color
        row[F_ATTEN_DIST] = m.attenuation_distance
        trow[T_EMISSIVE] = m.emissive_idx
        trow[T_COLOR] = m.color_idx
        trow[T_NORMAL] = m.normal_idx
        if mtype == MaterialType.METALLIC_ROUGHNESS:
            row[F_ROUGHNESS] = m.roughness
            row[F_METALNESS] = m.metalness
            trow[T_A] = m.roughness_idx
            trow[T_B] = m.metallic_idx
        else:
            row[F_SPECULAR:F_SPECULAR + 3] = m.specular
            row[F_GLOSS] = (m.glossiness if mtype == MaterialType.SPECULAR_GLOSSINESS
                            else m.shininess)
            trow[T_A] = m.specular_idx
            trow[T_B] = (m.glossiness_idx if mtype == MaterialType.SPECULAR_GLOSSINESS
                         else m.shininess_idx)
        mid = (index << 8) | int(mtype)
        mid_to_row[mid] = len(params)
        params.append(row)
        tex.append(trow)
        types.append(int(mtype))

    for i, m in enumerate(scene.materials_mr):
        add(m, MaterialType.METALLIC_ROUGHNESS, i)
    for i, m in enumerate(scene.materials_sg):
        add(m, MaterialType.SPECULAR_GLOSSINESS, i)
    for i, m in enumerate(scene.materials_ph):
        add(m, MaterialType.PHONG, i)
    if not params:  # default white diffuse
        add(MetallicRoughnessMaterial(), MaterialType.METALLIC_ROUGHNESS, 0)

    return ({"params": np.stack(params), "tex": np.stack(tex),
             "type": np.asarray(types, np.int32)}, mid_to_row)


def _build_lights(scene: Scene):
    colors = np.zeros((MAX_LIGHT_COUNT, 3), np.float32)
    pos = np.zeros((MAX_LIGHT_COUNT, 3), np.float32)
    atten = np.ones((MAX_LIGHT_COUNT, 3), np.float32)
    n = min(len(scene.point_lights), MAX_LIGHT_COUNT)
    for i in range(n):
        l = scene.point_lights[i]
        colors[i] = l.color
        pos[i] = l.position
        atten[i] = (l.attenuation_constant, l.attenuation_linear,
                    l.attenuation_quadratic)
    d = scene.directional_light
    return dict(
        point_light_color=jnp.asarray(colors),
        point_light_pos=jnp.asarray(pos),
        point_light_atten=jnp.asarray(atten),
        point_light_count=jnp.asarray(n, jnp.int32),
        dir_light_color=jnp.asarray(np.asarray(d.color if d else (0, 0, 0), np.float32)),
        dir_light_dir=jnp.asarray(np.asarray(d.direction if d else (0, -1, 0), np.float32)),
    )
