"""Per-hit material resolution from the unified material table + textures.

Vectorized counterpart of Shaders/material.glsl: all three material models
(MetallicRoughness / SpecularGlossiness / Phong) are evaluated with vector
selects instead of the reference's per-hit switch (material.glsl:147-176).
The spec-gloss→metalness conversion heuristic (material.glsl:108-140) and
the XY normal reconstruction (material.glsl:55-60) are preserved exactly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pt.render.bsdf import MaterialSample
from pt.render.textures import DeviceTextures, sample_texture_grad
from pt.scene.flatten import (DeviceScene, F_ATTEN_COLOR, F_ATTEN_DIST, F_COLOR,
                              F_EMISSIVE, F_EMISSIVE_INT, F_GLOSS, F_IOR,
                              F_METALNESS, F_ROUGHNESS, F_SPECULAR,
                              F_TRANSMISSION, T_A, T_B, T_COLOR, T_EMISSIVE,
                              T_NORMAL)
from pt.scene.types import MaterialType


def reconstruct_normal_xy(n):
    """≙ ReconstructNormalFromXY (material.glsl:55-60)."""
    n = 2.0 * n - 1.0
    z = jnp.sqrt(jnp.maximum(1.0 - n[..., 0] ** 2 - n[..., 1] ** 2, 0.0))
    return jnp.stack([n[..., 0], n[..., 1], z], axis=-1)


def sample_material(ds: DeviceScene, textures: DeviceTextures,
                    mat_row: jax.Array, uv: jax.Array,
                    is_inside: jax.Array,
                    dudx_dvdx: Optional[jax.Array] = None,
                    dudy_dvdy: Optional[jax.Array] = None,
                    nearest_mip: bool = False) -> MaterialSample:
    """Resolve a MaterialSample for each hit lane.

    mat_row: (N,) unified material rows; uv: (N, 2); is_inside: (N,) bool.
    Derivative pairs feed textureGrad-equivalent LOD selection.
    nearest_mip (static) selects rounded-level sampling — half the
    gathers; see sample_texture_grad.
    """
    p = ds.mat_params[mat_row]          # (N, NUM_MAT_FIELDS)
    t = ds.mat_tex[mat_row]             # (N, NUM_MAT_TEX)
    mtype = ds.mat_type[mat_row]        # (N,)

    def tex(slot):
        return sample_texture_grad(textures, t[..., slot], uv,
                                   dudx_dvdx, dudy_dvdy,
                                   nearest_mip=nearest_mip)

    emissive = ((tex(T_EMISSIVE)[..., :3] + p[..., F_EMISSIVE:F_EMISSIVE + 3])
                * p[..., F_EMISSIVE_INT:F_EMISSIVE_INT + 1])
    color = tex(T_COLOR)[..., :3] * p[..., F_COLOR:F_COLOR + 3]
    normal = reconstruct_normal_xy(tex(T_NORMAL)[..., :3])
    if ds.flip_normal_y:  # DX-style normal maps (HitFlagsDxNormalTextures)
        normal = normal * jnp.asarray([1.0, -1.0, 1.0])

    tex_a = tex(T_A)
    tex_b = tex(T_B)

    # MetallicRoughness path: green=roughness, blue=metallic channels
    mr_rough = tex_a[..., 1] * p[..., F_ROUGHNESS]
    mr_metal = tex_b[..., 2] * p[..., F_METALNESS]

    # SpecularGlossiness / Phong path (identical math, different factor col)
    specular = tex_a[..., :3] * p[..., F_SPECULAR:F_SPECULAR + 3]
    gloss = tex_b[..., 3] * p[..., F_GLOSS]
    sg_rough = 1.0 - gloss
    # deliberately UNCLAMPED, matching the reference bug-for-bug
    # (material.glsl:109-110): dark diffuse colors can push the derived
    # metalness far outside [0,1] (even negative); the reference renders
    # those materials the same way, so parity requires keeping it
    diff = jnp.maximum(specular - 0.04, 0.0) / ((color - 0.04) + 1e-5)
    sg_metal = jnp.mean(diff, axis=-1)

    is_mr = mtype == int(MaterialType.METALLIC_ROUGHNESS)
    roughness = jnp.where(is_mr, mr_rough, sg_rough)
    metalness = jnp.where(is_mr, mr_metal, sg_metal)

    ior = p[..., F_IOR]
    eta = jnp.where(is_inside, ior, 1.0 / jnp.maximum(ior, 1e-6))

    return MaterialSample(
        color=color,
        emissive=emissive,
        normal=normal,
        roughness=roughness,
        metalness=metalness,
        transmission=p[..., F_TRANSMISSION],
        eta=eta,
        attenuation_color=p[..., F_ATTEN_COLOR:F_ATTEN_COLOR + 3],
        attenuation_distance=p[..., F_ATTEN_DIST],
    )
