"""Sampling primitives + light sampling.

Vectorized counterparts of Shaders/common.glsl:169-197 (concentric disk,
cosine hemisphere, tangent-space construction) and Shaders/sampling.glsl:17-56
(uniform pick among point lights + one directional light, disk-softened,
attenuation-clamped).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pt.render.shading import PI, _normalize

DIRECTIONAL_LIGHT_DISTANCE = 100000.0


def sample_uniform_disk_concentric(u1, u2):
    """PBRT concentric disk mapping (≙ sampleUniformDiskConcentric,
    common.glsl:169-186). Returns (x, y)."""
    ox = 2.0 * u1 - 1.0
    oy = 2.0 * u2 - 1.0
    zero = (ox == 0.0) & (oy == 0.0)
    x_major = jnp.abs(ox) > jnp.abs(oy)
    safe_ox = jnp.where(ox == 0.0, 1.0, ox)
    safe_oy = jnp.where(oy == 0.0, 1.0, oy)
    theta = jnp.where(x_major, PI / 4 * (oy / safe_ox),
                      PI / 2 - PI / 4 * (ox / safe_oy))
    r = jnp.where(x_major, ox, oy)
    x = jnp.where(zero, 0.0, r * jnp.cos(theta))
    y = jnp.where(zero, 0.0, r * jnp.sin(theta))
    return x, y


def sample_cosine_hemisphere(u1, u2):
    """≙ sampleCosineHemisphere (common.glsl:188-193); z-up."""
    x, y = sample_uniform_disk_concentric(u1, u2)
    z = jnp.sqrt(jnp.maximum(1.0 - x * x - y * y, 0.0))
    return jnp.stack([x, y, z], axis=-1)


def compute_tangent_space(normal):
    """Orthonormal TBN columns for a normal (≙ computeTangentSpace,
    common.glsl:195-202). Returns (..., 3, 3) with columns T, B, N."""
    x_axis = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), normal.shape)
    y_axis = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), normal.shape)
    t1 = jnp.cross(normal, x_axis)
    t2 = jnp.cross(normal, y_axis)
    use1 = (jnp.linalg.norm(t1, axis=-1) > jnp.linalg.norm(t2, axis=-1))[..., None]
    tangent = _normalize(jnp.where(use1, t1, t2))
    bitangent = _normalize(jnp.cross(normal, tangent))
    return jnp.stack([tangent, bitangent, normal], axis=-1)


class LightSample(NamedTuple):
    """≙ LightSample (sampling.glsl:17-23)."""
    direction: jax.Array    # (..., 3) direction *from* light *to* shading point
    distance: jax.Array     # (...,)
    color: jax.Array        # (..., 3)
    attenuation: jax.Array  # (...,)
    pdf: jax.Array          # (...,) uniform 1/(count+1)
    is_directional: jax.Array  # (...,) bool — picked the directional light


def sample_light(u1, u2, u3, position, point_color, point_pos, point_atten,
                 point_count, dir_color, dir_dir) -> LightSample:
    """Uniformly pick one light among point lights + the directional light
    (≙ sampleLight, sampling.glsl:25-56): index = u1*(count+1); index==count
    selects the directional light with a 0.001-radius disk softener, point
    lights use a 0.1-radius disk at the light and clamped 1/(c+l·d+q·d²)
    attenuation.

    `position` is the shading point (..., 3). Light tables are the flat
    MAX_LIGHT_COUNT arrays from DeviceScene. Vectorized: both variants are
    computed and the per-lane pick selects.
    """
    count = point_count.astype(jnp.float32)
    idx = jnp.floor(u1 * (count + 1.0)).astype(jnp.int32)
    pdf = 1.0 / (count + 1.0)
    is_dir = idx >= point_count

    dx, dy = sample_uniform_disk_concentric(u2, u3)

    # --- directional variant (disk-softened direction) ---
    ddir = _normalize(jnp.broadcast_to(dir_dir, position.shape))
    frame_d = compute_tangent_space(ddir)
    disk_d = jnp.stack([dx, dy, jnp.zeros_like(dx)], axis=-1) * 0.001
    dir_direction = _normalize(ddir + jnp.einsum("...ij,...j->...i", frame_d, disk_d))

    # --- point-light variant ---
    safe_idx = jnp.minimum(idx, jnp.maximum(point_count - 1, 0))
    lcolor = point_color[safe_idx]
    lpos = point_pos[safe_idx]
    latten = point_atten[safe_idx]
    to_point = _normalize(position - lpos)
    frame_p = compute_tangent_space(to_point)
    disk_p = jnp.stack([dx, dy, jnp.zeros_like(dx)], axis=-1) * 0.1
    new_pos = lpos + jnp.einsum("...ij,...j->...i", frame_p, disk_p)
    dist_p = jnp.linalg.norm(position - new_pos, axis=-1)
    dir_p = _normalize(position - new_pos)
    atten_p = 1.0 / (latten[..., 0] + dist_p * latten[..., 1]
                     + dist_p * dist_p * latten[..., 2])
    atten_p = jnp.clip(atten_p, 0.0, 1.0)

    sel = is_dir[..., None]
    return LightSample(
        direction=jnp.where(sel, dir_direction, dir_p),
        distance=jnp.where(is_dir, DIRECTIONAL_LIGHT_DISTANCE, dist_p),
        color=jnp.where(sel, jnp.broadcast_to(dir_color, position.shape), lcolor),
        attenuation=jnp.where(is_dir, 1.0, atten_p),
        pdf=jnp.broadcast_to(pdf, u1.shape),
        is_directional=is_dir,
    )
