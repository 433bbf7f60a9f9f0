"""Debug renderer: Whitted-style single-trace visualization modes.

Counterpart of the reference's debug RT pipeline (Shaders/Debug/*: 8 render
modes — color via simple direct lighting, world position, normals,
texcoords, mip heatmap, geometry/primitive/instance id coloring —
DebugShaderTypes.incl:13-43, debugClosestHit.rchit:239-263), selected in
the UI Debug tab and swapped in for the path-tracing pipeline
(UserInterface.cpp:1700-1764). Here each mode is a cheap alternate shade
function over one closest-hit trace.
"""

from __future__ import annotations

import enum
import functools

import jax
import jax.numpy as jnp

from pt.render import rng as prng
from pt.render.integrator import (Accel, PathTracingSettings, prepare_accel,
                                  raygen, trace_closest)
from pt.render.materials import sample_material
from pt.render.shading import _normalize
from pt.render.textures import DeviceTextures
from pt.scene.flatten import DeviceScene


class DebugRenderMode(enum.IntEnum):
    """≙ DebugRenderMode (DebugShaderTypes.incl:13-22)."""
    COLOR = 0
    WORLD_POSITION = 1
    NORMAL = 2
    TEX_COORDS = 3
    MIPS = 4
    GEOMETRY = 5
    PRIMITIVE = 6
    INSTANCE = 7


def _id_color(ids):
    """Stable pseudo-random color per integer id (≙ the id-hash coloring in
    debugClosestHit.rchit)."""
    h = prng.jenkins_hash(ids.astype(jnp.uint32))
    r = prng.uint_to_float(h)
    g = prng.uint_to_float(prng.jenkins_hash(h))
    b = prng.uint_to_float(prng.jenkins_hash(h + 1))
    return jnp.stack([r, g, b], axis=-1)


def debug_shade(ds: DeviceScene, tex: DeviceTextures, accel: Accel, hit,
                origin, direction, mode: DebugRenderMode):
    """Mode-dependent hit coloring; background is dark gray."""
    tri = jnp.maximum(hit.tri, 0)
    bary = jnp.stack([1.0 - hit.u - hit.v, hit.u, hit.v], axis=-1)
    rp = accel.tri_pos[tri]
    rn = accel.tri_nrm[tri]
    ru = accel.tri_uv[tri]

    def lerp3(r, k):
        return (r[:, 0 * k:1 * k] * bary[:, 0:1]
                + r[:, 1 * k:2 * k] * bary[:, 1:2]
                + r[:, 2 * k:3 * k] * bary[:, 2:3])

    position = lerp3(rp, 3)
    normal = _normalize(lerp3(rn, 3))
    uv = lerp3(ru, 2)

    if mode == DebugRenderMode.COLOR:
        is_inside = jnp.sum(normal * direction, axis=-1) > 0.0
        mat = sample_material(ds, tex, ds.tri_mat[tri], uv, is_inside)
        n = jnp.where(is_inside[:, None], -normal, normal)
        # simple headlight diffuse (≙ the debug pipeline's simple direct GGX)
        ndl = jnp.abs(jnp.sum(n * -_normalize(direction), axis=-1))
        color = mat.color * (0.1 + 0.9 * ndl[:, None]) + mat.emissive
    elif mode == DebugRenderMode.WORLD_POSITION:
        color = jnp.abs(position) * 0.1
    elif mode == DebugRenderMode.NORMAL:
        color = normal * 0.5 + 0.5
    elif mode == DebugRenderMode.TEX_COORDS:
        color = jnp.concatenate(
            [jnp.mod(uv, 1.0), jnp.zeros_like(uv[:, :1])], axis=-1)
    elif mode == DebugRenderMode.MIPS:
        # hit-distance heatmap standing in for the LOD heatmap until ray
        # differentials land (mip level ∝ log distance)
        level = jnp.clip(jnp.log2(jnp.maximum(hit.t, 1e-3)), 0.0, 12.0) / 12.0
        color = jnp.stack([level, 1.0 - level, jnp.zeros_like(level)],
                          axis=-1)
    elif mode == DebugRenderMode.GEOMETRY:
        color = _id_color(ds.vert_seg[ds.tri_idx[tri, 0]])
    elif mode == DebugRenderMode.PRIMITIVE:
        color = _id_color(tri)
    elif mode == DebugRenderMode.INSTANCE:
        color = _id_color(ds.tri_mat[tri])
    else:
        color = jnp.zeros((tri.shape[0], 3))

    background = jnp.asarray([0.1, 0.1, 0.12])
    return jnp.where(hit.is_hit[:, None], color, background)


@functools.partial(jax.jit, static_argnames=("width", "height", "mode",
                                             "settings"))
def render_debug_image(ds: DeviceScene, tex: DeviceTextures, inv_view,
                       inv_proj, width: int, height: int,
                       mode: DebugRenderMode,
                       settings: PathTracingSettings = PathTracingSettings(
                           backend="brute")):
    """One debug frame (H, W, 3); single primary trace, center rays."""
    accel = prepare_accel(ds, settings)
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.uint32),
                          jnp.arange(width, dtype=jnp.uint32), indexing="ij")
    px, py = xs.reshape(-1), ys.reshape(-1)
    n = px.shape[0]
    # centered rays (≙ the centered constructPrimaryRay overload,
    # ray.glsl:91-99): fixed 0.5 jitter
    from pt.render.rays import construct_primary_rays
    ray, _, _ = construct_primary_rays(
        px, py, width, height, inv_view, inv_proj,
        jnp.full((n,), 0.5), jnp.full((n,), 0.5))
    hit = trace_closest(accel.bvh, accel.wpos, ds.tri_idx,
                        ray.origin, ray.direction)
    color = debug_shade(ds, tex, accel, hit, ray.origin, ray.direction, mode)
    return color.reshape(height, width, 3)
