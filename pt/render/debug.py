"""Debug renderer: Whitted-style single-trace visualization modes + flags.

Counterpart of the reference's debug RT pipeline (Shaders/Debug/*: 8 render
modes — color via simple direct lighting with shadows, world position,
normals, texcoords, mip heatmap via computeLod, geometry/primitive/instance
id coloring — DebugShaderTypes.incl:13-43, debugClosestHit.rchit:239-263)
and the UI Debug tab's pipeline flags (force-opaque / cull-backfaces
raygen flags, disable-color/-shadows hit flags,
UserInterface.cpp:1700-1764). Each mode is a cheap alternate shade function
over one closest-hit trace; flags are static jit args (≙ the debug
pipeline's specialization constants).
"""

from __future__ import annotations

import dataclasses
import enum
import functools

import jax
import jax.numpy as jnp

from pt.render import rng as prng
from pt.render.integrator import (Accel, PathTracingSettings, prepare_accel,
                                  trace_closest, trace_closest_alpha,
                                  trace_occluded)
from pt.render.differentials import (DiffRays, compute_dp_dxy,
                                     compute_dpn_duv,
                                     compute_uv_derivatives)
from pt.render.materials import sample_material
from pt.render.sampling import sample_light
from pt.render.shading import _normalize
from pt.render.textures import DeviceTextures
from pt.scene.flatten import DeviceScene, T_COLOR


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


@dataclasses.dataclass(frozen=True)
class DebugFlags:
    """≙ the Debug tab's raygen/hit flag checkboxes
    (DebugShaderTypes.incl:24-43): static jit args, like the reference's
    debug-pipeline spec constants."""
    force_opaque: bool = False        # skip any-hit alpha handling
    cull_backfaces: bool = False      # drop hits seen from behind
    disable_color_texture: bool = False
    disable_shadows: bool = False


def _id_color(ids):
    """Stable pseudo-random color per integer id (≙ the id-hash coloring in
    debugClosestHit.rchit)."""
    h = prng.jenkins_hash(ids.astype(jnp.uint32))
    r = prng.uint_to_float(h)
    g = prng.uint_to_float(prng.jenkins_hash(h))
    b = prng.uint_to_float(prng.jenkins_hash(h + 1))
    return jnp.stack([r, g, b], axis=-1)


def debug_shade(ds: DeviceScene, tex: DeviceTextures, accel: Accel, hit,
                origin, direction, mode: DebugRenderMode,
                flags: DebugFlags = DebugFlags(),
                diff: DiffRays = None):
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
    p0, p1, p2 = rp[:, 0:3], rp[:, 3:6], rp[:, 6:9]
    gn = _normalize(jnp.cross(p1 - p0, p2 - p0))

    visible = hit.is_hit
    if flags.cull_backfaces:
        # ≙ gl_RayFlagsCullBackFacingTrianglesEXT: backface hits vanish
        visible = visible & (jnp.sum(gn * direction, axis=-1) <= 0.0)

    def uv_derivs():
        uv0, uv1, uv2 = ru[:, 0:2], ru[:, 2:4], ru[:, 4:6]
        n0, n1, n2 = rn[:, 0:3], rn[:, 3:6], rn[:, 6:9]
        dpdu, dpdv, _, _ = compute_dpn_duv(
            p0, p1, p2, uv0, uv1, uv2, n0, n1, n2,
            accel.tri_tan[tri][:, 0:3], accel.tri_bit[tri][:, 0:3])
        dpdx, dpdy = compute_dp_dxy(position, diff, normal)
        return compute_uv_derivatives(dpdx, dpdy, dpdu, dpdv)

    if mode == DebugRenderMode.COLOR:
        is_inside = jnp.sum(normal * direction, axis=-1) > 0.0
        duv_x = duv_y = None
        if diff is not None:
            duv_x, duv_y = uv_derivs()
        mat = sample_material(ds, tex, ds.tri_mat[tri], uv, is_inside,
                              duv_x, duv_y)
        base = jnp.ones_like(mat.color) if flags.disable_color_texture \
            else mat.color
        n = jnp.where(is_inside[:, None], -normal, normal)
        # one direct light + shadow ray (≙ the debug pipeline's simple
        # direct lighting, debugClosestHit.rchit; shadows gated by flag)
        half = jnp.full((tri.shape[0],), 0.5, jnp.float32)
        light = sample_light(half, half, half, position,
                             ds.point_light_color, ds.point_light_pos,
                             ds.point_light_atten, ds.point_light_count,
                             ds.dir_light_color, ds.dir_light_dir)
        ldir = -_normalize(light.direction)
        ndl = jnp.maximum(jnp.sum(n * ldir, axis=-1), 0.0)
        if flags.disable_shadows:
            lit = jnp.ones_like(ndl)
        else:
            occ = trace_occluded(accel.bvh, accel.wpos, ds.tri_idx,
                                 position + n * 1e-3, ldir, light.distance)
            lit = jnp.where(occ, 0.0, 1.0)
        direct = (light.color * light.attenuation[:, None]
                  * (ndl * lit)[:, None])
        headlight = jnp.abs(jnp.sum(n * -_normalize(direction), axis=-1))
        color = base * (0.1 + 0.25 * headlight[:, None] + 0.65 * direct) \
            + mat.emissive
    elif mode == DebugRenderMode.WORLD_POSITION:
        color = jnp.abs(position) * 0.1
    elif mode == DebugRenderMode.NORMAL:
        color = normal * 0.5 + 0.5
    elif mode == DebugRenderMode.TEX_COORDS:
        color = jnp.concatenate(
            [jnp.mod(uv, 1.0), jnp.zeros_like(uv[:, :1])], axis=-1)
    elif mode == DebugRenderMode.MIPS:
        if diff is not None and not tex.all_constant:
            # real LOD heatmap (≙ computeLod in the debug hit shader):
            # the level the color texture would be sampled at
            duv_x, duv_y = uv_derivs()
            tex_idx = ds.mat_tex[ds.tri_mat[tri], T_COLOR]
            size0 = tex.sizes[tex_idx, 0].astype(jnp.float32)
            px = duv_x * size0
            py = duv_y * size0
            rho = jnp.sqrt(jnp.maximum(jnp.sum(px * px, -1),
                                       jnp.sum(py * py, -1)))
            level = jnp.log2(jnp.maximum(rho, 1e-12))
            level = jnp.clip(level, 0.0, 12.0) / 12.0
        else:
            # constant pools have no meaningful LOD: distance stand-in
            level = jnp.clip(jnp.log2(jnp.maximum(hit.t, 1e-3)),
                             0.0, 12.0) / 12.0
        color = jnp.stack([level, 1.0 - level, jnp.zeros_like(level)],
                          axis=-1)
    elif mode == DebugRenderMode.GEOMETRY:
        color = _id_color(ds.vert_seg[ds.tri_idx[tri, 0]])
    elif mode == DebugRenderMode.PRIMITIVE:
        color = _id_color(tri)
    elif mode == DebugRenderMode.INSTANCE:
        # per-instance id (the earlier material-row coloring could not
        # tell two instances of one model apart)
        color = _id_color(ds.seg_instance[ds.vert_seg[ds.tri_idx[tri, 0]]])
    else:
        color = jnp.zeros((tri.shape[0], 3))

    background = jnp.asarray([0.1, 0.1, 0.12])
    return jnp.where(visible[:, None], color[:, :3], background)


@functools.partial(jax.jit, static_argnames=("width", "height", "mode",
                                             "settings", "flags"))
def render_debug_image(ds: DeviceScene, tex: DeviceTextures, inv_view,
                       inv_proj, width: int, height: int,
                       mode: DebugRenderMode,
                       settings: PathTracingSettings = PathTracingSettings(
                           backend="brute"),
                       flags: DebugFlags = DebugFlags()):
    """One debug frame (H, W, 3); single primary trace, center rays."""
    accel = prepare_accel(ds, settings)
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.uint32),
                          jnp.arange(width, dtype=jnp.uint32), indexing="ij")
    px, py = xs.reshape(-1), ys.reshape(-1)
    n = px.shape[0]
    # centered rays (≙ the centered constructPrimaryRay overload,
    # ray.glsl:91-99): fixed 0.5 jitter; offset rays feed the LOD heatmap
    from pt.render.rays import construct_primary_rays
    ray, rx, ry = construct_primary_rays(
        px, py, width, height, inv_view, inv_proj,
        jnp.full((n,), 0.5), jnp.full((n,), 0.5))
    diff = DiffRays(rx.origin, rx.direction, ry.origin, ry.direction)
    if ds.has_alpha and not flags.force_opaque:
        alive = jnp.ones((n,), bool)
        hit, _, _, _ = trace_closest_alpha(ds, tex, accel, ray.origin,
                                           ray.direction, alive)
    else:
        hit = trace_closest(accel.bvh, accel.wpos, ds.tri_idx,
                            ray.origin, ray.direction)
    color = debug_shade(ds, tex, accel, hit, ray.origin, ray.direction,
                        mode, flags, diff)
    return color.reshape(height, width, 3)
