"""Wavefront path-tracing integrator.

TPU-native replacement of the reference's RT pipeline hot loop: the per-pixel
sample/bounce loops of Shaders/raygen.rgen:36-118 and the closest-hit shading
of Shaders/closestHit.rchit:52-161 become one jitted program over a flat
megabatch of rays:

* sample loop  → `lax.fori_loop` carrying (rng, accumulated radiance)
* bounce loop  → `lax.fori_loop` carrying masked "alive" lanes instead of
                 `break` (dead lanes stop consuming RNG draws, preserving
                 stream parity with the divergent GLSL)
* traceRayEXT  → `pt.accel` intersection over the world-space triangle soup
* NEE occlusion traceRay → a second (cheaper, opaque-only) intersection
* payload round-trip → plain SSA values

Integrator features mirrored from the reference: next-event estimation with
uniform light pick + disk softening, 4-lobe BSDF importance sampling,
Russian roulette on max throughput (min prob 1e-3, raygen.rgen:92-97),
progressive firefly clamp via the MaxRoughness payload
(closestHit.rchit:108-112), Beer–Lambert interior attenuation
(closestHit.rchit:123-128), shadow-terminator + self-intersection origin
offsets, and NaN/Inf sample rejection (raygen.rgen:99-112 — rejected samples
are zeroed rather than resampled; see `_finite_or_zero`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pt.accel.intersect import intersect_brute
from pt.render import rng as prng
from pt.render.bsdf import sample_bsdf
from pt.render.bsdf import evaluate_bsdf
from pt.render.materials import sample_material
from pt.render.rays import (TMAX, TMIN, construct_primary_rays,
                            offset_ray_origin_self_intersection,
                            offset_ray_origin_shadow_terminator)
from pt.render.sampling import compute_tangent_space, sample_light
from pt.render.shading import _normalize
from pt.render.textures import DeviceTextures
from pt.scene.flatten import DeviceScene, world_vertices
from pt.scene.types import SkyboxKind


@dataclasses.dataclass(frozen=True)
class PathTracingSettings:
    """Static integrator knobs (≙ PathTracingSettings, Renderer.h:37-52 +
    the RaygenUniformData fields). Static under jit — changing them
    recompiles, like the reference's pipeline spec-constant variants."""
    sample_count: int = 1
    bounce_count: int = 5
    lens_radius: float = 0.0
    focal_distance: float = 1.0


def _finite_or_zero(radiance):
    """NaN/Inf sample rejection. The reference resamples bad samples
    (raygen.rgen:99-112); we zero them — identical in expectation up to the
    (rare) lost sample, and keeps the program shape static."""
    finite = jnp.all(jnp.isfinite(radiance), axis=-1, keepdims=True)
    return jnp.where(finite, radiance, 0.0)


def _skybox_emissive(ds: DeviceScene, directions):
    """Miss 'shader' (≙ miss.rmiss:16-39). Skybox kind is static."""
    if ds.skybox_kind == int(SkyboxKind.CLEAR):
        return jnp.broadcast_to(ds.skybox_color, directions.shape)
    raise NotImplementedError("2D/cube skybox sampling lands with textures")


def trace_closest(world_pos, tri_idx, origins, dirs, tmax=TMAX):
    """Closest-hit query (backend dispatch point)."""
    return intersect_brute(world_pos, tri_idx, origins, dirs, TMIN, tmax)


def trace_occluded(world_pos, tri_idx, origins, dirs, dist):
    """Shadow query (≙ checkOccluded, raygen.rgen:22-33)."""
    hit = intersect_brute(world_pos, tri_idx, origins, dirs, TMIN, dist)
    return hit.is_hit


def _shade_hit(ds: DeviceScene, tex: DeviceTextures, world, hit,
               ray_o, ray_d, state, alive, max_roughness):
    """Vectorized closest-hit 'shader' (≙ closestHit.rchit:52-161).

    Returns a dict payload with next-ray data, NEE data, emissive, bsdf/pdf,
    plus the updated RNG state and MaxRoughness carry. All RNG draws are
    masked by `alive & hit` so dead/missed lanes keep their streams intact.
    """
    wpos, wnrm, wtan, wbit = world
    active = alive & hit.is_hit
    tri = jnp.maximum(hit.tri, 0)
    i0, i1, i2 = (ds.tri_idx[tri, k] for k in range(3))
    bary = jnp.stack([1.0 - hit.u - hit.v, hit.u, hit.v], axis=-1)

    p0, p1, p2 = wpos[i0], wpos[i1], wpos[i2]
    n0, n1, n2 = wnrm[i0], wnrm[i1], wnrm[i2]

    def lerp3(a0, a1, a2):
        return (a0 * bary[..., 0:1] + a1 * bary[..., 1:2] + a2 * bary[..., 2:3])

    position = lerp3(p0, p1, p2)
    normal = lerp3(n0, n1, n2)
    tangent = lerp3(wtan[i0], wtan[i1], wtan[i2])
    bitangent = lerp3(wbit[i0], wbit[i1], wbit[i2])
    uv = lerp3(ds.tex_coords[i0], ds.tex_coords[i1], ds.tex_coords[i2])

    # geometric normal; flip the frame on inside hits (closestHit.rchit:71-85)
    gn = _normalize(jnp.cross(p1 - p0, p2 - p0))
    is_inside = jnp.sum(gn * ray_d, axis=-1) > 0.0
    flip = jnp.where(is_inside, -1.0, 1.0)[..., None]
    gn = gn * flip
    normal = normal * flip
    tangent = tangent * flip
    bitangent = bitangent * flip

    mat = sample_material(ds, tex, ds.tri_mat[tri], uv, is_inside)

    # progressive roughness clamp (firefly suppression, closestHit.rchit:108-112)
    max_roughness = jnp.where(active,
                              jnp.maximum(mat.roughness, max_roughness),
                              max_roughness)
    mat = dataclasses.replace(
        mat, roughness=jnp.maximum(max_roughness, 0.01))

    # shading frame: perturb vertex normal by the mapped normal through the
    # geometry TBN, then build an orthonormal frame (closestHit.rchit:114-117)
    mapped = (mat.normal[..., 0:1] * tangent + mat.normal[..., 1:2] * bitangent
              + mat.normal[..., 2:3] * normal)
    n = _normalize(normal + mapped)
    tbn = compute_tangent_space(n)                  # (..., 3, 3) columns T,B,N
    to_local = lambda v: jnp.einsum("...ji,...j->...i", tbn, v)
    to_world = lambda v: jnp.einsum("...ij,...j->...i", tbn, v)
    v_local = _normalize(to_local(-_normalize(ray_d)))

    state0 = state
    state, bs = sample_bsdf(mat, v_local, state)

    # Beer–Lambert attenuation through the interior (closestHit.rchit:123-128)
    atten = jnp.where(
        is_inside[..., None],
        jnp.power(jnp.maximum(mat.attenuation_color, 1e-30),
                  (hit.t / jnp.maximum(mat.attenuation_distance, 1e-30))[..., None]),
        1.0)
    bsdf_color = bs.color * atten

    is_refracted = bs.direction[..., 2] < 0.0

    # ray-origin offsets (closestHit.rchit:130-140)
    n0s, n1s, n2s = wnrm[i0], wnrm[i1], wnrm[i2]
    ray_origin = offset_ray_origin_shadow_terminator(
        position, bary, p0, p1, p2, n0s, n1s, n2s, is_refracted)
    refr_origin = offset_ray_origin_self_intersection(position, -gn)
    next_origin = jnp.where(is_refracted[..., None], refr_origin, ray_origin)

    # NEE light sample (closestHit.rchit:142-147): three rands
    state, u1, u2, u3 = prng.rand3(state)
    light = sample_light(u1, u2, u3, ray_origin,
                         ds.point_light_color, ds.point_light_pos,
                         ds.point_light_atten, ds.point_light_count,
                         ds.dir_light_color, ds.dir_light_dir)
    l_local = _normalize(to_local(-light.direction))
    light_bsdf, _ = evaluate_bsdf(mat, v_local, l_local)

    # lanes that missed (or are dead) must not consume RNG draws
    state = jnp.where(active, state, state0)

    return dict(
        state=state,
        max_roughness=max_roughness,
        emissive=mat.emissive,
        bsdf=bsdf_color,
        pdf=bs.pdf,
        next_origin=next_origin,
        next_dir=_normalize(to_world(bs.direction)),
        light_dir=light.direction,
        light_dist=light.distance,
        light_pdf=light.pdf,
        direct_light=light.color * light.attenuation[..., None] * light_bsdf,
    )


def render_flat(ds: DeviceScene, tex: DeviceTextures, inv_view, inv_proj,
                px, py, width: int, height: int, frame,
                settings: PathTracingSettings):
    """Trace `settings.sample_count` full paths for each listed pixel.

    px/py: (N,) pixel integer coords; frame: uint32 accumulation counter
    (the RNG is seeded per (pixel, frame) exactly like initRng,
    common.glsl:144-148). Returns (radiance (N, 3), rays_traced ()) where
    radiance is the summed contribution to add to the accumulation film
    (matching the additive imageStore of raygen.rgen:115-117) and
    rays_traced counts useful rays (live closest-hit + NEE shadow rays) for
    the Mrays/s benchmark metric.
    """
    world = world_vertices(ds)
    wpos = world[0]
    n = px.shape[0]

    state = prng.init_rng(px, py, width, frame)

    def sample_body(_, carry):
        state, radiance_sum, ray_count = carry
        state, u1, u2 = prng.rand2(state)
        if settings.lens_radius > 0:
            state, lu1, lu2 = prng.rand2(state)
            ray, _, _ = construct_primary_rays(
                px, py, width, height, inv_view, inv_proj, u1, u2,
                lu1, lu2, settings.lens_radius, settings.focal_distance)
        else:
            ray, _, _ = construct_primary_rays(
                px, py, width, height, inv_view, inv_proj, u1, u2)

        def bounce_body(_, bcarry):
            (state, origin, direction, throughput, radiance, alive,
             max_roughness, rays) = bcarry
            rays = rays + jnp.sum(alive.astype(jnp.int32))
            hit = trace_closest(wpos, ds.tri_idx, origin, direction)
            missed = alive & ~hit.is_hit

            # miss: add skybox emissive, terminate (raygen.rgen:73-77)
            sky = _skybox_emissive(ds, direction)
            radiance = radiance + jnp.where(missed[..., None],
                                            throughput * sky, 0.0)

            payload = _shade_hit(ds, tex, world, hit, origin, direction,
                                 state, alive, max_roughness)
            state = payload["state"]
            max_roughness = payload["max_roughness"]
            active = alive & hit.is_hit

            # emissive (raygen.rgen:79)
            radiance = radiance + jnp.where(active[..., None],
                                            throughput * payload["emissive"], 0.0)

            # NEE (raygen.rgen:81-83)
            shadow_dir = -_normalize(payload["light_dir"])
            occluded = trace_occluded(wpos, ds.tri_idx,
                                      payload["next_origin"], shadow_dir,
                                      payload["light_dist"])
            rays = rays + jnp.sum((active & (payload["light_pdf"] > 0.0))
                                  .astype(jnp.int32))
            nee_ok = active & (payload["light_pdf"] > 0.0) & ~occluded
            radiance = radiance + jnp.where(
                nee_ok[..., None],
                throughput * payload["direct_light"]
                / jnp.maximum(payload["light_pdf"], 1e-12)[..., None],
                0.0)

            # throughput update (raygen.rgen:85-86): only when pdf > 1e-3
            tp_update = active & (payload["pdf"] > 0.001)
            throughput = jnp.where(
                tp_update[..., None],
                throughput * payload["bsdf"]
                / jnp.maximum(payload["pdf"], 1e-12)[..., None],
                throughput)

            # Russian roulette (raygen.rgen:88-97). The continuation rand is
            # drawn only on lanes that reach it (masked state advance).
            prob = jnp.minimum(jnp.max(throughput, axis=-1), 1.0)
            dead_small = prob < 0.001
            need_rr = active & ~dead_small
            rr_state = prng.xorshift(state)
            rr = prng.uint_to_float(rr_state)
            state = jnp.where(need_rr, rr_state, state)
            killed = need_rr & (prob < rr)
            survived = need_rr & ~killed
            throughput = jnp.where(survived[..., None],
                                   throughput / jnp.maximum(prob, 1e-12)[..., None],
                                   throughput)
            alive = survived
            origin = payload["next_origin"]
            direction = payload["next_dir"]
            return (state, origin, direction, throughput, radiance, alive,
                    max_roughness, rays)

        init = (state,
                ray.origin, ray.direction,
                jnp.ones((n, 3), jnp.float32),       # throughput
                jnp.zeros((n, 3), jnp.float32),      # radiance
                jnp.ones((n,), bool),                # alive
                jnp.zeros((n,), jnp.float32),        # MaxRoughness
                ray_count)
        (state, _, _, _, radiance, _, _, ray_count) = jax.lax.fori_loop(
            0, settings.bounce_count, bounce_body, init)

        radiance = _finite_or_zero(radiance)
        return state, radiance_sum + radiance, ray_count

    state, radiance_sum, ray_count = jax.lax.fori_loop(
        0, settings.sample_count, sample_body,
        (state, jnp.zeros((n, 3), jnp.float32), jnp.zeros((), jnp.int32)))
    return radiance_sum, ray_count


@functools.partial(jax.jit, static_argnames=("width", "height", "settings"))
def render_image_stats(ds: DeviceScene, tex: DeviceTextures, inv_view, inv_proj,
                       width: int, height: int, frame,
                       settings: PathTracingSettings):
    """Full-frame render step. Returns ((H, W, 3) radiance sum over
    sample_count samples, rays_traced scalar)."""
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.uint32),
                          jnp.arange(width, dtype=jnp.uint32), indexing="ij")
    radiance, rays = render_flat(ds, tex, inv_view, inv_proj,
                                 xs.reshape(-1), ys.reshape(-1),
                                 width, height, frame, settings)
    return radiance.reshape(height, width, 3), rays


def render_image(ds: DeviceScene, tex: DeviceTextures, inv_view, inv_proj,
                 width: int, height: int, frame,
                 settings: PathTracingSettings):
    """Full-frame render: (H, W, 3) radiance sum over sample_count samples."""
    return render_image_stats(ds, tex, inv_view, inv_proj, width, height,
                              frame, settings)[0]
