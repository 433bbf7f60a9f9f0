"""Wavefront path-tracing integrator.

TPU-native replacement of the reference's RT pipeline hot loop: the per-pixel
sample/bounce loops of Shaders/raygen.rgen:36-118 and the closest-hit shading
of Shaders/closestHit.rchit:52-161 become programs over a flat megabatch of
rays:

* raygen        → `raygen()` (jittable stage)
* traceRayEXT   → `pt.accel` BVH/brute intersection over the triangle soup
* closest-hit   → `_shade_hit()` (vectorized shading, masked RNG draws)
* NEE occlusion → second (early-out) traversal
* bounce "loop" → masked "alive" lanes instead of `break` (dead lanes stop
                  consuming RNG draws, preserving stream parity with the
                  divergent GLSL)

Two execution strategies share the same per-bounce function `bounce_once`:

1. `render_flat` / `render_image_stats` — the whole sample/bounce nest in
   ONE jit (lax.fori_loop). Used for tests, the multi-chip shard_map path,
   and small scenes. (On the TPU backend, nesting the traversal while-loops
   inside fori_loops explodes XLA compile time for large scenes — measured
   264 s for 2 bounces on a 100k-triangle scene — hence strategy 2.)

2. the host-orchestrated wavefront in `pt.run.renderer` — each stage
   (`prepare_accel`, `raygen`, `bounce_once`, `finish_sample`) is its own
   cached jit; the host drives the sample/bounce loops and can early-exit
   when every lane is dead. Stages compile once and are reused for every
   frame/sample/bounce. This is the production path.

Integrator features mirrored from the reference: next-event estimation with
uniform light pick + disk softening, 4-lobe BSDF importance sampling,
Russian roulette on max throughput (min prob 1e-3, raygen.rgen:92-97),
progressive firefly clamp via the MaxRoughness payload
(closestHit.rchit:108-112), Beer–Lambert interior attenuation
(closestHit.rchit:123-128), shadow-terminator + self-intersection origin
offsets, and NaN/Inf sample rejection (raygen.rgen:99-112 — rejected samples
are zeroed rather than resampled; see `finish_sample`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pt.accel.intersect import intersect_brute
from pt.accel.lbvh import ThreadedBVH, build_bvh
from pt.accel.pallas_bvh import (PacketBVH, build_packet_bvh, packet_closest,
                                 packet_occluded)
from pt.accel.traverse import bvh_closest, bvh_occluded
from pt.render import rng as prng
from pt.render.bsdf import evaluate_bsdf, sample_bsdf
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
    # traversal backend: "pallas" (packet kernel, production), "bvh"
    # (XLA threaded LBVH), or "brute" (dense oracle; fastest for trivially
    # small scenes)
    backend: str = "pallas"
    bvh_leaf_size: int = 4


class Accel(NamedTuple):
    """World-space geometry + acceleration structure for one frame
    (≙ the per-frame AccelerationStructure, Renderer.h:163).

    Vertex attributes are pre-gathered into per-triangle rows (tri_*): TPU
    gathers are the shading bottleneck, so the 6 index+attribute gathers per
    attribute class collapse to ONE fat row gather per hit. The packing
    itself runs once per frame and amortizes over samples × bounces."""
    wpos: jax.Array           # (V, 3) world positions (BVH build + leaves)
    tri_pos: jax.Array        # (T, 9) p0|p1|p2 world
    tri_nrm: jax.Array        # (T, 9) n0|n1|n2 world
    tri_tan: jax.Array        # (T, 9)
    tri_bit: jax.Array        # (T, 9)
    tri_uv: jax.Array         # (T, 6) uv0|uv1|uv2
    bvh: Optional[object]     # PacketBVH | ThreadedBVH | None (static type)


class BounceCarry(NamedTuple):
    """Per-lane path state threaded across bounces (≙ Payload +
    raygen locals, ShaderRendererTypes.incl / raygen.rgen:41-97)."""
    state: jax.Array          # (N,) uint32 RNG
    origin: jax.Array         # (N, 3)
    direction: jax.Array      # (N, 3)
    throughput: jax.Array     # (N, 3)
    radiance: jax.Array       # (N, 3)
    alive: jax.Array          # (N,) bool
    max_roughness: jax.Array  # (N,)
    rays: jax.Array           # () i32 useful-ray counter


def resolve_backend(settings: PathTracingSettings, num_tris: int) -> str:
    """The packet kernels are TPU-only; off-TPU (CPU tests, virtual meshes)
    fall back to the XLA paths — brute force for small scenes, threaded
    LBVH otherwise. Resolved at trace time (static)."""
    backend = settings.backend
    if backend == "pallas" and jax.default_backend() != "tpu":
        backend = "brute" if num_tris <= 4096 else "bvh"
    return backend


def prepare_accel(ds: DeviceScene, settings: PathTracingSettings) -> Accel:
    """World-space flatten + per-triangle attribute packing + BVH build
    (≙ BLAS/TLAS build; rebuilt on animation since all are dense ops)."""
    wpos, wnrm, wtan, wbit = world_vertices(ds)
    backend = resolve_backend(settings, ds.tri_idx.shape[0])
    if backend == "pallas":
        bvh = build_packet_bvh(wpos, ds.tri_idx)
    elif backend == "bvh":
        bvh = build_bvh(wpos, ds.tri_idx, settings.bvh_leaf_size)
    else:
        bvh = None

    i0, i1, i2 = ds.tri_idx[:, 0], ds.tri_idx[:, 1], ds.tri_idx[:, 2]
    pack3 = lambda a: jnp.concatenate([a[i0], a[i1], a[i2]], axis=1)
    return Accel(wpos=wpos,
                 tri_pos=pack3(wpos), tri_nrm=pack3(wnrm),
                 tri_tan=pack3(wtan), tri_bit=pack3(wbit),
                 tri_uv=pack3(ds.tex_coords),
                 bvh=bvh)


def _finite_or_zero(radiance):
    finite = jnp.all(jnp.isfinite(radiance), axis=-1, keepdims=True)
    return jnp.where(finite, radiance, 0.0)


def _skybox_emissive(ds: DeviceScene, directions):
    """Miss 'shader' (≙ miss.rmiss:16-39). Skybox kind is static."""
    if ds.skybox_kind == int(SkyboxKind.CLEAR):
        return jnp.broadcast_to(ds.skybox_color, directions.shape)
    raise NotImplementedError("2D/cube skybox sampling lands with textures")


def trace_closest(bvh, world_pos, tri_idx, origins, dirs, tmax=TMAX):
    """Closest-hit query (backend dispatch point; the pytree type of bvh
    statically selects the compiled variant). bvh None → brute."""
    if bvh is None:
        return intersect_brute(world_pos, tri_idx, origins, dirs, TMIN, tmax)
    if isinstance(bvh, PacketBVH):
        return packet_closest(bvh, origins, dirs, tmax, TMIN)
    return bvh_closest(bvh, world_pos, tri_idx, origins, dirs, TMIN, tmax)


def trace_occluded(bvh, world_pos, tri_idx, origins, dirs, dist):
    """Shadow query (≙ checkOccluded, raygen.rgen:22-33)."""
    if bvh is None:
        hit = intersect_brute(world_pos, tri_idx, origins, dirs, TMIN, dist)
        return hit.is_hit
    if isinstance(bvh, PacketBVH):
        return packet_occluded(bvh, origins, dirs, dist, TMIN)
    return bvh_occluded(bvh, world_pos, tri_idx, origins, dirs, dist, TMIN)


def init_rng_state(px, py, width: int, frame) -> jax.Array:
    return prng.init_rng(px, py, width, frame)


def raygen(px, py, width: int, height: int, inv_view, inv_proj, state,
           settings: PathTracingSettings):
    """Sample-start stage: jitter + (optional) lens draws, primary rays.
    Returns (state, origin, direction)."""
    state, u1, u2 = prng.rand2(state)
    if settings.lens_radius > 0:
        state, lu1, lu2 = prng.rand2(state)
        ray, _, _ = construct_primary_rays(
            px, py, width, height, inv_view, inv_proj, u1, u2,
            lu1, lu2, settings.lens_radius, settings.focal_distance)
    else:
        ray, _, _ = construct_primary_rays(
            px, py, width, height, inv_view, inv_proj, u1, u2)
    return state, ray.origin, ray.direction


def start_carry(state, origin, direction) -> BounceCarry:
    n = origin.shape[0]
    return BounceCarry(
        state=state, origin=origin, direction=direction,
        throughput=jnp.ones((n, 3), jnp.float32),
        radiance=jnp.zeros((n, 3), jnp.float32),
        alive=jnp.ones((n,), bool),
        max_roughness=jnp.zeros((n,), jnp.float32),
        rays=jnp.zeros((), jnp.int32))


def _shade_hit(ds: DeviceScene, tex: DeviceTextures, accel: Accel, hit,
               ray_o, ray_d, state, alive, max_roughness):
    """Vectorized closest-hit 'shader' (≙ closestHit.rchit:52-161).

    Returns a dict payload with next-ray data, NEE data, emissive, bsdf/pdf,
    plus the updated RNG state and MaxRoughness carry. All RNG draws are
    masked by `alive & hit` so dead/missed lanes keep their streams intact.
    """
    active = alive & hit.is_hit
    tri = jnp.maximum(hit.tri, 0)
    bary = jnp.stack([1.0 - hit.u - hit.v, hit.u, hit.v], axis=-1)

    # one fat row gather per attribute class (see Accel docstring)
    rp = accel.tri_pos[tri]
    rn = accel.tri_nrm[tri]
    rt = accel.tri_tan[tri]
    rb = accel.tri_bit[tri]
    ru = accel.tri_uv[tri]
    p0, p1, p2 = rp[:, 0:3], rp[:, 3:6], rp[:, 6:9]
    n0, n1, n2 = rn[:, 0:3], rn[:, 3:6], rn[:, 6:9]

    def lerp3(a0, a1, a2):
        return (a0 * bary[..., 0:1] + a1 * bary[..., 1:2] + a2 * bary[..., 2:3])

    position = lerp3(p0, p1, p2)
    normal = lerp3(n0, n1, n2)
    tangent = lerp3(rt[:, 0:3], rt[:, 3:6], rt[:, 6:9])
    bitangent = lerp3(rb[:, 0:3], rb[:, 3:6], rb[:, 6:9])
    uv = lerp3(ru[:, 0:2], ru[:, 2:4], ru[:, 4:6])

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
    ray_origin = offset_ray_origin_shadow_terminator(
        position, bary, p0, p1, p2, n0, n1, n2, is_refracted)
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


def _coherence_keys(bvh: "PacketBVH", origin, direction, alive):
    """Ray-sorting keys for packet coherence: direction octant (3 bits) +
    27-bit origin Morton code within the scene AABB. Dead lanes key to the
    max so they compact into trailing packets (which the trace dispatch
    degenerates so they terminate at the root test)."""
    from pt.accel.lbvh import _expand_bits_10
    lo = bvh.top_lo[0]
    hi = bvh.top_hi[0]
    ext = jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip((origin - lo) / ext * 512.0, 0.0, 511.0).astype(jnp.uint32)
    morton = (_expand_bits_10(q[:, 0]) << 2 | _expand_bits_10(q[:, 1]) << 1
              | _expand_bits_10(q[:, 2])) & jnp.uint32((1 << 27) - 1)
    octant = ((direction[:, 0] < 0).astype(jnp.uint32) << 2
              | (direction[:, 1] < 0).astype(jnp.uint32) << 1
              | (direction[:, 2] < 0).astype(jnp.uint32))
    key = (octant << 27) | morton
    return jnp.where(alive, key, jnp.uint32(0xFFFFFFFF))


def bounce_once(ds: DeviceScene, tex: DeviceTextures, accel: Accel,
                carry: BounceCarry,
                settings: PathTracingSettings) -> BounceCarry:
    """One wavefront bounce: closest trace → shade → NEE → RR
    (≙ one iteration of raygen.rgen:62-97)."""
    (state, origin, direction, throughput, radiance, alive,
     max_roughness, rays) = carry
    rays = rays + jnp.sum(alive.astype(jnp.int32))
    sort_packets = isinstance(accel.bvh, PacketBVH)
    if sort_packets:
        # defer the actual traces so closest+shadow share one sort; we must
        # first shade to know the shadow rays, so trace closest here with
        # the sort and shadow below reusing the permutation
        perm_keys = _coherence_keys(accel.bvh, origin, direction, alive)
        perm = jnp.argsort(perm_keys)
        n = origin.shape[0]
        inv = jnp.zeros((n,), jnp.int32).at[perm].set(
            jnp.arange(n, dtype=jnp.int32))
        outside = accel.bvh.top_hi[0] + 1.0e6
        live_s = alive[perm]
        o_s = jnp.where(live_s[:, None], origin[perm], outside)
        d_s = jnp.where(live_s[:, None], direction[perm],
                        jnp.asarray([1.0, 0.0, 0.0]))
        t_s = jnp.where(live_s, TMAX, TMIN)
        hit_s = trace_closest(accel.bvh, accel.wpos, ds.tri_idx, o_s, d_s,
                              t_s)
        hit = type(hit_s)(hit_s.t[inv], hit_s.tri[inv], hit_s.u[inv],
                          hit_s.v[inv])
    else:
        hit = trace_closest(accel.bvh, accel.wpos, ds.tri_idx, origin,
                            direction)
    missed = alive & ~hit.is_hit

    # miss: add skybox emissive, terminate (raygen.rgen:73-77)
    sky = _skybox_emissive(ds, direction)
    radiance = radiance + jnp.where(missed[..., None], throughput * sky, 0.0)

    payload = _shade_hit(ds, tex, accel, hit, origin, direction,
                         state, alive, max_roughness)
    state = payload["state"]
    max_roughness = payload["max_roughness"]
    active = alive & hit.is_hit

    # emissive (raygen.rgen:79)
    radiance = radiance + jnp.where(active[..., None],
                                    throughput * payload["emissive"], 0.0)

    # NEE (raygen.rgen:81-83)
    shadow_dir = -_normalize(payload["light_dir"])
    if sort_packets:
        shadow_live = active & (payload["light_pdf"] > 0.0)
        so_s = jnp.where(shadow_live[perm][:, None],
                         payload["next_origin"][perm], outside)
        sd_s = jnp.where(shadow_live[perm][:, None], shadow_dir[perm],
                         jnp.asarray([1.0, 0.0, 0.0]))
        sdist_s = jnp.where(shadow_live[perm], payload["light_dist"][perm],
                            TMIN)
        occ_s = trace_occluded(accel.bvh, accel.wpos, ds.tri_idx,
                               so_s, sd_s, sdist_s)
        occluded = occ_s[inv]
    else:
        occluded = trace_occluded(accel.bvh, accel.wpos, ds.tri_idx,
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

    # Russian roulette (raygen.rgen:88-97); continuation rand drawn only on
    # lanes that reach it (masked state advance)
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

    return BounceCarry(state, payload["next_origin"], payload["next_dir"],
                       throughput, radiance, survived, max_roughness, rays)


def finish_sample(carry: BounceCarry, radiance_sum):
    """NaN/Inf rejection + accumulate (≙ raygen.rgen:99-117, rejected
    samples zeroed instead of resampled)."""
    return radiance_sum + _finite_or_zero(carry.radiance)


def render_flat(ds: DeviceScene, tex: DeviceTextures, inv_view, inv_proj,
                px, py, width: int, height: int, frame,
                settings: PathTracingSettings):
    """Single-program render of `settings.sample_count` full paths for each
    listed pixel (strategy 1: all loops in one jaxpr; see module docstring).

    Returns (radiance (N, 3) summed over samples — add to the accumulation
    film like the additive imageStore of raygen.rgen:115-117, rays ()).
    """
    accel = prepare_accel(ds, settings)
    n = px.shape[0]
    state = init_rng_state(px, py, width, frame)

    def sample_body(_, scarry):
        state, radiance_sum, ray_count = scarry
        state, origin, direction = raygen(px, py, width, height,
                                          inv_view, inv_proj, state, settings)
        carry = start_carry(state, origin, direction)
        carry = carry._replace(rays=ray_count)

        carry = jax.lax.fori_loop(
            0, settings.bounce_count,
            lambda _, c: bounce_once(ds, tex, accel, c, settings), carry)

        radiance_sum = finish_sample(carry, radiance_sum)
        return carry.state, radiance_sum, carry.rays

    state, radiance_sum, ray_count = jax.lax.fori_loop(
        0, settings.sample_count, sample_body,
        (state, jnp.zeros((n, 3), jnp.float32), jnp.zeros((), jnp.int32)))
    return radiance_sum, ray_count


@functools.partial(jax.jit, static_argnames=("width", "height", "settings"))
def render_image_stats(ds: DeviceScene, tex: DeviceTextures, inv_view,
                       inv_proj, width: int, height: int, frame,
                       settings: PathTracingSettings):
    """Full-frame single-jit render. Returns ((H, W, 3) radiance sum,
    rays traced). Prefer pt.run.renderer for large scenes on TPU."""
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
