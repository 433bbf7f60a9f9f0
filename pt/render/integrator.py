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
from pt.accel.pallas_bvh import (BF8BVH, PacketBVH, build_packet_bvh,
                                 packet_closest_bf8, packet_closest_v4,
                                 packet_occluded_bf8, packet_occluded_v4)
from pt.accel.traverse import bvh_closest, bvh_occluded
from pt.render import rng as prng
from pt.render.bsdf import evaluate_bsdf, sample_bsdf
from pt.render.differentials import (DiffRays, compute_dp_dxy,
                                     compute_dpn_duv, compute_uv_derivatives,
                                     reflect_differentials,
                                     refract_differentials)
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
    # per-bounce coherence sort of secondary rays (octant+Morton).
    # Default OFF: with the v4 kernel's 1024-ray cones, film-tile origin
    # coherence already bounds the traversal footprint, and the sort's
    # argsort + full-carry gather measured a net LOSS (bounce1 at 262k
    # rays: 114 ms sorted vs 81 ms unsorted on the heightfield bench).
    # Scope: applies to the binary PacketBVH path only — static scenes
    # use the BF8 wide-node structures, where every re-sort key we tried
    # also measured negative (docs/perf_budget.md §2), so the knob is
    # intentionally inert there.
    sort_rays: bool = False
    # NEE shadow rays toward POINT lights are traced reversed (origin at
    # the sampled light point, direction toward the surface): occlusion
    # is segment-symmetric, and reversed cones share one origin per
    # light, so the packet kernels' slab tests see a tight frustum
    # instead of scattered origins (directional-light lanes already
    # share one direction and stay unreversed). Film-identical up to a
    # TMIN-sliver at the segment ends. A/B: docs/perf_budget.md §11.
    reverse_point_shadows: bool = True
    # Russian-roulette aggressiveness: survival = min(maxcomp(tp)/rr_scale, 1)
    # at bounces >= rr_start_bounce; earlier bounces keep the reference
    # rule (raygen.rgen:88-97; rr_scale=1.0 ≙ reference everywhere).
    # >1 truncates the low-contribution incoherent tail harder (VERDICT
    # round-2 lever (a)): unbiased (1/p compensation), costs variance —
    # scale-everywhere measured a throughput win but a time-to-converged
    # LOSS, hence the start-bounce gate (docs/perf_budget.md §11).
    rr_scale: float = 1.0
    rr_start_bounce: int = 0
    # Nearest-mip material sampling on incoherent TAIL bounces (bounce
    # >= 1): rounds the LOD to one mip and skips the second bilinear —
    # half the texture gathers on the bounces where the <=half-level LOD
    # blend error is film-invisible (MSE-gated A/B: docs/perf_budget.md
    # §14: -9.8% full-step on the 2.1 GiB courtyard at same-RNG film
    # MSE 3.1e-5). Primary-bounce samples keep full trilinear; set False
    # for reference-exact textureGrad filtering everywhere.
    tex_nearest_tail: bool = True
    # Material-sorted shading (perf_budget §14 lever 4): permute lanes to
    # material-major order around _shade_hit inside the stage jit, so
    # consecutive lanes gather from the same textures. Film-bit-exact
    # (pure permutation). Default off pending the on-chip A/B
    # (benches/shade_sorted_ab.py) — §2's sort experience prices lane
    # permutes above the locality they buy.
    shade_sorted: bool = False

    @classmethod
    def reference_exact(cls, **overrides) -> "PathTracingSettings":
        """Settings with every default-on divergence from the reference's
        math disabled in one call (PARITY.md "Known default-on
        divergences"): reference-rule point-light shadow segments and
        full trilinear textureGrad filtering at every bounce. Pair with
        `build_scene_textures(..., reference_exact=True)` for the f32
        unpaired texture pool — together these reproduce the round-3
        reference-exact pixel pipeline."""
        overrides.setdefault("reverse_point_shadows", False)
        overrides.setdefault("tex_nearest_tail", False)
        return cls(**overrides)


class AlphaSplit(NamedTuple):
    """Opaque/alpha scene partition for any-hit emulation (≙ the RT
    hardware's opaque-flag fast path: geometry flagged opaque traverses
    without any-hit invocations, AccelerationStructure.cpp geometry
    flags + anyhit.rahit). Alpha-tested triangles are typically a small
    fraction of a scene (courtyard: ~11%), so the re-trace rounds that
    emulate any-hit shaders walk a tree ~10x smaller than the scene
    tree, and shadow queries use the early-out occlusion kernel on the
    opaque tree instead of full closest-hit traversals."""
    bvh_opaque: Optional[object]  # accel over the opaque subset (None→brute)
    tri_opaque: jax.Array         # (K0, 3) rows into wpos
    sel_opaque: jax.Array         # (K0,) global triangle ids
    bvh_alpha: Optional[object]   # accel over the non-opaque subset
    tri_alpha: jax.Array          # (K1, 3)
    sel_alpha: jax.Array          # (K1,)


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
    alpha_split: Optional[AlphaSplit] = None  # opaque/alpha partition


class BounceCarry(NamedTuple):
    """Per-lane path state threaded across bounces (≙ Payload +
    raygen locals, ShaderRendererTypes.incl / raygen.rgen:41-97; the
    differential-ray state mirrors RayDifferentials0..2)."""
    state: jax.Array          # (N,) uint32 RNG
    origin: jax.Array         # (N, 3)
    direction: jax.Array      # (N, 3)
    throughput: jax.Array     # (N, 3)
    radiance: jax.Array       # (N, 3)
    alive: jax.Array          # (N,) bool
    max_roughness: jax.Array  # (N,)
    rays: jax.Array           # () i32 useful-ray counter
    diff: DiffRays            # texture-LOD differential rays


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
        bvh = build_packet_bvh(wpos, ds.tri_idx, tri_opaque=ds.tri_opaque)
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


def _aabb_exit_t(lo, hi, origin, direction):
    """Distance at which each ray exits the [lo, hi] box (0 if it never
    enters in front of the origin)."""
    inv = 1.0 / jnp.where(jnp.abs(direction) < 1e-12,
                          jnp.where(direction < 0, -1e-12, 1e-12), direction)
    t0 = (lo - origin) * inv
    t1 = (hi - origin) * inv
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return jnp.maximum(t_far, 0.0)


def _finite_or_zero(radiance):
    finite = jnp.all(jnp.isfinite(radiance), axis=-1, keepdims=True)
    return jnp.where(finite, radiance, 0.0)


def _skybox_emissive(ds: DeviceScene, directions):
    """Miss 'shader' (≙ miss.rmiss:16-39). Skybox kind is static; equirect
    applies the reference's hdrToLdr soft clamp (miss.rmiss:27,
    common.glsl:17-20)."""
    if ds.skybox_kind == int(SkyboxKind.EQUIRECT):
        img = ds.skybox_image                      # (H, W, 3)
        longitude = jnp.arctan2(directions[:, 2], directions[:, 0])
        latitude = jnp.arcsin(jnp.clip(-directions[:, 1], -1.0, 1.0))
        u = longitude / (2.0 * jnp.pi) + 0.5
        v = latitude / jnp.pi + 0.5
        rgb = _bilinear_wrap(img, u, v)
        # hdrToLdr: c / (1 + max component)
        return rgb / (1.0 + jnp.max(rgb, axis=-1, keepdims=True))
    if ds.skybox_kind == int(SkyboxKind.CUBE):
        return _sample_cubemap(ds.skybox_image, directions)
    return jnp.broadcast_to(ds.skybox_color, directions.shape)


def _bilinear_wrap(img, u, v):
    """Bilinear sample of an (H, W, 3) image; u wraps, v clamps."""
    h, w = img.shape[0], img.shape[1]
    x = u * w - 0.5
    y = jnp.clip(v * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def fetch(xi, yi):
        xi = jnp.mod(xi.astype(jnp.int32), w)
        yi = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        return img[yi, xi]

    top = fetch(x0, y0) * (1 - fx) + fetch(x0 + 1, y0) * fx
    bot = fetch(x0, y0 + 1) * (1 - fx) + fetch(x0 + 1, y0 + 1) * fx
    return top * (1 - fy) + bot * fy


def _sample_cubemap(faces, directions):
    """Cubemap lookup (faces (6, H, W, 3) in +X,-X,+Y,-Y,+Z,-Z order,
    the Vulkan layer order the reference's cube skybox uses)."""
    d = directions
    ax, ay, az = (jnp.abs(d[:, 0]), jnp.abs(d[:, 1]), jnp.abs(d[:, 2]))
    major_x = (ax >= ay) & (ax >= az)
    major_y = (ay > ax) & (ay >= az)
    face = jnp.where(major_x, jnp.where(d[:, 0] > 0, 0, 1),
                     jnp.where(major_y, jnp.where(d[:, 1] > 0, 2, 3),
                               jnp.where(d[:, 2] > 0, 4, 5)))
    ma = jnp.where(major_x, ax, jnp.where(major_y, ay, az))
    ma = jnp.maximum(ma, 1e-12)
    # standard cubemap face (s,t) conventions
    sc = jnp.where(major_x, jnp.where(d[:, 0] > 0, -d[:, 2], d[:, 2]),
                   jnp.where(major_y, d[:, 0],
                             jnp.where(d[:, 2] > 0, d[:, 0], -d[:, 0])))
    tc = jnp.where(major_y, jnp.where(d[:, 1] > 0, d[:, 2], -d[:, 2]),
                   -d[:, 1])
    u = (sc / ma + 1.0) * 0.5
    v = (tc / ma + 1.0) * 0.5
    h, w = faces.shape[1], faces.shape[2]
    xi = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    return faces[face, yi, xi]


ALPHA_ROUNDS = 4   # max transparent surfaces skipped per ray segment


def _root_bounds(bvh):
    """Scene root AABB of any packet-kernel structure (None for the
    XLA/brute backends). Wide structures mask their 1e30 empty slots."""
    if isinstance(bvh, PacketBVH):
        return bvh.top_lo[0], bvh.top_hi[0]
    if isinstance(bvh, BF8BVH):
        if bvh.root_lo is not None:       # recorded at build time
            return bvh.root_lo, bvh.root_hi
        lo, hi = bvh.c_lo, bvh.c_hi
    elif hasattr(bvh, "root_bounds"):
        # archived structures (pt.accel.pallas_bvh_archive, e.g. BF8V6)
        # carry their own protocol methods
        return bvh.root_bounds()
    else:
        return None
    valid = lo[:, 0] < 1e29
    root_lo = jnp.min(jnp.where(valid[:, None], lo, jnp.inf), axis=0)
    root_hi = jnp.max(jnp.where(valid[:, None], hi, -jnp.inf), axis=0)
    return root_lo, root_hi


def _degenerate_masked(bvh, origins, dirs, tmax, live):
    """Point dead lanes at a ray that exits the scene instantly: origin
    outside the root AABB, +x direction, tmax=TMIN. Packet kernels then
    terminate those lanes at the root test, so the 1024-ray cone unions
    shrink to the LIVE rays' footprint — the alpha re-trace rounds
    (any-hit emulation) cost proportional to the few pending lanes
    instead of 4x the whole wavefront (VERDICT round-2 task 5)."""
    bounds = _root_bounds(bvh)
    if bounds is None:
        return origins, dirs, tmax
    outside = bounds[1] + 1.0e6
    live_c = live[:, None]
    o = jnp.where(live_c, origins, outside)
    d = jnp.where(live_c, dirs, jnp.asarray([1.0, 0.0, 0.0]))
    t = jnp.where(live, tmax, TMIN)
    return o, d, t


def _surface_color_alpha_tri(ds: DeviceScene, tex: DeviceTextures, accel,
                             tri, u, v):
    """Color-texture RGBA at a (global-tri, u, v) surface point (≙ the
    any-hit shaders' color fetch: texture(colorTex, uv) * colorFactor,
    anyhit.rahit:44-50)."""
    from pt.render.textures import sample_texture_grad
    from pt.scene.flatten import F_COLOR, T_COLOR
    tri = jnp.maximum(tri, 0)
    bary0 = (1.0 - u - v)[:, None]
    ru = accel.tri_uv[tri]
    uv = (ru[:, 0:2] * bary0 + ru[:, 2:4] * u[:, None]
          + ru[:, 4:6] * v[:, None])
    row = ds.tri_mat[tri]
    texel = sample_texture_grad(tex, ds.mat_tex[row, T_COLOR], uv)
    return texel * ds.mat_params[row, F_COLOR:F_COLOR + 4]


def _surface_color_alpha(ds: DeviceScene, tex: DeviceTextures, accel, hit):
    return _surface_color_alpha_tri(ds, tex, accel, hit.tri, hit.u, hit.v)


def _remap_subset_tri(sel, tri):
    """Subset-local hit triangle ids → global ids (misses stay -1)."""
    return jnp.where(tri >= 0, sel[jnp.maximum(tri, 0)], -1)


def make_alpha_split_brute(ds: DeviceScene) -> Optional[AlphaSplit]:
    """AlphaSplit over the brute backend (subset accels = None): the exact
    split-loop semantics with no Pallas dependency. Used by CPU tests and
    viable for small scenes on any backend; the production path builds
    SAH/BF8 subset trees instead (pt/run/renderer.py)."""
    import numpy as np
    opq = np.asarray(ds.tri_opaque)
    if not (opq.any() and (~opq).any()):
        return None
    tri = np.asarray(ds.tri_idx)
    sel_o = np.nonzero(opq)[0].astype(np.int32)
    sel_a = np.nonzero(~opq)[0].astype(np.int32)
    return AlphaSplit(None, jnp.asarray(tri[sel_o]), jnp.asarray(sel_o),
                      None, jnp.asarray(tri[sel_a]), jnp.asarray(sel_a))


def _trace_closest_alpha_split(ds: DeviceScene, tex: DeviceTextures, accel,
                               sp: AlphaSplit, origins, dirs, alive):
    """Split-tree any-hit emulation (≙ the RT hardware fast path where
    opaque geometry never invokes anyhit.rahit):

    1. ONE closest-hit trace of the opaque tree gives a definitive
       per-ray bound t_opq — no opaque surface needs re-tracing, ever.
    2. ALPHA_ROUNDS closest-hit traces of the (small) alpha tree resolve
       the α<0.5 skip chain strictly in front of that bound; the first
       α≥0.5 candidate nearer than t_opq wins, else the opaque hit does.

    vs the single-tree loop (below): the up-to-3 re-trace rounds walk a
    tree ~10x smaller, and rays whose nearest surfaces are opaque never
    pay a second full-tree traversal. Rays still pending after
    ALPHA_ROUNDS transparent layers resolve to the opaque bound hit
    (the single-tree loop kept the last transparent surface instead;
    the reference's hardware loop is unbounded, so neither is exact —
    this one errs toward geometry that actually blocks)."""
    n = origins.shape[0]
    o_t, d_t, t_t = _degenerate_masked(sp.bvh_opaque, origins, dirs,
                                       TMAX, alive)
    hit_o = trace_closest(sp.bvh_opaque, accel.wpos, sp.tri_opaque,
                          o_t, d_t, t_t)
    bound = hit_o.t
    final_t = hit_o.t
    final_tri = _remap_subset_tri(sp.sel_opaque, hit_o.tri)
    final_u, final_v = hit_o.u, hit_o.v

    pending = alive
    cur_origin = origins
    t_accum = jnp.zeros((n,), jnp.float32)
    decal_color = jnp.zeros((n, 3), jnp.float32)
    decal_alpha = jnp.zeros((n,), jnp.float32)
    has_decal = jnp.zeros((n,), bool)

    for _ in range(ALPHA_ROUNDS):
        rem = jnp.maximum(bound - t_accum, 0.0)
        o_t, d_t, t_t = _degenerate_masked(sp.bvh_alpha, cur_origin, dirs,
                                           rem, pending)
        hit_a = trace_closest(sp.bvh_alpha, accel.wpos, sp.tri_alpha,
                              o_t, d_t, t_t)
        tri_g = _remap_subset_tri(sp.sel_alpha, hit_a.tri)
        valid = pending & hit_a.is_hit & (t_accum + hit_a.t < bound)
        rgba = _surface_color_alpha_tri(ds, tex, accel, tri_g,
                                        hit_a.u, hit_a.v)
        alpha = rgba[:, 3]
        accepts = valid & (alpha >= 0.5)
        skips = valid & (alpha < 0.5)

        record = skips & ~has_decal
        decal_color = jnp.where(record[:, None], rgba[:, :3], decal_color)
        decal_alpha = jnp.where(record, alpha, decal_alpha)
        has_decal = has_decal | record

        final_t = jnp.where(accepts, t_accum + hit_a.t, final_t)
        final_tri = jnp.where(accepts, tri_g, final_tri)
        final_u = jnp.where(accepts, hit_a.u, final_u)
        final_v = jnp.where(accepts, hit_a.v, final_v)

        step = hit_a.t + 1e-4
        cur_origin = jnp.where(skips[:, None],
                               cur_origin + dirs * step[:, None], cur_origin)
        t_accum = jnp.where(skips, t_accum + step, t_accum)
        pending = skips
    final = type(hit_o)(final_t, final_tri, final_u, final_v)
    return final, decal_color, decal_alpha, has_decal


def trace_closest_alpha(ds: DeviceScene, tex: DeviceTextures, accel,
                        origins, dirs, alive):
    """Closest hit honoring alpha-tested geometry: non-opaque hits with
    α < 0.5 are recorded as decals and skipped (≙ anyhit.rahit:52-64);
    α ≥ 0.5 accepts. Returns (hit with cumulative t, decal_color (N,3),
    decal_alpha (N,), has_decal (N,)).

    Static-shape re-trace loop: up to ALPHA_ROUNDS segments; masked lanes
    idle. Opaque-only scenes never call this (ds.has_alpha is static).
    When the accel carries an opaque/alpha partition, the much cheaper
    split-tree scheme above is used instead."""
    if accel.alpha_split is not None:
        return _trace_closest_alpha_split(ds, tex, accel, accel.alpha_split,
                                          origins, dirs, alive)
    n = origins.shape[0]
    pending = alive
    cur_origin = origins
    t_accum = jnp.zeros((n,), jnp.float32)
    final = None
    decal_color = jnp.zeros((n, 3), jnp.float32)
    decal_alpha = jnp.zeros((n,), jnp.float32)
    has_decal = jnp.zeros((n,), bool)

    for _ in range(ALPHA_ROUNDS):
        # degenerate non-pending lanes so the packet kernels only pay for
        # rays still resolving alpha (round 0: the dead-lane mask)
        o_t, d_t, t_t = _degenerate_masked(accel.bvh, cur_origin, dirs,
                                           TMAX, pending)
        hit = trace_closest(accel.bvh, accel.wpos, ds.tri_idx, o_t, d_t,
                            t_t)
        opaque = ds.tri_opaque[jnp.maximum(hit.tri, 0)]
        rgba = _surface_color_alpha(ds, tex, accel, hit)
        alpha = rgba[:, 3]
        is_alpha_skip = (pending & hit.is_hit & ~opaque & (alpha < 0.5))

        # record the first (closest) decal per ray (anyhit keeps min dist)
        record = is_alpha_skip & ~has_decal
        decal_color = jnp.where(record[:, None], rgba[:, :3], decal_color)
        decal_alpha = jnp.where(record, alpha, decal_alpha)
        has_decal = has_decal | record

        adjusted = type(hit)(t_accum + hit.t, hit.tri, hit.u, hit.v)
        if final is None:
            final = adjusted
        else:
            upd = pending
            final = type(hit)(
                jnp.where(upd, adjusted.t, final.t),
                jnp.where(upd, adjusted.tri, final.tri),
                jnp.where(upd, adjusted.u, final.u),
                jnp.where(upd, adjusted.v, final.v))

        step = hit.t + 1e-4
        cur_origin = jnp.where(is_alpha_skip[:, None],
                               cur_origin + dirs * step[:, None], cur_origin)
        t_accum = jnp.where(is_alpha_skip, t_accum + step, t_accum)
        pending = is_alpha_skip
    return final, decal_color, decal_alpha, has_decal


def _trace_occluded_alpha_split(ds: DeviceScene, tex: DeviceTextures, accel,
                                sp: AlphaSplit, origins, dirs, dist, alive,
                                reverse=None):
    """Split-tree shadow query (see trace_occluded_alpha docstring).
    `reverse` marks lanes whose opaque-tree query runs light→surface
    (segment-symmetric; see PathTracingSettings.reverse_point_shadows).
    The alpha rounds below need closest-hit ordering from the surface,
    so they always run unreversed."""
    n = origins.shape[0]
    live = jnp.ones((n,), bool) if alive is None else alive
    dist_b = jnp.broadcast_to(jnp.asarray(dist, jnp.float32), (n,))
    o_o, d_o, t_o = origins, dirs, dist_b
    if reverse is not None:
        rev = live & reverse
        o_o = jnp.where(rev[:, None], origins + dirs * dist_b[:, None],
                        origins)
        d_o = jnp.where(rev[:, None], -dirs, dirs)
        t_o = jnp.where(rev, dist_b - TMIN, dist_b)
    o_t, d_t, t_t = _degenerate_masked(sp.bvh_opaque, o_o, d_o, t_o, live)
    occluded = live & trace_occluded(sp.bvh_opaque, accel.wpos,
                                     sp.tri_opaque, o_t, d_t, t_t)

    pending = live & ~occluded
    cur_origin = origins
    remaining = dist_b
    for _ in range(ALPHA_ROUNDS):
        o_t, d_t, t_t = _degenerate_masked(sp.bvh_alpha, cur_origin, dirs,
                                           remaining, pending)
        hit = trace_closest(sp.bvh_alpha, accel.wpos, sp.tri_alpha,
                            o_t, d_t, t_t)
        tri_g = _remap_subset_tri(sp.sel_alpha, hit.tri)
        rgba = _surface_color_alpha_tri(ds, tex, accel, tri_g, hit.u, hit.v)
        translucent = hit.is_hit & (rgba[:, 3] < 1.0)
        occluded = occluded | (pending & hit.is_hit & ~translucent)
        cont = pending & translucent
        step = hit.t + 1e-4
        cur_origin = jnp.where(cont[:, None],
                               cur_origin + dirs * step[:, None], cur_origin)
        remaining = jnp.where(cont, remaining - step, remaining)
        pending = cont
    return occluded


def trace_occluded_alpha(ds: DeviceScene, tex: DeviceTextures, accel,
                         origins, dirs, dist, alive=None, reverse=None):
    """Shadow query honoring alpha: any surface with α < 1 passes light
    (≙ occlusionAnyhit.rahit:51-53). `alive` masks lanes that need no
    shadow query at all (their packets degenerate).

    A two-pass prefilter via the page-id alpha bit (opaque-only occlusion
    pass + any-hit pass, leaving only alpha-blocked rays for the loop) was
    measured 6% SLOWER end-to-end on the courtyard — occlusion traversal
    costs nearly as much as closest-hit on enclosed scenes, so the loop's
    round-0 closest (which serves double duty) wins. The infrastructure
    (ALPHA_TRI_BIT pages, `packet_occluded_bf8(opaque_only=True)`) stays
    for A/B and for open scenes where occlusion early-outs dominate.

    When the accel carries an opaque/alpha partition the query splits
    differently (and strictly cheaper) than that prefilter: blocked =
    any-opaque-within-dist (ONE early-out occlusion trace of the opaque
    tree — no closest-hit ordering needed, since any blocker anywhere in
    the segment shadows) OR any alpha surface with α≥1 within dist
    (closest-hit rounds over the ~10x smaller alpha tree). The
    single-tree loop instead pays up to ALPHA_ROUNDS full-tree
    *closest-hit* traces, the most expensive query the kernels have."""
    if accel.alpha_split is not None:
        return _trace_occluded_alpha_split(ds, tex, accel,
                                           accel.alpha_split, origins,
                                           dirs, dist, alive, reverse)
    n = origins.shape[0]
    pending = jnp.ones((n,), bool) if alive is None else alive
    occluded = jnp.zeros((n,), bool)
    cur_origin = origins
    remaining = jnp.broadcast_to(jnp.asarray(dist, jnp.float32), (n,))

    for _ in range(ALPHA_ROUNDS):
        o_t, d_t, t_t = _degenerate_masked(accel.bvh, cur_origin, dirs,
                                           remaining, pending)
        hit = trace_closest(accel.bvh, accel.wpos, ds.tri_idx,
                            o_t, d_t, t_t)
        opaque = ds.tri_opaque[jnp.maximum(hit.tri, 0)]
        rgba = _surface_color_alpha(ds, tex, accel, hit)
        translucent = hit.is_hit & ~opaque & (rgba[:, 3] < 1.0)
        occluded = occluded | (pending & hit.is_hit & ~translucent)
        cont = pending & translucent
        step = hit.t + 1e-4
        cur_origin = jnp.where(cont[:, None],
                               cur_origin + dirs * step[:, None], cur_origin)
        remaining = jnp.where(cont, remaining - step, remaining)
        pending = cont
    return occluded


def trace_closest(bvh, world_pos, tri_idx, origins, dirs, tmax=TMAX):
    """Closest-hit query (backend dispatch point; the pytree type of bvh
    statically selects the compiled variant). bvh None → brute."""
    if bvh is None:
        return intersect_brute(world_pos, tri_idx, origins, dirs, TMIN, tmax)
    if isinstance(bvh, BF8BVH):
        # wide (BF8) variant of v4, used for static scenes where the
        # host-side collapse is available: 49/102 ms on 65k
        # sorted/unsorted incoherent rays vs v4's 51/125
        return packet_closest_bf8(bvh, origins, dirs, tmax, TMIN)
    if isinstance(bvh, PacketBVH):
        # phase-split full-vreg kernel (v4): unconditional slab tests +
        # packed reduces issued before any scalar consumption, scalar-only
        # branches, prefetched leaf DMAs — 51 ms on 65k sorted incoherent
        # rays vs 72 (v3) / 83 (v2) / 105 (v1)
        return packet_closest_v4(bvh, origins, dirs, tmax, TMIN)
    if hasattr(bvh, "closest"):
        # archived generations (pt.accel.pallas_bvh_archive, e.g. BF8V6)
        # carry their own dispatch methods — selectable for A/B work
        return bvh.closest(origins, dirs, tmax, TMIN)
    return bvh_closest(bvh, world_pos, tri_idx, origins, dirs, TMIN, tmax)


def trace_occluded(bvh, world_pos, tri_idx, origins, dirs, dist):
    """Shadow query (≙ checkOccluded, raygen.rgen:22-33)."""
    if bvh is None:
        hit = intersect_brute(world_pos, tri_idx, origins, dirs, TMIN, dist)
        return hit.is_hit
    if isinstance(bvh, BF8BVH):
        return packet_occluded_bf8(bvh, origins, dirs, dist, TMIN)
    if isinstance(bvh, PacketBVH):
        # phase-split occlusion kernel (v4): 57 ms vs 93 ms (monolithic)
        # on 65k shadow rays
        return packet_occluded_v4(bvh, origins, dirs, dist, TMIN)
    if hasattr(bvh, "occluded"):
        return bvh.occluded(origins, dirs, dist, TMIN)
    return bvh_occluded(bvh, world_pos, tri_idx, origins, dirs, dist, TMIN)


def init_rng_state(px, py, width: int, frame) -> jax.Array:
    return prng.init_rng(px, py, width, frame)


def raygen(px, py, width: int, height: int, inv_view, inv_proj, state,
           settings: PathTracingSettings):
    """Sample-start stage: jitter + (optional) lens draws, primary rays +
    one-pixel-offset differential rays (ray.glsl overloads).
    Returns (state, origin, direction, DiffRays)."""
    state, u1, u2 = prng.rand2(state)
    if settings.lens_radius > 0:
        state, lu1, lu2 = prng.rand2(state)
        ray, rx, ry = construct_primary_rays(
            px, py, width, height, inv_view, inv_proj, u1, u2,
            lu1, lu2, settings.lens_radius, settings.focal_distance)
    else:
        ray, rx, ry = construct_primary_rays(
            px, py, width, height, inv_view, inv_proj, u1, u2)
    diff = DiffRays(rx.origin, rx.direction, ry.origin, ry.direction)
    return state, ray.origin, ray.direction, diff


def start_carry(state, origin, direction, diff: DiffRays) -> BounceCarry:
    n = origin.shape[0]
    return BounceCarry(
        state=state, origin=origin, direction=direction,
        throughput=jnp.ones((n, 3), jnp.float32),
        radiance=jnp.zeros((n, 3), jnp.float32),
        alive=jnp.ones((n,), bool),
        max_roughness=jnp.zeros((n,), jnp.float32),
        rays=jnp.zeros((), jnp.int32),
        diff=diff)


def _shade_hit(ds: DeviceScene, tex: DeviceTextures, accel: Accel, hit,
               ray_o, ray_d, state, alive, max_roughness, decal=None,
               diff: Optional[DiffRays] = None, nearest_mip: bool = False):
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

    # ray differentials → UV footprints for textureGrad-style LOD
    # (≙ closestHit.rchit:87-101 + tracing.glsl)
    if diff is not None:
        uv0, uv1, uv2 = ru[:, 0:2], ru[:, 2:4], ru[:, 4:6]
        dpdu, dpdv, dndu, dndv = compute_dpn_duv(
            p0, p1, p2, uv0, uv1, uv2, n0, n1, n2, tangent, bitangent)
        dpdx, dpdy = compute_dp_dxy(position, diff, normal)
        duv_x, duv_y = compute_uv_derivatives(dpdx, dpdy, dpdu, dpdv)
    else:
        duv_x = duv_y = None
        dndu = dndv = None

    mat = sample_material(ds, tex, ds.tri_mat[tri], uv, is_inside,
                          duv_x, duv_y, nearest_mip=nearest_mip)

    if decal is not None:
        # decal tint from skipped alpha surfaces (≙ closestHit.rchit:104-106:
        # material.Color = mix(Color, decalColor, decalAlpha))
        d_color, d_alpha, d_has = decal
        blended = mat.color * (1.0 - d_alpha[:, None]) + d_color * d_alpha[:, None]
        mat = dataclasses.replace(
            mat, color=jnp.where(d_has[:, None], blended, mat.color))

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

    # differential propagation for the continuation ray
    # (≙ closestHit.rchit:155-161: reflected/refracted per-lane select)
    next_dir_world = _normalize(to_world(bs.direction))
    if diff is not None:
        view = -_normalize(ray_d)
        refl = reflect_differentials(diff, duv_x, duv_y, normal, ray_origin,
                                     view, next_dir_world, dndu, dndv)
        refr = refract_differentials(diff, duv_x, duv_y, normal, ray_origin,
                                     view, next_dir_world, dndu, dndv,
                                     mat.eta)
        sel = is_refracted[:, None]
        pick = lambda a, b: jnp.where(sel, a, b)
        new_diff = DiffRays(pick(refr.rx_origin, refl.rx_origin),
                            pick(refr.rx_dir, refl.rx_dir),
                            pick(refr.ry_origin, refl.ry_origin),
                            pick(refr.ry_dir, refl.ry_dir))
        # keep previous differentials on missed/dead lanes
        keep = active[:, None]
        new_diff = DiffRays(*(jnp.where(keep, a, b)
                              for a, b in zip(new_diff, diff)))
    else:
        new_diff = None

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
        next_dir=next_dir_world,
        diff=new_diff,
        light_dir=light.direction,
        light_dist=light.distance,
        light_pdf=light.pdf,
        light_is_dir=light.is_directional,
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
                settings: PathTracingSettings,
                sort_rays: bool = True, rr_div=None,
                tail: bool = False) -> BounceCarry:
    """One wavefront bounce: closest trace → shade → NEE → RR
    (≙ one iteration of raygen.rgen:62-97). `sort_rays` statically disables
    the coherence sort (used for the already-coherent primary bounce).
    `rr_div` optionally overrides the RR truncation divisor as a TRACED
    scalar (the host passes rr_scale for bounces >= rr_start_bounce and
    1.0 before — one compiled variant serves every bounce).
    `tail` (static) marks an incoherent tail bounce (bounce >= 1 on the
    host-staged paths); with settings.tex_nearest_tail it selects
    nearest-mip material sampling there. The fori_loop oracle path never
    sets it, staying reference-exact trilinear at every bounce."""
    (state, origin, direction, throughput, radiance, alive,
     max_roughness, rays, diff) = carry
    rays = rays + jnp.sum(alive.astype(jnp.int32))
    sort = sort_rays and settings.sort_rays
    decal = None
    if ds.has_alpha:
        # alpha-tested geometry: the re-trace loops implement any-hit
        # semantics; coherence sorting is skipped on this path for now
        hit, d_color, d_alpha, d_has = trace_closest_alpha(
            ds, tex, accel, origin, direction, alive)
        decal = (d_color, d_alpha, d_has)
        sort_packets = False
    elif isinstance(accel.bvh, PacketBVH):
        sort_packets = sort
    else:
        sort_packets = False
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
    elif not ds.has_alpha:
        # degenerate dead lanes (terminated between compaction replans):
        # they never vote in the packet slab tests, so subs full of dead
        # lanes finish in fewer lockstep rounds. Dead lanes' hits are
        # never read (everything below is gated on `alive`) — this is
        # film-bit-exact.
        o_c, d_c, t_c = _degenerate_masked(
            accel.bvh, origin, direction,
            jnp.full(origin.shape[:1], TMAX, jnp.float32), alive)
        hit = trace_closest(accel.bvh, accel.wpos, ds.tri_idx, o_c,
                            d_c, t_c)
    missed = alive & ~hit.is_hit

    # miss: add skybox emissive, terminate (raygen.rgen:73-77)
    sky = _skybox_emissive(ds, direction)
    radiance = radiance + jnp.where(missed[..., None], throughput * sky, 0.0)

    if settings.shade_sorted:
        # material-sorted shade (perf_budget §14 lever 4): permute lanes
        # to material-major order INSIDE the stage jit (no §4 layout
        # boundary), shade, inverse-permute the payload — consecutive
        # lanes then gather from the same texture set. Film-bit-exact:
        # pure permutation, per-lane RNG states travel with their lanes.
        mat_key = jnp.where(alive & hit.is_hit,
                            ds.tri_mat[jnp.maximum(hit.tri, 0)],
                            jnp.int32(0x7FFFFFF))
        sperm = jnp.argsort(mat_key)
        n = origin.shape[0]
        sinv = jnp.zeros((n,), jnp.int32).at[sperm].set(
            jnp.arange(n, dtype=jnp.int32))
        take = lambda a: jax.tree_util.tree_map(  # noqa: E731
            lambda x: x[sperm], a)
        hit_p = type(hit)(hit.t[sperm], hit.tri[sperm], hit.u[sperm],
                          hit.v[sperm])
        decal_p = None if decal is None else tuple(d[sperm] for d in decal)
        payload = _shade_hit(ds, tex, accel, hit_p, origin[sperm],
                             direction[sperm], state[sperm], alive[sperm],
                             max_roughness[sperm], decal_p, take(diff),
                             nearest_mip=(tail
                                          and settings.tex_nearest_tail))
        payload = {k: jax.tree_util.tree_map(lambda x: x[sinv], v)
                   for k, v in payload.items()}
    else:
        payload = _shade_hit(ds, tex, accel, hit, origin, direction,
                             state, alive, max_roughness, decal, diff,
                             nearest_mip=(tail
                                          and settings.tex_nearest_tail))
    state = payload["state"]
    max_roughness = payload["max_roughness"]
    active = alive & hit.is_hit

    # emissive (raygen.rgen:79)
    radiance = radiance + jnp.where(active[..., None],
                                    throughput * payload["emissive"], 0.0)

    # NEE (raygen.rgen:81-83). Shadow distances are clamped to the scene
    # AABB exit: no occluder exists outside the scene, and the directional
    # light's 1e5 sentinel distance otherwise forces unoccluded rays to
    # walk every overlapping BVH leaf (occlusion cannot t-prune).
    shadow_dir = -_normalize(payload["light_dir"])
    # shadow rays whose NEE contribution is identically zero (light pdf 0,
    # or a backfacing/zero-BSDF light sample → direct_light == 0) cannot
    # affect the film regardless of occlusion — skip tracing them.
    # ≙ the reference simply traces (raygen.rgen:81-83); skipping is
    # film-bit-exact and consumes no RNG.
    shadow_live = (active & (payload["light_pdf"] > 0.0)
                   & jnp.any(payload["direct_light"] != 0.0, axis=-1))
    bounds = _root_bounds(accel.bvh)
    if bounds is not None:
        # round-1 bug: this clamp only fired for PacketBVH, but production
        # scenes use the BF8 structures — directional-light shadow rays
        # then walked every overlapping leaf with a 1e5 sentinel distance
        light_dist = jnp.minimum(
            payload["light_dist"],
            _aabb_exit_t(bounds[0], bounds[1],
                         payload["next_origin"], shadow_dir) + 1e-3)
    else:
        light_dist = payload["light_dist"]
    reverse = (~payload["light_is_dir"] if settings.reverse_point_shadows
               else None)
    if ds.has_alpha:
        occluded = trace_occluded_alpha(ds, tex, accel,
                                        payload["next_origin"], shadow_dir,
                                        light_dist, shadow_live,
                                        reverse=reverse)
    elif sort_packets:
        so_s = jnp.where(shadow_live[perm][:, None],
                         payload["next_origin"][perm], outside)
        sd_s = jnp.where(shadow_live[perm][:, None], shadow_dir[perm],
                         jnp.asarray([1.0, 0.0, 0.0]))
        sdist_s = jnp.where(shadow_live[perm], light_dist[perm], TMIN)
        occ_s = trace_occluded(accel.bvh, accel.wpos, ds.tri_idx,
                               so_s, sd_s, sdist_s)
        occluded = occ_s[inv]
    else:
        so_f, sd_f, st_f = payload["next_origin"], shadow_dir, light_dist
        if reverse is not None:
            # point-light lanes trace light→surface: reversed cones
            # share one origin per light (a tight frustum for the slab
            # tests) instead of scattered hit-point origins. The pivot is
            # the (AABB-clamped) segment end; the -TMIN limit excludes
            # the shading surface the forward trace excluded via tmin.
            rev = shadow_live & reverse
            so_f = jnp.where(rev[:, None],
                             so_f + shadow_dir * light_dist[:, None], so_f)
            sd_f = jnp.where(rev[:, None], -shadow_dir, sd_f)
            st_f = jnp.where(rev, light_dist - TMIN, st_f)
        # degenerate skipped shadow lanes (same trick as the closest
        # trace above): they never vote in the slab tests
        so, sd, sdist = _degenerate_masked(
            accel.bvh, so_f, sd_f, st_f, shadow_live)
        occluded = trace_occluded(accel.bvh, accel.wpos, ds.tri_idx,
                                  so, sd, sdist)
    rays = rays + jnp.sum(shadow_live.astype(jnp.int32))
    nee_ok = shadow_live & ~occluded
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
    # lanes that reach it (masked state advance). rr_scale > 1 truncates
    # the tail harder than the reference rule (see PathTracingSettings).
    prob = jnp.max(throughput, axis=-1)
    if rr_div is not None:
        prob = prob * (1.0 / jnp.asarray(rr_div, jnp.float32))
    elif settings.rr_scale != 1.0:
        prob = prob * (1.0 / settings.rr_scale)
    prob = jnp.minimum(prob, 1.0)
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
                       throughput, radiance, survived, max_roughness, rays,
                       payload["diff"])


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
        state, origin, direction, diff = raygen(px, py, width, height,
                                                inv_view, inv_proj, state,
                                                settings)
        carry = start_carry(state, origin, direction, diff)
        carry = carry._replace(rays=ray_count)

        carry = jax.lax.fori_loop(
            0, settings.bounce_count,
            lambda i, c: bounce_once(
                ds, tex, accel, c, settings,
                rr_div=jnp.where(i >= settings.rr_start_bounce,
                                 settings.rr_scale, 1.0)), carry)

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
