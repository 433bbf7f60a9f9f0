"""Frame orchestrator: the production (host-driven wavefront) render path.

Counterpart of the reference's `Renderer` (L3, Renderer/Renderer.{h,cpp}):
owns the device scene + textures + acceleration structure + accumulation
film, exposes UpdateSceneData/OnUpdate/Render/SetSettings-style entry
points, tracks TotalSamples for progressive accumulation with
clear-on-change (ResetAccumulationImage, Renderer.cpp:801-808), and runs
the adaptive samples-per-frame controller.

Execution strategy: each wavefront stage (accel build, raygen, bounce,
finish) is a separately cached jit; the host drives sample/bounce loops and
early-exits when all lanes die. This sidesteps the XLA compile-time blowup
of nesting traversal while-loops inside fori_loops on large scenes (see
pt.render.integrator module docstring) and mirrors the reference's
pipeline-cache design: stages compile once per settings 'variant'
(≙ pipeline LRU cache keyed on spec constants, Pipeline.h:303-372).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pt.core.compilewatch import stage_call as _guard
from pt.core.stats import Stats, Timer
from pt.post.pipeline import PostProcessSettings, postprocess
from pt.render.integrator import (Accel, BounceCarry, PathTracingSettings,
                                  bounce_once, init_rng_state,
                                  prepare_accel, raygen, start_carry)
from pt.render.textures import DeviceTextures, default_texture_pool
from pt.scene.builder import Scene
from pt.scene.flatten import DeviceScene, flatten_scene, update_seg_transforms
from pt.run.adaptive import AdaptiveSampleController
from pt.render.differentials import DiffRays


@functools.partial(jax.jit, static_argnames=("settings",))
def _prepare_jit(ds: DeviceScene, settings: PathTracingSettings) -> Accel:
    return prepare_accel(ds, settings)


@functools.partial(jax.jit, static_argnames=("settings",))
def _prepare_attribs_jit(ds: DeviceScene, settings: PathTracingSettings):
    """World vertices + packed per-triangle attributes, no BVH (the BVH is
    supplied by the native SAH builder for static scenes).

    backend="brute" here means prepare_accel builds NO acceleration
    structure at all (brute ⇒ Accel.bvh is None — see resolve_backend /
    prepare_accel); nothing is built and discarded. The packed tri_* rows
    it does compute are the per-hit shading attribute tables (one fat row
    gather per hit, see Accel docstring) — load-bearing on every path,
    not a brute-intersection table (intersect_brute reads wpos+tri_idx)."""
    import dataclasses as _dc
    accel = prepare_accel(ds, _dc.replace(settings, backend="brute"))
    return accel


@functools.partial(jax.jit, static_argnames=("width", "height", "settings"))
def _raygen_jit(px, py, width, height, inv_view, inv_proj, state, settings):
    state, o, d, diff = raygen(px, py, width, height, inv_view, inv_proj,
                               state, settings)
    return start_carry(state, o, d, diff)


@functools.partial(jax.jit, static_argnames=("settings", "tail"))
def _bounce_jit(ds, tex, accel, carry, settings, tail=True,
                rr_div=1.0):
    # every caller passes tail == (bounce > 0): it both enables the
    # coherence sort (tails only) and marks the bounce for the
    # nearest-mip texture path (settings.tex_nearest_tail)
    carry = bounce_once(ds, tex, accel, carry, settings, sort_rays=tail,
                        rr_div=rr_div, tail=tail)
    return carry, jnp.sum(carry.alive.astype(jnp.int32))


@jax.jit
def _accumulate_jit(carry: BounceCarry, accum, rays_total, film_perm):
    """Fold one finished sample into the film (additive, like the
    accumulation imageStore raygen.rgen:115-117). `film_perm` maps lane →
    film pixel (lanes are tile-swizzled for packet coherence)."""
    flat = accum.reshape(-1, 3)
    from pt.render.integrator import _finite_or_zero
    flat = flat.at[film_perm].add(_finite_or_zero(carry.radiance))
    return flat.reshape(accum.shape), rays_total + carry.rays


@functools.partial(jax.jit, static_argnames=("g",))
def _split_all_jit(carry: BounceCarry, g: int) -> BounceCarry:
    """De-interleave a g-sample spp-major group (lane layout pixel*g+rep)
    into rep-major (g, n, ...) stacks with ONE transpose per array —
    per-rep strided slices (a[rep::g]) lower as pathological sub-128
    gathers on TPU (docs/perf_budget.md §4); a dense transpose is one
    relayout pass, and the per-rep reads become contiguous static
    slices. The scalar ray counter is zeroed — the grouped bounce-0
    count is booked once by the caller."""
    def de(a):
        if not a.ndim:
            return jnp.zeros((g,), jnp.int32)
        stacked = a.reshape(-1, g, *a.shape[1:])
        return jnp.swapaxes(stacked, 0, 1)
    return jax.tree_util.tree_map(de, carry)


@jax.jit
def _take_rep_jit(stacked: BounceCarry, rep) -> BounceCarry:
    """Contiguous per-rep slice of a de-interleaved carry stack."""
    return jax.tree_util.tree_map(
        lambda a: jax.lax.dynamic_index_in_dim(a, rep, 0, keepdims=False),
        stacked)


_LUM = np.array([0.2126, 0.7152, 0.0722], np.float32)


@jax.jit
def _accumulate_adaptive_jit(carry: BounceCarry, accum, accum_sq, rays_total,
                             perm_sub, weight):
    """Adaptive-film accumulate: scatter ONE sample per lane into the film
    plus its luminance second moment (drives the per-pixel stderr stopping
    rule in render_adaptive). Lanes added to pad the active set up to a
    power-of-two size class carry weight 0 so padding never touches the
    film."""
    from pt.render.integrator import _finite_or_zero
    rad = _finite_or_zero(carry.radiance) * weight[:, None]
    flat = accum.reshape(-1, 3).at[perm_sub].add(rad)
    lum = rad @ jnp.asarray(_LUM)
    sq = accum_sq.at[perm_sub].add(lum * lum)
    return flat.reshape(accum.shape), sq, rays_total + carry.rays


def _largest_remainder_alloc(deficit: np.ndarray,
                             budget: int) -> np.ndarray:
    """Proportional integer allocation: sum(alloc) == budget,
    alloc <= deficit elementwise (largest-remainder rounding).
    Requires 0 < budget <= deficit.sum()."""
    total = int(deficit.sum())
    alloc = (deficit * budget) // total
    rem = budget - int(alloc.sum())
    while rem > 0:
        frac = deficit * budget - alloc * total
        frac[alloc >= deficit] = -1
        bump = np.argsort(-frac, kind="stable")[:rem]
        bump = bump[frac[bump] >= 0]
        if len(bump) == 0:
            break
        alloc[bump] += 1
        rem -= len(bump)
    return alloc


def _rep_major_stream(alloc: np.ndarray, base_counts: np.ndarray):
    """(pixel, frame) dispatch stream, repetition-major: every pixel's
    rep-0 sample first (film order), then rep-1, ... — a chunk of the
    stream therefore covers mostly-distinct pixels in film order, and a
    pixel's duplicates carry consecutive frame counters."""
    parts_p, parts_f = [], []
    for rep in range(int(alloc.max())):
        sel = np.flatnonzero(alloc > rep)
        parts_p.append(sel)
        parts_f.append(base_counts[sel] + rep)
    return np.concatenate(parts_p), np.concatenate(parts_f)


def _tile_order(width: int, height: int, tile: int = 32) -> np.ndarray:
    """Pixel visit order grouping 32x32 tiles: each 1024-ray packet then
    covers a compact square tile instead of a thin full-width scanline
    strip, shrinking the BVH footprint each packet traverses."""
    ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    lin = (ys * width + xs)
    ty, iy = np.divmod(ys, tile)
    tx, ix = np.divmod(xs, tile)
    tiles_x = (width + tile - 1) // tile
    key = ((ty * tiles_x + tx) * tile + iy) * tile + ix
    return lin.reshape(-1)[np.argsort(key.reshape(-1), kind="stable")]


@functools.partial(jax.jit, static_argnames=("width",))
def _init_state_jit(px, py, width, frame):
    return init_rng_state(px, py, width, frame)


@functools.partial(jax.jit, static_argnames=("k",))
def _compact_jit(carry: BounceCarry, k: int):
    """Gather the live lanes of `carry` into a k-lane sub-batch (k static,
    a power of two ≥ the live count). The classic wavefront compaction —
    dead lanes stop costing trace/shade work — adapted to static shapes by
    jumping between a few compiled size classes. Results are bit-identical
    to the uncompacted loop: dead lanes neither consume RNG nor contribute.

    Returns (sub_carry, perm) where perm maps sub-lane → original lane."""
    n = carry.alive.shape[0]
    # stable partition: live lanes first (order preserved)
    order = jnp.argsort(jnp.where(carry.alive, 0, 1).astype(jnp.int32),
                        stable=True)
    perm = order[:k]
    take = lambda a: a[perm] if a.ndim else a
    sub = jax.tree_util.tree_map(take, carry)
    return sub, perm


@jax.jit
def _scatter_jit(full: BounceCarry, sub: BounceCarry, perm):
    """Write a compacted sub-batch back into the full carry."""
    put = lambda f, s: f.at[perm].set(s) if f.ndim else s
    return jax.tree_util.tree_map(put, full, sub)


def _size_class(n_alive: int, minimum: int = 1024) -> int:
    return max(minimum, 1 << max(0, (n_alive - 1).bit_length()))


# spp-major group cap: largest merged wavefront dispatched as one unit
# (~1M lanes ≈ 110 MB of carry state + stage temporaries; a 512² film
# merges 4 spp exactly, 1080p stays per-sample)
_MAX_GROUP_LANES = 1 << 20


def _carry_pspec(axis):
    from jax.sharding import PartitionSpec as P
    lane = P(axis)
    return BounceCarry(
        state=lane, origin=lane, direction=lane, throughput=lane,
        radiance=lane, alive=lane, max_roughness=lane, rays=P(),
        diff=DiffRays(lane, lane, lane, lane))


class _ShardedStages:
    """shard_map-wrapped wavefront stages for multi-chip film-row data
    parallelism (the TPU-native scale-out: pixels are independent, the
    scene is replicated read-only, the only collective is the ray-count
    psum — film rows gather only at save time; SURVEY §2.7/§5)."""

    def __init__(self, mesh, width, height, settings):
        from jax.sharding import PartitionSpec as P
        axis = mesh.axis_names[0]
        cspec = _carry_pspec(axis)
        lane = P(axis)
        self.mesh = mesh

        @functools.partial(jax.shard_map, mesh=mesh,
                           in_specs=(lane, lane, P(), P(), P()),
                           out_specs=cspec, check_vma=False)
        def raygen_stage(px, py, inv_view, inv_proj, frame):
            state = init_rng_state(px, py, width, frame)
            state, o, d, diff = raygen(px, py, width, height,
                                       inv_view, inv_proj, state, settings)
            return start_carry(state, o, d, diff)

        def bounce_stage_of(sort_rays: bool):
            # two variants mirroring _bounce_jit's static sort_rays arg:
            # the primary bounce is already film-tile coherent, so the
            # coherence sort must be skipped there (the single-device
            # path measured sorting bounce 0 as a pure loss)
            @functools.partial(jax.shard_map, mesh=mesh,
                               in_specs=(P(), P(), P(), cspec, P()),
                               out_specs=(cspec, P(), P()), check_vma=False)
            def bounce_stage(ds, tex, accel, carry, rr_div):
                out = bounce_once(ds, tex, accel, carry, settings,
                                  sort_rays, rr_div=rr_div,
                                  tail=sort_rays)
                # carry.rays stays zero in sharded mode; report this
                # bounce's global ray count separately (one psum per
                # bounce). The per-shard MAX live count sizes the next
                # step's compaction classes (shards compact to the same
                # static k).
                rays_delta = jax.lax.psum(out.rays - carry.rays, axis)
                out = out._replace(rays=carry.rays)
                return out, jax.lax.pmax(
                    jnp.sum(out.alive.astype(jnp.int32)), axis), rays_delta
            return bounce_stage

        @functools.partial(jax.shard_map, mesh=mesh,
                           in_specs=(lane, lane, P(), P(), lane),
                           out_specs=cspec, check_vma=False)
        def raygen_adaptive_stage(px, py, inv_view, inv_proj, frames):
            # per-lane frame counters: each pixel continues its own
            # render(1)-compatible stream regardless of which shard/lane
            # it lands on this dispatch
            state = init_rng_state(px, py, width, frames)
            state, o, d, diff = raygen(px, py, width, height,
                                       inv_view, inv_proj, state, settings)
            return start_carry(state, o, d, diff)

        @functools.partial(jax.shard_map, mesh=mesh,
                           in_specs=(cspec, lane, lane, lane, lane),
                           out_specs=(lane, lane), check_vma=False)
        def accumulate_adaptive_stage(carry, accum_flat, sq_flat,
                                      film_perm, weight):
            from pt.render.integrator import _finite_or_zero
            rad = _finite_or_zero(carry.radiance) * weight[:, None]
            acc = accum_flat.at[film_perm].add(rad)
            lum = rad @ jnp.asarray(_LUM)
            return acc, sq_flat.at[film_perm].add(lum * lum)

        @functools.partial(jax.shard_map, mesh=mesh,
                           in_specs=(cspec, lane, lane),
                           out_specs=lane, check_vma=False)
        def accumulate_stage(carry, accum_flat, film_perm):
            # lanes are tile-swizzled within each shard's row band for
            # packet coherence; film_perm maps lane -> local film pixel
            from pt.render.integrator import _finite_or_zero
            return accum_flat.at[film_perm].add(
                _finite_or_zero(carry.radiance))

        def compact_stage_of(k: int):
            @functools.partial(jax.shard_map, mesh=mesh,
                               in_specs=(cspec,),
                               out_specs=(_carry_pspec(axis), lane),
                               check_vma=False)
            def compact_stage(carry):
                return _compact_jit(carry, k)
            return jax.jit(compact_stage)

        @functools.partial(jax.shard_map, mesh=mesh,
                           in_specs=(cspec, _carry_pspec(axis), lane),
                           out_specs=cspec, check_vma=False)
        def scatter_stage(full, sub, perm):
            return _scatter_jit(full, sub, perm)

        self.raygen = jax.jit(raygen_stage)
        self.raygen_adaptive = jax.jit(raygen_adaptive_stage)
        self.bounce = jax.jit(bounce_stage_of(True))
        self.bounce0 = jax.jit(bounce_stage_of(False))
        self.accumulate = jax.jit(accumulate_stage)
        self.accumulate_adaptive = jax.jit(accumulate_adaptive_stage)
        self.scatter = jax.jit(scatter_stage)
        self._compact_cache = {}
        self.compact = lambda k: self._compact_cache.setdefault(
            k, compact_stage_of(k))


class Renderer:
    """Progressive wavefront renderer for one scene (≙ static Renderer)."""

    def __init__(self,
                 settings: Optional[PathTracingSettings] = None,
                 post: Optional[PostProcessSettings] = None,
                 min_refresh_rate: float = 60.0,
                 max_samples_per_frame: int = 64,
                 mesh=None,
                 instancing: str = "auto"):
        """`mesh`: optional jax.sharding.Mesh for multi-chip film-row data
        parallelism (pt.dist.film_mesh()); None = single device.

        `instancing`: shared-BLAS accel policy for static opaque scenes
        (≙ the reference's one-BLAS-per-Model TLAS reuse,
        AccelerationStructure.cpp:260-301). "auto" switches to
        pt/accel/instanced.py when geometry reuse is heavy enough that
        the flatten build/memory cost dominates (see _want_instanced);
        "shared" forces it where feasible; "flatten" disables it."""
        self.mesh = mesh
        self.instancing = instancing
        self._stages = None          # lazily built _ShardedStages
        self.settings = settings or PathTracingSettings()
        self.post = post or PostProcessSettings()
        self.width = 0
        self.height = 0
        self.ds: Optional[DeviceScene] = None
        self.tex: Optional[DeviceTextures] = None
        self.accel: Optional[Accel] = None
        self.scene: Optional[Scene] = None
        self.accum = None                 # (H, W, 3) f32 device film
        self.total_samples = 0
        # ray counter: per-sample () i32 device chunks + a folded host
        # int. A single chained i32 would overflow past ~2.1e9 traced rays
        # (a 1 Mpixel film at 1024 spp exceeds that); per-sample chunks
        # stay far below the limit and fold lazily without ever syncing
        # on in-flight work.
        self._rays_chunks: list = []
        self._rays_host: int = 0
        import threading as _threading
        self._rays_lock = _threading.Lock()
        self.adaptive = AdaptiveSampleController(min_refresh_rate,
                                                 max_samples_per_frame)
        # active camera in scene.cameras (≙ the Settings-tab camera radio
        # list, UserInterface.cpp:1230-1243)
        self.camera_index = 0
        self._px = self._py = None
        self._order_np = None
        # adaptive-film state (render_adaptive): per-pixel sample counts
        # (film order, host) + luminance second moments (film order, device)
        self._spp_map = None
        self._accum_sq = None
        self._accel_dirty = True
        # compaction plans keyed by dispatch lane count: the spp-major
        # grouped dispatch (render), the adaptive film (full-film lanes)
        # and the sharded path (per-shard lanes) each observe and apply
        # size classes for their own wavefront width
        self._plans: dict = {}
        self._plan_ages: dict = {}
        # spp-major group arrays keyed by group size g (see _group_arrays)
        self._group_cache: dict = {}

    # -- scene management (≙ Renderer::UpdateSceneData, Renderer.cpp:238) --
    def set_scene(self, scene: Scene,
                  tex: Optional[DeviceTextures] = None,
                  stream_textures: bool = True) -> None:
        """Upload a new scene. When it has textures and `stream_textures`
        is set, rendering starts immediately with the placeholder defaults
        while a loader thread decodes the real textures; they swap in when
        ready and accumulation restarts (≙ the TextureUploader streaming
        pipeline with placeholder-then-swap texture table,
        TextureUploader.cpp:272-383, Renderer.cpp:127-173)."""
        import threading
        self.scene = scene
        with Timer("Mesh Upload"):
            self.ds = flatten_scene(scene)
        # generation tag: a loader thread from a PREVIOUS scene that
        # finishes after this switch must not swap its (stale) pool in
        self._tex_gen = getattr(self, "_tex_gen", 0) + 1
        self._pending_tex = None
        if tex is not None:
            self.tex = tex
        elif scene.textures:
            from pt.scene.textures import build_scene_textures
            if stream_textures:
                self.tex = default_texture_pool()
                gen = self._tex_gen

                def load() -> None:
                    pool = build_scene_textures(scene)
                    self._pending_tex = (gen, pool)

                self._tex_thread = threading.Thread(target=load, daemon=True)
                self._tex_thread.start()
            else:
                with Timer("Texture Upload"):
                    self.tex = build_scene_textures(scene)
        else:
            self.tex = default_texture_pool()
        self._accel_dirty = True
        self.reset_accumulation()

    def _poll_textures(self) -> None:
        """Swap in streamed textures once the loader thread finishes
        (≙ Renderer::UpdateTexture acquire + descriptor update,
        Renderer.cpp:441-470)."""
        pending = getattr(self, "_pending_tex", None)
        if pending is not None:
            gen, pool = pending
            self._pending_tex = None
            if gen == getattr(self, "_tex_gen", 0):
                self.tex = pool
                self.reset_accumulation()
            # else: a stale loader from a replaced scene — drop its pool

    def wait_for_textures(self) -> None:
        t = getattr(self, "_tex_thread", None)
        if t is not None and t.is_alive():
            t.join()
        self._poll_textures()

    def update_scene_data(self, scene_changed: bool = False) -> None:
        """Per-frame: refresh animated transforms + rebuild accel; reset
        accumulation when anything moved."""
        if self.scene is None:
            raise RuntimeError("no scene set")
        if scene_changed:
            self.ds = update_seg_transforms(self.ds, self.scene)
            self._accel_dirty = True
            self.reset_accumulation()

    def on_resize(self, width: int, height: int) -> None:
        if (self.width, self.height) == (width, height):
            return
        self.width, self.height = width, height
        self._group_cache = {}
        ys, xs = np.meshgrid(np.arange(height, dtype=np.uint32),
                             np.arange(width, dtype=np.uint32), indexing="ij")
        order = _tile_order(width, height)
        self._order_np = order
        self._px = jnp.asarray(xs.reshape(-1)[order])
        self._py = jnp.asarray(ys.reshape(-1)[order])
        self._film_perm = jnp.asarray(order.astype(np.int32))
        if self.mesh is not None:
            # film rows shard in bands; lanes tile-swizzle WITHIN each
            # band so every packet still covers a compact square tile
            # (scanline strips cost ~20% traversal coherence, measured in
            # benches/sharded_tpu.py round 2)
            from jax.sharding import NamedSharding, PartitionSpec as P
            n_dev = self.mesh.devices.size
            if height % n_dev:
                raise ValueError(
                    f"film height {height} not divisible by mesh {n_dev}")
            band_h = height // n_dev
            band_order = _tile_order(width, band_h)
            full_order = np.concatenate(
                [band_order + b * band_h * width for b in range(n_dev)])
            self._order_np = full_order
            sh = NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
            self._px = jax.device_put(
                jnp.asarray(xs.reshape(-1)[full_order]), sh)
            self._py = jax.device_put(
                jnp.asarray(ys.reshape(-1)[full_order]), sh)
            # per-shard LOCAL pixel index for the scatter-add (band-local)
            local_perm = np.concatenate([band_order for _ in range(n_dev)])
            self._film_perm_sharded = jax.device_put(
                jnp.asarray(local_perm.astype(np.int32)), sh)
            self._stages = None
        self.reset_accumulation()

    def set_settings(self, settings: Optional[PathTracingSettings] = None,
                     post: Optional[PostProcessSettings] = None) -> None:
        """≙ Renderer::SetSettings (Renderer.cpp:825-852); path-tracing
        setting changes reset accumulation."""
        if settings is not None and settings != self.settings:
            if settings.backend != self.settings.backend or \
               settings.bvh_leaf_size != self.settings.bvh_leaf_size:
                self._accel_dirty = True
            self.settings = settings
            # sharded stages close over the settings — rebuild lazily
            self._stages = None
            self.reset_accumulation()
        if post is not None:
            self.post = post

    def reset_accumulation(self) -> None:
        """≙ ResetAccumulationImage (Renderer.cpp:801-808)."""
        if self.width and self.height:
            self.accum = jnp.zeros((self.height, self.width, 3), jnp.float32)
        self.total_samples = 0
        with self._rays_lock:
            self._rays_chunks = []
            self._rays_host = 0
        self._plans = {}
        self._plan_ages = {}
        self._spp_map = None
        self._accum_sq = None

    # -- adaptive controller (≙ Renderer::OnUpdate) ------------------------
    def on_update(self, dt: float) -> None:
        spf = self.adaptive.on_update(dt)
        if spf != self.settings.sample_count:
            # sample_count is a host-loop bound, not a jit static — no
            # recompilation, unlike bounce settings
            self.settings = dataclasses.replace(self.settings,
                                                sample_count=spf)
        Stats.add_stat("Samples Per Frame", spf)

    # -- rendering --------------------------------------------------------
    # static-scene accel LRU shared across Renderer instances: SAH build +
    # BF8 collapse are host-side and expensive; switching between scenes
    # (UI scene list, A/B scripts) must not rebuild (≙ the reference's
    # LRU-cached pipeline variants, Core/Cache.h + Pipeline.h:303-372)
    _accel_cache = None

    @staticmethod
    def _want_instanced(mode: str, dup_ratio: float, n_tris: int,
                        has_alpha: bool) -> bool:
        """Shared-BLAS selection policy. The instanced kernels trace
        1.03-1.14x the flat kernels on incoherent closest hits
        (benches/instancing_ab.py, docs/perf_budget.md §8.5), so "auto"
        only switches when the flatten path's duplication cost
        dominates: heavy reuse (>=4x) AND enough flattened triangles
        that the duplicated host SAH build + Woop pages are
        multi-second / tens-of-MiB (the A/B's 64-instance point: build
        5.6 s -> 0.8 s, bytes 0.015x). Alpha scenes instance too since
        round 5 (the AlphaSplit subset trees are themselves instanced —
        build_instanced_split ≙ the reference composing TLAS instancing
        with any-hit geometry, AccelerationStructure.cpp:260-301 +
        anyhit.rahit:52-64)."""
        if mode == "flatten":
            return False
        if mode == "shared":
            return True
        return dup_ratio >= 4.0 and n_tris >= 200_000

    #: negative-cache sentinel: a scene key whose instanced build proved
    #: infeasible skips straight to flatten on every later rebuild
    #: (ADVICE r4: re-attempting costs up to 4 multi-second block
    #: attempts per accel rebuild)
    _INFEASIBLE = "instanced-infeasible"

    def _build_instanced(self, key, tri_np, opq_np, build_static, base):
        """Shared-BLAS Accel for the current scene, or None → flatten.

        Opaque scenes: one BF8Instanced with global-id remap. Alpha
        scenes (round 5, VERDICT r4 task 2): build_instanced_split
        returns the full tree (root bounds + debug force-opaque) plus
        instanced opaque/alpha subset trees wired into the integrator's
        AlphaSplit scheme; a subset whose instanced build is infeasible
        falls back to a FLAT subset tree (hybrid — the duplicated bytes
        of a small subset are acceptable). Results, including the
        infeasible verdict, are LRU-cached under the scene key."""
        ikey = (key, "instanced")
        hit = Renderer._accel_cache.get(ikey)
        if hit is None:
            from pt.scene.flatten import shared_mesh_layout
            layout = shared_mesh_layout(self.scene)
            hit = Renderer._INFEASIBLE
            if layout is not None:
                meshes, seg_mesh, seg_base, _dup = layout
                st = np.asarray(self.ds.seg_transform, np.float64)
                if bool(self.ds.has_alpha):
                    from pt.accel.instanced import build_instanced_split
                    out = build_instanced_split(meshes, seg_mesh, st,
                                                seg_base)
                    if out is not None:
                        full, (tree_o, sel_o), (tree_a, sel_a) = out
                        if len(sel_o) == 0 or len(sel_a) == 0:
                            # wholly-alpha (or wholly-opaque) content:
                            # no split to build — the single-tree alpha
                            # loop walks the full instanced tree
                            hit = (full, None)
                        else:
                            if tree_o is None:
                                tree_o = build_static(tri_np[sel_o],
                                                      opq_np[sel_o])
                            if tree_a is None:
                                tree_a = build_static(tri_np[sel_a],
                                                      opq_np[sel_a])
                            # a failed subset build is only acceptable
                            # where the brute fallback stays cheap (the
                            # flatten path's rule)
                            ok = ((tree_o is not None
                                   or len(sel_o) <= 4096)
                                  and (tree_a is not None
                                       or len(sel_a) <= 4096))
                            if ok:
                                from pt.render.integrator import \
                                    AlphaSplit
                                split = AlphaSplit(
                                    tree_o, jnp.asarray(tri_np[sel_o]),
                                    jnp.asarray(sel_o),
                                    tree_a, jnp.asarray(tri_np[sel_a]),
                                    jnp.asarray(sel_a))
                                hit = (full, split)
                else:
                    from pt.accel.instanced import build_instanced_bf8
                    inst = build_instanced_bf8(meshes, seg_mesh, st,
                                               seg_tri_base=seg_base)
                    if inst is not None:
                        hit = (inst, None)
            Renderer._accel_cache.put(ikey, hit)
        if hit == Renderer._INFEASIBLE:
            return None
        bvh, split = hit
        return base._replace(bvh=bvh, alpha_split=split)

    def _ensure_accel(self) -> None:
        if not (self._accel_dirty or self.accel is None):
            return
        with Timer("Acceleration Structure Build"):
            use_sah = (self.settings.backend == "pallas"
                       and jax.default_backend() == "tpu"
                       and self.scene is not None
                       and not self.scene.has_animated_instances
                       and not self.scene.has_skinned_geometry)
            if use_sah:
                # static scene → native binned-SAH build (higher quality;
                # ≙ PREFER_FAST_TRACE); animated scenes rebuild the
                # device-side Morton tree per frame (≙ ALLOW_UPDATE).
                # Preferred static structure: a fine-leaf (block 32) tree
                # collapsed to branching-factor 8 (cheaper leaf tests,
                # 1/3 the rounds); falls back to the binary v4 tree when
                # the collapse would not fit SMEM.
                from pt.accel.pallas_bvh import (build_bf8,
                                                 build_packet_bvh_sah)
                from pt.core.cache import LRUCache, fnv1a
                base = _prepare_attribs_jit(self.ds, self._jit_settings())
                wpos_np = np.asarray(base.wpos)
                tri_np = np.asarray(self.ds.tri_idx)
                if Renderer._accel_cache is None:
                    Renderer._accel_cache = LRUCache(4)

                def geo_key(a):
                    # fnv1a over a strided sample (full-array python-loop
                    # hashing is seconds at Sponza scale) + exact global
                    # reductions so any vertex perturbation changes the key
                    step = max(1, len(a) // 1024)
                    return (a.shape, fnv1a(np.ascontiguousarray(
                                a[::step]).tobytes()),
                            float(a.astype(np.float64).sum()),
                            float(a.min()), float(a.max()))

                opq_np = np.asarray(self.ds.tri_opaque)
                # content hash, not just the opaque COUNT: two material
                # variants of the same mesh can swap which triangles are
                # alpha-tested without changing the sum, and a stale hit
                # would reuse the wrong opaque/alpha split trees
                key = (geo_key(wpos_np), geo_key(tri_np),
                       fnv1a(np.packbits(opq_np.astype(bool)).tobytes()),
                       opq_np.shape)

                def build_static(rows, opq_rows):
                    # spatial splits (SBVH): measured -14.5% closest-hit
                    # time on the courtyard (enclosed, thin columns/cards),
                    # neutral on the heightfield (benches/sbvh_ab.py)
                    fine = build_packet_bvh_sah(wpos_np, rows, block=32,
                                                max_leaves=8192,
                                                tri_opaque_np=opq_rows,
                                                spatial=True)
                    b = build_bf8(fine) if fine is not None else None
                    if b is None:
                        b = build_packet_bvh_sah(wpos_np, rows,
                                                 tri_opaque_np=opq_rows,
                                                 spatial=True)
                    return b

                # shared-BLAS (TLAS-semantics) arm: dedupe Woop pages
                # across segments that share a mesh; hits come back
                # remapped to global ids so shading is untouched. The
                # policy gates on COUNTS first (ADVICE r4: the full
                # layout copies every unique geometry's buffers — don't
                # pay that on scenes the policy rejects).
                if self.instancing != "flatten":
                    from pt.scene.flatten import shared_dup_ratio
                    dup_info = shared_dup_ratio(self.scene)
                    if dup_info is not None and self._want_instanced(
                            self.instancing, dup_info[0],
                            int(tri_np.shape[0]),
                            bool(self.ds.has_alpha)):
                        inst_accel = self._build_instanced(
                            key, tri_np, opq_np, build_static, base)
                        if inst_accel is not None:
                            self.accel = inst_accel
                            self._accel_dirty = False
                            return
                        # infeasible (capacity/singular) → flatten below

                cached = Renderer._accel_cache.get(key)
                if cached is None:
                    bvh = build_static(tri_np, opq_np)
                    # opaque/alpha partition for the any-hit emulation
                    # loops: the re-trace rounds then walk a tree over
                    # only the non-opaque subset (docs/perf_budget.md)
                    split = None
                    if bvh is not None and opq_np.any() and (~opq_np).any():
                        sel_o = np.nonzero(opq_np)[0].astype(np.int32)
                        sel_a = np.nonzero(~opq_np)[0].astype(np.int32)
                        bvh_o = build_static(tri_np[sel_o], opq_np[sel_o])
                        bvh_a = build_static(tri_np[sel_a], opq_np[sel_a])
                        # a failed subset build is only acceptable where
                        # the brute fallback stays cheap
                        ok = ((bvh_o is not None or len(sel_o) <= 4096)
                              and (bvh_a is not None or len(sel_a) <= 4096))
                        if ok:
                            from pt.render.integrator import AlphaSplit
                            split = AlphaSplit(
                                bvh_o, jnp.asarray(tri_np[sel_o]),
                                jnp.asarray(sel_o),
                                bvh_a, jnp.asarray(tri_np[sel_a]),
                                jnp.asarray(sel_a))
                    if bvh is not None:
                        Renderer._accel_cache.put(key, (bvh, split))
                    cached = (bvh, split)
                bvh, split = cached
                if bvh is not None:
                    self.accel = base._replace(bvh=bvh, alpha_split=split)
                else:
                    self.accel = _prepare_jit(self.ds, self._jit_settings())
            else:
                self.accel = _prepare_jit(self.ds, self._jit_settings())
                # the brute oracle follows the same split semantics as the
                # production path (the split resolves deep alpha stacks the
                # way the reference's TerminateOnFirstHit hardware loop
                # does), so pallas-vs-brute MSE measures traversal alone
                static = (self.scene is not None
                          and not self.scene.has_animated_instances
                          and not self.scene.has_skinned_geometry)
                if (self.settings.backend == "brute" and static
                        and bool(self.ds.has_alpha)):
                    from pt.render.integrator import make_alpha_split_brute
                    split = make_alpha_split_brute(self.ds)
                    if split is not None:
                        self.accel = self.accel._replace(alpha_split=split)
        self._accel_dirty = False

    def render(self, samples: Optional[int] = None) -> int:
        """One progressive accumulation step: trace `samples` (default
        settings.sample_count) full paths per pixel, add to the film.
        Returns the new total sample count (≙ Renderer::Render,
        Renderer.cpp:1659-1809, without the swapchain parts)."""
        if self.ds is None or not self.width:
            raise RuntimeError("scene or film not initialized")
        if self._spp_map is not None:
            # uniform stepping cannot continue a per-pixel-count film
            self.reset_accumulation()
        self._fold_rays()
        self._poll_textures()
        self._ensure_accel()
        inv_view, inv_proj = self._camera_mats()

        samples = samples if samples is not None else self.settings.sample_count
        with Timer("Render"):
            if self.mesh is not None:
                self._render_sharded(samples, inv_view, inv_proj)
            else:
                # spp-major grouping: merge up to G samples into ONE
                # wavefront whose lanes interleave (pixel, rep) — each
                # 1024-ray packet then covers a G× smaller pixel
                # footprint, shrinking the per-cone BVH leaf-visit union
                # that dominates incoherent bounces (docs/perf_budget.md
                # §2: denser cones are the one re-partitioning that
                # helps). Each lane seeds its own (pixel, frame) RNG
                # stream, so films match repeated render(1) semantics.
                # group sizes are quantized to powers of two so the
                # compiled dispatch-shape set stays bounded (≤ log2(cap)
                # shapes per film size): the adaptive samples-per-frame
                # controller retunes sample_count continuously, and each
                # retune must map onto an already-compiled class instead
                # of minting a new one (test_spf_retune_does_not_recompile)
                n_full = self.width * self.height
                cap = (_MAX_GROUP_LANES // n_full
                       if n_full <= _MAX_GROUP_LANES else 1)
                jset = self._jit_settings()
                done = 0
                while done < samples:
                    g = min(cap, samples - done)
                    g = 1 << (g.bit_length() - 1)       # pow2 floor
                    # only the FIRST group of a render() may observe/age
                    # the compaction plan — otherwise a multi-group (or
                    # g==1 multi-sample) step ages the plan once per
                    # dispatch and re-observes (a full uncompacted
                    # dispatch + ~30 ms sync) 16/samples× too often
                    self._render_group(g, done, inv_view, inv_proj, jset,
                                       observe_ok=(done == 0))
                    done += g
        self.total_samples += samples
        Stats.add_stat("Total Samples", self.total_samples)
        return self.total_samples

    def _group_arrays(self, g: int):
        """Lane arrays for a g-sample spp-major group: lane = (tile-order
        pixel index) * g + rep, so each pixel's g samples sit adjacent
        (rep-ordered film reduce in _accumulate_group_jit) and every
        packet covers a g× smaller pixel footprint."""
        cached = self._group_cache.get(g)
        if cached is None:
            px = np.asarray(self._px)
            py = np.asarray(self._py)
            rep = np.tile(np.arange(g, dtype=np.uint32), px.size)
            cached = (jnp.asarray(np.repeat(px, g)),
                      jnp.asarray(np.repeat(py, g)),
                      jnp.asarray(rep))
            self._group_cache[g] = cached
        return cached

    def _render_group(self, g: int, rep0: int, inv_view, inv_proj,
                      jset, observe_ok: bool = True) -> None:
        """Trace one g-sample spp-major group (reps rep0..rep0+g-1) and
        fold it into the film.

        Hybrid dispatch (measured, benches/rr_ttc.py): the COHERENT part
        (primary trace + shade + NEE of bounce 0) runs as ONE g-merged
        wavefront — g near-identical rays per pixel share each packet, so
        the coherent stage runs ~1.8x faster than g separate dispatches —
        then the carry SPLITS back into per-sample wavefronts for the
        incoherent bounces, where g-merged cones measured 66% slower
        (denser origins do not shrink hemisphere-spread unions; see
        docs/perf_budget.md §11). Each lane seeds its own
        (pixel, total_samples + rep) RNG stream == repeated render(1)."""
        n_full = self.width * self.height
        if g == 1:
            px, py = self._px, self._py
            frames = jnp.uint32(self.total_samples + rep0)
        else:
            px, py, rep = self._group_arrays(g)
            frames = jnp.uint32(self.total_samples + rep0) + rep
        state = _init_state_jit(px, py, self.width, frames)
        carry = _guard(_raygen_jit, px, py, self.width, self.height,
                       inv_view, inv_proj, state, jset, what="raygen jit")
        # bounce 0 (never compacted: all lanes are live)
        carry, _ = _guard(_bounce_jit, self.ds, self.tex, self.accel, carry,
                          jset, False, self._rr_div(0), what="bounce jit")
        if g == 1:
            full = self._trace_tail(carry, jset, n_full,
                                    observe_ok=observe_ok)
            self.accum, rt = _accumulate_jit(full, self.accum,
                                             jnp.zeros((), jnp.int32),
                                             self._film_perm)
            self._rays_chunks.append(rt)
            return
        self._rays_chunks.append(carry.rays)     # grouped bounce-0 rays
        stacked = _split_all_jit(carry, g)       # rays zeroed in the subs
        for r in range(g):
            sub = _take_rep_jit(stacked, r)
            full = self._trace_tail(sub, jset, n_full,
                                    observe_ok=(observe_ok and r == 0))
            self.accum, rt = _accumulate_jit(full, self.accum,
                                             jnp.zeros((), jnp.int32),
                                             self._film_perm)
            self._rays_chunks.append(rt)

    def _trace_tail(self, carry: BounceCarry, jset, n_lanes: int,
                    observe_ok: bool = True) -> BounceCarry:
        """Bounces 1..B-1 with wavefront compaction over an n_lanes-wide
        carry. Compaction plans (size classes per bounce) come from
        previously observed live counts, keyed by dispatch width: any
        host readback mid-pipeline costs a ~30 ms sync on this platform,
        so live counts are fetched ONCE per observation and drive later
        dispatches' classes with 1.35x headroom (live counts only drift
        by RNG noise between renders; film/settings changes reset the
        plans entirely). During re-observation the (stale) plan is NOT
        applied — compaction by an undersized class would truncate live
        paths AND clamp the very counts meant to correct it.

        Plan keys carry the indexing convention: "tail" plans are
        length-(B-1), plan[j] = class for bounce j+1 (bounce 0 is traced
        before this method); "full" plans (adaptive/sharded writers) are
        bounce-0-based. Without the tag a "full" plan for the same lane
        count would be applied one bounce too deep here, compacting by an
        undersized class and truncating live paths."""
        key = ("tail", n_lanes)
        plan = self._plans.get(key)
        observe = observe_ok and (plan is None
                                  or self._plan_ages.get(key, 0) >= 16)
        full = carry
        perm = None
        cur_n = n_lanes
        alive_obs = [] if observe else None
        for bounce in range(1, self.settings.bounce_count):
            carry, alive_count = _guard(_bounce_jit, self.ds, self.tex,
                                        self.accel, carry, jset, True,
                                        self._rr_div(bounce),
                                        what="bounce jit")
            if alive_obs is not None:
                alive_obs.append(alive_count)
            k = (plan[bounce - 1] if plan and bounce - 1 < len(plan)
                 and not observe else None)
            if (k is not None and k <= cur_n // 2
                    and bounce < self.settings.bounce_count - 1):
                if perm is not None:
                    full = _scatter_jit(full, carry, perm)
                else:
                    full = carry
                carry, perm = _compact_jit(full, k)
                cur_n = k
        if perm is not None:
            full = _scatter_jit(full, carry, perm)
        else:
            full = carry
        if alive_obs:
            counts = np.asarray(jnp.stack(alive_obs))   # one batched sync
            self._plans[key] = [
                _size_class(int(1.35 * c)) if c > 0 else 1024
                for c in counts]
            self._plan_ages[key] = 0
        elif observe_ok:
            # age once per render step (the observing rep of the first
            # group), not once per rep/group — render() forwards
            # observe_ok=True only for its first dispatch
            self._plan_ages[key] = self._plan_ages.get(key, 0) + 1
        return full

    def _rr_div(self, bounce: int) -> float:
        """Per-bounce RR truncation divisor (traced jit arg — floats do
        not mint compile variants): rr_scale at bounces >=
        rr_start_bounce, the reference rule before."""
        s = self.settings
        return s.rr_scale if bounce >= s.rr_start_bounce else 1.0

    def _jit_settings(self):
        """Settings instance for the per-stage jits: sample_count is
        host-loop state, not a kernel parameter (no traced stage reads
        it), so pin it in the static key — otherwise every
        samples-per-frame retune by the adaptive controller (on_update)
        would retrace and recompile raygen + both bounce variants."""
        return dataclasses.replace(self.settings, sample_count=1)

    def _camera_mats(self):
        cams = self.scene.cameras
        cam = cams[self.camera_index if 0 <= self.camera_index < len(cams)
                   else 0]
        cam.on_resize(self.width, self.height)
        return (jnp.asarray(cam.inv_view, jnp.float32),
                jnp.asarray(cam.inv_proj, jnp.float32))

    def _adaptive_deficit(self, tol, target_mse, pool, min_spp, max_spp,
                          expo):
        """One host moment fetch -> per-pixel sample deficit (film order),
        or None when the stopping rule is satisfied. Shared by the
        single-device and sharded adaptive loops."""
        n_full = self.width * self.height
        counts = np.maximum(self._spp_map, 1)
        s1 = np.asarray(self.accum.reshape(-1, 3) @ jnp.asarray(_LUM))
        sq = np.asarray(self._accum_sq)
        mean_lum = s1 / counts
        if (pool > 1 and self.height % pool == 0
                and self.width % pool == 0):
            # tile-pooled per-sample variance (film is row-major)
            within = np.maximum(sq - s1 * mean_lum, 0.0)
            hh, ww = self.height // pool, self.width // pool
            w4 = within.reshape(hh, pool, ww, pool).sum((1, 3))
            n4 = self._spp_map.reshape(hh, pool, ww, pool).sum((1, 3))
            dof = np.maximum(n4 - pool * pool, 1)
            var = np.broadcast_to(
                (w4 / dof)[:, None, :, None],
                (hh, pool, ww, pool)).reshape(-1)
        else:
            var = np.maximum(sq / counts - mean_lum * mean_lum, 0.0)
        # tonemap-space stddev: d(1-exp(-e*c))/dc = e*exp(-e*c)
        sd_tm = np.sqrt(var) * expo * np.exp(-expo * mean_lum)
        if target_mse is not None:
            var_tm = sd_tm * sd_tm
            warm = (self._spp_map >= min_spp).all()
            if warm and float(np.mean(var_tm / counts)) < target_mse:
                return None
            # MSE-optimal allocation: n_p ~ sigma_p scaled so that
            # mean(var_p/n_p) == target_mse at completion
            need = np.ceil(sd_tm * sd_tm.sum() / (target_mse * n_full))
        elif tol > 0:
            need = np.ceil((1.96 * sd_tm / tol) ** 2)
        else:
            need = np.full(n_full, float(max_spp))
        need = np.maximum(need, float(min_spp))
        return np.clip(need - self._spp_map, 0,
                       max_spp - self._spp_map).astype(np.int64)

    def render_adaptive(self, tol: float = 5e-3, max_spp: int = 1024,
                        min_spp: int = 32, check_every: int = 8,
                        target_mse: Optional[float] = None,
                        pool: int = 4,
                        max_seconds: Optional[float] = None) -> dict:
        """Noise-driven per-pixel progressive refinement: each pixel keeps
        sampling until the 95% CI of its TONEMAPPED luminance drops below
        `tol`. An upgrade over the reference, whose progressive
        accumulation always samples the full film (Renderer.cpp:1694-1700).

        Allocation strategy (sample redistribution, NOT wavefront
        shrinking): every dispatch stays full-film-sized — one compiled
        size class, zero padding waste — and its lanes are dealt to the
        pixels with the largest sample DEFICIT (the CI-derived need
        (1.96*sigma/tol)^2 minus the samples already taken), proportional
        largest-remainder allocation. A noisy pixel may occupy many lanes
        of one dispatch; its duplicates carry consecutive per-pixel frame
        counters, so every sample continues the exact RNG stream that
        repeated render(1) calls would produce — uniform and adaptive
        films are sample-for-sample comparable (and identical at tol=0).
        `check_every` caps the dispatches issued per allocation round
        (one host moment-fetch per round). The film mean stays correct
        per pixel (accum/count); the stopping rule observes the estimator
        it stops, the standard (negligible) adaptive-sampling caveat.

        `target_mse` switches the stopping rule from per-pixel CIs to the
        GLOBAL tonemapped-MSE contract (BASELINE.json): sampling stops
        when the estimated film MSE mean(var_p/n_p) drops below it, and
        lanes are allocated toward the MSE-optimal profile n_p ~ sigma_p
        (vs the CI rule's sigma_p^2) — strictly fewer total samples for
        the same global MSE by Cauchy-Schwarz, at the cost of per-pixel
        error uniformity. `tol` is ignored when target_mse is set.

        Per-pixel sample variance at low counts HASN'T SEEN the rare
        bright paths yet and understates the true error (the classic
        adaptive-sampling firefly trap), so the noise level sigma_p used
        for stopping/allocation is pooled over `pool` x `pool` film tiles
        (per-pixel means stay exact; only the deviation energy pools —
        ~pool^2 x the degrees of freedom per estimate). pool=1 disables.

        `max_seconds` bounds wall time at allocation-round granularity
        (the film stays a valid partial render wherever it stops).

        Returns {"spp_min", "spp_max", "spp_mean", "steps"} where steps
        counts full-film-sized dispatches.
        """
        if self.mesh is not None:
            return self._render_adaptive_sharded(tol, max_spp, min_spp,
                                                 check_every, target_mse,
                                                 pool, max_seconds)
        if self.ds is None or not self.width:
            raise RuntimeError("scene or film not initialized")
        self._fold_rays()
        self._poll_textures()
        self._ensure_accel()
        inv_view, inv_proj = self._camera_mats()
        n_full = self.width * self.height
        # dispatch at the exact film size: render() compiles this shape
        # already, and a pow2 class would pad every dispatch of a non-pow2
        # film with up to ~14% weight-0 lanes doing full path-tracing work
        disp_n = n_full                       # lanes per dispatch
        if self._spp_map is None:
            if self.total_samples:
                # adaptive stats can't be reconstructed for a uniform film
                self.reset_accumulation()
            self._spp_map = np.zeros(n_full, np.int64)
            self._accum_sq = jnp.zeros((n_full,), jnp.float32)
        film_perm_np = self._order_np.astype(np.int64)
        lane_of_film = np.argsort(film_perm_np)
        px_np = np.asarray(self._px)
        py_np = np.asarray(self._py)
        steps = 0
        expo = float(self.post.exposure)
        deadline = (time.perf_counter() + max_seconds
                    if max_seconds is not None else None)
        with Timer("Render"):
            while deadline is None or time.perf_counter() < deadline:
                # ---- allocation round: ONE host moment fetch ----------
                deficit = self._adaptive_deficit(tol, target_mse, pool,
                                                 min_spp, max_spp, expo)
                if deficit is None:
                    break
                total_deficit = int(deficit.sum())
                if total_deficit == 0:
                    break
                n_disp = int(min(check_every,
                                 max(1, -(-total_deficit // n_full))))
                budget = min(total_deficit, n_disp * n_full)
                alloc = _largest_remainder_alloc(deficit, budget)
                pix, frm = _rep_major_stream(alloc, self._spp_map)
                for off in range(0, len(pix), disp_n):
                    cp = pix[off:off + disp_n]
                    cf = frm[off:off + disp_n]
                    w = np.ones(len(cp), np.float32)
                    padn = disp_n - len(cp)
                    if padn:
                        cp = np.concatenate([cp, np.zeros(padn, np.int64)])
                        cf = np.concatenate([cf, np.zeros(padn, np.int64)])
                        w = np.concatenate([w, np.zeros(padn, np.float32)])
                    lanes = lane_of_film[cp]
                    # lane order keeps 32x32 film tiles contiguous per
                    # 1024-ray packet (coherence; see _tile_order)
                    order = np.argsort(lanes, kind="stable")
                    lanes, cp, cf, w = (lanes[order], cp[order],
                                        cf[order], w[order])
                    pxs = jnp.asarray(px_np[lanes])
                    pys = jnp.asarray(py_np[lanes])
                    perm_sub = jnp.asarray(cp.astype(np.int32))
                    w_d = jnp.asarray(w)
                    state = _init_state_jit(
                        pxs, pys, self.width,
                        jnp.asarray(cf.astype(np.uint32)))
                    carry = _guard(_raygen_jit, pxs, pys, self.width,
                                   self.height, inv_view, inv_proj, state,
                                   self._jit_settings(), what="raygen jit")
                    full = carry
                    perm = None
                    cur_n = disp_n
                    plan = self._plans.get(("full", disp_n))
                    # re-observe on every round's first dispatch: adaptive
                    # rounds concentrate the noisiest pixels, whose paths
                    # live longer — a stale plan would truncate them
                    alive_obs = [] if (plan is None or off == 0) else None
                    for bounce in range(self.settings.bounce_count):
                        carry, alive_count = _guard(
                            _bounce_jit, self.ds, self.tex, self.accel,
                            carry, self._jit_settings(), bounce > 0,
                            self._rr_div(bounce), what="bounce jit")
                        if alive_obs is not None:
                            alive_obs.append(alive_count)
                        kk = (plan[bounce]
                              if plan and bounce < len(plan) else None)
                        if (kk is not None and kk <= cur_n // 2
                                and bounce < self.settings.bounce_count - 1):
                            if perm is not None:
                                full = _scatter_jit(full, carry, perm)
                            else:
                                full = carry
                            carry, perm = _compact_jit(full, kk)
                            cur_n = kk
                    if perm is not None:
                        full = _scatter_jit(full, carry, perm)
                    else:
                        full = carry
                    (self.accum, self._accum_sq,
                     rt) = _accumulate_adaptive_jit(
                        full, self.accum, self._accum_sq,
                        jnp.zeros((), jnp.int32), perm_sub, w_d)
                    self._rays_chunks.append(rt)
                    if alive_obs is not None:
                        obs = np.asarray(jnp.stack(alive_obs))
                        new_plan = [
                            _size_class(int(1.35 * c)) if c > 0 else 1024
                            for c in obs]
                        if plan is not None:
                            # counts are observed pre-compaction, so a
                            # bounce whose true count exceeded its class
                            # is visible directly — but counts at DEEPER
                            # bounces were depressed by that truncation:
                            # don't shrink their classes on this
                            # observation
                            for b in range(len(new_plan)):
                                if b < len(plan) and obs[b] > plan[b]:
                                    for j in range(b + 1, len(new_plan)):
                                        if j < len(plan):
                                            new_plan[j] = max(new_plan[j],
                                                              plan[j])
                                    break
                        self._plans[("full", disp_n)] = new_plan
                        self._plan_ages[("full", disp_n)] = 0
                    steps += 1
                self._spp_map += alloc
        self.total_samples = int(self._spp_map.max())
        Stats.add_stat("Total Samples", self.total_samples)
        Stats.add_stat("Adaptive Mean SPP",
                       float(self._spp_map.mean()))
        return {"spp_min": int(self._spp_map.min()),
                "spp_max": int(self._spp_map.max()),
                "spp_mean": float(self._spp_map.mean()),
                "steps": steps}

    def _render_adaptive_sharded(self, tol, max_spp, min_spp, check_every,
                                 target_mse, pool,
                                 max_seconds=None) -> dict:
        """Adaptive film over a device mesh: the film stays band-sharded
        (pt.dist.film_mesh) and redistribution runs PER BAND — each
        dispatch is one full film-sized wavefront whose per-shard segment
        is dealt from that band's own deficits (shard_map needs equal
        local sizes; bands never exchange lanes). Streams are (pixel,
        count)-seeded exactly like the single-device loop, so the tol=0
        film matches the unsharded adaptive film."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        if self.ds is None or not self.width:
            raise RuntimeError("scene or film not initialized")
        self._fold_rays()
        self._poll_textures()
        self._ensure_accel()
        inv_view, inv_proj = self._camera_mats()
        if self._stages is None:
            self._stages = _ShardedStages(self.mesh, self.width,
                                          self.height, self._jit_settings())
        sh = NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
        n_dev = self.mesh.devices.size
        n_full = self.width * self.height
        n_local = n_full // n_dev          # == pixels per row band
        if self._spp_map is None:
            if self.total_samples:
                self.reset_accumulation()
            self._spp_map = np.zeros(n_full, np.int64)
            self._accum_sq = jax.device_put(
                jnp.zeros((n_full,), jnp.float32), sh)
        accum_flat = self.accum.reshape(-1, 3)
        sq_flat = self._accum_sq
        film_perm_np = self._order_np.astype(np.int64)
        lane_of_film = np.argsort(film_perm_np)
        px_np = np.asarray(self._px)
        py_np = np.asarray(self._py)
        steps = 0
        expo = float(self.post.exposure)
        deadline = (time.perf_counter() + max_seconds
                    if max_seconds is not None else None)
        with Timer("Render"):
            while deadline is None or time.perf_counter() < deadline:
                self.accum = accum_flat.reshape(self.accum.shape)
                self._accum_sq = sq_flat
                deficit = self._adaptive_deficit(tol, target_mse, pool,
                                                 min_spp, max_spp, expo)
                if deficit is None or int(deficit.sum()) == 0:
                    break
                d_band = deficit.reshape(n_dev, n_local)
                band_tot = d_band.sum(1)
                n_disp = int(min(check_every,
                                 max(1, -(-int(band_tot.max()) // n_local))))
                alloc = np.zeros(n_full, np.int64)
                stream_len = n_disp * n_local
                pix_s = np.empty((n_dev, stream_len), np.int64)
                frm_s = np.zeros((n_dev, stream_len), np.int64)
                w_s = np.zeros((n_dev, stream_len), np.float32)
                for b in range(n_dev):
                    base_i = b * n_local
                    pix_s[b] = base_i          # pad default (weight 0)
                    d_b = d_band[b].copy()
                    total_b = int(band_tot[b])
                    if total_b == 0:
                        continue
                    budget = min(total_b, stream_len)
                    a = _largest_remainder_alloc(d_b, budget)
                    pix_b, frm_b = _rep_major_stream(
                        a, self._spp_map[base_i:base_i + n_local])
                    pix_b = pix_b + base_i
                    pix_s[b, :len(pix_b)] = pix_b
                    frm_s[b, :len(pix_b)] = frm_b
                    w_s[b, :len(pix_b)] = 1.0
                    alloc[base_i:base_i + n_local] = a
                for d in range(n_disp):
                    seg = slice(d * n_local, (d + 1) * n_local)
                    cp = pix_s[:, seg]
                    cf = frm_s[:, seg]
                    cw = w_s[:, seg]
                    lanes = lane_of_film[cp]
                    order = np.argsort(lanes, axis=1, kind="stable")
                    lanes = np.take_along_axis(lanes, order, 1).reshape(-1)
                    cp_o = np.take_along_axis(cp, order, 1).reshape(-1)
                    cf_o = np.take_along_axis(cf, order, 1).reshape(-1)
                    cw_o = np.take_along_axis(cw, order, 1).reshape(-1)
                    pxs = jax.device_put(jnp.asarray(px_np[lanes]), sh)
                    pys = jax.device_put(jnp.asarray(py_np[lanes]), sh)
                    perm_sub = jax.device_put(
                        jnp.asarray((cp_o % n_local).astype(np.int32)), sh)
                    w_d = jax.device_put(jnp.asarray(cw_o), sh)
                    frames = jax.device_put(
                        jnp.asarray(cf_o.astype(np.uint32)), sh)
                    carry = _guard(self._stages.raygen_adaptive,
                                   pxs, pys, inv_view, inv_proj, frames,
                                   what="sharded raygen")
                    full = carry
                    perm = None
                    cur_n = n_local
                    plan = self._plans.get(("full", n_local))
                    alive_obs = [] if (plan is None or d == 0) else None
                    rt = jnp.zeros((), jnp.int32)
                    for bounce in range(self.settings.bounce_count):
                        stage = (self._stages.bounce if bounce > 0
                                 else self._stages.bounce0)
                        carry, alive_max, rays_delta = _guard(
                            stage, self.ds, self.tex, self.accel, carry,
                            jnp.float32(self._rr_div(bounce)),
                            what="sharded bounce")
                        rt = rt + rays_delta
                        if alive_obs is not None:
                            alive_obs.append(alive_max)
                        kk = (plan[bounce]
                              if plan and bounce < len(plan) else None)
                        if (kk is not None and kk <= cur_n // 2
                                and bounce < self.settings.bounce_count - 1):
                            if perm is not None:
                                full = self._stages.scatter(full, carry,
                                                            perm)
                            else:
                                full = carry
                            carry, perm = self._stages.compact(kk)(full)
                            cur_n = kk
                    if perm is not None:
                        full = self._stages.scatter(full, carry, perm)
                    else:
                        full = carry
                    accum_flat, sq_flat = self._stages.accumulate_adaptive(
                        full, accum_flat, sq_flat, perm_sub, w_d)
                    self._rays_chunks.append(rt)
                    if alive_obs is not None:
                        obs = np.asarray(jnp.stack(alive_obs))
                        new_plan = [
                            _size_class(int(1.35 * c)) if c > 0 else 1024
                            for c in obs]
                        if plan is not None:
                            # counts at bounces deeper than an overflowed
                            # class were depressed by its truncation —
                            # don't shrink them on this observation
                            for b in range(len(new_plan)):
                                if b < len(plan) and obs[b] > plan[b]:
                                    for j in range(b + 1, len(new_plan)):
                                        if j < len(plan):
                                            new_plan[j] = max(new_plan[j],
                                                              plan[j])
                                    break
                        self._plans[("full", n_local)] = new_plan
                        self._plan_ages[("full", n_local)] = 0
                    steps += 1
                self._spp_map += alloc
        self.accum = accum_flat.reshape(self.accum.shape)
        self._accum_sq = sq_flat
        self.total_samples = int(self._spp_map.max())
        Stats.add_stat("Total Samples", self.total_samples)
        Stats.add_stat("Adaptive Mean SPP", float(self._spp_map.mean()))
        return {"spp_min": int(self._spp_map.min()),
                "spp_max": int(self._spp_map.max()),
                "spp_mean": float(self._spp_map.mean()),
                "steps": steps}

    def _render_sharded(self, samples: int, inv_view, inv_proj) -> None:
        """Multi-chip film-row render: each sample is seeded by a distinct
        frame counter (decorrelated streams; intra-frame stream
        continuation is a single-device property).

        Mirrors the single-device path's sync discipline: per-bounce live
        counts drive the NEXT step's per-shard compaction size classes and
        are fetched in ONE batched host sync per render() — the per-bounce
        `int(alive_count)` sync (≈30 ms each on this platform) is gone."""
        if self._stages is None:
            self._stages = _ShardedStages(self.mesh, self.width, self.height,
                                          self._jit_settings())
        n_dev = self.mesh.devices.size
        n_local = (self.width * self.height) // n_dev
        accum_flat = self.accum.reshape(-1, 3)
        plan = self._plans.get(("full", n_local))
        observe = plan is None or self._plan_ages.get(("full", n_local), 0) >= 16
        alive_obs = []
        for s in range(samples):
            frame = jnp.uint32(self.total_samples + s)
            carry = _guard(self._stages.raygen, self._px, self._py,
                           inv_view, inv_proj, frame, what="sharded raygen")
            full = carry
            perm = None
            cur_n = n_local
            rt = jnp.zeros((), jnp.int32)
            for bounce in range(self.settings.bounce_count):
                stage = (self._stages.bounce if bounce > 0
                         else self._stages.bounce0)
                carry, alive_max, rays_delta = _guard(
                    stage, self.ds, self.tex, self.accel, carry,
                    jnp.float32(self._rr_div(bounce)),
                    what="sharded bounce")
                rt = rt + rays_delta
                if s == 0 and observe:
                    alive_obs.append(alive_max)
                # the observing sample runs uncompacted (see render())
                k = (plan[bounce]
                     if plan and bounce < len(plan)
                     and not (observe and s == 0) else None)
                if (k is not None and k <= cur_n // 2
                        and bounce < self.settings.bounce_count - 1):
                    if perm is not None:
                        full = self._stages.scatter(full, carry, perm)
                    else:
                        full = carry
                    carry, perm = self._stages.compact(k)(full)
                    cur_n = k
            if perm is not None:
                full = self._stages.scatter(full, carry, perm)
            else:
                full = carry
            accum_flat = self._stages.accumulate(full, accum_flat,
                                                 self._film_perm_sharded)
            self._rays_chunks.append(rt)
        if alive_obs:
            counts = np.asarray(jnp.stack(alive_obs))   # one batched sync
            self._plans[("full", n_local)] = [
                _size_class(int(1.35 * c)) if c > 0 else 1024
                for c in counts]
            self._plan_ages[("full", n_local)] = 0
        else:
            self._plan_ages[("full", n_local)] = self._plan_ages.get(("full", n_local), 0) + 1
        self.accum = accum_flat.reshape(self.accum.shape)

    def _film_host(self) -> np.ndarray:
        """The accumulation film as a host array. Under a mesh the film is
        band-sharded; it assembles through ONE all-gather per saved frame
        (pt/dist/mesh.assemble_film — crosses DCN only when the mesh spans
        hosts; ≙ the reference reading back the accumulation image once per
        save, OutputSaver.cpp:113-181). Per-step code never calls this."""
        if self.mesh is not None:
            from pt.dist.mesh import assemble_film
            return assemble_film(self.accum, self.mesh)
        return np.asarray(self.accum)

    def film_mean(self) -> np.ndarray:
        """Linear per-pixel mean radiance (host); handles the adaptive
        film's per-pixel sample counts."""
        if self._spp_map is not None:
            counts = np.maximum(self._spp_map, 1).astype(np.float32)
            return self._film_host() / counts.reshape(
                self.height, self.width, 1)
        return self._film_host() / max(self.total_samples, 1)

    def snapshot(self, hdr: bool = False) -> np.ndarray:
        """Resolve the film through the post stack → float image (host)."""
        # mesh: assemble the band-sharded film first (see _film_host);
        # single-device keeps the film on device through the post stack
        # (snapshot also feeds the live viewer's per-frame stream)
        accum = (self.accum if self.mesh is None
                 else jnp.asarray(self._film_host()))
        if self._spp_map is not None:
            # adaptive film: per-pixel sample counts
            counts = np.maximum(self._spp_map, 1).astype(np.float32)
            mean = accum / jnp.asarray(
                counts.reshape(self.height, self.width, 1))
            return np.asarray(postprocess(mean, 1.0, self.post, hdr))
        out = postprocess(accum, float(max(self.total_samples, 1)),
                          self.post, hdr)
        return np.asarray(out)

    def _fold_rays(self, keep: int = 64, limit: int = 512) -> None:
        """Bound the ray-chunk list: fold chunks older than the last
        `keep` into the host total. Old chunks' computations finished many
        renders ago, so the int() conversions don't stall the pipeline.
        Render-thread only (rays_traced readers take the same lock)."""
        if len(self._rays_chunks) <= limit:
            return
        with self._rays_lock:
            old, self._rays_chunks = (self._rays_chunks[:-keep],
                                      self._rays_chunks[-keep:])
            self._rays_host += sum(int(c) for c in old)

    @property
    def rays_traced(self) -> int:
        with self._rays_lock:
            chunks = list(self._rays_chunks)
            host = self._rays_host
        return host + sum(int(c) for c in chunks)

    # -- checkpoint / resume (an upgrade over the reference, which loses
    # -- progress on a crash mid-render; SURVEY §5 recommends this) --------
    def save_checkpoint(self, path: str) -> None:
        """Persist the accumulation film + counters; a resumed render
        continues the exact RNG stream (seeding is (pixel, total_samples))."""
        extra = {}
        if self._spp_map is not None:
            extra = dict(spp_map=self._spp_map,
                         accum_sq=np.asarray(self._accum_sq))
        np.savez(path,
                 accum=np.asarray(self.accum),
                 total_samples=self.total_samples,
                 rays_total=self.rays_traced,
                 width=self.width, height=self.height, **extra)

    def load_checkpoint(self, path: str) -> None:
        data = np.load(path)
        w, h = int(data["width"]), int(data["height"])
        self.on_resize(w, h)
        self.accum = jnp.asarray(data["accum"])
        self.total_samples = int(data["total_samples"])
        with self._rays_lock:
            self._rays_chunks = []
            self._rays_host = int(data["rays_total"])
        if "spp_map" in data:
            self._spp_map = data["spp_map"]
            self._accum_sq = jnp.asarray(data["accum_sq"])
        else:
            self._spp_map = None
            self._accum_sq = None
