"""Film-tile sharding over a device mesh.

The reference is single-GPU; its scale-out axis is image size × samples ×
bounces (SURVEY §5). The natural TPU sharding for a path tracer is **image-
space data parallelism**: shard film rows across chips on a 1-D mesh, render
each shard locally (scene/textures replicated — they are read-only), and
gather the film only at save time. No per-bounce collectives are needed:
paths are pixel-independent, so the only communication is the final
all-gather over ICI (and DCN only for multi-host saves).

An alternative mode shards *samples* instead (every chip renders the full
film with a decorrelated RNG stream and films are psum-merged) — that is
`render_spp_sharded`, useful when the film is small but spp is huge.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from pt.render.integrator import PathTracingSettings, render_flat
from pt.render.textures import DeviceTextures
from pt.scene.flatten import DeviceScene


def film_mesh(devices: Optional[list] = None, axis: str = "film") -> Mesh:
    """1-D device mesh over film tiles."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def film_spp_mesh(film: int, spp: int, devices: Optional[list] = None,
                  axes=("film", "spp")) -> Mesh:
    """2-D mesh: `film` row-groups × `spp` decorrelated sample groups —
    the pod-slice layout when neither axis alone covers the slice (e.g.
    a 4×2 v5e tray rendering a tall film at high spp). Uses film*spp
    devices."""
    devices = devices if devices is not None else jax.devices()
    if film * spp > len(devices):
        raise ValueError(f"need {film * spp} devices, have {len(devices)}")
    grid = np.asarray(devices[:film * spp]).reshape(film, spp)
    return Mesh(grid, axes)


def render_image_sharded(ds: DeviceScene, tex: DeviceTextures, inv_view,
                         inv_proj, width: int, height: int, frame,
                         settings: PathTracingSettings, mesh: Mesh):
    """Render the frame with film rows sharded over `mesh`.

    Returns ((H, W, 3) radiance sum, rays scalar). H must be divisible by
    the mesh size (callers pad; film heights are multiples of 8 in
    practice).
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    if height % n_dev:
        raise ValueError(f"height {height} not divisible by mesh size {n_dev}")

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(axis), P(axis)),
        out_specs=(P(axis), P()),
        check_vma=False,
    )
    def shard_render(ds_, tex_, iv, ip, frame_, px, py):
        # frame is an operand (like the sibling spp/2-D modes), not a
        # closure constant: progressive callers advance it per step and
        # must reuse one compiled program
        radiance, rays = render_flat(ds_, tex_, iv, ip,
                                     px.reshape(-1), py.reshape(-1),
                                     width, height, frame_, settings)
        rows = height // n_dev
        return (radiance.reshape(rows, width, 3),
                jax.lax.psum(rays, axis))

    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.uint32),
                          jnp.arange(width, dtype=jnp.uint32), indexing="ij")
    return shard_render(ds, tex,
                        jnp.asarray(inv_view, jnp.float32),
                        jnp.asarray(inv_proj, jnp.float32),
                        jnp.asarray(frame, jnp.uint32), xs, ys)


def render_spp_sharded(ds: DeviceScene, tex: DeviceTextures, inv_view,
                       inv_proj, width: int, height: int, frame,
                       settings: PathTracingSettings, mesh: Mesh):
    """Sample-parallel mode: each chip renders the whole film with a
    decorrelated frame seed; films are psum-merged over ICI. Total spp per
    call = settings.sample_count * mesh size."""
    axis = mesh.axis_names[0]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def shard_render(ds_, tex_, iv, ip, frame_):
        my = jax.lax.axis_index(axis).astype(jnp.uint32)
        ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.uint32),
                              jnp.arange(width, dtype=jnp.uint32),
                              indexing="ij")
        # decorrelate streams with a large odd per-chip stride: the old
        # `frame + chip * sample_count` collided across progressive steps
        # (chip k at step s+1 == chip k+1 at step s when callers advance
        # the frame by sample_count); a golden-ratio stride makes
        # (chip, step) -> frame injective for any realistic step count
        local_frame = frame_ + my * jnp.uint32(2654435761)
        radiance, rays = render_flat(ds_, tex_, iv, ip,
                                     xs.reshape(-1), ys.reshape(-1),
                                     width, height, local_frame, settings)
        return (jax.lax.psum(radiance.reshape(height, width, 3), axis),
                jax.lax.psum(rays, axis))

    return shard_render(ds, tex,
                        jnp.asarray(inv_view, jnp.float32),
                        jnp.asarray(inv_proj, jnp.float32),
                        jnp.asarray(frame, jnp.uint32))


def render_image_spp_sharded(ds: DeviceScene, tex: DeviceTextures, inv_view,
                             inv_proj, width: int, height: int, frame,
                             settings: PathTracingSettings, mesh: Mesh):
    """Combined mode over a 2-D (film, spp) mesh: film rows shard over the
    first axis while each spp-group renders its shard with a decorrelated
    frame seed (same golden-ratio stride as `render_spp_sharded`, so the
    1-wide special cases are bit-identical to the 1-D modes). Radiance is
    reduce-summed over the spp axis on ICI; the film axis needs no
    collective at all. Total spp per call = sample_count * spp-axis size.

    Returns ((H, W, 3) radiance sum, rays scalar); H must divide by the
    film-axis size."""
    f_ax, s_ax = mesh.axis_names
    nf = mesh.shape[f_ax]
    ns = mesh.shape[s_ax]
    if height % nf:
        raise ValueError(f"height {height} not divisible by film axis {nf}")

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(f_ax), P(f_ax), P()),
        out_specs=(P(f_ax), P()),
        check_vma=False,
    )
    def shard_render(ds_, tex_, iv, ip, px, py, frame_):
        my_s = jax.lax.axis_index(s_ax).astype(jnp.uint32)
        local_frame = frame_ + my_s * jnp.uint32(2654435761)
        radiance, rays = render_flat(ds_, tex_, iv, ip,
                                     px.reshape(-1), py.reshape(-1),
                                     width, height, local_frame, settings)
        rows = height // nf
        radiance = jax.lax.psum(radiance.reshape(rows, width, 3), s_ax)
        return radiance, jax.lax.psum(rays, (f_ax, s_ax))

    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.uint32),
                          jnp.arange(width, dtype=jnp.uint32), indexing="ij")
    return shard_render(ds, tex,
                        jnp.asarray(inv_view, jnp.float32),
                        jnp.asarray(inv_proj, jnp.float32), xs, ys,
                        jnp.asarray(frame, jnp.uint32))


def film_mesh_multihost(axis: str = "film") -> Mesh:
    """Film-row mesh over ALL processes' devices (multi-host: ICI within
    a slice, DCN across hosts — requires jax.distributed.initialize()
    before first jax use). Single-process it degenerates to film_mesh().

    Design (SURVEY §5 "multi-host film output over DCN only at save
    time"): film rows shard over the global device order, so every
    collective inside a render step (the ray-count psum, the compaction
    pmax) stays on ICI within each host's devices wherever the mesh
    axis order permits; film bands live host-local. Nothing in the
    per-step path crosses DCN — the FILM only assembles at save time via
    assemble_film() below, the analogue of the reference reading back
    the accumulation image once per saved frame (OutputSaver.cpp)."""
    import jax
    return Mesh(np.asarray(jax.devices()), (axis,))


def assemble_film(accum, mesh: Mesh):
    """Gather a band-sharded film to every process (one all-gather over
    the mesh — crosses DCN only when the mesh spans hosts; call once per
    SAVED frame, not per step). Returns a fully-replicated host array."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    out = jax.jit(lambda x: x,
                  out_shardings=NamedSharding(mesh, P()))(accum)
    return np.asarray(out)
