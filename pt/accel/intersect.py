"""Batched ray-triangle intersection (Möller–Trumbore), brute-force backend.

This is the TPU replacement for the reference's hardware `traceRayEXT`
closest-hit / any-hit queries (Shaders/raygen.rgen:70, :31). Rays are flat
SoA megabatches; triangles are tested two-sided (the reference traces with
gl_RayFlagsNone, i.e. no backface culling — backface handling happens in
shading via the inside-hit flip, closestHit.rchit:77-84).

The brute-force path is exact and fully dense (VPU-friendly): it tiles rays
into chunks (lax.map) and reduces over all triangles per chunk. It is the
correctness oracle for the BVH backends and the fast path for small scenes
where a BVH would be overhead.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_RAY_TRI_BUDGET = 1 << 24   # max rays*tris elements materialized per chunk


class Hit(NamedTuple):
    """Closest-hit record (≙ the payload fields the RT pipeline hands the
    closest-hit shader: gl_PrimitiveID, gl_RayTmaxEXT, barycentrics)."""
    t: jax.Array        # (N,) hit distance; >= tmax means miss
    tri: jax.Array      # (N,) i32 triangle index; -1 on miss
    u: jax.Array        # (N,) barycentric u (weight of vertex 1)
    v: jax.Array        # (N,) barycentric v (weight of vertex 2)

    @property
    def is_hit(self) -> jax.Array:
        return self.tri >= 0


def _gather_tris(positions: jax.Array, tri_idx: jax.Array):
    v0 = positions[tri_idx[:, 0]]
    e1 = positions[tri_idx[:, 1]] - v0
    e2 = positions[tri_idx[:, 2]] - v0
    return v0, e1, e2


def _mt_chunk(origins, dirs, v0, e1, e2, tmin, tmax):
    """Möller–Trumbore for a (C rays) x (T tris) block. Returns per-ray
    (t, tri, u, v) of the closest accepted hit."""
    # (C, T, 3) broadcasts
    o = origins[:, None, :]
    d = dirs[:, None, :]
    pvec = jnp.cross(d, e2[None, :, :])
    det = jnp.sum(e1[None] * pvec, axis=-1)                   # (C, T)
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / jnp.where(det == 0, 1.0, det))
    tvec = o - v0[None]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None] * qvec, axis=-1) * inv_det
    ok = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t > tmin) & (t < tmax[:, None]))
    t = jnp.where(ok, t, jnp.inf)
    best = jnp.argmin(t, axis=-1)                              # (C,)
    rows = jnp.arange(t.shape[0])
    best_t = t[rows, best]
    hit = jnp.isfinite(best_t)
    return (jnp.where(hit, best_t, tmax),
            jnp.where(hit, best.astype(jnp.int32), -1),
            jnp.where(hit, u[rows, best], 0.0),
            jnp.where(hit, v[rows, best], 0.0))


def intersect_brute(positions: jax.Array, tri_idx: jax.Array,
                    origins: jax.Array, dirs: jax.Array,
                    tmin: float = 1e-5, tmax=1e4) -> Hit:
    """Closest hit of each ray against all triangles.

    positions: (V, 3) world-space; tri_idx: (T, 3); origins/dirs: (N, 3).
    tmax may be scalar or (N,).
    """
    v0, e1, e2 = _gather_tris(positions, tri_idx)
    n = origins.shape[0]
    t_count = tri_idx.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))

    chunk = max(1, min(n, _RAY_TRI_BUDGET // max(t_count, 1)))
    # pad rays to a multiple of the chunk size
    pad = (-n) % chunk
    if pad:
        zpad = lambda a: jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        origins, dirs, tmax = zpad(origins), zpad(dirs), zpad(tmax)
    num_chunks = origins.shape[0] // chunk

    def body(args):
        o, d, tm = args
        return _mt_chunk(o, d, v0, e1, e2, tmin, tm)

    rs = lambda a: a.reshape(num_chunks, chunk, *a.shape[1:])
    t, tri, u, v = jax.lax.map(body, (rs(origins), rs(dirs), rs(tmax)))
    flat = lambda a: a.reshape(-1)[:n]
    return Hit(flat(t), flat(tri), flat(u), flat(v))


def occluded_brute(positions: jax.Array, tri_idx: jax.Array,
                   origins: jax.Array, dirs: jax.Array, dist,
                   tmin: float = 1e-5) -> jax.Array:
    """Boolean shadow query: any (opaque) triangle closer than dist
    (≙ occlusion traceRay with TerminateOnFirstHit, raygen.rgen:22-33).
    Caller pre-filters to opaque triangles; alpha-tested shadows are layered
    on top by the integrator."""
    hit = intersect_brute(positions, tri_idx, origins, dirs, tmin, dist)
    return hit.is_hit
