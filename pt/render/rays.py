"""Primary-ray construction (pinhole + thin-lens DoF) and ray-origin offsets.

Vectorized counterpart of Shaders/ray.glsl: the three constructPrimaryRay
overloads all emit +1-pixel-offset differential rays (ray.glsl:16-99); the
self-intersection offset uses the integer-ulp scheme from Ray Tracing Gems
ch. 6 (ray.glsl:101-115) and the shadow-terminator offset follows RT Gems II
ch. 4 (ray.glsl:117-131).

Camera matrices follow the reference convention: rays are built from
inverse-projection then inverse-view (left-handed, zero-to-one depth,
Core/Camera.cpp:1-2).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pt.render.sampling import sample_uniform_disk_concentric
from pt.render.shading import _normalize

TMIN = 1e-5
TMAX = 1e4

_ORIGIN_CONST = 1.0 / 32.0
_FLOAT_SCALE = 1.0 / 65536.0
_INT_SCALE = 256.0


class Rays(NamedTuple):
    origin: jax.Array      # (..., 3)
    direction: jax.Array   # (..., 3)


def _unproject(d, inv_proj):
    """Pixel NDC (..., 2) → world direction through inverse proj/view."""
    ndc = jnp.concatenate([d, jnp.ones_like(d)], axis=-1)       # (x, y, 1, 1)
    target = jnp.einsum("ij,...j->...i", inv_proj, ndc)[..., :3]
    return target


def _to_world_dir(v, inv_view):
    v4 = jnp.concatenate([v, jnp.zeros_like(v[..., :1])], axis=-1)
    return jnp.einsum("ij,...j->...i", inv_view, v4)[..., :3]


def construct_primary_rays(px, py, width, height, inv_view, inv_proj,
                           u1, u2, lens_u1=None, lens_u2=None,
                           lens_radius=0.0, focal_distance=1.0
                           ) -> Tuple[Rays, Rays, Rays]:
    """Build jittered primary rays + x/y differential rays.

    px, py: integer pixel coordinates (...,). u1,u2: per-ray jitter in [0,1).
    With lens_radius > 0 the thin-lens model applies (≙ the DoF overload,
    ray.glsl:16-58); otherwise pinhole (ray.glsl:60-88).
    Returns (ray, rx, ry); differentials share the main origin semantics of
    the reference (offset-by-one-pixel directions).
    """
    inv_view = jnp.asarray(inv_view, jnp.float32)
    inv_proj = jnp.asarray(inv_proj, jnp.float32)
    res = jnp.asarray([width, height], jnp.float32)

    center = jnp.stack([px.astype(jnp.float32) + u1,
                        py.astype(jnp.float32) + u2], axis=-1)

    def ndc(p):
        return (p / res) * 2.0 - 1.0

    d = ndc(center)
    dx = ndc(center + jnp.asarray([1.0, 0.0]))
    dy = ndc(center + jnp.asarray([0.0, 1.0]))

    t0 = _unproject(d, inv_proj)
    tx = _unproject(dx, inv_proj)
    ty = _unproject(dy, inv_proj)

    cam_origin = inv_view[:3, 3]

    if lens_u1 is None:
        origin = jnp.broadcast_to(cam_origin, t0.shape)
        main = Rays(origin, _to_world_dir(_normalize(t0), inv_view))
        rx = Rays(origin, _to_world_dir(_normalize(tx), inv_view))
        ry = Rays(origin, _to_world_dir(_normalize(ty), inv_view))
        return main, rx, ry

    # thin lens: origin on the lens disk, directions through the focal plane
    lx, ly = sample_uniform_disk_concentric(lens_u1, lens_u2)
    p_lens = jnp.stack([lx, ly, jnp.zeros_like(lx)], axis=-1) * lens_radius
    o4 = jnp.concatenate([p_lens, jnp.ones_like(p_lens[..., :1])], axis=-1)
    origin = jnp.einsum("ij,...j->...i", inv_view, o4)[..., :3]

    def lens_dir(target):
        ft = focal_distance / target[..., 2:3]
        p_focus = ft * target
        return _to_world_dir(_normalize(p_focus - p_lens), inv_view)

    return (Rays(origin, lens_dir(t0)),
            Rays(origin, lens_dir(tx)),
            Rays(origin, lens_dir(ty)))


def offset_ray_origin_self_intersection(origin, normal):
    """Integer-ulp origin offset along the normal
    (≙ offsetRayOriginSelfIntersection, ray.glsl:101-115)."""
    of_i = (_INT_SCALE * normal).astype(jnp.int32)
    o_bits = jax.lax.bitcast_convert_type(origin, jnp.int32)
    shifted = jnp.where(origin < 0.0, o_bits - of_i, o_bits + of_i)
    p_i = jax.lax.bitcast_convert_type(shifted, jnp.float32)
    near_origin = jnp.abs(origin) < _ORIGIN_CONST
    return jnp.where(near_origin, origin + _FLOAT_SCALE * normal, p_i)


def offset_ray_origin_shadow_terminator(position, bary, p0, p1, p2,
                                        n0, n1, n2, is_refracted):
    """Hit-point offset onto the interpolated-normal bound planes
    (≙ offsetRayOriginShadowTerminator, ray.glsl:117-131). `bary` is
    (..., 3); per-vertex positions/normals are (..., 3)."""
    sign = jnp.where(is_refracted[..., None], -1.0, 1.0)
    n0, n1, n2 = n0 * sign, n1 * sign, n2 * sign
    tmpu = position - p0
    tmpv = position - p1
    tmpw = position - p2
    tmpu = tmpu - jnp.minimum(0.0, jnp.sum(tmpu * n0, -1))[..., None] * n0
    tmpv = tmpv - jnp.minimum(0.0, jnp.sum(tmpv * n1, -1))[..., None] * n1
    tmpw = tmpw - jnp.minimum(0.0, jnp.sum(tmpw * n2, -1))[..., None] * n2
    return (position + bary[..., 0:1] * tmpu + bary[..., 1:2] * tmpv
            + bary[..., 2:3] * tmpw)
