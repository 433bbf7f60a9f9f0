"""Ray-triangle intersection tests (the brute backend is the correctness
oracle all BVH backends are checked against)."""

import numpy as np
import jax.numpy as jnp

from pt.accel.intersect import intersect_brute, occluded_brute


def _tri_scene():
    # one unit triangle in z=0 plane + one behind it at z=2
    positions = jnp.asarray(np.array([
        [0, 0, 0], [1, 0, 0], [0, 1, 0],
        [0, 0, 2], [1, 0, 2], [0, 1, 2],
    ], np.float32))
    tri_idx = jnp.asarray(np.array([[0, 1, 2], [3, 4, 5]], np.int32))
    return positions, tri_idx


def test_hit_front():
    pos, tri = _tri_scene()
    o = jnp.asarray([[0.2, 0.2, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    hit = intersect_brute(pos, tri, o, d)
    assert int(hit.tri[0]) == 0
    assert abs(float(hit.t[0]) - 1.0) < 1e-5
    # barycentric: P = (1-u-v)*v0 + u*v1 + v*v2 → u = x, v = y here
    assert abs(float(hit.u[0]) - 0.2) < 1e-5
    assert abs(float(hit.v[0]) - 0.2) < 1e-5


def test_closest_of_two():
    pos, tri = _tri_scene()
    o = jnp.asarray([[0.2, 0.2, -1.0], [0.2, 0.2, 1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    hit = intersect_brute(pos, tri, o, d)
    assert list(np.asarray(hit.tri)) == [0, 1]


def test_backface_hit():
    """Two-sided intersection (gl_RayFlagsNone semantics)."""
    pos, tri = _tri_scene()
    o = jnp.asarray([[0.2, 0.2, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = intersect_brute(pos, tri, o, d)
    assert int(hit.tri[0]) == 0


def test_miss():
    pos, tri = _tri_scene()
    o = jnp.asarray([[2.0, 2.0, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    hit = intersect_brute(pos, tri, o, d)
    assert int(hit.tri[0]) == -1
    assert not bool(hit.is_hit[0])


def test_tmax_respected():
    pos, tri = _tri_scene()
    o = jnp.asarray([[0.2, 0.2, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    hit = intersect_brute(pos, tri, o, d, tmax=jnp.asarray([0.5]))
    assert int(hit.tri[0]) == -1


def test_occlusion():
    pos, tri = _tri_scene()
    o = jnp.asarray([[0.2, 0.2, -1.0], [0.2, 0.2, 0.5], [2.0, 2.0, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 3)
    occ = occluded_brute(pos, tri, o, d, jnp.asarray([10.0, 2.0, 10.0]))
    assert list(np.asarray(occ)) == [True, True, False]


def test_parallel_ray_no_false_hit():
    pos, tri = _tri_scene()
    o = jnp.asarray([[0.2, 0.2, 0.5]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])   # parallel to both triangles
    hit = intersect_brute(pos, tri, o, d)
    assert int(hit.tri[0]) == -1


def test_many_rays_chunking():
    """Exercise the lax.map chunking path with a non-divisible ray count."""
    pos, tri = _tri_scene()
    n = 1000
    rng = np.random.default_rng(0)
    o = np.concatenate([rng.uniform(0.05, 0.28, (n, 2)),
                        np.full((n, 1), -1.0)], axis=1).astype(np.float32)
    d = np.tile(np.array([[0, 0, 1]], np.float32), (n, 1))
    hit = intersect_brute(pos, tri, jnp.asarray(o), jnp.asarray(d))
    tri_ids = np.asarray(hit.tri)
    inside = (o[:, 0] + o[:, 1]) <= 1.0
    np.testing.assert_array_equal(tri_ids[inside], 0)
