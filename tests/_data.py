"""Edge-case input generators for numerical-robustness tests.

Mirrors the reference's combinatorial generators (Path-Tracing-Tests/
TestData.h:14-101): near-axis unit vectors and near-0/near-1 floats, which
drive the shading tests that assert no NaN/Inf ever escapes the math.
"""

import itertools

import numpy as np

_EPSES = [0.0, 1e-7, 1e-4, 1e-2]


def edge_floats():
    """Floats crowding 0 and 1 from both sides, plus midpoints."""
    vals = set()
    for e in _EPSES:
        for base in (0.0, 1.0):
            for v in (base + e, base - e):
                if 0.0 <= v <= 1.0:
                    vals.add(v)
    vals.update([0.25, 0.5, 0.75])
    return np.array(sorted(vals), np.float32)


def near_axis_unit_vectors():
    """Unit vectors at and near the coordinate axes (both hemispheres)."""
    vecs = []
    for axis, sign in itertools.product(range(3), (1.0, -1.0)):
        for e in _EPSES:
            v = np.zeros(3)
            v[axis] = sign
            v[(axis + 1) % 3] = e
            v[(axis + 2) % 3] = -e / 2
            vecs.append(v / np.linalg.norm(v))
    return np.asarray(vecs, np.float32)


def random_unit_vectors(n=256, seed=0, upper=False):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    if upper:
        v[:, 2] = np.abs(v[:, 2])
    return v.astype(np.float32)


def upper_unit_vectors():
    """Edge + random vectors constrained to z >= 0 (shading-space V)."""
    v = np.concatenate([near_axis_unit_vectors(), random_unit_vectors(64)])
    v[:, 2] = np.abs(v[:, 2])
    n = np.linalg.norm(v, axis=-1, keepdims=True)
    return (v / n).astype(np.float32)
