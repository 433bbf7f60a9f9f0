"""ctypes bridge to the native C++ acceleration-structure builder.

The reference's fast-trace BVH builds happen in the Vulkan driver's native
code; here `csrc/sah_bvh.cpp` fills that role for static scenes. The
shared library is compiled on demand with g++ (no pybind11 in this
environment — plain C ABI + ctypes) and cached next to the source; absence
of a compiler degrades gracefully to the device Morton builder.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_SRC = pathlib.Path(__file__).resolve().parent.parent.parent / "csrc" / "sah_bvh.cpp"
_LIB_DIR = _SRC.parent / ".build"
_LIB = _LIB_DIR / "libptsah.so"
_lock = threading.Lock()
_lib_handle: Optional[ctypes.CDLL] = None
_lib_failed = False


def _compile() -> bool:
    _LIB_DIR.mkdir(exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           str(_SRC), "-o", str(_LIB)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib_handle, _lib_failed
    with _lock:
        if _lib_handle is not None or _lib_failed:
            return _lib_handle
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _compile():
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            _lib_failed = True
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.pt_build_sah_bvh.restype = ctypes.c_int
        lib.pt_build_sah_bvh.argtypes = [f32p, f32p, f32p, ctypes.c_int,
                                         ctypes.c_int, i32p, f32p, f32p,
                                         i32p, i32p, i32p, ctypes.c_int]
        lib.pt_build_sbvh.restype = ctypes.c_int
        lib.pt_build_sbvh.argtypes = [f32p, f32p, f32p, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int, i32p,
                                      f32p, f32p, i32p, i32p, i32p, i32p,
                                      ctypes.c_float, ctypes.c_int,
                                      ctypes.c_float, ctypes.c_int]
        _lib_handle = lib
        return lib


def sah_available() -> bool:
    return _load() is not None


# Distinct sentinel returned when a build aborts on its node budget
# (callers retry at a coarser block) — None still means "native builder
# unavailable".
OVERFLOW = object()


def build_sah(tri_lo: np.ndarray, tri_hi: np.ndarray, centroids: np.ndarray,
              max_leaf: int, max_nodes: int = 0):
    """Run the native binned-SAH build.

    Inputs are (T, 3) float32 arrays. Returns (order, node_lo, node_hi,
    miss, leaf_start, leaf_count) in threaded preorder, None when the
    native library is unavailable, or OVERFLOW when `max_nodes` > 0 and
    the build exceeded it (aborted mid-build — retry a coarser block
    without paying for the rest of the infeasible tree).
    """
    lib = _load()
    if lib is None:
        return None
    t = tri_lo.shape[0]
    tri_lo = np.ascontiguousarray(tri_lo, np.float32)
    tri_hi = np.ascontiguousarray(tri_hi, np.float32)
    centroids = np.ascontiguousarray(centroids, np.float32)
    cap = 2 * t + 1
    order = np.zeros(t, np.int32)
    node_lo = np.zeros((cap, 3), np.float32)
    node_hi = np.zeros((cap, 3), np.float32)
    miss = np.zeros(cap, np.int32)
    leaf_start = np.zeros(cap, np.int32)
    leaf_count = np.zeros(cap, np.int32)

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    as_f = lambda a: a.ctypes.data_as(f32p)
    as_i = lambda a: a.ctypes.data_as(i32p)
    n = lib.pt_build_sah_bvh(as_f(tri_lo), as_f(tri_hi), as_f(centroids),
                             t, max_leaf, as_i(order), as_f(node_lo),
                             as_f(node_hi), as_i(miss), as_i(leaf_start),
                             as_i(leaf_count), max_nodes)
    if n == -2:
        return OVERFLOW
    if n <= 0:
        return None
    return (order, node_lo[:n], node_hi[:n], miss[:n], leaf_start[:n],
            leaf_count[:n])


def build_sbvh(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
               max_leaf: int,
               ref_budget: float = 1.75,
               alpha: float = 1e-5,
               max_nodes: int = 0,
               presplit_mult: float = 0.0,
               spatial_min_count: int = 0):
    """Run the native SBVH build (binned SAH + spatial splits, Stich et
    al. 2009). Triangles may be referenced by several leaves with clipped
    bounds, so `order` is a reference list (len ≥ T) rather than a
    permutation. Inputs are (T, 3) float32 vertex arrays; `ref_budget`
    caps total references at budget·T; `alpha` is the Stich overlap gate
    (spatial splits are tried only when the object split's children
    overlap by more than alpha·root_area — raise it to trade tree quality
    for build speed; when no valid object split exists at all, degenerate
    centroid-coincident ranges still try spatial splits ungated).
    `presplit_mult` > 0 pre-splits references whose bounds exceed
    presplit_mult x the mean triangle-box area before the recursion
    (Ernst & Greiner 2007 early split clipping; spends at most half the
    duplication budget). `spatial_min_count` > 0 restricts per-node
    spatial tries to nodes holding at least that many references
    (top-level-only spatial splits). Returns (order, node_lo, node_hi,
    miss, leaf_start, leaf_count) in threaded preorder, None when the
    native library is unavailable, or OVERFLOW when `max_nodes` > 0 and
    the build exceeded it.
    """
    lib = _load()
    if lib is None:
        return None
    t = v0.shape[0]
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    max_refs = max(t, int(ref_budget * t) + 16)
    cap = 2 * max_refs + 1
    order = np.zeros(max_refs, np.int32)
    node_lo = np.zeros((cap, 3), np.float32)
    node_hi = np.zeros((cap, 3), np.float32)
    miss = np.zeros(cap, np.int32)
    leaf_start = np.zeros(cap, np.int32)
    leaf_count = np.zeros(cap, np.int32)
    nrefs = np.zeros(1, np.int32)

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    as_f = lambda a: a.ctypes.data_as(f32p)
    as_i = lambda a: a.ctypes.data_as(i32p)
    n = lib.pt_build_sbvh(as_f(v0), as_f(v1), as_f(v2), t, max_leaf,
                          max_refs, as_i(order), as_f(node_lo),
                          as_f(node_hi), as_i(miss), as_i(leaf_start),
                          as_i(leaf_count), as_i(nrefs),
                          ctypes.c_float(alpha), max_nodes,
                          ctypes.c_float(presplit_mult),
                          spatial_min_count)
    if n == -2:
        return OVERFLOW
    if n <= 0:
        return None
    return (order[:int(nrefs[0])], node_lo[:n], node_hi[:n], miss[:n],
            leaf_start[:n], leaf_count[:n])
