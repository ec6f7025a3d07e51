"""ctypes bindings for the native C++ setup/graph kernels.

The library (src/calibr8_native.cpp) is compiled on first use with the
system g++ and cached next to this file; every entry point has a pure
numpy fallback in its caller, so the framework works (slower at setup)
without a compiler.  Compute never goes through here — only CPU-side
mesh/graph machinery (incidence tables, edge graphs, refinement), the
analog of the reference's native PUMI/apf mesh layer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "calibr8_native.cpp")
_LIB = os.path.join(_HERE, "libcalibr8_native.so")

_lib = None
_tried = False


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("CALIBR8_NATIVE", "1") == "0":
        return None
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(
            _SRC
        ):
            if not _compile():
                return None
        lib = ctypes.CDLL(_LIB)
    except Exception:
        return None

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

    lib.c8_max_degree.restype = ctypes.c_int32
    lib.c8_max_degree.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32]
    lib.c8_node_incidence.restype = None
    lib.c8_node_incidence.argtypes = [
        i32p,
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        i32p,
    ]
    lib.c8_unique_edges.restype = ctypes.c_int64
    lib.c8_unique_edges.argtypes = [i64p, ctypes.c_int64, i64p, i64p]
    lib.c8_refine_children.restype = None
    lib.c8_refine_children.argtypes = [
        i64p,
        ctypes.c_int64,
        ctypes.c_int32,
        i64p,
        f64p,
        i64p,
        i64p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def node_incidence(ids: np.ndarray, n_nodes: int):
    """(n_slots,) int node ids -> (n_nodes, K) padded slot table, or
    None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    ids = np.ascontiguousarray(ids, np.int32)
    n = ids.shape[0]
    K = int(lib.c8_max_degree(ids, n, n_nodes)) if n else 1
    inc = np.full((n_nodes, max(K, 1)), n, np.int32)
    if n:
        lib.c8_node_incidence(ids, n, n_nodes, inc.shape[1], inc)
    return inc


def unique_edges(pairs: np.ndarray):
    """(m, 2) sorted-row pairs -> (uniq (n,2), inv (m,)) like
    np.unique(axis=0, return_inverse=True), or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    pairs = np.ascontiguousarray(pairs, np.int64)
    m = pairs.shape[0]
    uniq = np.empty((m, 2), np.int64)
    inv = np.empty(m, np.int64)
    n = int(lib.c8_unique_edges(pairs, m, uniq, inv))
    return uniq[:n].copy(), inv


def refine_children(conn: np.ndarray, dim: int, mids: np.ndarray,
                    coords: np.ndarray):
    """Uniform simplex refinement children with positive orientation.
    conn (E, npe), mids (n_pairs, E) midpoint node ids, coords
    (n_all_nodes, dim).  Returns (fine_conn (E*nchild, npe), parent) or
    None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    conn = np.ascontiguousarray(conn, np.int64)
    mids = np.ascontiguousarray(mids, np.int64)
    coords = np.ascontiguousarray(coords, np.float64)
    E, npe = conn.shape
    nchild = 4 if dim == 2 else 8
    fine = np.empty((E * nchild, npe), np.int64)
    parent = np.empty(E * nchild, np.int64)
    lib.c8_refine_children(conn, E, dim, mids, coords, fine, parent)
    return fine, parent
