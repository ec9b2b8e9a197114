"""ctypes bindings for the native (C++) setup kernels.

The TPU compute path is jitted XLA; the host-side setup runtime — point
location, basis tabulation at scattered reference points, COO deduplication,
compact-AL dense accumulation — is native C++ (native/fdal_setup.cpp), the
role deal.II/Trilinos' C++ plays in the reference (N1/N5/N6/N12).  Every entry
point has a NumPy fallback, so the framework works without the shared library;
``available()`` reports which path is active.

The library is built on first use with ``make -C native`` (g++ -O3).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["available", "locate_points", "tabulate", "coo_dedup",
           "accumulate_al"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfdal_setup.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(
            os.path.join(_NATIVE_DIR, "Makefile")):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.fdal_locate_points.argtypes = [f64p, ctypes.c_int64, ctypes.c_int,
                                       f64p, f64p, i64p, i64p, f64p]
    lib.fdal_tabulate.argtypes = [f64p, ctypes.c_int64, ctypes.c_int, f64p,
                                  ctypes.c_int, f64p]
    lib.fdal_coo_dedup.argtypes = [i64p, i64p, f64p, ctypes.c_int64,
                                   ctypes.c_int64]
    lib.fdal_coo_dedup.restype = ctypes.c_int64
    lib.fdal_accumulate_al.argtypes = [i64p, f64p, f64p, ctypes.c_int64,
                                       ctypes.c_int, ctypes.c_int64, f64p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def locate_points(points, origin, h, ncells):
    """Uniform-grid point location (native; falls back to grid.locate)."""
    lib = _load()
    points = np.ascontiguousarray(points, dtype=np.float64)
    n, dim = points.shape
    if lib is None:
        rel = (points - np.asarray(origin)) / np.asarray(h)
        mi = np.clip(np.floor(rel).astype(np.int64), 0,
                     np.asarray(ncells) - 1)
        ref = rel - mi
        strides = np.cumprod([1] + list(ncells[:-1]))
        return (mi @ strides).astype(np.int64), ref
    origin = np.ascontiguousarray(origin, dtype=np.float64)
    h = np.ascontiguousarray(h, dtype=np.float64)
    nc = np.ascontiguousarray(ncells, dtype=np.int64)
    cells = np.empty(n, dtype=np.int64)
    ref = np.empty((n, dim), dtype=np.float64)
    lib.fdal_locate_points(_ptr(points, ctypes.c_double), n, dim,
                           _ptr(origin, ctypes.c_double),
                           _ptr(h, ctypes.c_double),
                           _ptr(nc, ctypes.c_int64),
                           _ptr(cells, ctypes.c_int64),
                           _ptr(ref, ctypes.c_double))
    return cells, ref


def tabulate(points, nodes_1d, dim):
    """Tensor Lagrange values at reference points (native; numpy fallback)."""
    lib = _load()
    points = np.ascontiguousarray(np.atleast_2d(points), dtype=np.float64)
    n = points.shape[0]
    n_nodes = len(nodes_1d)
    if lib is None:
        from .core.fe import FE

        fe = FE(dim, n_nodes - 1)
        return fe.tabulate(points)
    nodes = np.ascontiguousarray(nodes_1d, dtype=np.float64)
    out = np.empty((n, n_nodes ** dim), dtype=np.float64)
    lib.fdal_tabulate(_ptr(points, ctypes.c_double), n, dim,
                      _ptr(nodes, ctypes.c_double), n_nodes,
                      _ptr(out, ctypes.c_double))
    return out


def coo_dedup(rows, cols, vals, ncols):
    """Sort + sum-duplicates for COO triplets (native; numpy fallback)."""
    lib = _load()
    if lib is None:
        from .ops.sparse import coo_dedup as np_dedup

        return np_dedup(rows, cols, vals, ncols)
    rows = np.ascontiguousarray(rows, dtype=np.int64).copy()
    cols = np.ascontiguousarray(cols, dtype=np.int64).copy()
    vals = np.ascontiguousarray(vals, dtype=np.float64).copy()
    n = lib.fdal_coo_dedup(_ptr(rows, ctypes.c_int64),
                           _ptr(cols, ctypes.c_int64),
                           _ptr(vals, ctypes.c_double), len(vals),
                           np.int64(ncols))
    return rows[:n], cols[:n], vals[:n]


def accumulate_al(idx, phi, w, m):
    """Dense compact-AL accumulation A[idx_a, idx_b] += phi_a phi_b w
    (native; numpy add.at fallback)."""
    lib = _load()
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    phi = np.ascontiguousarray(phi, dtype=np.float64)
    w = np.ascontiguousarray(w, dtype=np.float64)
    nq, nloc = idx.shape
    if lib is None:
        A = np.zeros((m, m))
        contrib = np.einsum("qa,qb,q->qab", phi, phi, w)
        np.add.at(A, (idx[:, :, None], idx[:, None, :]), contrib)
        return A
    A = np.zeros((m, m), dtype=np.float64)
    lib.fdal_accumulate_al(_ptr(idx, ctypes.c_int64),
                           _ptr(phi, ctypes.c_double),
                           _ptr(w, ctypes.c_double), nq, nloc, m,
                           _ptr(A, ctypes.c_double))
    return A
