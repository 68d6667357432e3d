"""ctypes bindings for the native C++ runtime kernels (native/stark_native.cc).

The reference's runtime is C++ (vtkio writer, mesh_utils topology, symx RCM
ordering); this module is the TPU build's native layer. Loading is lazy and
optional: if the shared library is missing it is built once with g++ (the
toolchain is part of the deployment image); if that fails, callers fall back
to the pure-numpy implementations so the framework never hard-depends on a
compiler at runtime.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libstark_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("STARK_TPU_NO_NATIVE") == "1":
            return None
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.sn_write_vtk.argtypes = [ctypes.c_char_p, f64p, ctypes.c_int64,
                                     i64p, ctypes.c_int64, ctypes.c_int32,
                                     ctypes.c_int32]
        lib.sn_write_vtk.restype = ctypes.c_int
        lib.sn_find_edges.argtypes = [i64p, ctypes.c_int64, ctypes.c_int32,
                                      i64p, ctypes.c_int64]
        lib.sn_find_edges.restype = ctypes.c_int64
        lib.sn_find_internal_edges.argtypes = [i64p, ctypes.c_int64, i64p,
                                               ctypes.c_int64]
        lib.sn_find_internal_edges.restype = ctypes.c_int64
        lib.sn_find_surface.argtypes = [i64p, ctypes.c_int64, i64p,
                                        ctypes.c_int64]
        lib.sn_find_surface.restype = ctypes.c_int64
        lib.sn_rcm_order.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, i64p]
        lib.sn_rcm_order.restype = None
        _lib = lib
        return _lib


# ---------------------------------------------------------------------------
# typed wrappers (None return -> caller uses the numpy fallback)
# ---------------------------------------------------------------------------

def write_vtk_binary(path: str, vertices: np.ndarray, conn: np.ndarray,
                     cell_type: int) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    vertices = np.ascontiguousarray(vertices, dtype=np.float64).reshape(-1, 3)
    conn = np.ascontiguousarray(conn, dtype=np.int64)
    if conn.ndim == 1:
        conn = conn.reshape(-1, 1)
    rc = lib.sn_write_vtk(path.encode(), vertices, len(vertices), conn,
                          conn.shape[0], conn.shape[1], cell_type)
    return rc == 0


def find_edges(simplices: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    simplices = np.ascontiguousarray(simplices, dtype=np.int64)
    n, k = simplices.shape
    cap = n * k * (k - 1) // 2 + 1
    out = np.empty((cap, 2), dtype=np.int64)
    cnt = lib.sn_find_edges(simplices, n, k, out, cap)
    return out[:cnt].copy()


def find_internal_edges(triangles: np.ndarray) -> Optional[np.ndarray]:
    """Rows [e0, e1, wing_a, wing_b] for every internal triangle edge."""
    lib = get_lib()
    if lib is None:
        return None
    triangles = np.ascontiguousarray(triangles, dtype=np.int64)
    n = len(triangles)
    cap = 3 * n // 2 + 1
    out = np.empty((cap, 4), dtype=np.int64)
    cnt = lib.sn_find_internal_edges(triangles, n, out, cap)
    return out[:cnt].copy()


def find_surface_triangles(tets: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    tets = np.ascontiguousarray(tets, dtype=np.int64)
    n = len(tets)
    cap = 4 * n + 1
    out = np.empty((cap, 3), dtype=np.int64)
    cnt = lib.sn_find_surface(tets, n, out, cap)
    return out[:cnt].copy()


def rcm_order(edges: np.ndarray, n_nodes: int) -> Optional[np.ndarray]:
    """RCM permutation (new->old) from an undirected edge list."""
    lib = get_lib()
    if lib is None:
        return None
    edges = np.ascontiguousarray(edges, dtype=np.int64).reshape(-1, 2)
    out = np.empty(n_nodes, dtype=np.int64)
    lib.sn_rcm_order(edges, len(edges), n_nodes, out)
    return out
