"""ctypes bindings for the native mesh-compiler kernels.

Loads ``native/libmeshcompiler.so`` (built by ``native/build.sh``; the
first import attempts an automatic build).  All entry points fall back
to numpy implementations in :mod:`smoothmesh_tpu.mesh.topology` when
the library is unavailable, so the framework works without a C++
toolchain — but 10M-cell mesh compilation wants the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(root, "native", "libmeshcompiler.so")
    if not os.path.exists(so):
        build = os.path.join(root, "native", "build.sh")
        if os.path.exists(build):
            try:
                subprocess.run(["sh", build], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    # Index arrays are int32 (ids fit 2^31 at 10M-cell scale; halves
    # the setup-path peak RSS); sizes/offsets stay int64.
    lib.build_edges.restype = ctypes.c_int64
    lib.build_edges.argtypes = [i32p, i64p, ctypes.c_int64,
                                ctypes.c_int64, i32p, i32p]
    lib.group_counts.restype = None
    lib.group_counts.argtypes = [i32p, ctypes.c_int64, i32p]
    lib.group_fill.restype = None
    lib.group_fill.argtypes = [i32p, i32p, ctypes.c_int64, ctypes.c_int64,
                               i32p, i32p, u8p]
    lib.group_fill_dedup.restype = None
    lib.group_fill_dedup.argtypes = lib.group_fill.argtypes
    lib.edge_cell_face_pairs.restype = ctypes.c_int64
    lib.edge_cell_face_pairs.argtypes = [i32p, u8p, i32p, u8p, i32p,
                                         i32p, ctypes.c_int64,
                                         ctypes.c_int64, ctypes.c_int64,
                                         i32p, i32p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _lib() is not None


def _p32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _p64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _pu8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def build_edges(flat: np.ndarray, offsets: np.ndarray,
                n_points: int) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Unique undirected edges + per-perimeter-entry edge ids.

    Returns (edges (E,2), edge_of_pair (M,)) in first-appearance order,
    or None if the native library is unavailable.
    """
    lib = _lib()
    if lib is None:
        return None
    flat = np.ascontiguousarray(flat, dtype=np.int32)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    m = int(offsets[-1])
    edge_of_pair = np.empty(m, dtype=np.int32)
    edges_buf = np.empty((m, 2), dtype=np.int32)
    n_faces = len(offsets) - 1
    n_edges = lib.build_edges(_p32(flat), _p64(offsets), n_faces,
                              n_points, _p32(edge_of_pair),
                              _p32(edges_buf))
    if n_edges < 0:
        raise ValueError("native build_edges: face point label out of range")
    return edges_buf[:n_edges].copy(), edge_of_pair


def pad_groups_native(keys: np.ndarray, nrows: int, vals: np.ndarray,
                      dedupe: bool = False
                      ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(mask, padded) like topology.pad_groups but preserving input
    order within rows, built in O(M)."""
    lib = _lib()
    if lib is None:
        return None
    keys = np.ascontiguousarray(keys, dtype=np.int32)
    vals = np.ascontiguousarray(vals, dtype=np.int32)
    m = len(keys)
    counts = np.zeros(nrows, dtype=np.int32)
    lib.group_counts(_p32(keys), m, _p32(counts))
    width = max(int(counts.max(initial=0)), 1)
    out = np.zeros((nrows, width), dtype=np.int32)
    mask = np.zeros((nrows, width), dtype=np.uint8)
    cursor = np.zeros(nrows, dtype=np.int32)
    fill = lib.group_fill_dedup if dedupe else lib.group_fill
    fill(_p32(keys), _p32(vals), m, width, _p32(cursor), _p32(out),
         _pu8(mask))
    # trim over-wide dedup output
    used = int(cursor.max(initial=0)) if dedupe else width
    return mask[:, :used].astype(bool), out[:, :used]


def edge_cell_face_pairs(edge_faces, ef_mask, edge_cells, ec_mask,
                         owner, neighbour_full):
    """Per-(edge, cell) face-pair slots, or None without the library.

    ``neighbour_full`` has -1 for boundary faces.  Raises ValueError on
    the reference's findCellFacePair sanity violation.
    """
    lib = _lib()
    if lib is None:
        return None
    edge_faces = np.ascontiguousarray(edge_faces, dtype=np.int32)
    ef_mask = np.ascontiguousarray(ef_mask, dtype=np.uint8)
    edge_cells = np.ascontiguousarray(edge_cells, dtype=np.int32)
    ec_mask = np.ascontiguousarray(ec_mask, dtype=np.uint8)
    owner = np.ascontiguousarray(owner, dtype=np.int32)
    neighbour_full = np.ascontiguousarray(neighbour_full, dtype=np.int32)
    E, wf = edge_faces.shape
    wc = edge_cells.shape[1]
    f0 = np.zeros((E, wc), dtype=np.int32)
    f1 = np.zeros((E, wc), dtype=np.int32)
    rc = lib.edge_cell_face_pairs(
        _p32(edge_faces), _pu8(ef_mask), _p32(edge_cells), _pu8(ec_mask),
        _p32(owner), _p32(neighbour_full), E, wc, wf, _p32(f0), _p32(f1))
    if rc != 0:
        raise ValueError(
            "mesh sanity: edge/cell with != 2 adjacent edge-faces")
    return f0, f1
