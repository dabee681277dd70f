"""ctypes binding for the native host runtime (native/mv_native.cpp).

Lazy-compiles the shared library with g++ on first use and caches it next to
the source; every entry point has a pure-Python fallback so the package
works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "mv_native.cpp"
_LIB = _SRC.with_suffix(".so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not _LIB.exists()
                or _LIB.stat().st_mtime < _SRC.stat().st_mtime):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 str(_SRC), "-o", str(_LIB)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_LIB))
        lib.mv_union_find.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            np.ctypeslib.ndpointer(np.int64, flags="C")]
        lib.mv_dedup_keypoints.restype = ctypes.c_int64
        lib.mv_dedup_keypoints.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C")]
        lib.mv_read_files.argtypes = [
            ctypes.c_int64, ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def union_find_roots(n_nodes: int, edges: np.ndarray) -> np.ndarray:
    """Final root per node after merging edge pairs [E,2]. Native when
    available, NumPy/python fallback otherwise."""
    edges = np.ascontiguousarray(edges, np.int64)
    lib = _load()
    out = np.empty(n_nodes, np.int64)
    if lib is not None:
        a = np.ascontiguousarray(edges[:, 0])
        b = np.ascontiguousarray(edges[:, 1])
        lib.mv_union_find(n_nodes, len(edges), a, b, out)
        return out
    # fallback
    parent = np.arange(n_nodes, dtype=np.int64)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for ea, eb in edges:
        ra, rb = find(int(ea)), find(int(eb))
        if ra != rb:
            parent[rb] = ra
    for i in range(n_nodes):
        out[i] = find(i)
    return out


def dedup_keypoints_array(xy: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(ids [N], unique_xy [U,2]) with bit-exact float matching."""
    xy = np.ascontiguousarray(xy, np.float64)
    n = len(xy)
    lib = _load()
    if lib is not None and n > 0:
        ids = np.empty(n, np.int64)
        uniq = np.empty((n, 2), np.float64)
        u = lib.mv_dedup_keypoints(n, xy, ids, uniq)
        return ids, uniq[:u].copy()
    # fallback
    seen = {}
    ids = np.empty(n, np.int64)
    uniq: List[np.ndarray] = []
    for i in range(n):
        key = (xy[i, 0].tobytes(), xy[i, 1].tobytes())
        if key not in seen:
            seen[key] = len(uniq)
            uniq.append(xy[i])
        ids[i] = seen[key]
    return ids, (np.stack(uniq) if uniq else np.zeros((0, 2)))


def read_files(paths: List[str], num_threads: int = 0) -> List[Optional[bytes]]:
    """Read many files concurrently (native thread pool); None for errors."""
    lib = _load()
    if lib is None:
        out = []
        for p in paths:
            try:
                out.append(Path(p).read_bytes())
            except OSError:
                out.append(None)
        return out
    n = len(paths)
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    sizes = np.empty(n, np.int64)
    offsets = np.empty(n, np.int64)
    lib.mv_read_files(n, blob, sizes, offsets, None, 0, num_threads)
    total = int(sum(s for s in sizes if s > 0))
    buf = np.empty(total, np.uint8)
    lib.mv_read_files(n, blob, sizes, offsets,
                      buf.ctypes.data_as(ctypes.c_void_p), total, num_threads)
    out = []
    for i in range(n):
        if sizes[i] < 0:
            out.append(None)
        else:
            off = int(offsets[i])
            out.append(bytes(buf[off:off + int(sizes[i])]))
    return out
