"""Native (C++) runtime components, loaded via ctypes.

The shared library is built on demand from graph_ops.cc with the system
compiler (no Python.h / pybind11 dependency — raw pointers from numpy).
Every entry point has a pure-Python fallback, so the framework works even
without a toolchain; the native path removes host-side traversal overhead
on large scenes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libgraph_ops.so"
_lib = None
_tried = False


def _build() -> bool:
    src = _HERE / "graph_ops.cc"
    for cc in ("c++", "g++", "cc"):
        try:
            res = subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", str(src), "-o", str(_LIB_PATH)],
                capture_output=True,
                timeout=120,
            )
            if res.returncode == 0:
                return True
        except (OSError, subprocess.TimeoutExpired):
            continue
    return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        src = _HERE / "graph_ops.cc"
        stale = (
            _LIB_PATH.exists()
            and src.exists()
            and _LIB_PATH.stat().st_mtime < src.stat().st_mtime
        )
        if not _LIB_PATH.exists() or stale:
            if not _build():
                return None
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.bfs_transitive.restype = ctypes.c_int64
        lib.bfs_transitive.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.bfs_component.restype = ctypes.c_int64
        lib.bfs_component.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.expand_complete_candidates.restype = ctypes.c_int64
        lib.expand_complete_candidates.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.expand_merge_pairs.restype = ctypes.c_int64
        lib.expand_merge_pairs.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


class GraphTraversal:
    """ctypes wrapper holding the per-graph scratch buffer."""

    def __init__(self, indptr: np.ndarray, adj: np.ndarray):
        self.indptr = np.ascontiguousarray(indptr, dtype=np.int64)
        self.adj = np.ascontiguousarray(adj, dtype=np.int64)
        self.num_nodes = len(self.indptr) - 1
        self._visited = np.zeros(max(self.num_nodes, 1), dtype=np.uint8)
        self._lib = get_lib()

    @property
    def native(self) -> bool:
        return self._lib is not None

    def bfs_transitive(self, start: int, transitivity: int) -> np.ndarray:
        out = np.empty(max(self.num_nodes, 1), dtype=np.int64)
        n = self._lib.bfs_transitive(
            _ptr(self.indptr), _ptr(self.adj), self.num_nodes, start,
            transitivity, _ptr(out), len(out), _ptr(self._visited),
        )
        return out[: min(n, len(out))]

    def bfs_component(self, seeds: np.ndarray, max_depth: int,
                      eligible: np.ndarray):
        seeds = np.ascontiguousarray(seeds, dtype=np.int64)
        eligible = np.ascontiguousarray(eligible, dtype=np.uint8)
        out = np.empty(max(self.num_nodes, 1), dtype=np.int64)
        depth = np.empty(max(self.num_nodes, 1), dtype=np.int32)
        n = self._lib.bfs_component(
            _ptr(self.indptr), _ptr(self.adj), self.num_nodes, _ptr(seeds),
            len(seeds), max_depth, _ptr(eligible), _ptr(out), _ptr(depth),
            len(out), _ptr(self._visited),
        )
        n = min(n, len(out))
        return out[:n], depth[:n]

    def expand_complete_candidates(self, node_image, flat_pid, reg_flag,
                                   src_nodes):
        """(target nodes, source pids) for unlinked registered targets of
        the source nodes' edges, deduped by target (first pid wins)."""
        node_image = np.ascontiguousarray(node_image, dtype=np.int32)
        flat_pid = np.ascontiguousarray(flat_pid, dtype=np.int64)
        reg_flag = np.ascontiguousarray(reg_flag, dtype=np.uint8)
        src_nodes = np.ascontiguousarray(src_nodes, dtype=np.int64)
        cap = max(self.num_nodes, 1)
        out_tgt = np.empty(cap, dtype=np.int64)
        out_pid = np.empty(cap, dtype=np.int64)
        n = self._lib.expand_complete_candidates(
            _ptr(self.indptr), _ptr(self.adj), _ptr(node_image),
            _ptr(flat_pid), _ptr(reg_flag), _ptr(src_nodes), len(src_nodes),
            _ptr(out_tgt), _ptr(out_pid), cap, _ptr(self._visited),
        )
        n = min(n, cap)
        return out_tgt[:n], out_pid[:n]

    def expand_merge_pairs(self, flat_pid, src_nodes):
        """Unique packed (min_pid << 32 | max_pid) codes of linked-linked
        edges with distinct pids among the source nodes' edges."""
        flat_pid = np.ascontiguousarray(flat_pid, dtype=np.int64)
        src_nodes = np.ascontiguousarray(src_nodes, dtype=np.int64)
        degs = self.indptr[src_nodes + 1] - self.indptr[src_nodes]
        cap = int(degs.sum()) + 1  # exact bound: one code per edge
        out = np.empty(cap, dtype=np.int64)
        n = self._lib.expand_merge_pairs(
            _ptr(self.indptr), _ptr(self.adj), _ptr(flat_pid),
            _ptr(src_nodes), len(src_nodes), _ptr(out), cap,
        )
        return out[: min(n, cap)]
