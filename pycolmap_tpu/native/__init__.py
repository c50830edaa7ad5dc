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
        lib.graph_min_cut.restype = ctypes.c_int64
        lib.graph_min_cut.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def min_cut(num_nodes: int, edge_u: np.ndarray, edge_v: np.ndarray,
            edge_cap: np.ndarray, net_cap: np.ndarray) -> np.ndarray:
    """s-t min-cut labels over an undirected graph with folded terminal
    capacities (net_cap > 0: source arc, < 0: sink arc). Returns uint8
    labels, 1 = source side. Native Dinic when available; a pure-Python
    Dinic fallback handles toolchain-less hosts (slow — fine for the
    test-scale graphs that path sees)."""
    edge_u = np.ascontiguousarray(edge_u, dtype=np.int64)
    edge_v = np.ascontiguousarray(edge_v, dtype=np.int64)
    edge_cap = np.ascontiguousarray(edge_cap, dtype=np.float32)
    net_cap = np.ascontiguousarray(net_cap, dtype=np.float32)
    lib = get_lib()
    if lib is not None:
        label = np.zeros(max(num_nodes, 1), dtype=np.uint8)
        n = lib.graph_min_cut(
            num_nodes, _ptr(edge_u), _ptr(edge_v), _ptr(edge_cap),
            len(edge_u), _ptr(net_cap), _ptr(label),
        )
        if n >= 0:
            return label[:num_nodes]
    return _min_cut_py(num_nodes, edge_u, edge_v, edge_cap, net_cap)


def _min_cut_py(n, eu, ev, ecap, net):
    """Pure-Python Dinic (adjacency lists of [to, cap, rev-index])."""
    S, T = n, n + 1
    graph = [[] for _ in range(n + 2)]

    def add(u, v, c, crev):
        graph[u].append([v, float(c), len(graph[v])])
        graph[v].append([u, float(crev), len(graph[u]) - 1])

    for u, v, c in zip(eu, ev, ecap):
        add(int(u), int(v), c, c)
    for i, c in enumerate(net):
        if c > 0:
            add(S, i, c, 0.0)
        elif c < 0:
            add(i, T, -c, 0.0)

    from collections import deque

    EPS = 1e-12
    level = [0] * (n + 2)

    def bfs():
        for i in range(n + 2):
            level[i] = -1
        dq = deque([S])
        level[S] = 0
        while dq:
            u = dq.popleft()
            for arc in graph[u]:
                if arc[1] > EPS and level[arc[0]] < 0:
                    level[arc[0]] = level[u] + 1
                    dq.append(arc[0])
        return level[T] >= 0

    def dfs(u, f, iters):
        if u == T:
            return f
        while iters[u] < len(graph[u]):
            arc = graph[u][iters[u]]
            v = arc[0]
            if arc[1] > EPS and level[v] == level[u] + 1:
                d = dfs(v, min(f, arc[1]), iters)
                if d > EPS:
                    arc[1] -= d
                    graph[v][arc[2]][1] += d
                    return d
            iters[u] += 1
        return 0.0

    import sys as _s

    old = _s.getrecursionlimit()
    _s.setrecursionlimit(max(old, n + 50))
    try:
        while bfs():
            iters = [0] * (n + 2)
            while dfs(S, float("inf"), iters) > EPS:
                pass
    finally:
        _s.setrecursionlimit(old)
    # residual-reachable from S
    label = np.zeros(max(n, 1), dtype=np.uint8)
    dq = deque([S])
    seen = np.zeros(n + 2, dtype=bool)
    seen[S] = True
    while dq:
        u = dq.popleft()
        for arc in graph[u]:
            if arc[1] > EPS and not seen[arc[0]]:
                seen[arc[0]] = True
                dq.append(arc[0])
    label[:n] = seen[:n]
    return label[:n]


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
