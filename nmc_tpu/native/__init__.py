"""Native (C++) host-side kernels with transparent fallback.

Builds cluster.cpp with g++ at first use (no pybind11 in this image; plain
C ABI via ctypes). If the toolchain or build is unavailable, callers fall
back to the pure-Python/scipy implementations in ops/clusters.py — the
native path is a performance optimization, not a semantic dependency
(parity-tested in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cluster.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_dir() -> str:
    # Per-user cache OUTSIDE the package tree (a checkout may be read-only
    # or shared across heterogeneous hosts), keyed by the host's CPU so an
    # ISA-incompatible .so from another machine is never loaded.
    import hashlib
    import platform
    host_key = hashlib.sha1(
        f"{platform.machine()}:{platform.processor()}:{os.uname().nodename}"
        .encode()).hexdigest()[:12]
    d = os.environ.get("NMC_TPU_NATIVE_CACHE") or os.path.join(
        os.path.expanduser("~/.cache/nmc_tpu_native"), host_key)
    os.makedirs(d, exist_ok=True)
    return d


def load_library() -> Optional[ctypes.CDLL]:
    """Build (once) and load the native library; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so_path = os.path.join(_build_dir(), "libnmccluster.so")
        try:
            if (not os.path.exists(so_path)
                    or os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", so_path, _SRC],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(so_path)
            lib.nmc_connected_components.restype = ctypes.c_int32
            lib.nmc_connected_components.argtypes = [
                ctypes.c_int32,
                np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ]
            lib.nmc_backbone_clusters.restype = ctypes.c_int32
            lib.nmc_backbone_clusters.argtypes = [
                ctypes.c_int32,
                np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available() -> bool:
    return load_library() is not None


class CSRAdjacency:
    """Reusable CSR adjacency of a (symmetric) J for the native kernels."""

    def __init__(self, J):
        from scipy.sparse import csr_matrix

        Jc = csr_matrix(np.asarray(
            J.toarray() if hasattr(J, "toarray") else J) != 0)
        Jc.sort_indices()
        self.indptr = Jc.indptr.astype(np.int64)
        self.indices = Jc.indices.astype(np.int32)
        self.n = Jc.shape[0]


def connected_components_masked(
    adj: CSRAdjacency, active: np.ndarray
) -> List[np.ndarray]:
    """Components of the subgraph induced by `active` nodes (native path).

    Returns a list of index arrays, ordered by smallest member — the same
    partition ops/clusters.disagreement_clusters produces.
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    labels = np.empty(adj.n, dtype=np.int32)
    ncomp = lib.nmc_connected_components(
        np.int32(adj.n), adj.indptr, adj.indices,
        np.ascontiguousarray(active, dtype=np.int8), labels)
    return [np.flatnonzero(labels == c) for c in range(ncomp)]


def backbone_clusters(
    adj: CSRAdjacency, magnetizations: np.ndarray,
    threshold_initial: float, threshold_cutoff: float,
    threshold_step: float,
) -> List[np.ndarray]:
    """Native find_clusters (semantics of /root/reference/NMC/nmc.py:257-318,
    membership identical to ops/clusters.find_clusters)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    cid = np.empty(adj.n, dtype=np.int32)
    ncl = lib.nmc_backbone_clusters(
        np.int32(adj.n), adj.indptr, adj.indices,
        np.ascontiguousarray(magnetizations, dtype=np.float64),
        float(threshold_initial), float(threshold_cutoff),
        float(threshold_step), cid)
    return [np.flatnonzero(cid == c) for c in range(ncl)]


_ENUM_SRC = os.path.join(_HERE, "enum.cpp")
_ENUM_LIB: Optional[ctypes.CDLL] = None
_ENUM_TRIED = False


def load_enum_library() -> Optional[ctypes.CDLL]:
    """Build (once) and load the exact-enumeration library; None if
    unavailable (callers fall back to the MITM device/host paths)."""
    global _ENUM_LIB, _ENUM_TRIED
    with _LOCK:
        if _ENUM_LIB is not None or _ENUM_TRIED:
            return _ENUM_LIB
        _ENUM_TRIED = True
        so_path = os.path.join(_build_dir(), "libnmcenum.so")
        try:
            if (not os.path.exists(so_path)
                    or os.path.getmtime(so_path)
                    < os.path.getmtime(_ENUM_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", so_path, _ENUM_SRC],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(so_path)
            common_tail = [
                np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                ctypes.c_longlong,
                np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ]
            lib.nmc_exact_enumerate.restype = ctypes.c_longlong
            lib.nmc_exact_enumerate.argtypes = [
                ctypes.c_int32,
                np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ] + common_tail
            lib.nmc_exact_enumerate_f32.restype = ctypes.c_longlong
            lib.nmc_exact_enumerate_f32.argtypes = [
                ctypes.c_int32,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ] + common_tail
            _ENUM_LIB = lib
        except Exception:
            _ENUM_LIB = None
        return _ENUM_LIB


def exact_enumerate(R: np.ndarray, W: np.ndarray, r2: float,
                    max_nodes: int = 0, use_f32: bool = False,
                    progress: Optional[np.ndarray] = None):
    """DFS the +-1 cube against upper-triangular R (see enum.cpp).

    Returns (found, z, best_r2, nodes, complete): `complete` means the
    tree was exhausted — a PROOF that nothing beats r2 (or that the
    returned z is the exact optimum if found). `use_f32`: 2x SIMD width,
    SEARCH MODE ONLY — the f32 box bound's slack error grows with row
    magnitude (≈2·slack·δ per row) and can wrongly prune near-radius
    subtrees, so exhaustion is NOT a proof in f32; use f64 for proofs.
    `progress`: optional int64[1] array the kernel updates every ~16M
    nodes — poll it from another thread on long proofs.
    """
    lib = load_enum_library()
    if lib is None:
        raise RuntimeError("native enum library unavailable")
    n = R.shape[0]
    best_r2 = np.array([r2], np.float64)
    best_z = np.zeros(n, np.float64)
    found = np.zeros(1, np.int32)
    status = np.zeros(1, np.int32)
    if progress is None:
        progress = np.zeros(1, np.int64)
    dt = np.float32 if use_f32 else np.float64
    fn = lib.nmc_exact_enumerate_f32 if use_f32 else lib.nmc_exact_enumerate
    nodes = fn(
        np.int32(n), np.ascontiguousarray(R, dt),
        np.ascontiguousarray(W, dt), best_r2, best_z, found,
        status, np.longlong(max_nodes), progress)
    return (bool(found[0]), best_z, float(best_r2[0]), int(nodes),
            status[0] == 0)
