"""Native (C++) components, built on demand and bound via ctypes.

`linear_sum_assignment(cost)` — min-cost bipartite matching used by the MODA
matching step; the native backend is the framework's equivalent of the
reference devkit's `MinCostMatching.cpp` mex. Falls back to scipy when the
toolchain is unavailable or `VFA_TPU_NATIVE_MATCHING=0`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from pathlib import Path

import numpy as np

_SRC_DIR = Path(__file__).resolve().parents[2] / "native"
_BUILD_DIR = Path(__file__).resolve().parent / "_build"
_LOCK = threading.Lock()
_LIB = None
_LIB_FAILED = False


def _build_library() -> Path | None:
    src = _SRC_DIR / "matching.cpp"
    if not src.exists():
        return None
    _BUILD_DIR.mkdir(exist_ok=True)
    out = _BUILD_DIR / "libvfa_matching.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    cmd = [
        os.environ.get("CXX", "g++"), "-O2", "-shared", "-fPIC",
        "-std=c++17", str(src), "-o", str(out),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError) as e:  # pragma: no cover
        print(f"vfa_tpu.native: build failed ({e}); falling back to scipy",
              file=sys.stderr)
        return None
    return out


def _get_lib():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        path = _build_library()
        if path is None:
            _LIB_FAILED = True
            return None
        lib = ctypes.CDLL(str(path))
        lib.solve_lsap.restype = ctypes.c_int
        lib.solve_lsap.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.solve_lsap_batch.restype = ctypes.c_int
        lib.solve_lsap_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    return _LIB


def native_available() -> bool:
    return _get_lib() is not None


def linear_sum_assignment(cost: np.ndarray):
    """Optimal assignment of an (n, m) cost matrix.

    Returns (row_indices, col_indices) of the min(n, m) assigned pairs, like
    scipy.optimize.linear_sum_assignment (rows sorted ascending).
    """
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n, m = cost.shape
    if n == 0 or m == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)

    use_native = os.environ.get("VFA_TPU_NATIVE_MATCHING", "1") != "0"
    lib = _get_lib() if use_native else None
    if lib is None:
        from scipy.optimize import linear_sum_assignment as scipy_lsa

        return scipy_lsa(cost)

    row_to_col = np.full(n, -1, np.int32)
    rc = lib.solve_lsap(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        np.int32(n), np.int32(m),
        row_to_col.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:  # pragma: no cover
        from scipy.optimize import linear_sum_assignment as scipy_lsa

        return scipy_lsa(cost)
    rows = np.nonzero(row_to_col >= 0)[0]
    return rows.astype(np.int64), row_to_col[rows].astype(np.int64)


def batch_linear_sum_assignment(costs: np.ndarray, ns: np.ndarray,
                                ms: np.ndarray) -> np.ndarray:
    """Solve a batch of padded assignment problems in one native call.

    costs: (B, pad_n, pad_m); problem b is its top-left ns[b] x ms[b]
    submatrix (padding never read). Returns row_to_col (B, pad_n) int32
    with -1 for unassigned/padded rows — the batched form the vectorized
    CLEAR-metrics path (eval/moda.py) consumes. Falls back to a per-problem
    scipy loop when the native library is unavailable.
    """
    costs = np.ascontiguousarray(costs, dtype=np.float64)
    B, pad_n, pad_m = costs.shape
    ns = np.ascontiguousarray(ns, dtype=np.int32)
    ms = np.ascontiguousarray(ms, dtype=np.int32)
    out = np.full((B, pad_n), -1, np.int32)
    if B == 0:
        return out

    use_native = os.environ.get("VFA_TPU_NATIVE_MATCHING", "1") != "0"
    lib = _get_lib() if use_native else None
    if lib is not None:
        rc = lib.solve_lsap_batch(
            costs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ns.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ms.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            np.int32(B), np.int32(pad_n), np.int32(pad_m),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc == 0:
            return out
        out[:] = -1  # pragma: no cover — fall through to scipy

    from scipy.optimize import linear_sum_assignment as scipy_lsa

    for b in range(B):
        if ns[b] <= 0 or ms[b] <= 0:
            continue
        r, c = scipy_lsa(costs[b, :ns[b], :ms[b]])
        out[b, r] = c
    return out
