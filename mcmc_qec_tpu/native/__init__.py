"""Native components: C++ exact minimum-weight perfect matching.

Builds ``libblossom.so`` on demand with g++ and exposes it through ctypes —
an in-memory replacement for the reference's blossom5 subprocess + text-file
protocol (src/mwpm.py:376-404).  A pure-Python Jonker-style fallback is NOT
provided; if no compiler is available, ``mwpm_solve`` raises and callers can
use the brute-force solver (tests only).
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "blossom.cpp")
_LIB = os.path.join(_HERE, "libblossom.so")


def build_library(force: bool = False) -> str:
    """Compile blossom.cpp into libblossom.so (cached by mtime)."""
    if (
        not force
        and os.path.exists(_LIB)
        and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
    ):
        return _LIB
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


@functools.lru_cache(maxsize=1)
def _get_lib():
    lib = ctypes.CDLL(build_library())
    lib.mwpm_solve.restype = ctypes.c_longlong
    lib.mwpm_solve.argtypes = [
        ctypes.c_int,
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    return lib


def mwpm_solve(
    n_nodes: int, edges: np.ndarray
) -> Tuple[np.ndarray, int]:
    """Exact minimum-weight perfect matching.

    edges: (m, 3) array of (u, v, w) with integer weights >= 0.
    Returns (match, total_weight) where match[i] is i's partner.
    Raises ValueError if no perfect matching exists.
    """
    edges = np.asarray(edges)
    if n_nodes == 0:
        return np.zeros(0, dtype=np.int32), 0
    eu = np.ascontiguousarray(edges[:, 0], dtype=np.int32)
    ev = np.ascontiguousarray(edges[:, 1], dtype=np.int32)
    ew = np.ascontiguousarray(edges[:, 2], dtype=np.int64)
    out = np.zeros(n_nodes, dtype=np.int32)
    total = _get_lib().mwpm_solve(n_nodes, len(edges), eu, ev, ew, out)
    if total < 0:
        raise ValueError("no perfect matching exists for the given graph")
    return out, int(total)


def brute_force_mwpm(n_nodes: int, edges: np.ndarray) -> Tuple[Optional[np.ndarray], float]:
    """Exponential-time exact solver for tests (n <= ~12)."""
    w = {}
    for u, v, wt in np.asarray(edges):
        key = (min(int(u), int(v)), max(int(u), int(v)))
        if key not in w or wt < w[key]:
            w[key] = int(wt)
    best = [None, float("inf")]

    def rec(remaining, acc, pairs):
        if acc >= best[1]:
            return
        if not remaining:
            best[0] = list(pairs)
            best[1] = acc
            return
        u = remaining[0]
        for v in remaining[1:]:
            key = (min(u, v), max(u, v))
            if key in w:
                rest = [x for x in remaining if x not in (u, v)]
                rec(rest, acc + w[key], pairs + [(u, v)])

    rec(list(range(n_nodes)), 0, [])
    if best[0] is None:
        return None, float("inf")
    match = np.full(n_nodes, -1, dtype=np.int32)
    for u, v in best[0]:
        match[u] = v
        match[v] = u
    return match, best[1]
