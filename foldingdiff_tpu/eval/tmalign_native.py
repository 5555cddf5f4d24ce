"""
ctypes bindings for the C++ TM-align implementation (csrc/tmalign.cpp).

Builds the shared library on first use if g++ is available (cached next to
this module); falls back gracefully so eval/tmscore.py can use the numpy path.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

_SO_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_tmalign.so")
_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
    "tmalign.cpp",
)
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    if not os.path.isfile(_SRC):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-std=c++17", "-shared",
             "-o", _SO_PATH, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logging.warning(f"Could not build native TM-align: {e}")
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_SO_PATH) or (
        os.path.isfile(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_SO_PATH)
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.tm_align.restype = ctypes.c_double
        lib.tm_align.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ]
        lib.tm_align_ex.restype = ctypes.c_double
        lib.tm_align_ex.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.c_int,
        ]
        lib.tm_score_identity.restype = ctypes.c_double
        lib.tm_score_identity.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ]
        _lib = lib
    except OSError as e:
        logging.warning(f"Could not load native TM-align: {e}")
    return _lib


def available() -> bool:
    return _load() is not None


def _as_ptr(arr: np.ndarray):
    arr = np.ascontiguousarray(arr, dtype=np.float64)
    return arr, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def tm_align_coords(query: np.ndarray, reference: np.ndarray, fast: bool = False) -> float:
    """TM-score of query CA trace aligned onto reference, normalized by
    reference length. Full DP alignment; fast=True uses the screening-grade
    truncated search (the analogue of TM-align's -fast, reference
    tmalign.py:36-37) -- rank candidates fast, re-score winners with
    fast=False."""
    lib = _load()
    assert lib is not None
    q, qp = _as_ptr(query)
    r, rp = _as_ptr(reference)
    return float(lib.tm_align_ex(qp, len(q), rp, len(r), 1 if fast else 0))


def tm_score_identity_coords(query: np.ndarray, reference: np.ndarray) -> float:
    lib = _load()
    assert lib is not None
    assert len(query) == len(reference)
    q, qp = _as_ptr(query)
    r, rp = _as_ptr(reference)
    return float(lib.tm_score_identity(qp, rp, len(q)))


def run_tmalign(query_pdb: str, reference_pdb: str, fast: bool = False) -> float:
    """File-level API: NaN on failure (reference tmalign.py:22-54)."""
    from foldingdiff_tpu.eval.tmscore import _load_ca

    q = _load_ca(query_pdb)
    r = _load_ca(reference_pdb)
    if q is None or r is None:
        return float("nan")
    score = tm_align_coords(q, r, fast=fast)
    return score if score >= 0 else float("nan")
