"""
ctypes bindings for the native C++ PDB featurizer (csrc/featurize.cpp).

Used by the dataset layer as a drop-in accelerated replacement for the python
featurization path (geometry/featurize.canonical_distances_and_dihedrals);
numerically matched in tests/test_native_featurize.py. Auto-builds with g++ on
first use; callers fall back to python when unavailable.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

_SO_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_featurize.so")
_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
    "featurize.cpp",
)
_lib: Optional[ctypes.CDLL] = None
_tried = False

COLUMNS = ["0C:1N", "N:CA", "CA:C", "phi", "psi", "omega", "tau", "CA:C:1N", "C:1N:1CA"]
MAX_RES = 4096


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
        logging.warning(f"Could not build native featurizer: {e}")
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
        lib.featurize_pdb.restype = ctypes.c_int
        lib.featurize_pdb.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ]
        _lib = lib
    except OSError as e:
        logging.warning(f"Could not load native featurizer: {e}")
    return _lib


def available() -> bool:
    return _load() is not None


def featurize_pdb_native(fname: str):
    """(n_res, 9) feature array or None on failure. Plain .pdb files only
    (no gzip -- callers route .gz through the python path)."""
    if str(fname).endswith(".gz"):
        return None
    lib = _load()
    if lib is None:
        return None
    out = np.empty((MAX_RES, 9), dtype=np.float64)
    n = lib.featurize_pdb(
        fname.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), MAX_RES
    )
    if n < 2:
        return None
    return out[:n].copy()
