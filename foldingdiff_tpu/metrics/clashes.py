"""
Van-der-Waals clash counting on backbones.

Reference: foldingdiff/vdw_clashes.py. Same semantics -- backbone atoms only,
clash when pairwise distance <= alpha * (r_i + r_j) for non-adjacent atoms,
count residues..atoms with any clash -- but vectorized (the reference builds
the threshold matrix with a python double loop).
"""
from __future__ import annotations

import multiprocessing as mp
import os
from typing import Collection, Dict

import numpy as np

from foldingdiff_tpu.geometry.pdb import read_pdb

VDW_RADII = {"C": 1.7, "N": 1.55}


def count_clashes(fname: str, alpha: float = 0.63) -> int:
    """Number of backbone atoms involved in at least one clash."""
    struct = read_pdb(fname)
    atoms = [
        a
        for a in struct.atoms
        if (not a.hetero) and a.name in ("N", "CA", "C")
    ]
    coords = np.stack([a.coord for a in atoms])
    elements = np.array([VDW_RADII[a.element if a.element in VDW_RADII else "C"] for a in atoms])

    diff = coords[:, None, :] - coords[None, :, :]
    dists = np.sqrt((diff**2).sum(-1))
    thresh = alpha * (elements[:, None] + elements[None, :])
    n = len(atoms)
    idx = np.arange(n)
    adjacent = np.abs(idx[:, None] - idx[None, :]) <= 1  # self + direct neighbors
    is_clash = (dists <= thresh) & ~adjacent
    return int(np.sum(np.any(is_clash, axis=1)))


def count_clashes_parallel(
    filenames: Collection[str], nthreads: int = os.cpu_count() or 1
) -> Dict[str, int]:
    if nthreads > 1 and len(filenames) > 8:
        with mp.Pool(nthreads) as pool:
            counts = pool.map(count_clashes, filenames, chunksize=10)
    else:
        counts = [count_clashes(f) for f in filenames]
    return dict(zip(filenames, counts))
