"""
lDDT (local Distance Difference Test) computed natively.

The reference shells out to OpenStructure inside docker (foldingdiff/lddt.py:
32-56); this is a direct implementation of the lDDT definition (Mariani et
al., Bioinformatics 2013): over all atom pairs from different residues within
an inclusion radius (15 A) in the REFERENCE structure, the fraction whose
model distance deviates by less than each threshold in {0.5, 1, 2, 4} A,
averaged over thresholds. Computed on CA traces (our generated backbones are
sequence-less GLY chains, so CA-lDDT is the meaningful variant).

`lddt_jax` is the jit-able on-device version for batched evaluation.
"""
from __future__ import annotations

import json
import logging
import os
from collections import defaultdict
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
INCLUSION_RADIUS = 15.0


def lddt_np(
    model: np.ndarray,
    reference: np.ndarray,
    thresholds: Sequence[float] = THRESHOLDS,
    inclusion_radius: float = INCLUSION_RADIUS,
    per_residue: bool = False,
):
    """lDDT of model CA coords vs reference CA coords (same length, (N, 3))."""
    model = np.asarray(model, dtype=np.float64)
    reference = np.asarray(reference, dtype=np.float64)
    assert model.shape == reference.shape and model.ndim == 2

    dref = np.linalg.norm(reference[:, None, :] - reference[None, :, :], axis=-1)
    dmod = np.linalg.norm(model[:, None, :] - model[None, :, :], axis=-1)
    n = len(model)
    # pairs of distinct residues within the inclusion radius in the reference
    incl = (dref < inclusion_radius) & ~np.eye(n, dtype=bool)
    delta = np.abs(dref - dmod)
    preserved = np.zeros_like(dref)
    for thr in thresholds:
        preserved += (delta < thr).astype(np.float64)
    preserved /= len(thresholds)
    with np.errstate(invalid="ignore"):
        per_res = np.where(
            incl.sum(axis=1) > 0,
            (preserved * incl).sum(axis=1) / np.maximum(incl.sum(axis=1), 1),
            np.nan,
        )
    if per_residue:
        return per_res
    total = incl.sum()
    if total == 0:
        return float("nan")
    return float((preserved * incl).sum() / total)


def lddt_jax(model, reference, thresholds=THRESHOLDS, inclusion_radius=INCLUSION_RADIUS):
    """Batched on-device lDDT: model/reference (B, N, 3), mask via NaN-free
    fixed shapes; returns (B,) scores."""
    import jax.numpy as jnp

    def pdists(x):
        d = x[:, :, None, :] - x[:, None, :, :]
        return jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-12))

    dref = pdists(reference)
    dmod = pdists(model)
    n = model.shape[1]
    eye = jnp.eye(n, dtype=bool)[None]
    incl = (dref < inclusion_radius) & ~eye
    delta = jnp.abs(dref - dmod)
    preserved = sum((delta < thr).astype(jnp.float32) for thr in thresholds) / len(thresholds)
    total = jnp.maximum(incl.sum(axis=(1, 2)), 1)
    return (preserved * incl).sum(axis=(1, 2)) / total


def lddt_pdb(query, ref) -> float:
    """File-level API matching the reference lddt() signature (lddt.py:32-56):
    returns CA-lDDT of query against ref; -1.0 on failure."""
    from foldingdiff_tpu.eval.tmscore import _load_ca

    q = _load_ca(str(query))
    r = _load_ca(str(ref))
    if q is None or r is None:
        logging.error(f"Failed to compute lDDT for {query} and {ref}")
        return -1.0
    n = min(len(q), len(r))
    if n < 3:
        return -1.0
    return lddt_np(q[:n], r[:n])


def lddt_sampled_folded(sampled_dir, folded_dir, out_path: str = "lddt.json") -> dict:
    """For each sampled structure, lDDT against each of its folded structures
    (reference lddt.py:59-100). Writes and returns the score dict."""
    sampled_dir, folded_dir = Path(sampled_dir), Path(folded_dir)
    sampled_pdbs = sorted(sampled_dir.glob("*.pdb"))
    logging.info(f"Found {len(sampled_pdbs)} sampled structures in {sampled_dir}")
    out_dict = defaultdict(dict)
    for s in sampled_pdbs:
        for folded in sorted(folded_dir.glob(f"{s.stem}_*.pdb")):
            out_dict[s.stem][folded.stem] = lddt_pdb(folded, s)
    with open(out_path, "w") as sink:
        json.dump(out_dict, sink, indent=4)
    return dict(out_dict)
