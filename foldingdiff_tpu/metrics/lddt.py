"""
lDDT (local Distance Difference Test) computed natively.

The reference shells out to OpenStructure inside docker (foldingdiff/lddt.py:
32-56); this is a direct implementation of the lDDT definition (Mariani et
al., Bioinformatics 2013): over all atom pairs from DIFFERENT residues within
an inclusion radius (15 A) in the REFERENCE structure, the fraction whose
model distance deviates by less than each threshold in {0.5, 1, 2, 4} A,
averaged over thresholds.

Default scoring matches the reference's OpenStructure convention: ALL backbone
atoms present in both structures (N/CA/C and O when present) are scored, with
same-residue pairs excluded via a per-atom residue index. CA-only mode is kept
as an option (atoms=("CA",)) -- equivalent to the residue_index-free form
where every atom is its own residue.

`lddt_jax` is the jit-able on-device version for batched evaluation.
"""
from __future__ import annotations

import json
import logging
import os
from collections import defaultdict
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
INCLUSION_RADIUS = 15.0
BACKBONE_ATOM_NAMES = ("N", "CA", "C", "O")


def lddt_np(
    model: np.ndarray,
    reference: np.ndarray,
    thresholds: Sequence[float] = THRESHOLDS,
    inclusion_radius: float = INCLUSION_RADIUS,
    per_residue: bool = False,
    residue_index: Optional[np.ndarray] = None,
):
    """
    lDDT of model coords vs reference coords (same length, (N, 3)).

    residue_index: (N,) per-atom residue ids; pairs within the same residue
    are excluded (the lDDT definition). Default: each atom is its own residue
    (exact CA-trace behavior).
    """
    model = np.asarray(model, dtype=np.float64)
    reference = np.asarray(reference, dtype=np.float64)
    assert model.shape == reference.shape and model.ndim == 2
    n = len(model)
    if residue_index is None:
        residue_index = np.arange(n)
    residue_index = np.asarray(residue_index)
    assert residue_index.shape == (n,)

    dref = np.linalg.norm(reference[:, None, :] - reference[None, :, :], axis=-1)
    dmod = np.linalg.norm(model[:, None, :] - model[None, :, :], axis=-1)
    # pairs of atoms from distinct residues within the inclusion radius in the
    # reference
    diff_res = residue_index[:, None] != residue_index[None, :]
    incl = (dref < inclusion_radius) & diff_res
    delta = np.abs(dref - dmod)
    preserved = np.zeros_like(dref)
    for thr in thresholds:
        preserved += (delta < thr).astype(np.float64)
    preserved /= len(thresholds)
    if per_residue:
        # score per residue: pairs involving any atom of that residue
        res_ids = np.unique(residue_index)
        out = np.full(len(res_ids), np.nan)
        for k, r in enumerate(res_ids):
            rows = residue_index == r
            tot = incl[rows].sum()
            if tot > 0:
                out[k] = (preserved[rows] * incl[rows]).sum() / tot
        return out
    total = incl.sum()
    if total == 0:
        return float("nan")
    return float((preserved * incl).sum() / total)


def lddt_jax(model, reference, thresholds=THRESHOLDS, inclusion_radius=INCLUSION_RADIUS,
             residue_index=None):
    """Batched on-device lDDT: model/reference (B, N, 3); residue_index (N,)
    or (B, N) optional per-atom residue ids; returns (B,) scores."""
    import jax.numpy as jnp

    def pdists(x):
        d = x[:, :, None, :] - x[:, None, :, :]
        return jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-12))

    dref = pdists(reference)
    dmod = pdists(model)
    n = model.shape[1]
    if residue_index is None:
        diff_res = ~jnp.eye(n, dtype=bool)[None]
    else:
        ri = jnp.asarray(residue_index)
        if ri.ndim == 1:
            ri = ri[None]
        diff_res = ri[:, :, None] != ri[:, None, :]
    incl = (dref < inclusion_radius) & diff_res
    delta = jnp.abs(dref - dmod)
    preserved = sum((delta < thr).astype(jnp.float32) for thr in thresholds) / len(thresholds)
    total = jnp.maximum(incl.sum(axis=(1, 2)), 1)
    return (preserved * incl).sum(axis=(1, 2)) / total


def _load_backbone_atoms(
    pdb_file: str, atom_names: Sequence[str]
) -> Optional[Tuple[np.ndarray, np.ndarray, list]]:
    """
    (coords (M, 3), residue_index (M,), [(res_key, atom_name), ...]) for
    amino-acid non-hetero atoms with the given names, grouped by residue in
    file order.
    """
    from foldingdiff_tpu.geometry.pdb import AMINO_ACIDS, read_pdb

    try:
        struct = read_pdb(str(pdb_file))
    except Exception as e:
        logging.error(f"Failed to parse {pdb_file}: {e}")
        return None
    keys, coords, names = [], [], []
    res_order: dict = {}
    for a in struct.atoms:
        if a.hetero or a.res_name not in AMINO_ACIDS or a.name not in atom_names:
            continue
        rk = (a.chain_id, a.res_id, a.insertion)
        if rk not in res_order:
            res_order[rk] = len(res_order)
        keys.append(res_order[rk])
        coords.append(a.coord)
        names.append(a.name)
    if not coords:
        return None
    return np.stack(coords), np.asarray(keys), names


def lddt_pdb(query, ref, atoms: Sequence[str] = BACKBONE_ATOM_NAMES) -> float:
    """
    File-level API matching the reference lddt() signature (lddt.py:32-56):
    lDDT of query against ref; -1.0 on failure.

    Default scores ALL backbone atoms (N/CA/C/O) present in BOTH structures
    per aligned residue -- the reference's OpenStructure `compare-structures
    --lddt` convention; pass atoms=("CA",) for a CA trace.
    """
    q = _load_backbone_atoms(str(query), atoms)
    r = _load_backbone_atoms(str(ref), atoms)
    if q is None or r is None:
        logging.error(f"Failed to compute lDDT for {query} and {ref}")
        return -1.0
    qc, qres, qnames = q
    rc, rres, rnames = r
    # Align residues positionally (sampled vs folded share indexing), keep the
    # per-residue intersection of atom names so both sides score the same set
    n_res = min(qres.max() + 1, rres.max() + 1)
    q_by_res = [dict() for _ in range(n_res)]
    r_by_res = [dict() for _ in range(n_res)]
    for c, ri, nm in zip(qc, qres, qnames):
        if ri < n_res:
            q_by_res[ri][nm] = c
    for c, ri, nm in zip(rc, rres, rnames):
        if ri < n_res:
            r_by_res[ri][nm] = c
    mq, mr, res_idx = [], [], []
    for i in range(n_res):
        for nm in atoms:
            if nm in q_by_res[i] and nm in r_by_res[i]:
                mq.append(q_by_res[i][nm])
                mr.append(r_by_res[i][nm])
                res_idx.append(i)
    if len(set(res_idx)) < 3:
        return -1.0
    return lddt_np(np.stack(mq), np.stack(mr), residue_index=np.asarray(res_idx))


def lddt_sampled_folded(
    sampled_dir, folded_dir, out_path: str = "lddt.json",
    atoms: Sequence[str] = BACKBONE_ATOM_NAMES,
    threads: int = 0,
) -> dict:
    """For each sampled structure, lDDT against each of its folded structures
    (reference lddt.py:59-100, incl. its mp.Pool fan-out lddt.py:82-89).
    Writes and returns the score dict. threads=0 uses all cores (serial on a
    1-core host)."""
    sampled_dir, folded_dir = Path(sampled_dir), Path(folded_dir)
    sampled_pdbs = sorted(sampled_dir.glob("*.pdb"))
    logging.info(f"Found {len(sampled_pdbs)} sampled structures in {sampled_dir}")
    pairs = [
        (s, folded)
        for s in sampled_pdbs
        for folded in sorted(folded_dir.glob(f"{s.stem}_*.pdb"))
    ]
    threads = threads or (os.cpu_count() or 1)
    if threads > 1 and len(pairs) > 4:
        import multiprocessing as mp

        with mp.Pool(threads) as pool:
            scores = pool.starmap(
                lddt_pdb, [(f, s, atoms) for s, f in pairs], chunksize=4
            )
    else:
        scores = [lddt_pdb(f, s, atoms=atoms) for s, f in pairs]
    out_dict = defaultdict(dict)
    for (s, folded), score in zip(pairs, scores):
        out_dict[s.stem][folded.stem] = score
    with open(out_path, "w") as sink:
        json.dump(out_dict, sink, indent=4)
    return dict(out_dict)
