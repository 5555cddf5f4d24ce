"""
PDB -> internal-angle featurization (the inverse of NeRF).

Reference behavior: angles_and_coords.canonical_distances_and_dihedrals
(angles_and_coords.py:30-109), reimplemented with direct vector math instead of
biotite. Feature layout (row i of an L-residue chain):

  phi[i]      : dihedral C_{i-1}-N_i-CA_i-C_i      (NaN at i=0)
  psi[i]      : dihedral N_i-CA_i-C_i-N_{i+1}      (NaN at i=L-1)
  omega[i]    : dihedral CA_i-C_i-N_{i+1}-CA_{i+1} (NaN at i=L-1)
  tau[i]      : bond angle N-CA-C of residue i+1   (NaN at i=L-1)  [shifted!]
  CA:C:1N[i]  : angle CA_i-C_i-N_{i+1}             (NaN at i=L-1)
  C:1N:1CA[i] : angle C_i-N_{i+1}-CA_{i+1}         (NaN at i=L-1)
  0C:1N[i]    : dist C_i to N_{i+1}                (0.0 at i=L-1)
  N:CA[i]     : dist N-CA of residue i+1           (0.0 at i=L-1)  [shifted!]
  CA:C[i]     : dist CA-C of residue i+1           (0.0 at i=L-1)  [shifted!]

The shift-by-one storage of tau/N:CA/CA:C mirrors the reference's index-array
construction (angles_and_coords.py:63-64, 95-104): row i holds the value
consumed when NeRF places residue i+1, so the build loop indexes row i
directly. The trailing pad differs (NaN vs 0) between angles and distances
exactly as biotite's index_angle (NaN on zero vectors) vs index_distance (0).
"""
from __future__ import annotations

import logging
import os
from typing import List, Optional

import numpy as np
import pandas as pd

from foldingdiff_tpu.geometry.pdb import read_pdb

EXHAUSTIVE_ANGLES = ["phi", "psi", "omega", "tau", "CA:C:1N", "C:1N:1CA"]
EXHAUSTIVE_DISTS = ["0C:1N", "N:CA", "CA:C"]
MINIMAL_ANGLES = ["phi", "psi", "omega"]
MINIMAL_DISTS: List[str] = []


def dihedral_np(p0: np.ndarray, p1: np.ndarray, p2: np.ndarray, p3: np.ndarray) -> np.ndarray:
    """
    Signed dihedral of point quadruples, IUPAC convention (matches biotite
    struc.dihedral and the inverse of nerf.place_dihedral). Broadcasts over
    leading dims; points are (..., 3).
    """
    b1 = p1 - p0
    b2 = p2 - p1
    b3 = p3 - p2
    n1 = np.cross(b1, b2)
    n2 = np.cross(b2, b3)
    u2 = b2 / np.linalg.norm(b2, axis=-1, keepdims=True)
    m1 = np.cross(u2, n1)
    x = np.sum(n1 * n2, axis=-1)
    y = np.sum(m1 * n2, axis=-1)
    return np.arctan2(y, x)


def bond_angle_np(p0: np.ndarray, p1: np.ndarray, p2: np.ndarray) -> np.ndarray:
    """Interior angle at p1 of the p0-p1-p2 triple, in [0, pi]."""
    v1 = p0 - p1
    v2 = p2 - p1
    v1 = v1 / np.linalg.norm(v1, axis=-1, keepdims=True)
    v2 = v2 / np.linalg.norm(v2, axis=-1, keepdims=True)
    return np.arccos(np.clip(np.sum(v1 * v2, axis=-1), -1.0, 1.0))


def backbone_dihedrals(bb: np.ndarray):
    """
    phi/psi/omega from an (3L, 3) N/CA/C backbone array, with biotite
    dihedral_backbone's NaN placement (phi[0], psi[-1], omega[-1] = NaN).
    """
    n_res = len(bb) // 3
    n_at = bb[0::3]
    ca_at = bb[1::3]
    c_at = bb[2::3]
    phi = np.full(n_res, np.nan)
    psi = np.full(n_res, np.nan)
    omega = np.full(n_res, np.nan)
    if n_res >= 2:
        phi[1:] = dihedral_np(c_at[:-1], n_at[1:], ca_at[1:], c_at[1:])
        psi[:-1] = dihedral_np(n_at[:-1], ca_at[:-1], c_at[:-1], n_at[1:])
        omega[:-1] = dihedral_np(ca_at[:-1], c_at[:-1], n_at[1:], ca_at[1:])
    return phi, psi, omega


def featurize_backbone(
    bb: np.ndarray,
    distances: List[str] = MINIMAL_DISTS,
    angles: List[str] = MINIMAL_ANGLES,
) -> pd.DataFrame:
    """Featurize an (3L, 3) backbone coordinate array into the angle table."""
    assert len(bb) % 3 == 0 and len(bb) >= 6, f"Bad backbone shape {bb.shape}"
    n_res = len(bb) // 3
    n_at, ca_at, c_at = bb[0::3], bb[1::3], bb[2::3]

    phi, psi, omega = backbone_dihedrals(bb)
    calc = {"phi": phi, "psi": psi, "omega": omega}

    def pad_nan(vals):
        return np.concatenate([vals, [np.nan]])

    def pad_zero(vals):
        return np.concatenate([vals, [0.0]])

    for a in angles:
        if a in calc:
            continue
        if a in ("tau", "N:CA:C"):
            # Residues 1..L-1, stored at rows 0..L-2
            calc[a] = pad_nan(bond_angle_np(n_at[1:], ca_at[1:], c_at[1:]))
        elif a == "CA:C:1N":
            calc[a] = pad_nan(bond_angle_np(ca_at[:-1], c_at[:-1], n_at[1:]))
        elif a == "C:1N:1CA":
            calc[a] = pad_nan(bond_angle_np(c_at[:-1], n_at[1:], ca_at[1:]))
        else:
            raise ValueError(f"Unrecognized angle: {a}")

    for d in distances:
        if d in ("0C:1N", "C:1N"):
            calc[d] = pad_zero(np.linalg.norm(n_at[1:] - c_at[:-1], axis=-1))
        elif d == "N:CA":
            calc[d] = pad_zero(np.linalg.norm(ca_at[1:] - n_at[1:], axis=-1))
        elif d == "CA:C":
            calc[d] = pad_zero(np.linalg.norm(c_at[1:] - ca_at[1:], axis=-1))
        else:
            raise ValueError(f"Unrecognized distance: {d}")

    return pd.DataFrame({k: calc[k] for k in list(distances) + list(angles)})


def canonical_distances_and_dihedrals(
    fname: str,
    distances: List[str] = MINIMAL_DISTS,
    angles: List[str] = MINIMAL_ANGLES,
) -> Optional[pd.DataFrame]:
    """
    Parse a PDB file into the canonical feature table; None on malformed input
    (multi-model, missing backbone atoms, out-of-range values), mirroring the
    reference's skip behavior (angles_and_coords.py:42-43, 51-53, 77-81).
    """
    assert os.path.isfile(fname)
    struct = read_pdb(fname)
    if struct.model_count > 1:
        return None
    bb = struct.backbone_coords()
    if len(bb) < 6 or len(bb) % 3 != 0:
        logging.debug(f"{fname}: malformed backbone ({len(bb)} atoms) - skipping")
        return None
    try:
        df = featurize_backbone(bb, distances=distances, angles=angles)
    except (ValueError, FloatingPointError):
        return None
    # Value-range check on angular columns
    for col in angles:
        v = df[col].values
        finite = v[np.isfinite(v)]
        if finite.size and not (finite.min() >= -np.pi - 1e-9 and finite.max() <= np.pi + 1e-9):
            logging.warning(f"Illegal values for {col} in {fname} -- skipping")
            return None
    return df


def create_new_chain_nerf(
    out_fname: str,
    dists_and_angles: pd.DataFrame,
    angles_to_set: Optional[List[str]] = None,
    dists_to_set: Optional[List[str]] = None,
    center_coords: bool = True,
) -> str:
    """
    Angles -> PDB via NeRF (reference angles_and_coords.py:112-184). Columns
    with exactly one ':' are distances; everything else is an angle. Returns
    the written path, or "" if the build produced NaNs.
    """
    from foldingdiff_tpu.geometry import nerf
    from foldingdiff_tpu.geometry.pdb import write_coords_to_pdb

    if angles_to_set is None and dists_to_set is None:
        angles_to_set, dists_to_set = [], []
        for c in dists_and_angles.columns:
            (dists_to_set if str(c).count(":") == 1 else angles_to_set).append(c)
    assert angles_to_set is not None and dists_to_set is not None
    assert all(a in angles_to_set for a in ["phi", "psi", "omega"])

    kwargs = dict(
        phi=dists_and_angles["phi"].values,
        psi=dists_and_angles["psi"].values,
        omega=dists_and_angles["omega"].values,
    )
    for a in angles_to_set:
        if a in ("phi", "psi", "omega"):
            continue
        vals = dists_and_angles[a].values
        if a in ("tau", "N:CA:C"):
            kwargs["bond_angle_n_ca_c"] = vals
        elif a == "CA:C:1N":
            kwargs["bond_angle_ca_c_n"] = vals
        elif a == "C:1N:1CA":
            kwargs["bond_angle_c_n_ca"] = vals
        else:
            raise ValueError(f"Unrecognized angle: {a}")
    for d in dists_to_set:
        vals = dists_and_angles[d].values
        if d == "0C:1N":
            kwargs["bond_len_c_n"] = vals
        elif d == "N:CA":
            kwargs["bond_len_n_ca"] = vals
        elif d == "CA:C":
            kwargs["bond_len_ca_c"] = vals
        else:
            raise ValueError(f"Unrecognized distance: {d}")

    coords = nerf.nerf_build_np(**kwargs)
    if center_coords:
        coords = coords - coords.mean(axis=0)
    if np.any(np.isnan(coords)):
        logging.warning(f"Found NaN values, not writing pdb file {out_fname}")
        return ""
    assert coords.shape == (len(dists_and_angles) * 3, 3)
    return write_coords_to_pdb(coords, out_fname)
