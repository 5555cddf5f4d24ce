"""
Minimal, dependency-free PDB backbone I/O.

Replaces the reference's biotite usage (angles_and_coords.py:17-19, 41-49,
187-253) with direct fixed-column PDB parsing/writing. Only the backbone
capability surface is implemented: read N/CA/C atoms per residue (first model,
first altloc, amino acids only), and write GLY-only N/CA/C backbones in the
exact style of reference write_coords_to_pdb (chain A, occupancy 1.0,
b-factor 5.0).
"""
from __future__ import annotations

import gzip
import os
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

# The 20 standard residues plus common variants biotite treats as amino acids
AMINO_ACIDS = {
    "ALA", "ARG", "ASN", "ASP", "CYS", "GLN", "GLU", "GLY", "HIS", "ILE",
    "LEU", "LYS", "MET", "PHE", "PRO", "SER", "THR", "TRP", "TYR", "VAL",
    "MSE", "SEC", "PYL", "UNK", "ASX", "GLX",
}

BACKBONE_ATOMS = ("N", "CA", "C")


@dataclass
class PDBAtom:
    name: str
    element: str
    res_name: str
    res_id: int
    chain_id: str
    coord: np.ndarray
    hetero: bool = False
    insertion: str = ""
    altloc: str = ""


@dataclass
class PDBStructure:
    atoms: List[PDBAtom] = field(default_factory=list)
    model_count: int = 1

    def backbone_coords(self) -> np.ndarray:
        """
        (3N, 3) array of N/CA/C coords in atom-record order, amino acids only,
        matching biotite filter_backbone semantics (name in N/CA/C, amino acid,
        non-hetero).
        """
        coords = [
            a.coord
            for a in self.atoms
            if (not a.hetero) and a.name in BACKBONE_ATOMS and a.res_name in AMINO_ACIDS
        ]
        if not coords:
            return np.zeros((0, 3))
        return np.stack(coords)

    def atom_coords(self, names=("CA",)) -> np.ndarray:
        """Coords of named backbone atoms, in order (reference extract_backbone_coords)."""
        bb = [
            a
            for a in self.atoms
            if (not a.hetero) and a.name in BACKBONE_ATOMS and a.res_name in AMINO_ACIDS
        ]
        return np.stack([a.coord for a in bb if a.name in names]) if bb else np.zeros((0, 3))


def _open_maybe_gz(fname: str):
    return gzip.open(fname, "rt") if str(fname).endswith(".gz") else open(fname, "rt")


def read_pdb(fname: str, keep_hetero: bool = False) -> PDBStructure:
    """
    Parse a PDB file's first model. Fixed-column parsing per the PDB v3.3 spec.
    Keeps the first altloc variant of each atom.
    """
    assert os.path.isfile(fname), f"Missing file: {fname}"
    atoms: List[PDBAtom] = []
    model_count = 0
    in_first_model = True
    seen_altloc = {}
    with _open_maybe_gz(fname) as fh:
        for line in fh:
            rec = line[:6]
            if rec == "MODEL ":
                model_count += 1
                in_first_model = model_count <= 1
                continue
            if rec == "ENDMDL":
                continue
            if not in_first_model:
                continue
            is_atom = rec == "ATOM  "
            is_het = rec == "HETATM"
            if not (is_atom or is_het):
                continue
            if is_het and not keep_hetero:
                continue
            name = line[12:16].strip()
            altloc = line[16].strip()
            res_name = line[17:20].strip()
            chain_id = line[21].strip()
            try:
                res_id = int(line[22:26])
            except ValueError:
                continue
            insertion = line[26].strip()
            # First record of each (chain, residue, icode, atom name) wins --
            # covers both altloc variants and pathological exact duplicates
            key = (chain_id, res_id, insertion, name)
            if key in seen_altloc:
                continue
            seen_altloc[key] = altloc
            try:
                x = float(line[30:38])
                y = float(line[38:46])
                z = float(line[46:54])
            except ValueError:
                continue
            element = line[76:78].strip() or name[:1]
            atoms.append(
                PDBAtom(
                    name=name,
                    element=element,
                    res_name=res_name,
                    res_id=res_id,
                    chain_id=chain_id,
                    coord=np.array([x, y, z], dtype=np.float64),
                    hetero=is_het,
                    insertion=insertion,
                    altloc=altloc,
                )
            )
    return PDBStructure(atoms=atoms, model_count=max(model_count, 1))


def get_model_count(fname: str) -> int:
    """Number of MODEL records (0/1 both mean a single model)."""
    count = 0
    with _open_maybe_gz(fname) as fh:
        for line in fh:
            if line.startswith("MODEL "):
                count += 1
    return max(count, 1)


def get_pdb_length(fname: str) -> int:
    """
    Chain length in residues (backbone atom count / 3); -1 for multi-model
    files (reference angles_and_coords.py:256-268).
    """
    struct = read_pdb(fname)
    if struct.model_count > 1:
        return -1
    return int(len(struct.backbone_coords()) // 3)


def extract_backbone_coords(fname: str, atoms=("CA",)) -> Optional[np.ndarray]:
    """Reference angles_and_coords.extract_backbone_coords equivalent."""
    struct = read_pdb(fname)
    if struct.model_count > 1:
        return None
    return struct.atom_coords(names=tuple(atoms))


def _format_atom_line(
    serial: int,
    name: str,
    res_name: str,
    chain_id: str,
    res_id: int,
    coord,
    occupancy: float,
    b_factor: float,
    element: str,
) -> str:
    # PDB atom-name convention: names of <4 chars start in column 14
    name_field = f" {name:<3s}" if len(name) < 4 else f"{name:<4s}"
    return (
        f"ATOM  {serial:>5d} {name_field}{'':1s}{res_name:>3s} {chain_id}"
        f"{res_id:>4d}{'':1s}   "
        f"{coord[0]:>8.3f}{coord[1]:>8.3f}{coord[2]:>8.3f}"
        f"{occupancy:>6.2f}{b_factor:>6.2f}          {element:>2s}\n"
    )


@contextmanager
def _atomic_write(out_fname: str):
    """
    Write-to-temp + os.replace so a PDB either exists complete or not at all.
    An interrupted write must never leave a truncated file at the final path:
    the synthetic-corpus generator's resume mode skips existing files, and
    its byte-parity-across-regenerations guarantee (CLAUDE.md) depends on
    every on-disk file being a complete write.
    """
    tmp = f"{out_fname}.tmp.{os.getpid()}"
    fh = open(tmp, "w")
    try:
        yield fh
        fh.close()
        os.replace(tmp, out_fname)
    except BaseException:
        fh.close()
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise


def write_coords_to_pdb(coords: np.ndarray, out_fname: str) -> str:
    """
    Write an (3N, 3) N/CA/C coordinate array as a GLY-only backbone PDB,
    matching reference angles_and_coords.write_coords_to_pdb (187-253).
    """
    coords = np.asarray(coords)
    assert len(coords) % 3 == 0, f"Expected 3N coords, got {len(coords)}"
    elements = ["N", "C", "C"]
    names = ["N", "CA", "C"]
    with _atomic_write(out_fname) as fh:
        serial = 1
        for i in range(0, len(coords), 3):
            res_id = i // 3 + 1
            for j in range(3):
                fh.write(
                    _format_atom_line(
                        serial, names[j], "GLY", "A", res_id, coords[i + j],
                        1.0, 5.0, elements[j],
                    )
                )
                serial += 1
        fh.write("END\n")
    return out_fname


def write_ca_trace_to_pdb(coords: np.ndarray, out_fname: str, recenter: bool = True) -> str:
    """
    Write an (L, 3) CA coordinate array as a GLY CA-trace PDB. Used for the
    cart-coords ablation model, whose samples are CA positions rather than
    internal angles (reference datasets.py:313 extracts atoms=["CA"]).

    Coordinates are zero-centered first (superposition-invariant metrics
    don't care; fixed-width %8.3f PDB columns overflow past +-1000 A and a
    badly-trained coord model can drift that far). If any coordinate still
    exceeds the column width after recentering, raises ValueError rather
    than silently emitting a malformed PDB whose shifted columns downstream
    parsers (TM-align, lDDT, DSSP) would read as garbage.
    """
    coords = np.asarray(coords, dtype=np.float64)
    assert coords.ndim == 2 and coords.shape[1] == 3, f"Expected (L, 3), got {coords.shape}"
    if recenter:
        coords = coords - coords.mean(axis=0)
    if not np.all(np.abs(coords) < 1000.0):
        raise ValueError(
            f"CA coords exceed PDB %8.3f column width even after recentering "
            f"(max |coord| = {np.abs(coords).max():.1f} A); refusing to write {out_fname}"
        )
    with _atomic_write(out_fname) as fh:
        for i, c in enumerate(coords):
            fh.write(_format_atom_line(i + 1, "CA", "GLY", "A", i + 1, c, 1.0, 5.0, "C"))
        fh.write("END\n")
    return out_fname


def write_full_atoms_to_pdb(atoms: List[PDBAtom], out_fname: str) -> str:
    """Write arbitrary atoms (used by sidechain grafting / oxygen addition)."""
    with _atomic_write(out_fname) as fh:
        for serial, a in enumerate(atoms, start=1):
            fh.write(
                _format_atom_line(
                    serial, a.name, a.res_name, a.chain_id or "A", a.res_id, a.coord,
                    1.0, 5.0, a.element,
                )
            )
        fh.write("END\n")
    return out_fname
