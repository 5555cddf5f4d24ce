"""Port of reference tests/test_angles_and_coords.py: side-chain grafting
reproduces reference coordinates on the synthetic all-residue PDB; plus
oxygen-placement checks."""
import os

import numpy as np
import pytest

from foldingdiff_tpu.geometry import sidechains
from foldingdiff_tpu.geometry.pdb import read_pdb, write_coords_to_pdb

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
ALL_RESIDUES = os.path.join(DATA_DIR, "all_residues.pdb")
ALL_RESIDUES_FA = os.path.join(DATA_DIR, "all_residues.fa")
CRN = os.path.join(DATA_DIR, "1CRN.pdb")


def _read_seq(fa_file):
    seq = ""
    with open(fa_file) as f:
        for line in f:
            if not line.startswith(">"):
                seq += line.strip()
    return seq


class TestSidechainGrafting:
    def test_reproduces_reference_coords(self, tmp_path):
        """Grafting the all-residues sequence onto the all-residues backbone
        must reproduce its own side-chain coordinates (reference
        tests/test_angles_and_coords.py)."""
        seq = _read_seq(ALL_RESIDUES_FA)
        struct = read_pdb(ALL_RESIDUES)
        # Write the backbone-only version
        bb = struct.backbone_coords()
        bb_file = str(tmp_path / "bb.pdb")
        write_coords_to_pdb(bb, bb_file)

        out = sidechains.add_sidechains_to_backbone(
            bb_file, seq, str(tmp_path / "full.pdb"), reference_pdbs=[ALL_RESIDUES]
        )
        # Compare by residue ORDER (write_coords_to_pdb renumbers res ids)
        from itertools import groupby

        orig_res = [
            {a.name: a.coord for a in atoms}
            for _, atoms in groupby(struct.atoms, key=lambda a: a.res_id)
        ]
        new_struct = read_pdb(out)
        new_res = [
            {a.name: a.coord for a in atoms}
            for _, atoms in groupby(new_struct.atoms, key=lambda a: a.res_id)
        ]
        assert len(orig_res) == len(new_res)
        n_checked = 0
        for orig, new in zip(orig_res, new_res):
            for name, coord in new.items():
                if name in ("N", "CA", "C"):
                    continue
                np.testing.assert_allclose(coord, orig[name], atol=2e-3)
                n_checked += 1
        assert n_checked > 50, f"Only verified {n_checked} sidechain atoms"

    def test_collect_covers_residues(self):
        lib = sidechains.collect_aa_sidechain_angles(ALL_RESIDUES)
        assert len(lib) == 20
        assert all(len(v) > 0 for k, v in lib.items() if k != "G")


class TestAddOxygen:
    def test_oxygen_geometry(self, tmp_path):
        bb = read_pdb(CRN).backbone_coords()
        bb_file = str(tmp_path / "bb.pdb")
        write_coords_to_pdb(bb, bb_file)
        out = sidechains.add_oxygen_to_backbone(bb_file, str(tmp_path / "with_o.pdb"))
        struct = read_pdb(out, keep_hetero=True)
        o_atoms = [a for a in struct.atoms if a.name == "O"]
        c_atoms = [a for a in struct.atoms if a.name == "C"]
        assert len(o_atoms) == len(bb) // 3
        # C=O bond length ~1.23
        for o, c in zip(o_atoms, c_atoms):
            assert np.isclose(np.linalg.norm(o.coord - c.coord), 1.23, atol=1e-3)


class TestCaTrace:
    def test_roundtrip(self, tmp_path):
        """write_ca_trace_to_pdb (cart-coords sampling output) roundtrips
        through our PDB reader at data-scale coordinates."""
        from foldingdiff_tpu.geometry.pdb import write_ca_trace_to_pdb

        rng = np.random.default_rng(0)
        ca = rng.normal(scale=20.0, size=(40, 3))
        out = write_ca_trace_to_pdb(ca, str(tmp_path / "ca.pdb"))
        got = read_pdb(out).atom_coords(names=("CA",))
        assert got.shape == (40, 3)
        # the writer zero-centers (PDB column-width guard); metrics are
        # superposition-invariant so this loses nothing
        np.testing.assert_allclose(got, ca - ca.mean(0), atol=5e-4)
        out2 = write_ca_trace_to_pdb(ca, str(tmp_path / "ca_raw.pdb"), recenter=False)
        got2 = read_pdb(out2).atom_coords(names=("CA",))
        np.testing.assert_allclose(got2, ca, atol=5e-4)

    def test_overflow_guard(self, tmp_path):
        """Coords past the %8.3f column width raise instead of silently
        writing a malformed PDB with shifted columns."""
        from foldingdiff_tpu.geometry.pdb import write_ca_trace_to_pdb

        ca = np.zeros((4, 3))
        ca[0, 0] = 2500.0  # recentering can't bring the spread under 1000
        ca[1, 0] = -2500.0
        with pytest.raises(ValueError, match="column width"):
            write_ca_trace_to_pdb(ca, str(tmp_path / "bad.pdb"))
        assert not (tmp_path / "bad.pdb").exists()
        # a large shared offset IS fixed by recentering
        ok = write_ca_trace_to_pdb(ca * 0 + 5000.0 + np.arange(12).reshape(4, 3),
                                   str(tmp_path / "ok.pdb"))
        got = read_pdb(ok).atom_coords(names=("CA",))
        assert np.abs(got).max() < 1000
