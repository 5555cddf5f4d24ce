"""
Port of reference tests/test_nerf.py: dihedral placement consistency and
golden PDB->angles->PDB round trips gated on TM-score.
"""
import os

import numpy as np
import pytest

from foldingdiff_tpu.eval import tmscore
from foldingdiff_tpu.geometry import featurize, nerf, pdb

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
CRN = os.path.join(DATA_DIR, "1CRN.pdb")
PFL = os.path.join(DATA_DIR, "7PFL.pdb")


class TestPlaceDihedral:
    """place_dihedral must be the exact inverse of the dihedral measurement."""

    def test_roundtrip_random_quadruples_np(self):
        rng = np.random.default_rng(1234)
        for _ in range(50):
            a, b, c = rng.normal(size=(3, 3)) * 5
            bond_angle = rng.uniform(0.1, np.pi - 0.1)
            bond_length = rng.uniform(1.0, 2.0)
            torsion = rng.uniform(-np.pi, np.pi)
            d = nerf.place_dihedral_np(a, b, c, bond_angle, bond_length, torsion)
            # Measured torsion should equal the requested torsion
            meas = featurize.dihedral_np(a, b, c, d)
            assert np.isclose(meas, torsion, atol=1e-8), (meas, torsion)
            # Bond length & angle too
            assert np.isclose(np.linalg.norm(d - c), bond_length, atol=1e-8)
            assert np.isclose(featurize.bond_angle_np(b, c, d), bond_angle, atol=1e-8)

    def test_jax_matches_numpy(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(99)
        a, b, c = rng.normal(size=(3, 8, 3)).astype(np.float32) * 5
        ang = rng.uniform(0.5, 2.5, size=8).astype(np.float32)
        ln = rng.uniform(1.0, 2.0, size=8).astype(np.float32)
        tor = rng.uniform(-np.pi, np.pi, size=8).astype(np.float32)
        d_np = nerf.place_dihedral_np(a, b, c, ang, ln, tor)
        d_j = np.asarray(nerf.place_dihedral(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), ang, ln, tor))
        np.testing.assert_allclose(d_j, d_np, atol=1e-4)

    def test_dihedral_on_real_structure(self):
        """Dihedrals of 1CRN must be in range and mostly trans omega."""
        bb = pdb.read_pdb(CRN).backbone_coords()
        phi, psi, omega = featurize.backbone_dihedrals(bb)
        assert np.isnan(phi[0]) and np.isnan(psi[-1]) and np.isnan(omega[-1])
        finite_omega = omega[np.isfinite(omega)]
        # Peptide bonds are overwhelmingly trans (|omega| ~ pi)
        assert np.mean(np.abs(finite_omega) > 2.5) > 0.9


class TestFullAngleRoundTrip:
    """Reference test_nerf.py:72-110: full-angle reconstruction has TM ~ 1.0."""

    @pytest.mark.parametrize("pdb_file", [CRN, PFL])
    def test_full_angles_and_dists(self, pdb_file, tmp_path):
        feats = featurize.canonical_distances_and_dihedrals(
            pdb_file,
            distances=featurize.EXHAUSTIVE_DISTS,
            angles=featurize.EXHAUSTIVE_ANGLES,
        )
        assert feats is not None
        out = featurize.create_new_chain_nerf(str(tmp_path / "reconst.pdb"), feats)
        assert out
        orig_ca = pdb.extract_backbone_coords(pdb_file, atoms=("CA",))
        new_ca = pdb.extract_backbone_coords(out, atoms=("CA",))
        assert len(orig_ca) == len(new_ca)
        score = tmscore.tm_score(new_ca, orig_ca)
        assert score > 0.99, f"Round trip TM {score}"

    @pytest.mark.parametrize("pdb_file", [CRN, PFL])
    def test_full_angles_ideal_bonds(self, pdb_file, tmp_path):
        """6-angle featurization (idealized bond lengths) still gives high TM."""
        feats = featurize.canonical_distances_and_dihedrals(
            pdb_file, distances=[], angles=featurize.EXHAUSTIVE_ANGLES
        )
        out = featurize.create_new_chain_nerf(str(tmp_path / "reconst.pdb"), feats)
        assert out
        orig_ca = pdb.extract_backbone_coords(pdb_file, atoms=("CA",))
        new_ca = pdb.extract_backbone_coords(out, atoms=("CA",))
        score = tmscore.tm_score(new_ca, orig_ca)
        assert score > 0.8, f"Ideal-bond round trip TM {score}"

    def test_minimal_angles(self, tmp_path):
        """Reference test_nerf.py:112-129: minimal angles give TM > 0.5."""
        feats = featurize.canonical_distances_and_dihedrals(
            CRN, distances=[], angles=["phi", "psi", "omega", "tau"]
        )
        out = featurize.create_new_chain_nerf(str(tmp_path / "reconst.pdb"), feats)
        assert out
        orig_ca = pdb.extract_backbone_coords(CRN, atoms=("CA",))
        new_ca = pdb.extract_backbone_coords(out, atoms=("CA",))
        score = tmscore.tm_score(new_ca, orig_ca)
        assert score > 0.5, f"Minimal-angle round trip TM {score}"


class TestBatchedNerf:
    """Reference test_nerf.py:131-241: batched build matches and handles ragged."""

    def _feats(self, pdb_file):
        return featurize.canonical_distances_and_dihedrals(
            pdb_file, distances=[], angles=featurize.EXHAUSTIVE_ANGLES
        )

    def test_batch_matches_np(self):
        import jax.numpy as jnp

        feats = self._feats(CRN)
        vals = np.nan_to_num(feats.values.astype(np.float32))
        batch = jnp.asarray(np.stack([vals, vals]))
        coords_j = np.asarray(
            nerf.nerf_build_batch(
                phi=batch[:, :, 0],
                psi=batch[:, :, 1],
                omega=batch[:, :, 2],
                bond_angle_n_ca_c=batch[:, :, 3],
                bond_angle_ca_c_n=batch[:, :, 4],
                bond_angle_c_n_ca=batch[:, :, 5],
            )
        )
        coords_np = nerf.nerf_build_np(
            phi=vals[:, 0],
            psi=vals[:, 1],
            omega=vals[:, 2],
            bond_angle_n_ca_c=vals[:, 3],
            bond_angle_ca_c_n=vals[:, 4],
            bond_angle_c_n_ca=vals[:, 5],
        )
        assert coords_j.shape == (2, len(vals) * 3, 3)
        # float32 drift compounds along the chain; gate on CA TM-score like the
        # reference's batched test (TM > 0.95)
        tm = tmscore.tm_score(coords_j[0, 1::3], coords_np[1::3])
        assert tm > 0.95, f"Batched f32 vs numpy f64 TM {tm}"

    def test_ragged_batch(self):
        """Different-length items padded with zeros: trimmed coords match."""
        import jax.numpy as jnp

        f1 = self._feats(CRN).values.astype(np.float32)
        f2 = self._feats(PFL).values.astype(np.float32)
        n = max(len(f1), len(f2))
        pad = lambda x: np.pad(np.nan_to_num(x), ((0, n - len(x)), (0, 0)))
        batch = jnp.asarray(np.stack([pad(f1), pad(f2)]))
        coords = np.asarray(
            nerf.nerf_build_batch(
                phi=batch[:, :, 0],
                psi=batch[:, :, 1],
                omega=batch[:, :, 2],
                bond_angle_n_ca_c=batch[:, :, 3],
                bond_angle_ca_c_n=batch[:, :, 4],
                bond_angle_c_n_ca=batch[:, :, 5],
            )
        )
        for feats, item in [(f1, coords[0]), (f2, coords[1])]:
            ref = nerf.nerf_build_np(
                phi=np.nan_to_num(feats[:, 0]),
                psi=np.nan_to_num(feats[:, 1]),
                omega=np.nan_to_num(feats[:, 2]),
                bond_angle_n_ca_c=np.nan_to_num(feats[:, 3]),
                bond_angle_ca_c_n=np.nan_to_num(feats[:, 4]),
                bond_angle_c_n_ca=np.nan_to_num(feats[:, 5]),
            )
            trimmed = item[: len(feats) * 3]
            tm = tmscore.tm_score(trimmed[1::3], ref[1::3])
            assert tm > 0.95, f"Ragged batched TM {tm}"


class TestTMScore:
    def test_self_identity(self):
        ca = pdb.extract_backbone_coords(CRN, atoms=("CA",))
        assert tmscore.tm_score(ca, ca) > 0.999

    def test_translation_rotation_invariance(self):
        from scipy.spatial.transform import Rotation

        ca = pdb.extract_backbone_coords(CRN, atoms=("CA",))
        rot = Rotation.random(random_state=3).as_matrix()
        moved = ca @ rot.T + np.array([10.0, -5.0, 2.0])
        assert tmscore.tm_score(moved, ca) > 0.999

    def test_different_structures_low(self):
        a = pdb.extract_backbone_coords(CRN, atoms=("CA",))
        b = pdb.extract_backbone_coords(PFL, atoms=("CA",))
        s = tmscore.tm_score(a, b)
        assert s < 0.5, f"Expected dissimilar structures, TM {s}"

    def test_run_tmalign_files(self, tmp_path):
        s = tmscore.run_tmalign(CRN, CRN)
        assert s > 0.999
        s2 = tmscore.run_tmalign(CRN, PFL)
        assert np.isnan(s2) or s2 < 0.6

    def test_max_tm_across_refs(self):
        score, best = tmscore.max_tm_across_refs(CRN, [PFL, CRN], parallel=False)
        assert best == CRN and score > 0.999


class TestPDBIO:
    def test_read_write_roundtrip(self, tmp_path):
        bb = pdb.read_pdb(CRN).backbone_coords()
        out = pdb.write_coords_to_pdb(bb, str(tmp_path / "out.pdb"))
        bb2 = pdb.read_pdb(out).backbone_coords()
        np.testing.assert_allclose(bb, bb2, atol=1e-3)

    def test_get_pdb_length(self):
        assert pdb.get_pdb_length(CRN) == 46  # 1CRN is 46 residues

    def test_featurize_shapes_and_nans(self):
        feats = featurize.canonical_distances_and_dihedrals(
            CRN,
            distances=featurize.EXHAUSTIVE_DISTS,
            angles=featurize.EXHAUSTIVE_ANGLES,
        )
        assert list(feats.columns) == featurize.EXHAUSTIVE_DISTS + featurize.EXHAUSTIVE_ANGLES
        assert len(feats) == 46
        assert np.isnan(feats["phi"].values[0])
        for col in ["psi", "omega", "tau", "CA:C:1N", "C:1N:1CA"]:
            assert np.isnan(feats[col].values[-1]), col
        for col in featurize.EXHAUSTIVE_DISTS:
            assert feats[col].values[-1] == 0.0, col
        # Bond distances near idealized values
        assert np.isclose(np.nanmean(feats["N:CA"].values[:-1]), 1.46, atol=0.05)
        assert np.isclose(np.nanmean(feats["CA:C"].values[:-1]), 1.54, atol=0.05)
        assert np.isclose(np.nanmean(feats["0C:1N"].values[:-1]), 1.34, atol=0.05)


class TestPDBParserRobustness:
    def _write(self, tmp_path, lines, name="t.pdb"):
        p = tmp_path / name
        p.write_text("\n".join(lines) + "\n")
        return str(p)

    @staticmethod
    def _atom(serial, name, res, chain, resid, x, y, z, altloc=" ", icode=" "):
        name_field = f" {name:<3s}" if len(name) < 4 else name
        return (
            f"ATOM  {serial:>5d} {name_field}{altloc}{res:>3s} {chain}{resid:>4d}{icode}   "
            f"{x:>8.3f}{y:>8.3f}{z:>8.3f}  1.00  5.00           {name[0]:>2s}"
        )

    def test_altloc_first_wins(self, tmp_path):
        lines = [
            self._atom(1, "N", "ALA", "A", 1, 0, 0, 0, altloc="A"),
            self._atom(2, "N", "ALA", "A", 1, 9, 9, 9, altloc="B"),
            self._atom(3, "CA", "ALA", "A", 1, 1, 0, 0),
            self._atom(4, "C", "ALA", "A", 1, 2, 0, 0),
        ]
        bb = pdb.read_pdb(self._write(tmp_path, lines)).backbone_coords()
        assert len(bb) == 3
        np.testing.assert_allclose(bb[0], [0, 0, 0])

    def test_multi_model_detected(self, tmp_path):
        lines = ["MODEL     1",
                 self._atom(1, "N", "GLY", "A", 1, 0, 0, 0),
                 "ENDMDL", "MODEL     2",
                 self._atom(1, "N", "GLY", "A", 1, 5, 5, 5),
                 "ENDMDL"]
        f = self._write(tmp_path, lines)
        assert pdb.get_model_count(f) == 2
        assert featurize.canonical_distances_and_dihedrals(f) is None

    def test_hetatm_excluded(self, tmp_path):
        lines = [
            self._atom(1, "N", "GLY", "A", 1, 0, 0, 0),
            self._atom(2, "CA", "GLY", "A", 1, 1, 0, 0),
            self._atom(3, "C", "GLY", "A", 1, 2, 0, 0),
            self._atom(4, "N", "HOH", "A", 2, 3, 0, 0),  # not an amino acid
        ]
        bb = pdb.read_pdb(self._write(tmp_path, lines)).backbone_coords()
        assert len(bb) == 3

    def test_gzip_supported(self, tmp_path):
        import gzip
        import shutil

        gz = str(tmp_path / "1crn.pdb.gz")
        with open(CRN, "rb") as fin, gzip.open(gz, "wb") as fout:
            shutil.copyfileobj(fin, fout)
        feats = featurize.canonical_distances_and_dihedrals(
            gz, distances=featurize.EXHAUSTIVE_DISTS, angles=featurize.EXHAUSTIVE_ANGLES
        )
        assert feats is not None and len(feats) == 46

    def test_insertion_codes_distinct_residues(self, tmp_path):
        lines = []
        serial = 1
        for icode in (" ", "A"):
            for j, nm in enumerate(["N", "CA", "C"]):
                lines.append(self._atom(serial, nm, "GLY", "A", 1,
                                        serial * 1.0, 0, 0, icode=icode))
                serial += 1
        bb = pdb.read_pdb(self._write(tmp_path, lines)).backbone_coords()
        assert len(bb) == 6  # two residues, not one
