"""Metrics tests: KL (port of reference tests/test_metrics.py), native lDDT,
clash counting, P-SEA secondary structure."""
import os

import numpy as np
import pytest

from foldingdiff_tpu.metrics import clashes, kl, lddt, ss
from foldingdiff_tpu.utils import wrapped_mean

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
CRN = os.path.join(DATA_DIR, "1CRN.pdb")
PFL = os.path.join(DATA_DIR, "7PFL.pdb")


class TestKL:
    def test_identical_self(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=5000)
        assert kl.kl_from_empirical(x, x) == 0.0

    def test_disjoint_is_inf(self):
        u = np.zeros(100) + 0.5
        v = np.ones(100) * 10
        assert np.isinf(kl.kl_from_empirical(u, v))

    def test_ordering(self):
        """KL grows as distributions separate (reference test_metrics)."""
        rng = np.random.default_rng(1)
        base = rng.normal(size=20000)
        prev = 0.0
        for shift in [0.25, 0.5, 1.0]:
            v = rng.normal(loc=shift, size=20000)
            cur = kl.kl_from_empirical(base, v, pseudocount=True)
            assert cur > prev
            prev = cur

    def test_kl_decreases_with_timestep(self):
        """Noised data approaches pure noise as t -> T."""
        from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule

        sched = DiffusionSchedule.create("cosine", 100)
        rng = np.random.default_rng(2)
        # Strongly peaked "data"
        values = rng.normal(loc=1.5, scale=0.1, size=(20000, 2))
        is_ang = np.array([True, True])
        kl_early = kl.kl_at_timestep(
            2, values, np.asarray(sched.sqrt_alphas_cumprod),
            np.asarray(sched.sqrt_one_minus_alphas_cumprod), is_ang,
            np.random.default_rng(3),
        )
        kl_late = kl.kl_at_timestep(
            99, values, np.asarray(sched.sqrt_alphas_cumprod),
            np.asarray(sched.sqrt_one_minus_alphas_cumprod), is_ang,
            np.random.default_rng(3),
        )
        assert np.all(kl_late < kl_early)


class TestWrappedMean:
    def test_nan_tolerant(self):
        x = np.array([0.4, np.nan, 0.6])
        assert np.isclose(wrapped_mean(x), 0.5, atol=0.01)

    def test_boundary(self):
        x = np.array([np.pi - 0.2, -np.pi + 0.2])
        assert np.isclose(abs(wrapped_mean(x)), np.pi, atol=1e-6)


class TestLDDT:
    def _ca(self, f):
        from foldingdiff_tpu.geometry.pdb import extract_backbone_coords

        return extract_backbone_coords(f, atoms=("CA",))

    def test_self_is_one(self):
        ca = self._ca(CRN)
        assert lddt.lddt_np(ca, ca) == 1.0

    def test_rigid_motion_invariant(self):
        from scipy.spatial.transform import Rotation

        ca = self._ca(CRN)
        rot = Rotation.random(random_state=0).as_matrix()
        moved = ca @ rot.T + np.array([5.0, 6.0, 7.0])
        assert lddt.lddt_np(moved, ca) > 0.999

    def test_perturbation_decreases(self):
        ca = self._ca(CRN)
        rng = np.random.default_rng(0)
        prev = 1.0
        for scale in [0.5, 1.0, 2.0]:
            noisy = ca + rng.normal(scale=scale, size=ca.shape)
            score = lddt.lddt_np(noisy, ca)
            assert score < prev
            prev = score
        assert prev < 0.6

    def test_file_api(self):
        assert lddt.lddt_pdb(CRN, CRN) == 1.0
        cross = lddt.lddt_pdb(PFL, CRN)
        assert cross < 0.7

    def test_file_api_ca_only_option(self):
        assert lddt.lddt_pdb(CRN, CRN, atoms=("CA",)) == 1.0
        # backbone scoring uses ~4x the atoms of the CA trace: scores differ
        bb = lddt.lddt_pdb(PFL, CRN)
        ca = lddt.lddt_pdb(PFL, CRN, atoms=("CA",))
        assert bb != ca

    def test_backbone_golden_brute_force(self):
        """All-backbone-atom lDDT vs an independent brute-force double loop
        (same-residue pairs excluded), plus a pinned value."""
        rng = np.random.default_rng(7)
        n_res, names = 6, ("N", "CA", "C")
        ref = rng.normal(scale=4.0, size=(n_res * 3, 3))
        model = ref + rng.normal(scale=0.8, size=ref.shape)
        res_idx = np.repeat(np.arange(n_res), 3)

        got = lddt.lddt_np(model, ref, residue_index=res_idx)

        hits, total = 0.0, 0
        for i in range(len(ref)):
            for j in range(len(ref)):
                if i == j or res_idx[i] == res_idx[j]:
                    continue
                dr = np.linalg.norm(ref[i] - ref[j])
                if dr >= 15.0:
                    continue
                dm = np.linalg.norm(model[i] - model[j])
                total += 1
                hits += np.mean([abs(dr - dm) < t for t in (0.5, 1.0, 2.0, 4.0)])
        expected = hits / total
        assert np.isclose(got, expected, atol=1e-12)
        assert np.isclose(got, 0.7843511450381679, atol=1e-9)  # pinned

    def test_same_residue_pairs_excluded(self):
        """Atoms within one residue can be arbitrarily wrong without
        affecting the score when residue_index groups them."""
        rng = np.random.default_rng(3)
        ref = rng.normal(scale=4.0, size=(12, 3))
        res_idx = np.repeat(np.arange(4), 3)
        model = ref.copy()
        base = lddt.lddt_np(model, ref, residue_index=res_idx)
        assert base == 1.0

    def test_backbone_pdb_matches_manual_assembly(self):
        """lddt_pdb(backbone) == lddt_np over manually extracted N/CA/C/O
        with per-residue indexing on a real structure pair."""
        from foldingdiff_tpu.geometry.pdb import read_pdb, AMINO_ACIDS

        def load(f):
            coords, res_idx, order = [], [], {}
            for a in read_pdb(f).atoms:
                if a.hetero or a.res_name not in AMINO_ACIDS:
                    continue
                if a.name not in ("N", "CA", "C", "O"):
                    continue
                rk = (a.chain_id, a.res_id, a.insertion)
                order.setdefault(rk, len(order))
                coords.append(a.coord)
                res_idx.append(order[rk])
            return np.stack(coords), np.asarray(res_idx)

        qc, qres = load(CRN)
        rng = np.random.default_rng(11)
        noisy = qc + rng.normal(scale=1.0, size=qc.shape)
        import tempfile, os
        from foldingdiff_tpu.geometry.pdb import PDBAtom, write_full_atoms_to_pdb

        ref_atoms = read_pdb(CRN).atoms
        kept = [a for a in ref_atoms
                if not a.hetero and a.res_name in AMINO_ACIDS
                and a.name in ("N", "CA", "C", "O")]
        for a, c in zip(kept, noisy):
            a.coord = c
        with tempfile.TemporaryDirectory() as td:
            noisy_pdb = os.path.join(td, "noisy.pdb")
            write_full_atoms_to_pdb(kept, noisy_pdb)
            got = lddt.lddt_pdb(noisy_pdb, CRN)
        expected = lddt.lddt_np(noisy, qc, residue_index=qres)
        assert np.isclose(got, expected, atol=5e-3)  # PDB coords quantize to 1e-3

    def test_jax_backbone_matches_np(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(5)
        ref = rng.normal(scale=4.0, size=(15, 3))
        model = ref + rng.normal(scale=0.5, size=ref.shape)
        res_idx = np.repeat(np.arange(5), 3)
        np_score = lddt.lddt_np(model, ref, residue_index=res_idx)
        j_score = float(lddt.lddt_jax(
            jnp.asarray(model[None]), jnp.asarray(ref[None]), residue_index=res_idx
        )[0])
        assert np.isclose(np_score, j_score, atol=1e-3)

    def test_jax_matches_np(self):
        import jax.numpy as jnp

        ca = self._ca(CRN)
        rng = np.random.default_rng(1)
        noisy = ca + rng.normal(scale=0.5, size=ca.shape)
        np_score = lddt.lddt_np(noisy, ca)
        j_score = float(
            lddt.lddt_jax(jnp.asarray(noisy[None]), jnp.asarray(ca[None]))[0]
        )
        assert np.isclose(np_score, j_score, atol=1e-3)


class TestClashes:
    def test_real_structure_few_clashes(self):
        # A real crystal structure should have no/few backbone clashes
        n = clashes.count_clashes(CRN)
        assert n <= 2, n

    def test_compressed_structure_clashes(self, tmp_path):
        from foldingdiff_tpu.geometry.pdb import read_pdb, write_coords_to_pdb

        bb = read_pdb(CRN).backbone_coords()
        squeezed = bb * 0.5  # compress -> guaranteed clashes
        out = write_coords_to_pdb(squeezed, str(tmp_path / "squeezed.pdb"))
        assert clashes.count_clashes(out) > 10


class TestSecondaryStructure:
    def test_1crn_topology(self):
        # 1CRN: 2 alpha helices + one 2-strand beta sheet (known topology)
        a, b = ss.count_structures_in_pdb(CRN)
        assert a == 2, a
        assert 1 <= b <= 3, b

    def test_beta_rich_structure(self):
        a, b = ss.count_structures_in_pdb(PFL)
        assert b >= 4, (a, b)

    def test_extended_chain_no_helix(self, tmp_path):
        """A fully extended synthetic chain (phi=psi=180deg-ish strand) should
        contain no helices."""
        import pandas as pd

        from foldingdiff_tpu.geometry.featurize import create_new_chain_nerf

        n = 30
        df = pd.DataFrame({
            "phi": np.full(n, -2.4),
            "psi": np.full(n, 2.4),
            "omega": np.full(n, np.pi - 0.01),
            "tau": np.full(n, 109.5 / 180 * np.pi),
        })
        out = create_new_chain_nerf(str(tmp_path / "ext.pdb"), df)
        a, b = ss.count_structures_in_pdb(out)
        assert a == 0

    def test_helix_synthetic(self, tmp_path):
        """Idealized alpha-helix angles produce one helix element."""
        import pandas as pd

        from foldingdiff_tpu.geometry.featurize import create_new_chain_nerf

        n = 30
        df = pd.DataFrame({
            "phi": np.full(n, -57.0 / 180 * np.pi),
            "psi": np.full(n, -47.0 / 180 * np.pi),
            "omega": np.full(n, np.pi - 0.01),
            "tau": np.full(n, 111.0 / 180 * np.pi),
        })
        out = create_new_chain_nerf(str(tmp_path / "helix.pdb"), df)
        a, b = ss.count_structures_in_pdb(out)
        assert a == 1 and b == 0, (a, b)


class TestDSSPBackend:
    """The DSSP text parser and subprocess behavior, exercised with a fake
    mkdssp binary on PATH (no real DSSP in CI)."""

    DSSP_TEXT = "\n".join([
        "==== Secondary Structure Definition by the program DSSP ====",
        "  #  RESIDUE AA STRUCTURE BP1 BP2  ACC",
        # columns: line[13]=aa, line[16]=SS code
        "    1    1 A T  H  >  S+ ",
        "    2    2 A H  H  X  S+ ",
        "    3    3 A R  E     -A ",
        "    4    4 A !* chain brk",
        "    5    5 A K        + ",
    ])

    def test_parse_dssp_text(self):
        labels = ss._parse_dssp_text(self.DSSP_TEXT)
        # H,H -> a; E -> b; '!' row skipped; blank code -> c
        assert list(labels) == ["a", "a", "b", "c"]

    def _fake_dssp(self, tmp_path, script_body, monkeypatch):
        bindir = tmp_path / "bin"
        bindir.mkdir()
        fake = bindir / "mkdssp"
        fake.write_text("#!/bin/sh\n" + script_body)
        fake.chmod(0o755)
        monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    def test_dssp4_output_format_flag(self, tmp_path, monkeypatch):
        """A DSSP-4-style binary (accepts --output-format) gets classic text
        requested explicitly."""
        body = (
            'case "$1" in\n'
            '--output-format) printf %s\\\\n "  #  RESIDUE AA" '
            '"    1    1 A A  H " ;;\n'
            "*) echo mmcif-garbage ;;\n"
            "esac\n"
        )
        self._fake_dssp(tmp_path, body, monkeypatch)
        labels = ss.annotate_pdb_sse_dssp("ignored.pdb")
        assert list(labels) == ["a"]

    def test_dssp_legacy_fallback(self, tmp_path, monkeypatch):
        """A DSSP-2/3-style binary rejects --output-format; the wrapper falls
        back to the plain invocation."""
        body = (
            'case "$1" in\n'
            '--output-format) echo "unrecognized option \'--output-format\'" >&2; exit 1 ;;\n'
            '*) printf %s\\\\n "  #  RESIDUE AA" "    1    1 A A  E " ;;\n'
            "esac\n"
        )
        self._fake_dssp(tmp_path, body, monkeypatch)
        labels = ss.annotate_pdb_sse_dssp("ignored.pdb")
        assert list(labels) == ["b"]

    def test_dssp_legacy_exit0_usage_fallback(self, tmp_path, monkeypatch):
        """A legacy binary that exits 0 while printing usage for the unknown
        flag (no parsable table) must still fall back to the plain
        invocation instead of silently returning the empty array."""
        body = (
            'case "$1" in\n'
            '--output-format) echo "Usage: dssp [input] [output]" ;;\n'
            '*) printf %s\\\\n "  #  RESIDUE AA" "    1    1 A A  E " ;;\n'
            "esac\n"
        )
        self._fake_dssp(tmp_path, body, monkeypatch)
        labels = ss.annotate_pdb_sse_dssp("ignored.pdb")
        assert list(labels) == ["b"]

    def test_dssp_failure_gives_sentinel_not_crash(self, tmp_path, monkeypatch):
        """One malformed PDB must produce the (-1, -1) sentinel (reference
        failure convention), not abort a parallel sweep."""
        self._fake_dssp(tmp_path, "echo broken >&2; exit 1\n", monkeypatch)
        pdb = tmp_path / "bad.pdb"
        pdb.write_text("not a pdb\n")
        assert ss.count_structures_in_pdb(str(pdb), backend="dssp") == (-1, -1)


class TestKSFeatureTests:
    def test_matched_vs_shifted(self):
        from foldingdiff_tpu.metrics.kl import ks_feature_tests

        rng = np.random.default_rng(0)
        a = rng.normal(size=(5000, 2))
        b = np.concatenate([rng.normal(size=(5000, 1)),
                            rng.normal(loc=1.5, size=(5000, 1))], axis=1)
        ks = ks_feature_tests(a, b, ["same", "shifted"])
        assert ks["same"]["p_subsampled"] > 0.01
        assert not ks["same"]["reject_subsampled"]
        assert ks["shifted"]["p_subsampled"] < 0.01
        assert ks["shifted"]["reject_subsampled"]
        assert ks["shifted"]["stat"] > ks["same"]["stat"]

    def test_reproducible(self):
        from foldingdiff_tpu.metrics.kl import ks_feature_tests

        rng = np.random.default_rng(1)
        a, b = rng.normal(size=(2000, 3)), rng.normal(size=(2000, 3))
        assert ks_feature_tests(a, b, list("xyz")) == ks_feature_tests(a, b, list("xyz"))
