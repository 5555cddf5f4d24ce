"""Port of reference tests/test_tmalign.py + native C++ TM-align tests."""
import os

import numpy as np
import pytest

from foldingdiff_tpu.eval import tmscore

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
CRN = os.path.join(DATA_DIR, "1CRN.pdb")
PFL = os.path.join(DATA_DIR, "7PFL.pdb")
ZYA = os.path.join(DATA_DIR, "7ZYA.pdb")


class TestRunTmalign:
    """Reference tests/test_tmalign.py: determinism, self=1.0, non-self<1."""

    def test_deterministic(self):
        a = tmscore.run_tmalign(PFL, ZYA)
        b = tmscore.run_tmalign(PFL, ZYA)
        assert a == b

    def test_self_is_one(self):
        assert tmscore.run_tmalign(CRN, CRN) > 0.999
        assert tmscore.run_tmalign(PFL, PFL) > 0.999

    def test_non_self_below_one(self):
        s = tmscore.run_tmalign(PFL, ZYA)
        assert 0.0 < s < 1.0


@pytest.mark.skipif(
    not pytest.importorskip("foldingdiff_tpu.eval.tmalign_native").available(),
    reason="native TM-align not built",
)
class TestNativeTmalign:
    def _ca(self, f):
        from foldingdiff_tpu.geometry.pdb import extract_backbone_coords

        return extract_backbone_coords(f, atoms=("CA",))

    def test_rigid_motion_invariance(self):
        from scipy.spatial.transform import Rotation

        from foldingdiff_tpu.eval import tmalign_native as tn

        crn = self._ca(CRN)
        rot = Rotation.random(random_state=1).as_matrix()
        moved = crn @ rot.T + np.array([7.0, -3.0, 11.0])
        assert tn.tm_align_coords(moved, crn) > 0.999

    def test_fragment_alignment_exact_ratio(self):
        """A perfectly-matching fragment aligns fully: TM = len_frag / len_ref."""
        from foldingdiff_tpu.eval import tmalign_native as tn

        crn = self._ca(CRN)
        frag = crn[10:40]
        score = tn.tm_align_coords(frag, crn)
        assert np.isclose(score, 30 / len(crn), atol=1e-6), score

    def test_dissimilar_structures_low(self):
        from foldingdiff_tpu.eval import tmalign_native as tn

        assert tn.tm_align_coords(self._ca(CRN), self._ca(PFL)) < 0.35

    def test_matches_python_identity_path(self):
        from foldingdiff_tpu.eval import tmalign_native as tn

        crn = self._ca(CRN)
        rng = np.random.default_rng(0)
        noisy = crn + rng.normal(scale=0.8, size=crn.shape)
        native = tn.tm_score_identity_coords(noisy, crn)
        python = tmscore.tm_score(noisy, crn)
        assert np.isclose(native, python, atol=0.02), (native, python)

    def test_alignment_beats_or_equals_threading(self):
        """The DP alignment must never do worse than gapless threading."""
        from foldingdiff_tpu.eval import tmalign_native as tn

        pfl, zya = self._ca(PFL), self._ca(ZYA)
        threading = tmscore.tm_score(pfl, zya)
        native = tn.tm_align_coords(pfl, zya)
        assert native >= threading - 0.02, (native, threading)


@pytest.mark.skipif(
    not pytest.importorskip("foldingdiff_tpu.eval.tmalign_native").available(),
    reason="native TM-align not built",
)
def test_insertion_alignment_beats_threading():
    """The DP alignment must recover identity through an insertion, where
    gapless threading structurally cannot."""
    from foldingdiff_tpu.eval import tmalign_native as tn
    from foldingdiff_tpu.geometry.pdb import extract_backbone_coords

    crn = extract_backbone_coords(CRN, atoms=("CA",))
    pfl = extract_backbone_coords(PFL, atoms=("CA",))
    insert = pfl[50:60] + (crn[19] - pfl[50]) + np.array([8.0, 0.0, 0.0])
    chimera = np.concatenate([crn[:20], insert, crn[20:]])
    dp = tn.tm_align_coords(chimera, crn)
    threading = tmscore.tm_score(chimera, crn)
    assert dp > 0.95, dp
    assert dp > threading + 0.2, (dp, threading)


@pytest.mark.skipif(
    not pytest.importorskip("foldingdiff_tpu.eval.tmalign_native").available(),
    reason="native TM-align not built",
)
class TestDecoyBattery:
    """Systematic decoy battery for the in-repo C++ TM-align (reference
    tmalign.py:22-54 semantics). The real TMalign binary is unavailable
    offline, so absolute accuracy is bounded by construction instead:
    analytically-known decoys (exact truncation ratios, recoverable
    insertions), monotonicity under a noise ramp, chirality/direction
    negatives, and agreement bounds between the C++ DP path, the C++
    identity path, and the independent numpy threading oracle
    (eval/tmscore.py). Measured bounds are documented in
    docs/performance.md ("TM-align validation")."""

    @staticmethod
    def _ca(f):
        from foldingdiff_tpu.geometry.pdb import extract_backbone_coords

        return extract_backbone_coords(f, atoms=("CA",))

    @classmethod
    def setup_class(cls):
        cls.crn = cls._ca(CRN)
        cls.pfl = cls._ca(PFL)
        cls.zya = cls._ca(ZYA)

    # ---- fast subset (runs by default) ------------------------------------

    def test_noise_ramp_fast(self):
        """TM decreases monotonically with noise; at each level the DP path
        >= the identity path == the numpy oracle (within 1e-3)."""
        from foldingdiff_tpu.eval import tmalign_native as tn

        rng = np.random.default_rng(1)
        prev = 1.1
        for sigma in (0.5, 2.0):
            noisy = self.crn + rng.normal(scale=sigma, size=self.crn.shape)
            dp = tn.tm_align_coords(noisy, self.crn)
            ident = tn.tm_score_identity_coords(noisy, self.crn)
            oracle = tmscore.tm_score(noisy, self.crn)
            assert dp < prev - 0.05, f"not monotone at sigma={sigma}"
            assert dp >= ident - 1e-6, "DP must never lose to identity"
            assert abs(ident - oracle) < 1e-3, (ident, oracle)
            prev = dp

    def test_terminal_truncation_exact_ratio(self):
        """Truncating k C-terminal residues gives TM == (L-k)/L exactly
        (all remaining residues align perfectly; d0 normalization by ref)."""
        from foldingdiff_tpu.eval import tmalign_native as tn

        l = len(self.crn)
        score = tn.tm_align_coords(self.crn[: l - 10], self.crn)
        assert np.isclose(score, (l - 10) / l, atol=1e-6), score

    def test_internal_insertion_recovered(self):
        """A 5-residue foreign insertion must be gapped out by the DP:
        TM == 1.0 (all 46 reference residues align), while gapless
        threading structurally cannot recover it."""
        from foldingdiff_tpu.eval import tmalign_native as tn

        ins = self.pfl[50:55] + (self.crn[14] - self.pfl[50]) + np.array([8.0, 0, 0])
        chimera = np.concatenate([self.crn[:15], ins, self.crn[15:]])
        dp = tn.tm_align_coords(chimera, self.crn)
        thr = tmscore.tm_score(chimera, self.crn)
        assert dp > 0.999, dp
        assert thr < 0.75, thr

    def test_mirror_image_negative(self):
        """TM-align must not superpose a mirror image (no reflections in
        Kabsch): the enantiomer scores like an unrelated fold."""
        from foldingdiff_tpu.eval import tmalign_native as tn

        mirrored = self.crn * np.array([-1.0, 1.0, 1.0])
        score = tn.tm_align_coords(mirrored, self.crn)
        assert score < 0.45, score

    # ---- full battery (slow) ----------------------------------------------

    @pytest.mark.slow
    def test_noise_ramp_full(self):
        """Five-level ramp; documents the measured C++-vs-numpy agreement
        bound (identity paths agree to <1e-3 at every level; DP beats
        identity by up to ~0.035 at sigma=4 where realignment helps)."""
        from foldingdiff_tpu.eval import tmalign_native as tn

        rng = np.random.default_rng(0)
        prev = 1.1
        for sigma in (0.2, 0.5, 1.0, 2.0, 4.0):
            noisy = self.crn + rng.normal(scale=sigma, size=self.crn.shape)
            dp = tn.tm_align_coords(noisy, self.crn)
            ident = tn.tm_score_identity_coords(noisy, self.crn)
            oracle = tmscore.tm_score(noisy, self.crn)
            assert dp < prev, f"not monotone at sigma={sigma}"
            assert dp >= ident - 1e-6
            assert abs(ident - oracle) < 1e-3
            assert dp - ident < 0.08, "DP advantage should stay bounded"
            prev = dp

    @pytest.mark.slow
    def test_truncation_sweep(self):
        from foldingdiff_tpu.eval import tmalign_native as tn

        l = len(self.crn)
        for k in (5, 10, 20):
            score = tn.tm_align_coords(self.crn[: l - k], self.crn)
            assert np.isclose(score, (l - k) / l, atol=1e-6), (k, score)

    @pytest.mark.slow
    def test_insertion_sweep(self):
        from foldingdiff_tpu.eval import tmalign_native as tn

        for j, p in ((5, 15), (15, 25)):
            ins = self.pfl[50 : 50 + j] + (self.crn[p - 1] - self.pfl[50]) + np.array([8.0, 0, 0])
            chimera = np.concatenate([self.crn[:p], ins, self.crn[p:]])
            assert tn.tm_align_coords(chimera, self.crn) > 0.999, (j, p)

    @pytest.mark.slow
    def test_reversal_negative(self):
        """Chain-reversed decoy: same point cloud, reversed correspondence;
        sequential alignment must score it like an unrelated fold."""
        from foldingdiff_tpu.eval import tmalign_native as tn

        score = tn.tm_align_coords(self.crn[::-1].copy(), self.crn)
        assert score < 0.45, score

    @pytest.mark.slow
    def test_real_pair_cross_scores(self):
        """Real-pair battery (1CRN/7PFL/7ZYA): near-symmetric for same-length
        pairs, clearly separated from self-scores, deterministic."""
        from foldingdiff_tpu.eval import tmalign_native as tn

        pz = tn.tm_align_coords(self.pfl, self.zya)
        zp = tn.tm_align_coords(self.zya, self.pfl)
        assert 0.1 < pz < 0.5 and 0.1 < zp < 0.5
        assert abs(pz - zp) < 0.05, "len-303 vs len-305 norms differ only slightly"
        assert tn.tm_align_coords(self.crn, self.pfl) < 0.2
        assert tn.tm_align_coords(self.crn, self.zya) < 0.2
        assert tn.tm_align_coords(self.pfl, self.zya) == pz  # deterministic

    @pytest.mark.slow
    def test_rigid_motion_sweep(self):
        """Invariance under 5 random rotations+translations (self-score
        stays 1.0, cross-score unchanged within 1e-3)."""
        from scipy.spatial.transform import Rotation

        from foldingdiff_tpu.eval import tmalign_native as tn

        base = tn.tm_align_coords(self.pfl, self.zya)
        for i in range(5):
            rot = Rotation.random(random_state=i).as_matrix()
            t = np.array([3.0 * i, -2.0 * i, 5.0])
            moved = self.pfl @ rot.T + t
            assert tn.tm_align_coords(moved, self.pfl) > 0.999
            assert abs(tn.tm_align_coords(moved, self.zya) - base) < 1e-3


@pytest.mark.skipif(
    not pytest.importorskip("foldingdiff_tpu.eval.tmalign_native").available(),
    reason="native TM-align not built",
)
class TestFastMode:
    """speed=1 screening mode (the analogue of TM-align's -fast, which the
    reference passes for max-over-references sweeps, tmalign.py:36-37 +
    57-83): truncated refinement must stay deterministic, exact on
    self-alignments, close to the full search on real pairs, and preserve
    the ranking the screen is used for. Note fast is a DIFFERENT truncated
    search, not a subset: either mode can win a given pair by a small
    margin (both are lower bounds of the true optimum)."""

    @staticmethod
    def _ca(f):
        from foldingdiff_tpu.geometry.pdb import extract_backbone_coords

        return extract_backbone_coords(f, atoms=("CA",))

    @classmethod
    def setup_class(cls):
        from foldingdiff_tpu.eval import tmalign_native as tn

        cls.tn = tn
        cls.crn = cls._ca(CRN)
        cls.pfl = cls._ca(PFL)
        cls.zya = cls._ca(ZYA)

    def test_deterministic(self):
        a = self.tn.tm_align_coords(self.pfl, self.zya, fast=True)
        b = self.tn.tm_align_coords(self.pfl, self.zya, fast=True)
        assert a == b

    def test_self_is_one(self):
        for s in (self.crn, self.pfl, self.zya):
            assert self.tn.tm_align_coords(s, s, fast=True) > 0.999

    def test_close_to_full_on_real_pairs(self):
        for q, r in [(self.pfl, self.zya), (self.crn, self.pfl), (self.zya, self.crn)]:
            full = self.tn.tm_align_coords(q, r)
            fast = self.tn.tm_align_coords(q, r, fast=True)
            assert abs(full - fast) < 0.05, (full, fast)

    def test_truncation_ratio_preserved(self):
        """Terminal truncation decoy has an analytically-known score
        (aligned fraction); the fast search must still recover it."""
        n = len(self.pfl)
        kept = int(n * 0.7)
        frag = self.pfl[:kept]
        tm = self.tn.tm_align_coords(frag, self.pfl, fast=True)
        assert abs(tm - kept / n) < 0.02, (tm, kept / n)

    def test_ranking_preserved_for_screening(self):
        """The screen's job: order a dissimilar ref below a near-identical
        one decisively."""
        import numpy as np

        rng = np.random.default_rng(0)
        noisy_self = self.pfl + rng.normal(0, 0.5, self.pfl.shape)
        good = self.tn.tm_align_coords(noisy_self, self.pfl, fast=True)
        bad = self.tn.tm_align_coords(self.zya, self.pfl, fast=True)
        assert good > 0.8 and good > bad + 0.3, (good, bad)

    def test_max_tm_rescore_returns_full_accuracy_score(self):
        """max_tm_across_refs fast-screens then re-scores top-k full: the
        returned score must equal the full-alignment score of the returned
        reference."""
        from foldingdiff_tpu.eval import tmscore

        refs = [PFL, ZYA, CRN]
        score, ref = tmscore.max_tm_across_refs(PFL, refs, parallel=False)
        assert ref == PFL and score > 0.999
        full = tmscore.run_tmalign(PFL, ref, fast=False)
        assert score == full
