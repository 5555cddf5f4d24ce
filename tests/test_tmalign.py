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
