"""Native C++ featurizer must match the python path exactly."""
import os

import numpy as np
import pytest

from foldingdiff_tpu.data import featurize_native as fn
from foldingdiff_tpu.geometry import featurize

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
FIXTURES = [os.path.join(DATA_DIR, f) for f in ["1CRN.pdb", "7PFL.pdb", "7ZYA.pdb"]]

pytestmark = pytest.mark.skipif(not fn.available(), reason="native featurizer not built")


@pytest.mark.parametrize("pdb_file", FIXTURES)
def test_matches_python_path(pdb_file):
    native = fn.featurize_pdb_native(pdb_file)
    py = featurize.canonical_distances_and_dihedrals(
        pdb_file, distances=featurize.EXHAUSTIVE_DISTS, angles=featurize.EXHAUSTIVE_ANGLES
    )
    assert native is not None and py is not None
    assert native.shape == py.values.shape
    assert fn.COLUMNS == list(py.columns)
    np.testing.assert_allclose(native, py.values, atol=1e-9, equal_nan=True)


def test_rejects_missing_file(tmp_path):
    assert fn.featurize_pdb_native(str(tmp_path / "nope.pdb")) is None


def test_speed_advantage():
    import time

    t0 = time.perf_counter()
    for _ in range(20):
        fn.featurize_pdb_native(FIXTURES[1])
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(20):
        featurize.canonical_distances_and_dihedrals(
            FIXTURES[1], distances=featurize.EXHAUSTIVE_DISTS,
            angles=featurize.EXHAUSTIVE_ANGLES,
        )
    t_py = time.perf_counter() - t0
    assert t_native < t_py, (t_native, t_py)
