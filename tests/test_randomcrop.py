"""Per-epoch randomcrop augmentation (reference datasets.py:411-438).

The reference draws a fresh pad-window of every >pad structure at each
__getitem__, i.e. each epoch trains on different crops -- that re-cropping is
the data augmentation the paper config (pad-128 randomcrop over CATH domains
mostly >128) relies on. These tests pin down the TPU-side equivalent:
refresh_crops_ re-derives only the long items in the stacked host arrays, is
a byte-exact no-op for <=pad corpora, and is wired through
train(trim_strategy="randomcrop") so consecutive epochs see different crops.
"""
import os

import numpy as np
import pytest

from foldingdiff_tpu.data import datasets as dsets
from tests.helpers import make_synthetic_pdb_dir

PAD = 24  # 1CRN-derived synthetic structures run 30..46 residues -> all >pad


@pytest.fixture(scope="module")
def long_corpus(tmp_path_factory):
    pdb_dir = str(tmp_path_factory.mktemp("pdbs_long"))
    make_synthetic_pdb_dir(pdb_dir, n=12, seed=7, min_len=40)
    return pdb_dir


def _make_ds(pdb_dir, cache_dir, pad=PAD, trim="randomcrop"):
    return dsets.AnglesOnlyDataset(
        pdbs=pdb_dir, pad=pad, min_length=10, trim_strategy=trim,
        cache_dir=cache_dir, n_workers=1,
    )


def test_refresh_changes_long_crops_and_is_seed_deterministic(long_corpus, tmp_path):
    ds = _make_ds(long_corpus, str(tmp_path))
    assert len(ds.over_pad_indices) == len(ds), "all synthetic structures exceed pad"

    arrays = ds.to_arrays()
    e1 = {k: np.copy(v) for k, v in ds.refresh_crops_(arrays, epoch_seed=1).items()}
    e2 = {k: np.copy(v) for k, v in ds.refresh_crops_(arrays, epoch_seed=2).items()}
    # Different epochs -> different windows of the long structures
    assert not np.array_equal(e1["angles"], e2["angles"])
    # Same epoch seed -> byte-identical crops (resume / multi-host determinism)
    e1_again = ds.refresh_crops_(arrays, epoch_seed=1)
    np.testing.assert_array_equal(e1["angles"], e1_again["angles"])
    np.testing.assert_array_equal(e1["coords"], e1_again["coords"])
    # Cropped rows stay full-length windows: mask/lengths are all-pad
    assert int(e1["lengths"].min()) == PAD
    np.testing.assert_array_equal(e1["attn_mask"], np.ones_like(e1["attn_mask"]))


def test_crops_are_valid_windows_of_the_source(long_corpus, tmp_path):
    """Every refreshed row must equal SOME contiguous window of the original
    (centered) feature matrix -- i.e. a crop, not a recompute or shuffle."""
    ds = _make_ds(long_corpus, str(tmp_path))
    arrays = ds.to_arrays()
    ds.refresh_crops_(arrays, epoch_seed=123)
    from foldingdiff_tpu import utils

    i = ds.over_pad_indices[0]
    full = np.asarray(ds.structures[i]["angles"], dtype=np.float64)[:, ds.feature_idx]
    full = utils.modulo_with_wrapped_range(full - ds.get_masked_means(), -np.pi, np.pi)
    full = np.nan_to_num(full, nan=0.0).astype(np.float32)
    got = arrays["angles"][i]
    matches = [
        s for s in range(full.shape[0] - PAD + 1)
        if np.allclose(full[s : s + PAD], got, atol=1e-6)
    ]
    assert matches, "refreshed row is not a contiguous window of the source structure"


def test_refresh_is_noop_for_short_corpus(long_corpus, tmp_path):
    """<=pad corpora: refresh leaves the stacked arrays byte-identical, so
    randomcrop on short data degenerates to leftalign exactly like the
    reference (datasets.py:420-423: crop only when length > pad)."""
    ds = _make_ds(long_corpus, str(tmp_path), pad=64)
    assert ds.over_pad_indices == []
    arrays = ds.to_arrays()
    before = {k: np.copy(v) for k, v in arrays.items()}
    out = ds.refresh_crops_(arrays, epoch_seed=99)
    assert out is arrays
    for k in before:
        np.testing.assert_array_equal(before[k], arrays[k])


def test_leftalign_never_refreshes(long_corpus, tmp_path):
    ds = _make_ds(long_corpus, str(tmp_path), trim="leftalign")
    arrays = ds.to_arrays()
    before = np.copy(arrays["angles"])
    ds.refresh_crops_(arrays, epoch_seed=5)
    np.testing.assert_array_equal(before, arrays["angles"])


def test_randomcrop_wired_through_train(long_corpus, tmp_path, monkeypatch):
    """train(trim_strategy='randomcrop') must call the refresh once per epoch
    with distinct crops per epoch (VERDICT r3 item 1 acceptance)."""
    from foldingdiff_tpu.training.orchestration import train

    calls = []
    orig = dsets.AngleDataset.refresh_crops_

    def spy(self, arrays, epoch_seed):
        out = orig(self, arrays, epoch_seed)
        calls.append((epoch_seed, np.copy(out["angles"])))
        return out

    monkeypatch.setattr(dsets.AngleDataset, "refresh_crops_", spy)
    monkeypatch.setenv("FOLDINGDIFF_CACHE_DIR", str(tmp_path / "cache"))
    os.makedirs(tmp_path / "cache", exist_ok=True)
    train(
        results_dir=str(tmp_path / "results"),
        dataset_key=long_corpus,
        angles_definitions="canonical-full-angles",
        max_seq_len=PAD,
        min_seq_len=10,
        trim_strategy="randomcrop",
        timesteps=5,
        variance_schedule="cosine",
        num_hidden_layers=1,
        hidden_size=16,
        intermediate_size=32,
        num_heads=2,
        batch_size=4,
        max_epochs=2,
        min_epochs=1,
        dryrun=True,
        multithread=False,
        use_mesh=False,
    )
    assert len(calls) == 2, "refresh must run once per epoch"
    assert calls[0][0] != calls[1][0]
    assert not np.array_equal(calls[0][1], calls[1][1]), (
        "consecutive epochs saw identical crops of >pad structures"
    )
