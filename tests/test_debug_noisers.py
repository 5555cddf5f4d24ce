"""Debug/synthetic noiser harnesses (reference datasets.py:889-1197)."""
import numpy as np
import pytest

from foldingdiff_tpu.data import datasets as dsets
from foldingdiff_tpu.data.debug_noisers import (
    ScoreMatchingNoisedAnglesDataset,
    SingleNoisedAngleAndTimeDataset,
    SingleNoisedAngleDataset,
    SingleNoisedBondDistanceDataset,
    SynNoisedByPositionDataset,
    SynNoisedMaskedOnlyDataset,
)
from tests.helpers import make_synthetic_pdb_dir


@pytest.fixture(scope="module")
def clean_dset(tmp_path_factory):
    d = tmp_path_factory.mktemp("pdbs")
    make_synthetic_pdb_dir(str(d), n=8, seed=4, min_len=30)
    return dsets.AnglesOnlyDataset(
        pdbs=str(d), pad=48, min_length=0, cache_dir=str(tmp_path_factory.mktemp("c")),
        n_workers=1,
    )


def test_single_angle(clean_dset):
    ds = SingleNoisedAngleDataset(dset=clean_dset, timesteps=50, seed=0, ft_idx=1)
    item = ds[0]
    assert item["angles"].shape == (48, 1)
    assert item["corrupted"].shape == (48, 1)
    assert item["known_noise"].shape == (48, 1)


def test_single_bond_distance(clean_dset):
    ds = SingleNoisedBondDistanceDataset(dset=clean_dset, timesteps=50, seed=0)
    assert ds.selected_index == 0


def test_single_angle_and_time(clean_dset):
    ds = SingleNoisedAngleAndTimeDataset(dset=clean_dset, timesteps=250, seed=0)
    for i in range(3):
        assert int(ds[i]["t"][0]) == ds.selected_timestep


def test_syn_by_position(clean_dset):
    ds = SynNoisedByPositionDataset(clean_dset, dset_key="angles", timesteps=50)
    item = ds[0]
    seq_len = float(np.sum(item["attn_mask"]))
    noise = item["known_noise"]
    # front half positive, back half negative
    assert np.all(noise[: int(seq_len // 2)] >= 0)
    assert np.all(noise[int(np.ceil(seq_len / 2)) :] <= 0)


def test_syn_masked_only_mask_invariance_property(clean_dset):
    ds = SynNoisedMaskedOnlyDataset(clean_dset)
    item = ds[0]
    mask = item["attn_mask"]
    np.testing.assert_array_equal(
        item["corrupted"][mask == 1], item["angles"][mask == 1]
    )
    assert np.all(item["known_noise"][mask == 1] == 0)


def test_score_matching(clean_dset):
    ds = ScoreMatchingNoisedAnglesDataset(clean_dset, seed=0)
    item = ds[0]
    assert "score" in item and item["score"].shape == item["corrupted"].shape
    assert 0 <= float(item["t"][0]) <= 1
    # Score of tiny noise should point back toward the original:
    # sign(score) == sign(orig - corr) in the small-sigma regime
    orig = item["angles"]
    t_small = 0.01
    sigma = ds.get_sigma(t_small)
    corr = orig + 0.5 * sigma
    score = ds.get_score(corr, orig, t_small)
    assert np.all(score <= 0)  # gradient points back down toward orig
