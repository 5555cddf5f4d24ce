"""Dataset-layer tests (port of reference tests/test_data.py, using a
synthetic PDB directory instead of the CATH download)."""
import os

import numpy as np
import pytest

from foldingdiff_tpu.data import datasets as dsets
from tests.helpers import make_synthetic_pdb_dir


@pytest.fixture(scope="module")
def pdb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pdbs")
    make_synthetic_pdb_dir(str(d), n=24, seed=1, min_len=25)
    return str(d)


@pytest.fixture(scope="module")
def cache_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cache"))


class TestAngleDataset:
    def test_shapes_and_keys(self, pdb_dir, cache_dir):
        ds = dsets.AngleDataset(
            pdbs=pdb_dir, pad=64, min_length=0, cache_dir=cache_dir, n_workers=1
        )
        assert len(ds) == 24
        item = ds[0]
        assert set(item.keys()) == {"angles", "coords", "attn_mask", "position_ids", "lengths"}
        assert item["angles"].shape == (64, 9)
        assert item["coords"].shape == (64, 3)
        assert item["attn_mask"].shape == (64,)
        assert item["attn_mask"].sum() == item["lengths"]

    def test_angles_only_subset(self, pdb_dir, cache_dir):
        ds = dsets.AnglesOnlyDataset(
            pdbs=pdb_dir, pad=64, min_length=0, cache_dir=cache_dir, n_workers=1
        )
        item = ds[0]
        assert item["angles"].shape == (64, 6)
        ang = item["angles"][: int(item["lengths"])]
        assert ang.min() >= -np.pi - 1e-5 and ang.max() <= np.pi + 1e-5

    def test_minimal_subset(self, pdb_dir, cache_dir):
        ds = dsets.MinimalAnglesDataset(
            pdbs=pdb_dir, pad=64, min_length=0, cache_dir=cache_dir, n_workers=1
        )
        assert ds[0]["angles"].shape == (64, 4)

    def test_coords_dataset(self, pdb_dir, cache_dir):
        ds = dsets.CoordsDataset(
            pdbs=pdb_dir, pad=64, min_length=0, cache_dir=cache_dir, n_workers=1
        )
        item = ds[0]
        assert "angles" not in item
        assert item["coords"].shape == (64, 3)

    def test_zero_center_means(self, pdb_dir, cache_dir):
        ds = dsets.AnglesOnlyDataset(
            pdbs=pdb_dir, pad=64, min_length=0, cache_dir=cache_dir, n_workers=1
        )
        assert ds.means is not None
        # After centering, wrapped mean of observed angles should be ~0
        vals = []
        for i in range(len(ds)):
            item = ds[i]
            vals.append(item["angles"][: int(item["lengths"])])
        concat = np.concatenate(vals)
        from foldingdiff_tpu.utils import wrapped_mean

        m = wrapped_mean(concat, axis=0)
        assert np.all(np.abs(m) < 0.15), m

    def test_split_disjoint_and_sizes(self, pdb_dir, cache_dir):
        kwargs = dict(pdbs=pdb_dir, pad=64, min_length=0, cache_dir=cache_dir, n_workers=1)
        train = dsets.AnglesOnlyDataset(split="train", **kwargs)
        valid = dsets.AnglesOnlyDataset(split="validation", **kwargs)
        test = dsets.AnglesOnlyDataset(split="test", **kwargs)
        all_files = set(train.filenames) | set(valid.filenames) | set(test.filenames)
        assert len(all_files) == 24
        assert not (set(train.filenames) & set(valid.filenames))
        assert not (set(train.filenames) & set(test.filenames))
        assert len(train) == int(24 * 0.8)

    def test_split_deterministic(self, pdb_dir, cache_dir):
        kwargs = dict(pdbs=pdb_dir, pad=64, min_length=0, cache_dir=cache_dir, n_workers=1)
        a = dsets.AnglesOnlyDataset(split="train", **kwargs)
        b = dsets.AnglesOnlyDataset(split="train", **kwargs)
        assert a.filenames == b.filenames

    def test_cache_roundtrip(self, pdb_dir, tmp_path):
        cache = str(tmp_path)
        ds1 = dsets.AngleDataset(pdbs=pdb_dir, pad=64, min_length=0, cache_dir=cache, n_workers=1)
        assert os.path.isfile(ds1.cache_fname)
        ds2 = dsets.AngleDataset(pdbs=pdb_dir, pad=64, min_length=0, cache_dir=cache, n_workers=1)
        np.testing.assert_allclose(ds1[0]["angles"], ds2[0]["angles"])

    def test_min_length_filter(self, pdb_dir, cache_dir):
        ds = dsets.AngleDataset(
            pdbs=pdb_dir, pad=64, min_length=40, cache_dir=cache_dir, n_workers=1
        )
        assert all(l >= 40 for l in ds.all_lengths)

    def test_trim_discard(self, pdb_dir, cache_dir):
        ds = dsets.AngleDataset(
            pdbs=pdb_dir, pad=30, min_length=0, trim_strategy="discard",
            cache_dir=cache_dir, n_workers=1,
        )
        assert all(l <= 30 for l in ds.all_lengths)

    def test_trim_leftalign_and_randomcrop(self, pdb_dir, cache_dir):
        for strategy in ["leftalign", "randomcrop"]:
            ds = dsets.AngleDataset(
                pdbs=pdb_dir, pad=30, min_length=0, trim_strategy=strategy,
                cache_dir=cache_dir, n_workers=1,
            )
            item = ds[0]
            assert item["angles"].shape == (30, 9)

    def test_to_arrays(self, pdb_dir, cache_dir):
        ds = dsets.AnglesOnlyDataset(
            pdbs=pdb_dir, pad=64, min_length=0, cache_dir=cache_dir, n_workers=1
        )
        arrays = ds.to_arrays()
        assert arrays["angles"].shape == (24, 64, 6)
        assert arrays["attn_mask"].shape == (24, 64)
        assert arrays["lengths"].shape == (24,)

    def test_sample_length(self, pdb_dir, cache_dir):
        ds = dsets.AngleDataset(pdbs=pdb_dir, pad=64, min_length=0, cache_dir=cache_dir, n_workers=1)
        l = ds.sample_length()
        assert l in ds.all_lengths
        ls = ds.sample_length(5)
        assert len(ls) == 5


class TestNoisedDataset:
    def test_keys_and_shapes(self, pdb_dir, cache_dir):
        clean = dsets.AnglesOnlyDataset(
            pdbs=pdb_dir, pad=64, min_length=0, cache_dir=cache_dir, n_workers=1
        )
        noised = dsets.NoisedAnglesDataset(clean, timesteps=50, beta_schedule="cosine", seed=0)
        item = noised[0]
        for k in ["corrupted", "t", "known_noise", "angles", "attn_mask"]:
            assert k in item, k
        assert item["corrupted"].shape == (64, 6)
        assert 0 <= int(item["t"][0]) < 50

    def test_analytic_denoise_recovers_x0(self, pdb_dir, cache_dir):
        """Reference test_data.py:156-168."""
        clean = dsets.AnglesOnlyDataset(
            pdbs=pdb_dir, pad=64, min_length=0, cache_dir=cache_dir, n_workers=1
        )
        noised = dsets.NoisedAnglesDataset(clean, timesteps=250, beta_schedule="cosine", seed=0)
        item = noised.__getitem__(0, use_t_val=2)
        recovered = (
            item["corrupted"] - item["sqrt_one_minus_alphas_cumprod_t"] * item["known_noise"]
        ) / item["sqrt_alphas_cumprod_t"]
        # Wrap differences back: corrupted was wrapped
        from foldingdiff_tpu.utils import modulo_with_wrapped_range

        diff = modulo_with_wrapped_range(recovered - np.asarray(item["angles"]))
        assert np.abs(diff).max() < 0.1, np.abs(diff).max()

    def test_exhaustive_t(self, pdb_dir, cache_dir):
        clean = dsets.AnglesOnlyDataset(
            pdbs=pdb_dir, pad=64, min_length=0, cache_dir=cache_dir, n_workers=1
        )
        noised = dsets.NoisedAnglesDataset(clean, timesteps=10, exhaustive_t=True, seed=0)
        assert len(noised) == len(clean) * 10
        assert int(noised[5]["t"][0]) == 5

    def test_empty_dataset_from_dir(self, tmp_path):
        import json

        train_args = {
            "angles_definitions": "canonical-full-angles",
            "max_seq_len": 128,
        }
        with open(tmp_path / "training_args.json", "w") as f:
            json.dump(train_args, f)
        np.save(tmp_path / "training_mean_offset.npy", np.arange(6, dtype=float))
        empty = dsets.AnglesEmptyDataset.from_dir(str(tmp_path))
        assert empty.pad == 128
        np.testing.assert_allclose(empty.get_masked_means(), np.arange(6))


class TestCausalDataset:
    def test_causal_wrapper(self, pdb_dir, cache_dir):
        clean = dsets.AnglesOnlyDataset(
            pdbs=pdb_dir, pad=64, min_length=0, cache_dir=cache_dir, n_workers=1
        )
        causal = dsets.AutoregressiveCausalDataset(clean, seed=0)
        item = causal[0]
        cl = int(item["causal_idx"])
        assert 1 <= cl < int(item["lengths"])
        assert item["causal_attn_mask"].sum() == cl
        np.testing.assert_allclose(item["causal_target"], item["angles"][cl])
