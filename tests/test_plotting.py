"""Plotting functions produce their artifact files (matplotlib Agg; content
is eyeballed, existence+shape is gated). Reference: foldingdiff/plotting.py +
bin/train.py:52-108."""
import os

import numpy as np
import pytest

from foldingdiff_tpu.metrics import plotting


def test_plot_kl_divergence(tmp_path):
    out = plotting.plot_kl_divergence(
        np.random.default_rng(0).uniform(0, 2, size=(20, 6)),
        ["phi", "psi", "omega", "tau", "a", "b"],
        str(tmp_path / "kl.pdf"),
    )
    assert os.path.getsize(out) > 0


def test_plot_timestep_distributions(tmp_path):
    """Pre-train per-timestep corrupted histograms (reference
    bin/train.py:52-80): one pdf per selected timestep."""
    from foldingdiff_tpu.data.datasets import AnglesEmptyDataset, NoisedAnglesDataset

    class TinyClean(AnglesEmptyDataset):
        def __init__(self):
            super().__init__("canonical-full-angles", pad=16)
            self._rng = np.random.default_rng(0)

        def __len__(self):
            return 8

        def __getitem__(self, index, ignore_zero_center=False):
            rng = np.random.default_rng(index)
            return {
                "angles": rng.uniform(-1, 1, size=(16, 6)).astype(np.float32),
                "attn_mask": (np.arange(16) < 12).astype(np.float32),
                "lengths": np.array(12),
            }

    noised = NoisedAnglesDataset(TinyClean(), timesteps=10, beta_schedule="cosine")
    outs = plotting.plot_timestep_distributions(
        noised, timesteps=10, plots_folder=str(tmp_path), n_intervals=3, max_items=4
    )
    assert len(outs) == 3
    for o in outs:
        assert os.path.getsize(o) > 0
    assert any("train_dists_at_t_0" in o for o in outs)
    assert any("train_dists_at_t_9" in o for o in outs)


def test_plot_losses_from_metrics_csv(tmp_path):
    import csv

    rows = [
        {"epoch": e, "train_loss": 1.0 / (e + 1), "val_loss": 1.1 / (e + 1),
         "train_loss_phi": 0.5 / (e + 1), "val_loss_phi": 0.6 / (e + 1), "lr": 1e-4}
        for e in range(5)
    ]
    p = tmp_path / "metrics.csv"
    with open(p, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    out = plotting.plot_losses(str(p), out_fname=str(tmp_path / "losses.pdf"))
    assert os.path.getsize(out) > 0
