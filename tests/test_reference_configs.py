"""Every reference config JSON trains end-to-end.

The reference ships 7 training configs (reference config_jsons/*.json,
consumed by reference bin/train.py:549-570); our bin/train.py promises they
"work unchanged". This test makes that promise a guarantee: each config is
loaded verbatim and passed through orchestration.train(**config) with only
size/speed overrides (tiny model dims, 1 epoch, synthetic 16-structure
corpus) layered on top -- so every config KEY still flows through the real
wiring (pdist loss, discard/randomcrop trims, raw coordinates, schedules,
LinearWarmup, SWA flags), just on shapes CPU can finish fast.
"""
import json
import os

import numpy as np
import pytest

from tests.helpers import make_synthetic_pdb_dir

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_CONFIGS = [
    "cath_full_angles.json",
    "cath_full_angles_cosine.json",
    "cath_full_angles_cosine_discard_long.json",
    "cath_full_angles_cosine_pdist.json",
    "cath_full_angles_discard_long.json",
    "cath_raw_coordinates.json",
    "mini_model.json",
]

# Overrides shrink compute without touching what the config is ABOUT
# (losses, trims, schedules, feature sets all come from the JSON)
_SPEED_OVERRIDES = dict(
    num_hidden_layers=1,
    hidden_size=32,
    intermediate_size=64,
    num_heads=2,
    timesteps=10,
    max_seq_len=48,
    min_seq_len=0,
    max_epochs=1,
    min_epochs=1,
    batch_size=8,
    dryrun=True,
    multithread=False,
)


@pytest.mark.slow
@pytest.mark.parametrize("config_name", REFERENCE_CONFIGS)
def test_reference_config_trains(config_name, tmp_path):
    with open(os.path.join(REPO, "config_jsons", config_name)) as f:
        config = json.load(f)
    # Keys bin/train.py strips before calling train() (parity no-ops)
    config.pop("multithread_plotting", None)
    config.update(_SPEED_OVERRIDES)
    pdb_dir = str(tmp_path / "pdbs")
    make_synthetic_pdb_dir(pdb_dir, n=16, seed=11, min_len=30)
    config["dataset_key"] = pdb_dir
    config["results_dir"] = str(tmp_path / "results")

    from foldingdiff_tpu.training.orchestration import train

    train(**config)

    results = tmp_path / "results"
    assert (results / "training_args.json").exists()
    assert (results / "logs" / "metrics.csv").exists()
    assert list((results / "models" / "best_by_valid").glob("*.msgpack"))
    import csv

    with open(results / "logs" / "metrics.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
    assert np.isfinite(float(rows[0]["train_loss"]))
    # pdist configs must actually engage the extra loss term
    if "pdist" in config_name:
        assert any("pairwise_dist_loss" in k for k in rows[0]), rows[0].keys()
