"""Training across all four angles_definitions feature sets (the reference's
dataset-class dispatch, bin/train.py:136-141): canonical (9 features incl.
distances, mixed angularity), full-angles (6), minimal (4), cart-coords (3)."""
import numpy as np
import pytest

from foldingdiff_tpu.training.orchestration import train
from tests.helpers import make_synthetic_pdb_dir


@pytest.fixture(scope="module")
def pdb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pdbs")
    make_synthetic_pdb_dir(str(d), n=12, seed=9, min_len=30)
    return str(d)


@pytest.mark.parametrize(
    "angles_definitions,n_features",
    [
        ("canonical", 9),
        ("canonical-full-angles", 6),
        ("canonical-minimal-angles", 4),
        ("cart-coords", 3),
    ],
)
def test_train_one_epoch_each_feature_set(pdb_dir, tmp_path, angles_definitions, n_features):
    state, rows = train(
        results_dir=str(tmp_path / angles_definitions),
        dataset_key=pdb_dir,
        angles_definitions=angles_definitions,
        max_seq_len=48,
        min_seq_len=0,
        timesteps=10,
        variance_schedule="cosine",
        num_hidden_layers=1,
        hidden_size=32,
        intermediate_size=64,
        num_heads=2,
        batch_size=8,
        lr=1e-4,
        lr_scheduler=None,
        max_epochs=1,
        dryrun=True,
        use_mesh=False,
    )
    assert np.isfinite(rows[0]["train_loss"])
    import jax

    n_model_inputs = jax.tree.leaves(
        {"k": state.params["inputs_to_hidden_dim"]["kernel"]}
    )[0].shape[0]
    assert n_model_inputs == n_features
