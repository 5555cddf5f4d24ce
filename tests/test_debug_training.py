"""Debug-noiser training paths (reference train.py syn_noiser /
single_angle_debug flags) + exhaustive-t validation."""
import numpy as np
import pytest

import jax

from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
from foldingdiff_tpu.models import BertForDiffusion, ModelConfig
from foldingdiff_tpu.training import Trainer, TrainConfig
from tests.helpers import make_synthetic_pdb_dir


@pytest.fixture(scope="module")
def pdb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pdbs")
    make_synthetic_pdb_dir(str(d), n=16, seed=5, min_len=30)
    return str(d)


def test_single_angle_debug_training(pdb_dir, tmp_path):
    """train() with single_angle_debug builds a 1-feature model and learns."""
    from foldingdiff_tpu.training.orchestration import train

    state, rows = train(
        results_dir=str(tmp_path / "r"),
        dataset_key=pdb_dir,
        angles_definitions="canonical-full-angles",
        max_seq_len=48,
        min_seq_len=0,
        timesteps=10,
        variance_schedule="cosine",
        num_hidden_layers=1,
        hidden_size=32,
        intermediate_size=64,
        num_heads=2,
        batch_size=8,
        lr=3e-4,
        lr_scheduler=None,
        max_epochs=3,
        single_angle_debug=1,
        dryrun=True,
        use_mesh=False,
    )
    assert len(rows) == 3
    assert np.isfinite(rows[-1]["train_loss"])


def test_syn_noiser_training(pdb_dir, tmp_path):
    from foldingdiff_tpu.training.orchestration import train

    state, rows = train(
        results_dir=str(tmp_path / "r2"),
        dataset_key=pdb_dir,
        angles_definitions="canonical-full-angles",
        max_seq_len=48,
        min_seq_len=0,
        timesteps=10,
        num_hidden_layers=1,
        hidden_size=32,
        intermediate_size=64,
        num_heads=2,
        batch_size=8,
        lr=3e-4,
        lr_scheduler=None,
        max_epochs=2,
        syn_noiser="halfhalf",
        dryrun=True,
        use_mesh=False,
    )
    assert np.isfinite(rows[-1]["train_loss"])


def test_exhaustive_t_eval():
    cfg = ModelConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=16,
    )
    sched = DiffusionSchedule.create("linear", 20)
    tcfg = TrainConfig(lr=1e-3, batch_size=8, max_epochs=1, lr_scheduler=None)
    trainer = Trainer(BertForDiffusion(cfg), sched, tcfg, steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(0), pad=16)
    rng = np.random.default_rng(0)
    data = {
        "angles": rng.uniform(-np.pi, np.pi, (8, 16, 6)).astype(np.float32),
        "attn_mask": np.ones((8, 16), np.float32),
        "lengths": np.full((8,), 16, np.int64),
    }
    terms = trainer.eval_exhaustive_t(state, data, n_t=4)
    assert terms.shape == (6,)
    assert np.all(np.isfinite(terms))
