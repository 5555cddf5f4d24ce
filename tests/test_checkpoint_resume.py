"""Mid-training resume: state round-trips and continued training matches."""
import numpy as np

import jax

from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
from foldingdiff_tpu.models import BertForDiffusion, ModelConfig
from foldingdiff_tpu.training import Trainer, TrainConfig
from foldingdiff_tpu.training.checkpoint import (
    latest_train_state,
    restore_train_state,
    save_train_state,
)

CONFIG = ModelConfig(
    hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
    intermediate_size=64, max_position_embeddings=16,
)


def _data(n=16, l=16):
    rng = np.random.default_rng(0)
    return {
        "angles": rng.uniform(-np.pi, np.pi, size=(n, l, 6)).astype(np.float32),
        "attn_mask": np.ones((n, l), dtype=np.float32),
        "lengths": np.full((n,), l, dtype=np.int64),
    }


def test_state_roundtrip(tmp_path):
    sched = DiffusionSchedule.create("linear", 10)
    tcfg = TrainConfig(lr=1e-3, batch_size=8, max_epochs=2, lr_scheduler=None, seed=0)
    trainer = Trainer(BertForDiffusion(CONFIG), sched, tcfg, steps_per_epoch=2)
    state = trainer.init_state(jax.random.PRNGKey(0), pad=16)
    state, _ = trainer.fit(state, _data())

    path = save_train_state(str(tmp_path), state, epoch=1)
    assert latest_train_state(str(tmp_path)) == path

    template = trainer.init_state(jax.random.PRNGKey(1), pad=16)
    restored, next_epoch = restore_train_state(path, template)
    assert next_epoch == 2
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Optimizer moments preserved too
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_training(tmp_path):
    sched = DiffusionSchedule.create("linear", 10)
    data = _data()
    tcfg = TrainConfig(lr=1e-3, batch_size=8, max_epochs=4, lr_scheduler=None, seed=0)
    trainer = Trainer(BertForDiffusion(CONFIG), sched, tcfg, steps_per_epoch=2)
    state = trainer.init_state(jax.random.PRNGKey(0), pad=16)
    state, rows = trainer.fit(
        state, data, results_dir=str(tmp_path), model_config=CONFIG,
        train_args={}, save_state_every=1,
    )
    assert latest_train_state(str(tmp_path)) is not None

    # Resume from a fresh template: should skip to epoch 4 (nothing to do)
    state2 = trainer.init_state(jax.random.PRNGKey(9), pad=16)
    state2, rows2 = trainer.fit(
        state2, data, results_dir=str(tmp_path), model_config=CONFIG,
        train_args={}, resume=True,
    )
    assert len(rows2) == 0  # already at max_epochs
    assert int(state2.step) == int(state.step)


def test_preemption_signal_checkpoints(tmp_path):
    """SIGTERM mid-training saves the full train state and stops cleanly."""
    import os
    import signal
    import threading

    sched = DiffusionSchedule.create("linear", 10)
    tcfg = TrainConfig(lr=1e-3, batch_size=8, max_epochs=10_000, lr_scheduler=None, seed=0)
    trainer = Trainer(BertForDiffusion(CONFIG), sched, tcfg, steps_per_epoch=2)
    state = trainer.init_state(jax.random.PRNGKey(0), pad=16)

    timer = threading.Timer(3.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        state, rows = trainer.fit(
            state, _data(), results_dir=str(tmp_path), model_config=CONFIG, train_args={},
        )
    finally:
        timer.cancel()
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
    assert len(rows) < 10_000  # stopped early
    assert latest_train_state(str(tmp_path)) is not None


def test_write_valid_preds(tmp_path):
    import glob
    import json

    sched = DiffusionSchedule.create("linear", 10)
    tcfg = TrainConfig(lr=1e-3, batch_size=8, max_epochs=2, lr_scheduler=None, seed=0)
    trainer = Trainer(BertForDiffusion(CONFIG), sched, tcfg, steps_per_epoch=2)
    state = trainer.init_state(jax.random.PRNGKey(0), pad=16)
    data = _data()
    state, rows = trainer.fit(
        state, data, valid_data=data, results_dir=str(tmp_path), model_config=CONFIG,
        train_args={}, write_preds_to_dir=str(tmp_path / "valid_preds"),
    )
    preds = sorted(glob.glob(str(tmp_path / "valid_preds" / "*_preds.json")))
    assert len(preds) == 2
    with open(preds[0]) as f:
        d = json.load(f)
    assert set(d.keys()) == {"known_noise", "predicted_noise", "attn_mask", "losses"}

    # exhaustive-t validation must not silently drop the write request
    trainer2 = Trainer(BertForDiffusion(CONFIG), sched, tcfg, steps_per_epoch=2)
    state2 = trainer2.init_state(jax.random.PRNGKey(0), pad=16)
    trainer2.fit(
        state2, data, valid_data=data, results_dir=str(tmp_path / "ex"),
        model_config=CONFIG, train_args={},
        write_preds_to_dir=str(tmp_path / "ex_valid_preds"),
        exhaustive_t_validation=True,
    )
    ex_preds = sorted(glob.glob(str(tmp_path / "ex_valid_preds" / "*_preds.json")))
    assert len(ex_preds) == 2
    with open(ex_preds[0]) as f:
        d = json.load(f)
    assert set(d.keys()) == {"known_noise", "predicted_noise", "attn_mask", "losses"}
