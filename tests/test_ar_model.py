"""AR baseline tests: forward, training step, jitted generation loop."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from foldingdiff_tpu.models.ar import BertForAutoregressive, ar_sample
from foldingdiff_tpu.models.config import ModelConfig
from foldingdiff_tpu.training.ar_trainer import ARTrainer
from foldingdiff_tpu.training.trainer import TrainConfig

CONFIG = ModelConfig(
    hidden_size=48,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=96,
    max_position_embeddings=32,
)


@pytest.fixture(scope="module")
def model_and_vars():
    model = BertForAutoregressive(CONFIG)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 32, 6)),
        jnp.ones((1, 32)),
        jnp.full((1,), 32),
        deterministic=True,
    )
    return model, variables


def test_forward_shape(model_and_vars):
    model, variables = model_and_vars
    out = model.apply(
        variables, jnp.zeros((3, 32, 6)), jnp.ones((3, 32)), jnp.full((3,), 32),
        deterministic=True,
    )
    assert out.shape == (3, 32, 6)


def test_length_embedding_changes_output(model_and_vars):
    model, variables = model_and_vars
    x = jnp.zeros((2, 32, 6))
    mask = jnp.ones((2, 32))
    o1 = model.apply(variables, x, mask, jnp.full((2,), 32), deterministic=True)
    o2 = model.apply(variables, x, mask, jnp.full((2,), 64), deterministic=True)
    assert not np.allclose(np.asarray(o1), np.asarray(o2), atol=1e-4)


def test_ar_sample_fills_positions(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(0)
    seed_angles = jnp.asarray(
        rng.uniform(-1, 1, size=(2, 32, 6)).astype(np.float32)
    )
    lengths = np.array([20, 32])
    out = ar_sample(
        model, variables["params"], variables.get("constants", {}),
        seed_angles, lengths, num_seed=4,
    )
    out = np.asarray(out)
    # Seed positions unchanged
    np.testing.assert_array_equal(out[:, :4], np.asarray(seed_angles)[:, :4])
    # Generated positions differ from the initial values
    assert not np.allclose(out[:, 4:32], np.asarray(seed_angles)[:, 4:32])


def test_ar_loss_ignores_zero_length_padded_rows(model_and_vars):
    """shard_batch zero-pads ragged batches (lengths == 0); those rows must
    not contribute to the AR loss -- their content must be irrelevant."""
    model, variables = model_and_vars
    trainer = ARTrainer(model, TrainConfig(lr=1e-3, batch_size=4, max_epochs=1),
                        steps_per_epoch=1)
    rng = np.random.default_rng(3)
    real = rng.uniform(-np.pi, np.pi, size=(2, 32, 6)).astype(np.float32)
    key = jax.random.PRNGKey(0)

    def batch(pad_value):
        angles = np.concatenate([real, np.full((2, 32, 6), pad_value, np.float32)])
        lengths = np.array([32, 32, 0, 0], np.int32)
        mask = (np.arange(32)[None, :] < lengths[:, None]).astype(np.float32)
        return {"angles": jnp.asarray(angles), "attn_mask": jnp.asarray(mask),
                "lengths": jnp.asarray(lengths)}

    loss_zeros = trainer._eval_step(
        variables["params"], variables.get("constants", {}), batch(0.0), key)
    loss_garbage = trainer._eval_step(
        variables["params"], variables.get("constants", {}), batch(2.5), key)
    np.testing.assert_allclose(
        float(loss_zeros), float(loss_garbage), rtol=0, atol=0,
        err_msg="padded rows leak into the AR loss",
    )
    assert np.isfinite(float(loss_zeros))


def test_ar_training_reduces_loss(tmp_path):
    rng = np.random.default_rng(0)
    n, l = 32, 32
    # Learnable pattern: smooth angle sequences
    base = np.cumsum(rng.normal(scale=0.05, size=(n, l, 6)), axis=1).astype(np.float32)
    data = {
        "angles": np.clip(base, -np.pi, np.pi),
        "attn_mask": np.ones((n, l), dtype=np.float32),
        "lengths": np.full((n,), l, dtype=np.int32),
    }
    tcfg = TrainConfig(lr=3e-4, batch_size=8, max_epochs=10, lr_scheduler=None, seed=0)
    trainer = ARTrainer(BertForAutoregressive(CONFIG), tcfg, steps_per_epoch=4)
    state = trainer.init_state(jax.random.PRNGKey(0), pad=l)
    state, rows = trainer.fit(state, data)
    assert rows[-1]["train_loss"] < rows[0]["train_loss"]
