"""Tensor-parallel parameter sharding over a 2-D (data, model) mesh must be
numerically equal to single-device execution (GSPMD inserts the collectives)."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from foldingdiff_tpu.models import BertForDiffusion, ModelConfig
from foldingdiff_tpu.models import io as model_io
from foldingdiff_tpu.parallel import tp

CONFIG = ModelConfig(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=128,
    max_position_embeddings=32,
    matmul_precision="highest",
)


@pytest.fixture(scope="module")
def setup():
    model = BertForDiffusion(CONFIG)
    variables = model_io.init_model_variables(model, jax.random.PRNGKey(0), pad=32)
    rng = np.random.default_rng(0)
    b, l = 8, 32
    x = jnp.asarray(rng.uniform(-np.pi, np.pi, (b, l, 6)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, 250, b))
    mask = jnp.asarray(
        (np.arange(l)[None, :] < rng.integers(l // 2, l + 1, (b,))[:, None]).astype(np.float32)
    )
    return model, variables, (x, t, mask)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (8, 1), (1, 8)])
def test_tp_matches_single_device(setup, mesh_shape):
    model, variables, args = setup
    baseline = np.asarray(
        model.apply(variables, *args, deterministic=True)
    )
    mesh = tp.make_mesh_2d(*mesh_shape)
    out = np.asarray(
        tp.tp_forward_sharded(
            model, variables["params"], variables["constants"], mesh, args,
            {"deterministic": True},
        )
    )
    np.testing.assert_allclose(out, baseline, atol=1e-5)


def test_sharding_specs_cover_dense_kernels(setup):
    model, variables, _ = setup
    mesh = tp.make_mesh_2d(2, 4)
    shardings = tp.param_shardings(variables["params"], mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    sharded_paths = [
        "/".join(str(getattr(k, "key", k)) for k in kp)
        for kp, s in flat
        if any(ax is not None for ax in s.spec)
    ]
    # qkv + intermediate + both output denses per layer = 8 kernels + 4 biases
    assert any("query/kernel" in p for p in sharded_paths)
    assert any("intermediate_dense/kernel" in p for p in sharded_paths)
    assert any("attention_output_dense/kernel" in p for p in sharded_paths)
    assert len(sharded_paths) >= CONFIG.num_hidden_layers * 8


def test_tprunner_caches_sharded_params(setup):
    """TPRunner shards params once; repeated calls reuse placement + jit."""
    model, variables, args = setup
    mesh = tp.make_mesh_2d(4, 2)
    runner = tp.TPRunner(model, variables["params"], variables["constants"], mesh)
    baseline = np.asarray(model.apply(variables, *args, deterministic=True))
    out1 = np.asarray(runner(args, {"deterministic": True}))
    out2 = np.asarray(runner(args, {"deterministic": True}))
    np.testing.assert_allclose(out1, baseline, atol=1e-5)
    np.testing.assert_array_equal(out1, out2)
    # params were placed with TP shardings at construction
    q = runner.params["encoder_layer_0"]["attention_self"]["query"]["kernel"]
    assert any(ax is not None for ax in q.sharding.spec)
    assert len(runner._jit_cache) == 1


def test_tp_train_step_matches_single_device():
    """A full TP training step (fwd + bwd + adamw over the 2-D mesh) must
    produce the same parameters as the unsharded step."""
    from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
    from foldingdiff_tpu.training import Trainer, TrainConfig

    rng = np.random.default_rng(1)
    b, l = 8, 32
    batch = {
        "angles": rng.uniform(-np.pi, np.pi, (b, l, 6)).astype(np.float32),
        "attn_mask": np.ones((b, l), dtype=np.float32),
        "lengths": np.full((b,), l, dtype=np.int32),
    }
    sched = DiffusionSchedule.create("linear", 10)
    tcfg = TrainConfig(lr=1e-3, batch_size=b, max_epochs=1, lr_scheduler=None, seed=0)

    def run(n_steps, tp_mesh=None):
        model = BertForDiffusion(CONFIG)
        trainer = Trainer(model, sched, tcfg, steps_per_epoch=1)
        state = trainer.init_state(jax.random.PRNGKey(0), pad=l)
        if tp_mesh is not None:
            state = tp.shard_train_state(state, tp_mesh)
        for i in range(n_steps):
            key = jax.random.PRNGKey(100 + i)
            if tp_mesh is not None:
                state, avg, _ = tp.tp_train_step(trainer, state, batch, key, tp_mesh)
            else:
                state, avg, _ = trainer._train_step(state, batch, key)
        return jax.device_get(state.params), float(avg)

    p_single, l_single = run(3)
    mesh = tp.make_mesh_2d(4, 2)
    p_tp, l_tp = run(3, tp_mesh=mesh)
    assert np.isclose(l_single, l_tp, atol=1e-5)
    flat_s = jax.tree_util.tree_flatten_with_path(p_single)[0]
    flat_t = jax.tree.leaves(p_tp)
    for (kp, a), b_ in zip(flat_s, flat_t):
        path = "/".join(str(getattr(k, "key", k)) for k in kp)
        if path.endswith("key/bias"):
            # The attention key bias has an EXACTLY zero gradient (softmax is
            # invariant to a per-query constant logit shift), so adam turns
            # f32 reassociation noise into +-lr sign updates that legitimately
            # differ across shardings. Bound it by the adam step size instead.
            np.testing.assert_allclose(a, b_, atol=3 * 1e-3 * 1.01)
            continue
        np.testing.assert_allclose(a, b_, atol=2e-5, err_msg=path)


def test_shard_train_state_places_moments(setup):
    """Optimizer moments must inherit the param TP shardings."""
    from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
    from foldingdiff_tpu.training import Trainer, TrainConfig

    model = BertForDiffusion(CONFIG)
    trainer = Trainer(
        model, DiffusionSchedule.create("linear", 10),
        TrainConfig(lr=1e-3, batch_size=8, max_epochs=1, lr_scheduler=None),
        steps_per_epoch=1,
    )
    state = trainer.init_state(jax.random.PRNGKey(0), pad=32)
    mesh = tp.make_mesh_2d(4, 2)
    state = tp.shard_train_state(state, mesh)
    q = state.params["encoder_layer_0"]["attention_self"]["query"]["kernel"]
    assert any(ax is not None for ax in q.sharding.spec)
    # find the adam mu subtree and check the same leaf is sharded
    import optax

    mus = [s.mu for s in jax.tree.leaves(
        state.opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
    ) if isinstance(s, optax.ScaleByAdamState)]
    assert mus, "adam state not found"
    mu_q = mus[0]["encoder_layer_0"]["attention_self"]["query"]["kernel"]
    assert any(ax is not None for ax in mu_q.sharding.spec)
