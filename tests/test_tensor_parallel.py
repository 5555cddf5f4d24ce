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
