"""Tests against the committed trained mini model fixture (the analogue of
the reference's tests/mini_model_for_testing), covering model-dir loading,
deterministic reload, and sample_simple reproducibility (reference
test_transformer.py:165-236 + test_sampling.py)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from foldingdiff_tpu.diffusion.sampling import sample_simple
from foldingdiff_tpu.models import io as model_io

MODEL_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "mini_model_for_testing", "results"
)


@pytest.fixture(scope="module")
def loaded():
    return model_io.from_dir(MODEL_DIR)


def test_from_dir_loads(loaded):
    model, params, constants, train_args = loaded
    assert train_args["timesteps"] == 250
    assert model.config.hidden_size == 64
    assert "W" in constants["time_embed"]


def test_reload_weight_equality(loaded):
    """Two independent loads produce identical outputs."""
    model, params, constants, _ = loaded
    model2, params2, constants2, _ = model_io.from_dir(MODEL_DIR)
    x = jnp.asarray(np.random.default_rng(0).uniform(-np.pi, np.pi, (2, 64, 6)).astype(np.float32))
    t = jnp.asarray([3, 100])
    mask = jnp.ones((2, 64))
    o1 = model.apply({"params": params, "constants": constants}, x, t, mask, deterministic=True)
    o2 = model2.apply({"params": params2, "constants": constants2}, x, t, mask, deterministic=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_sample_simple_reproducible():
    """Reference tests/test_sampling.py: same seed reproduces, mini model."""
    dfs1 = sample_simple(MODEL_DIR, n=1, sweep_lengths=(45, 47))
    dfs2 = sample_simple(MODEL_DIR, n=1, sweep_lengths=(45, 47))
    assert len(dfs1) == 2
    for a, b in zip(dfs1, dfs2):
        np.testing.assert_array_equal(a.values, b.values)
        assert list(a.columns) == ["phi", "psi", "omega", "tau", "CA:C:1N", "C:1N:1CA"]
        assert a.values.min() >= -np.pi and a.values.max() <= np.pi


def test_sampled_backbone_buildable(tmp_path):
    """Mini-model samples build into valid PDBs via NeRF."""
    from foldingdiff_tpu.geometry.featurize import create_new_chain_nerf
    from foldingdiff_tpu.geometry.pdb import get_pdb_length

    dfs = sample_simple(MODEL_DIR, n=1, sweep_lengths=(50, 51))
    out = create_new_chain_nerf(str(tmp_path / "mini.pdb"), dfs[0])
    assert out
    assert get_pdb_length(out) == 50
