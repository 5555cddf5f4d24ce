"""
Torch->flax conversion proven on a TRAINED torch checkpoint.

The fixture (tests/torch_trained_model_for_testing/, built by
scripts/make_torch_trained_fixture.py) is a reference-layout model dir whose
weights were trained BY TORCH on the DDPM objective and saved as a
lightning-style .ckpt -- standing in for the hub checkpoint
`wukevin/foldingdiff` (reference modelling.py:297-382 + tests/
test_sampling.py:21-25) since this sandbox has no network. from_dir must
glob the .ckpt, convert tensor-by-name, and reproduce the torch model's
predicted noise.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from foldingdiff_tpu.models import io as model_io

FIXTURE = os.path.join(os.path.dirname(__file__), "torch_trained_model_for_testing")


@pytest.fixture(scope="module")
def parity():
    return np.load(os.path.join(FIXTURE, "parity.npz"))


def test_fixture_was_actually_trained(parity):
    """Guard: the committed checkpoint's training improved the loss, so the
    parity below is exercised on trained (not init) weight magnitudes."""
    assert parity["loss_last"] < parity["loss_first"] * 0.7


def test_from_dir_converts_trained_torch_ckpt(parity):
    import dataclasses

    model, params, constants, train_args = model_io.from_dir(FIXTURE)
    assert train_args["position_embedding_type"] == "relative_key"
    # Fixed GaussianFourier buffer must be LOADED from the ckpt, not redrawn
    assert "time_embed" in constants

    model = type(model)(dataclasses.replace(model.config, matmul_precision="highest"))
    ours = np.asarray(
        model.apply(
            {"params": params, "constants": constants},
            jnp.asarray(parity["x"]),
            jnp.asarray(parity["t"]),
            jnp.asarray(parity["mask"]),
            deterministic=True,
        )
    )
    np.testing.assert_allclose(ours, parity["predicted_noise"], atol=2e-5, rtol=1e-4)


def test_sampling_from_torch_ckpt_dir_end_to_end():
    """sample_simple over the torch-ckpt model dir: full hub-user workflow
    (load dir -> schedule -> sample -> DataFrames) without any msgpack."""
    from foldingdiff_tpu.diffusion.sampling import sample_simple

    dfs = sample_simple(FIXTURE, n=1, sweep_lengths=(24, 26))
    assert len(dfs) == 2
    for df in dfs:
        assert list(df.columns) == ["phi", "psi", "omega", "tau", "CA:C:1N", "C:1N:1CA"]
        vals = df.to_numpy()
        assert np.all(np.isfinite(vals))
        assert vals.min() >= -np.pi and vals.max() <= np.pi


def test_hub_id_probe_offline_safe():
    """is_huggingface_hub_id: structural rejects + offline-graceful False."""
    from foldingdiff_tpu.utils import is_huggingface_hub_id

    assert not is_huggingface_hub_id(FIXTURE)  # existing local path
    assert not is_huggingface_hub_id("not-a-hub-id")
    assert not is_huggingface_hub_id("a/b/c")
    # A well-formed id: either True (network up) or False (offline) -- must
    # not raise either way
    assert is_huggingface_hub_id("wukevin/foldingdiff", timeout=2.0) in (True, False)


def test_resolve_model_dir_local_and_missing():
    assert model_io.resolve_model_dir(FIXTURE) == FIXTURE
    with pytest.raises(FileNotFoundError):
        model_io.resolve_model_dir("no/such-model-anywhere")
