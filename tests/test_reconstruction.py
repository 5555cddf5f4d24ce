"""Partial-noise reconstruction path (reference sampling.get_reconstruction_error,
sampling.py:287-356, + bin/partial_noise_reconstruct.py): start_t semantics,
shape/offset handling, and a CLI smoke run against the mini model fixture."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from foldingdiff_tpu.diffusion import sampling as samp
from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
from foldingdiff_tpu.models import BertForDiffusion, ModelConfig
from foldingdiff_tpu.models import io as model_io
from foldingdiff_tpu.utils import modulo_with_wrapped_range

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIG = ModelConfig(
    hidden_size=32,
    num_hidden_layers=1,
    num_attention_heads=2,
    intermediate_size=64,
    max_position_embeddings=16,
)


@pytest.fixture(scope="module")
def tiny_model():
    model = BertForDiffusion(CONFIG)
    variables = model_io.init_model_variables(model, jax.random.PRNGKey(0), pad=16)
    schedule = DiffusionSchedule.create("cosine", 50)
    return model, variables["params"], variables.get("constants", {}), schedule


def _data(n=6, l=16, f=6, seed=0):
    rng = np.random.default_rng(seed)
    lengths = np.asarray([l] * (n - 2) + [l - 4, l - 7])
    mask = (np.arange(l)[None, :] < lengths[:, None]).astype(np.float32)
    return {
        "angles": (rng.uniform(-np.pi, np.pi, (n, l, f)) * mask[..., None]).astype(
            np.float32
        ),
        "attn_mask": mask,
        "lengths": lengths,
    }


def _wrapped_err(recons, data):
    errs = []
    for i, r in enumerate(recons):
        truth = data["angles"][i, : len(r)]
        errs.append(np.abs(modulo_with_wrapped_range(r - truth)).mean())
    return float(np.mean(errs))


class TestReconstructionError:
    def test_start_t_semantics(self, tiny_model):
        """Low noise (t=1) must reconstruct nearly exactly even with an
        untrained model (the reverse-step coefficients at t=0 are ~identity);
        full noise (t=T) is ~sampling and cannot recover the input."""
        model, params, constants, schedule = tiny_model
        data = _data()
        low = samp.get_reconstruction_error(
            model, params, constants, schedule, data,
            is_angular=[True] * 6, noise_timesteps=1, seed=0,
        )
        high = samp.get_reconstruction_error(
            model, params, constants, schedule, data,
            is_angular=[True] * 6, noise_timesteps=schedule.timesteps, seed=0,
        )
        err_low, err_high = _wrapped_err(low, data), _wrapped_err(high, data)
        assert err_low < 0.3, f"t=1 should be near-exact, got err {err_low}"
        assert err_high > err_low + 0.3, f"t=T should be ~sampling: {err_high} vs {err_low}"

    def test_shapes_trimmed_to_lengths(self, tiny_model):
        model, params, constants, schedule = tiny_model
        data = _data()
        out = samp.get_reconstruction_error(
            model, params, constants, schedule, data,
            is_angular=[True] * 6, noise_timesteps=2, batch_size=4, seed=1,
        )
        assert len(out) == data["angles"].shape[0]
        for r, l in zip(out, data["lengths"]):
            assert r.shape == (int(l), 6)
            assert np.all(np.isfinite(r))

    def test_mean_offset_reapplied_and_wrapped(self, tiny_model):
        """With a mean offset, outputs are un-shifted then re-wrapped into
        [-pi, pi) (reference bin/partial_noise_reconstruct.py:44)."""
        model, params, constants, schedule = tiny_model
        data = _data()
        offset = np.full((6,), 3.0, dtype=np.float32)
        base = samp.get_reconstruction_error(
            model, params, constants, schedule, data,
            is_angular=[True] * 6, noise_timesteps=1, seed=0,
        )
        shifted = samp.get_reconstruction_error(
            model, params, constants, schedule, data,
            is_angular=[True] * 6, noise_timesteps=1, seed=0, mean_offset=offset,
        )
        for b, s in zip(base, shifted):
            assert np.all(s >= -np.pi) and np.all(s <= np.pi)
            np.testing.assert_allclose(
                modulo_with_wrapped_range(b + offset), s, atol=1e-5
            )


def test_partial_noise_reconstruct_cli(tmp_path):
    """bin/partial_noise_reconstruct.py end to end on the trained mini model
    fixture: noise 3 steps, denoise, TM-score vs truth, write the JSON."""
    from tests.helpers import make_synthetic_pdb_dir

    pdb_dir = str(tmp_path / "pdbs")
    make_synthetic_pdb_dir(pdb_dir, n=24, seed=5, min_len=40)
    out_json = tmp_path / "recon.json"
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "bin", "partial_noise_reconstruct.py"),
            "-m", os.path.join(REPO, "tests", "mini_model_for_testing", "results"),
            "--data", pdb_dir,
            "-t", "3",
            "--nsubset", "2",
            "-o", str(out_json),
        ],
        capture_output=True, text=True, cwd=REPO, timeout=1200,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    with open(out_json) as f:
        payload = json.load(f)
    assert payload["noise_timesteps"] == 3
    scores = list(payload["tm_scores"].values())
    assert len(scores) == 2
    # 3 steps of noise on a trained model must reconstruct a close structure
    assert all(np.isfinite(s) and s > 0.5 for s in scores), scores
