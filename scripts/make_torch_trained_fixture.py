"""
Build the trained-in-torch checkpoint fixture at
tests/torch_trained_model_for_testing/.

Purpose: prove the torch->flax weight converter (models/io.py) on a checkpoint
that was actually TRAINED by torch -- realistic weight magnitudes, a
lightning-style {"state_dict": ...} pickle, and the reference's parameter
names/artifact layout (modelling.py:297-382) -- not just a randomly
initialized twin. The sandbox has no network, so this stands in for the
hub checkpoint `wukevin/foldingdiff` (reference tests/test_sampling.py:21-25).

The torch model is assembled from the reference's documented semantics
(tests/helpers.build_torch_reference) and trained on the DDPM noise-prediction
objective over synthetic wrapped-angle data. Outputs:
  - training_args.json + config.json (reference layout)
  - models/best_by_valid/epoch=4-step=299.ckpt  (torch lightning-style)
  - parity.npz: fixed eval inputs + the torch model's predicted noise +
    first/last training losses (proof the weights moved and improved)

Run: python scripts/make_torch_trained_fixture.py  (CPU, ~1 min)
"""
import json
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "tests", "torch_trained_model_for_testing")

TRAIN_ARGS = {
    "angles_definitions": "canonical-full-angles",
    "max_seq_len": 64,
    "num_hidden_layers": 3,
    "hidden_size": 96,
    "intermediate_size": 192,
    "num_heads": 6,
    "position_embedding_type": "relative_key",
    "time_encoding": "gaussian_fourier",
    "decoder": "mlp",
    "dropout_p": 0.0,
    "timesteps": 100,
    "variance_schedule": "cosine",
    "variance_scale": 1.0,
    "lr": 1e-3,
    "loss": "smooth_l1",
}


def cosine_betas(timesteps: int, s: float = 8e-3) -> np.ndarray:
    """Cosine schedule (reference beta_schedules.py:20-29)."""
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    ac = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return np.clip(betas, 0.0001, 0.9999)


def synthetic_x0(rng, b, l, f=6):
    """Helix-like wrapped angle features."""
    means = np.array([-1.1, -0.8, np.pi, 1.94, 2.03, 2.13])[:f]
    x = means[None, None, :] + rng.normal(0, 0.25, size=(b, l, f))
    return ((x + np.pi) % (2 * np.pi)) - np.pi


def main():
    import torch

    from foldingdiff_tpu.models.config import ModelConfig
    from tests.helpers import build_torch_reference

    config = ModelConfig.from_train_args(TRAIN_ARGS)
    model = build_torch_reference(config, seed=11).train()

    T = TRAIN_ARGS["timesteps"]
    betas = cosine_betas(T)
    abar = np.cumprod(1.0 - betas)
    sqrt_abar = torch.from_numpy(np.sqrt(abar)).float()
    sqrt_1mabar = torch.from_numpy(np.sqrt(1 - abar)).float()

    opt = torch.optim.Adam(model.parameters(), lr=TRAIN_ARGS["lr"])
    rng = np.random.default_rng(0)
    torch.manual_seed(0)
    losses = []
    beta_huber = math.pi / 10
    for step in range(300):
        b, l = 32, 48
        x0 = torch.from_numpy(synthetic_x0(rng, b, l)).float()
        lengths = torch.from_numpy(rng.integers(24, l + 1, size=(b,)))
        mask = (torch.arange(l)[None, :] < lengths[:, None]).float()
        t = torch.randint(0, T, (b,))
        eps = torch.randn_like(x0)
        xt = sqrt_abar[t][:, None, None] * x0 + sqrt_1mabar[t][:, None, None] * eps
        xt = ((xt + math.pi) % (2 * math.pi)) - math.pi

        pred = model(xt, t, mask)
        d = ((pred - eps + math.pi) % (2 * math.pi)) - math.pi
        ad = d.abs()
        elem = torch.where(ad < beta_huber, 0.5 * d * d / beta_huber, ad - 0.5 * beta_huber)
        loss = (elem * mask[..., None]).sum() / mask.sum() / elem.shape[-1]
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
    print(f"torch training: loss {losses[0]:.4f} -> {losses[-1]:.4f}")
    assert losses[-1] < losses[0] * 0.7, "training did not improve; fixture would be untrained"

    model.eval()
    os.makedirs(os.path.join(OUT, "models", "best_by_valid"), exist_ok=True)
    with open(os.path.join(OUT, "training_args.json"), "w") as f:
        json.dump(TRAIN_ARGS, f, indent=4)
    with open(os.path.join(OUT, "config.json"), "w") as f:
        json.dump(config.to_hf_config_dict(), f, indent=2)
    ckpt = os.path.join(OUT, "models", "best_by_valid", "epoch=4-step=299.ckpt")
    torch.save(
        {"state_dict": model.state_dict(), "epoch": 4, "global_step": 299}, ckpt
    )

    # Parity payload: fixed inputs + the trained torch model's prediction
    rng = np.random.default_rng(123)
    x = rng.uniform(-np.pi, np.pi, size=(4, 64, 6)).astype(np.float32)
    t = rng.integers(0, T, size=(4,))
    lens = np.array([64, 40, 51, 28])
    mask = (np.arange(64)[None, :] < lens[:, None]).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(mask)).numpy()
    np.savez(
        os.path.join(OUT, "parity.npz"),
        x=x, t=t, mask=mask, predicted_noise=out,
        loss_first=losses[0], loss_last=losses[-1],
    )
    print(f"fixture written to {OUT}")


if __name__ == "__main__":
    main()
