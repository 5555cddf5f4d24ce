"""
End-to-end numerics parity: full reverse-diffusion sampling with THE SAME
converted weights must produce angle distributions statistically matching a
torch implementation of the reference sampler math (the north-star KS check,
BASELINE.md). RNG streams differ (threefry vs torch), so we compare
distributions, not samples.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from foldingdiff_tpu.diffusion import sampling as samp
from foldingdiff_tpu.diffusion.noise import sample_wrapped_noise
from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
from foldingdiff_tpu.models import BertForDiffusion, ModelConfig
from foldingdiff_tpu.models import io as model_io
from tests.test_transformer import _build_torch_reference

CONFIG = ModelConfig(
    hidden_size=48,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=96,
    max_position_embeddings=24,
    position_embedding_type="relative_key",
    hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
    matmul_precision="highest",
)
T = 25
B, L = 256, 24


def _torch_sample(ref_model, betas_np, b, l, n_ft, seed):
    """Reference DDPM sampling math in torch (sampling.py:27-132 semantics),
    written from the published equations."""
    import torch

    torch.manual_seed(seed)
    betas = torch.from_numpy(betas_np.astype(np.float64)).float()
    alphas = 1.0 - betas
    alphas_cumprod = torch.cumprod(alphas, dim=0)
    acp_prev = torch.cat([torch.ones(1), alphas_cumprod[:-1]])
    posterior_var = betas * (1.0 - acp_prev) / (1.0 - alphas_cumprod)
    sqrt_recip_alphas = 1.0 / torch.sqrt(alphas)
    sqrt_omac = torch.sqrt(1.0 - alphas_cumprod)

    def wrap(x):
        return ((x + torch.pi) % (2 * torch.pi)) - torch.pi

    x = wrap(torch.randn(b, l, n_ft))
    mask = torch.ones(b, l)
    with torch.no_grad():
        for t in reversed(range(T)):
            t_vec = torch.full((b,), t, dtype=torch.long)
            eps = ref_model(x, t_vec, mask)
            mean = sqrt_recip_alphas[t] * (x - betas[t] * eps / sqrt_omac[t])
            if t > 0:
                x = mean + torch.sqrt(posterior_var[t]) * torch.randn_like(x)
            else:
                x = mean
            x = wrap(x)
    return x.numpy()


@pytest.mark.slow
def test_sampled_distributions_match_torch_reference():
    torch = pytest.importorskip("torch")
    from scipy import stats

    ref = _build_torch_reference(CONFIG, seed=42)
    params, constants = model_io.convert_torch_state_dict(ref.state_dict(), CONFIG)
    model = BertForDiffusion(CONFIG)
    sched = DiffusionSchedule.create("cosine", T)

    torch_out = _torch_sample(ref, np.asarray(sched.betas), B, L, 6, seed=0)

    noise = sample_wrapped_noise(jax.random.PRNGKey(1), (B, L, 6), [True] * 6)
    jax_out = np.asarray(
        samp.p_sample_loop(
            lambda x, t, m: model.apply(
                {"params": params, "constants": constants}, x, t, m, deterministic=True
            ),
            noise,
            jax.random.PRNGKey(2),
            jnp.ones((B, L)),
            sched,
            [True] * 6,
        )
    )

    # Per-feature two-sample KS test over all positions; distributions from
    # the same weights + same math must be statistically indistinguishable
    pvals = []
    for i in range(6):
        a = jax_out[..., i].ravel()
        b = torch_out[..., i].ravel()
        stat, p = stats.ks_2samp(a, b)
        pvals.append(p)
        assert stat < 0.05, f"feature {i}: KS statistic {stat:.4f} too large (p={p:.4f})"
    # At least most features should not reject at alpha=0.01
    assert sum(p > 0.01 for p in pvals) >= 5, pvals
