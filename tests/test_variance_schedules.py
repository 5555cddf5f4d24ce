"""Port of reference tests/test_variance_schedules.py + parity vs torch."""
import numpy as np
import pytest

from foldingdiff_tpu.diffusion import schedules


@pytest.mark.parametrize("kw", ["linear", "cosine", "quadratic"])
def test_betas_monotonic_increasing(kw):
    betas = schedules.get_variance_schedule(kw, 1000)
    assert np.all(np.diff(betas) >= 0)
    assert np.all(betas > 0)
    assert np.all(betas <= 0.9999)


@pytest.mark.parametrize("kw", ["linear", "cosine", "quadratic"])
@pytest.mark.parametrize("t", [100, 250, 1000])
def test_schedule_shapes(kw, t):
    betas = schedules.get_variance_schedule(kw, t)
    assert betas.shape == (t,)
    sched = schedules.DiffusionSchedule.create(kw, t)
    assert sched.timesteps == t
    for arr in [
        sched.betas,
        sched.alphas,
        sched.alphas_cumprod,
        sched.sqrt_alphas_cumprod,
        sched.sqrt_one_minus_alphas_cumprod,
        sched.posterior_variance,
    ]:
        assert arr.shape == (t,)


def test_alphas_identities():
    sched = schedules.DiffusionSchedule.create("cosine", 250)
    np.testing.assert_allclose(
        np.asarray(sched.alphas), 1.0 - np.asarray(sched.betas), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod),
        np.cumprod(np.asarray(sched.alphas, dtype=np.float64)),
        rtol=1e-4,
        atol=1e-7,
    )
    assert np.all(np.asarray(sched.posterior_variance) >= 0)


def test_parity_with_torch_reference_math():
    """Recompute the reference's torch formulas and compare numerically."""
    torch = pytest.importorskip("torch")
    timesteps = 1000
    s = 8e-3
    steps = timesteps + 1
    x = torch.linspace(0, timesteps, steps, dtype=torch.float64)
    ac = torch.cos(((x / timesteps) + s) / (1 + s) * torch.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas_t = torch.clip(1 - (ac[1:] / ac[:-1]), 0.0001, 0.9999).numpy()
    betas_j = schedules.cosine_beta_schedule(timesteps)
    np.testing.assert_allclose(betas_j, betas_t, rtol=1e-6, atol=1e-9)

    terms = schedules.compute_alphas(betas_j)
    alphas = 1.0 - betas_t
    acp = np.cumprod(alphas)
    np.testing.assert_allclose(terms["alphas_cumprod"], acp, rtol=1e-6)
    acp_prev = np.concatenate([[1.0], acp[:-1]])
    np.testing.assert_allclose(
        terms["posterior_variance"], betas_t * (1 - acp_prev) / (1 - acp), rtol=1e-6
    )
