"""
Forward diffusion q(x_t | x_0) as pure jit-able functions.

Reference behavior: NoisedAnglesDataset.sample_noise / __getitem__
(foldingdiff/datasets.py:772-886). Key semantics preserved:
- noise ~ N(0, scale^2) per feature (angular/nonangular variance scales),
  then angular channels are WRAPPED to [-pi, pi) (datasets.py:793-797)
- x_t = sqrt(alpha_bar_t) * x0 + sqrt(1 - alpha_bar_t) * noise, then angular
  channels wrapped again (datasets.py:861-871)

Unlike the reference (per-item CPU Dataset wrapper), these are batched pure
functions of (x0, t, key) that run fused on device inside the train step.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
from foldingdiff_tpu.ops.angles import wrap_angles


def sample_wrapped_noise(
    key: jax.Array,
    shape: Tuple[int, ...],
    is_angular: jnp.ndarray,
    angular_scale: float = 1.0,
    nonangular_scale: float = 1.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """
    Zero-centered Gaussian noise, variance-scaled per feature channel, with
    angular channels wrapped to [-pi, pi). shape[-1] must equal len(is_angular).
    """
    is_angular = jnp.asarray(is_angular, dtype=bool)
    noise = jax.random.normal(key, shape, dtype=dtype)
    scale = jnp.where(is_angular, angular_scale, nonangular_scale).astype(dtype)
    noise = noise * scale
    return jnp.where(is_angular, wrap_angles(noise), noise)


def q_sample(
    x0: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    schedule: DiffusionSchedule,
    is_angular: jnp.ndarray,
) -> jnp.ndarray:
    """
    Diffuse x0 to timestep t given pre-sampled (already wrapped) noise.

    x0: (B, L, F); t: (B,) int; noise: (B, L, F). Returns x_t with angular
    channels wrapped.
    """
    is_angular = jnp.asarray(is_angular, dtype=bool)
    sqrt_ac = schedule.sqrt_alphas_cumprod[t][:, None, None]
    sqrt_omac = schedule.sqrt_one_minus_alphas_cumprod[t][:, None, None]
    noised = sqrt_ac * x0 + sqrt_omac * noise
    return jnp.where(is_angular, wrap_angles(noised), noised)


def corrupt_batch(
    key: jax.Array,
    x0: jnp.ndarray,
    schedule: DiffusionSchedule,
    is_angular: jnp.ndarray,
    angular_scale: float = 1.0,
    nonangular_scale: float = 1.0,
) -> dict:
    """
    Full forward-noising of a clean batch: sample t ~ U[0, T), sample wrapped
    noise, produce x_t. Returns dict mirroring the reference batch keys
    (datasets.py:873-879) minus host-only fields.
    """
    t_key, n_key = jax.random.split(key)
    b = x0.shape[0]
    t = jax.random.randint(t_key, (b,), 0, schedule.timesteps)
    noise = sample_wrapped_noise(
        n_key, x0.shape, is_angular, angular_scale, nonangular_scale, dtype=x0.dtype
    )
    corrupted = q_sample(x0, t, noise, schedule, is_angular)
    return {
        "corrupted": corrupted,
        "t": t,
        "known_noise": noise,
        "sqrt_alphas_cumprod_t": schedule.sqrt_alphas_cumprod[t],
        "sqrt_one_minus_alphas_cumprod_t": schedule.sqrt_one_minus_alphas_cumprod[t],
    }
