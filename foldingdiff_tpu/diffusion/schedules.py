"""
Variance (beta) schedules and derived alpha terms as a frozen pytree.

Reference behavior: foldingdiff/beta_schedules.py:20-78 (cosine/linear/quadratic
betas, compute_alphas incl. posterior variance). Instead of a dict of torch
tensors recomputed per call (reference recomputes compute_alphas inside every
p_sample call, sampling.py:42), we precompute everything once into an immutable
`DiffusionSchedule` pytree that rides along through jit/scan without retracing.

Schedules are computed in float64 on host for accuracy, stored as float32.
"""
from __future__ import annotations

from typing import Literal

import jax.numpy as jnp
import numpy as np
from flax import struct

SCHEDULES = Literal["linear", "cosine", "quadratic"]


def cosine_beta_schedule(timesteps: int, s: float = 8e-3) -> np.ndarray:
    """Cosine schedule from Nichol & Dhariwal (https://arxiv.org/abs/2102.09672)."""
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0.0001, 0.9999)


def linear_beta_schedule(timesteps: int, beta_start: float = 1e-4, beta_end: float = 0.02) -> np.ndarray:
    return np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)


def quadratic_beta_schedule(timesteps: int, beta_start: float = 1e-4, beta_end: float = 0.02) -> np.ndarray:
    x = np.linspace(-6, 6, timesteps, dtype=np.float64)
    sigmoid = 1.0 / (1.0 + np.exp(-x))
    return sigmoid * (beta_end - beta_start) + beta_start


def get_variance_schedule(keyword: SCHEDULES, timesteps: int, **kwargs) -> np.ndarray:
    """Keyword dispatch matching reference beta_schedules.get_variance_schedule."""
    if keyword == "cosine":
        return cosine_beta_schedule(timesteps, **kwargs)
    elif keyword == "linear":
        return linear_beta_schedule(timesteps, **kwargs)
    elif keyword == "quadratic":
        return quadratic_beta_schedule(timesteps, **kwargs)
    raise ValueError(f"Unrecognized variance schedule: {keyword}")


def compute_alphas(betas: np.ndarray) -> dict:
    """All derived alpha terms, as in reference beta_schedules.compute_alphas."""
    betas = np.asarray(betas, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    return {
        "betas": betas,
        "alphas": alphas,
        "alphas_cumprod": alphas_cumprod,
        "sqrt_alphas_cumprod": np.sqrt(alphas_cumprod),
        "sqrt_one_minus_alphas_cumprod": np.sqrt(1.0 - alphas_cumprod),
        "posterior_variance": posterior_variance,
    }


class DiffusionSchedule(struct.PyTreeNode):
    """
    Immutable precomputed schedule arrays, shaped (T,). All float32 on device.

    `timesteps` and `schedule_name` are aux (static) fields so the pytree can be
    passed through jit without retracing on array content.
    """

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    sqrt_recip_alphas: jnp.ndarray
    sqrt_posterior_variance: jnp.ndarray
    timesteps: int = struct.field(pytree_node=False, default=0)
    schedule_name: str = struct.field(pytree_node=False, default="")

    @classmethod
    def create(cls, keyword: SCHEDULES, timesteps: int, **kwargs) -> "DiffusionSchedule":
        betas = get_variance_schedule(keyword, timesteps, **kwargs)
        terms = compute_alphas(betas)
        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        return cls(
            betas=f32(terms["betas"]),
            alphas=f32(terms["alphas"]),
            alphas_cumprod=f32(terms["alphas_cumprod"]),
            sqrt_alphas_cumprod=f32(terms["sqrt_alphas_cumprod"]),
            sqrt_one_minus_alphas_cumprod=f32(terms["sqrt_one_minus_alphas_cumprod"]),
            posterior_variance=f32(terms["posterior_variance"]),
            sqrt_recip_alphas=f32(1.0 / np.sqrt(terms["alphas"])),
            sqrt_posterior_variance=f32(np.sqrt(terms["posterior_variance"])),
            timesteps=timesteps,
            schedule_name=keyword,
        )
