"""
Time-step encoders.

Reference: GaussianFourierProjection and SinusoidalPositionEmbeddings
(foldingdiff/modelling.py:42-93). The Gaussian Fourier weight W is a fixed,
NON-trainable random buffer drawn once at init (modelling.py:55-57); when
loading reference checkpoints W must be loaded, not redrawn. We store it in a
separate `constants` variable collection, so it rides along in checkpoints but
is invisible to the optimizer.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


class GaussianFourierProjection(nn.Module):
    """embed(t) = [sin(2*pi*t*W), cos(2*pi*t*W)], W ~ N(0, scale^2) fixed."""

    embed_dim: int
    scale: float = 2 * math.pi

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        w = self.variable(
            "constants",
            "W",
            lambda: jax.random.normal(self.make_rng("params"), (self.embed_dim // 2,)) * self.scale,
        )
        t = t.reshape(-1).astype(jnp.float32)
        x_proj = t[:, None] * w.value[None, :] * 2 * jnp.pi
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class SinusoidalPositionEmbeddings(nn.Module):
    """Standard transformer sinusoidal embedding over the timestep."""

    embed_dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half_dim = self.embed_dim // 2
        freqs = jnp.exp(jnp.arange(half_dim) * -(math.log(10000.0) / (half_dim - 1)))
        t = t.reshape(-1).astype(jnp.float32)
        args = t[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def get_time_encoder(kind: str, embed_dim: int) -> nn.Module:
    if kind == "gaussian_fourier":
        return GaussianFourierProjection(embed_dim=embed_dim, name="time_embed")
    if kind == "sinusoidal":
        return SinusoidalPositionEmbeddings(embed_dim=embed_dim, name="time_embed")
    raise ValueError(f"Unknown time encoding: {kind}")
