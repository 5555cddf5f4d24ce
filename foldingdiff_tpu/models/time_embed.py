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


class PositionalEncoding(nn.Module):
    """Classic sin/cos positional encoding over sequence positions with
    dropout (reference modelling.py:96-129; unused by the main model there
    too, kept for capability parity)."""

    d_model: int
    dropout: float = 0.1
    max_len: int = 5000

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        assert x.ndim == 3  # (B, L, D)
        position = jnp.arange(self.max_len)[:, None].astype(jnp.float32)
        div_term = jnp.exp(
            jnp.arange(0, self.d_model, 2) * (-math.log(10000.0) / self.d_model)
        )
        pe = jnp.zeros((self.max_len, self.d_model))
        pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
        pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
        x = x + pe[None, : x.shape[1], :]
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


def get_time_encoder(kind: str, embed_dim: int) -> nn.Module:
    if kind == "gaussian_fourier":
        return GaussianFourierProjection(embed_dim=embed_dim, name="time_embed")
    if kind == "sinusoidal":
        return SinusoidalPositionEmbeddings(embed_dim=embed_dim, name="time_embed")
    raise ValueError(f"Unknown time encoding: {kind}")
