"""
On-device angular lattice ops.

The angular wrap to [-pi, pi) is the single primitive shared by forward noising,
the wrapped losses, every reverse-diffusion step, and the mean-offset un-shift
(reference wrap sites: foldingdiff/datasets.py:866-871, losses.py:49-50,
sampling.py:118-130, 208-223). Implemented once here as a jit-friendly
elementwise op; the feature-wise variant applies the wrap only to angular
feature channels so a single fused `where` replaces the reference's per-feature
python loop (sampling.py:126-130).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def wrap_angles(x: jnp.ndarray, range_min: float = -np.pi, range_max: float = np.pi) -> jnp.ndarray:
    """Wrap values into [range_min, range_max) with floored modulo."""
    top = range_max - range_min
    return ((x - range_min) % top) + range_min


def wrap_angular_features(x: jnp.ndarray, is_angular: jnp.ndarray) -> jnp.ndarray:
    """
    Wrap only the feature channels flagged angular.

    x: (..., F); is_angular: (F,) bool. Non-angular channels pass through.
    """
    wrapped = wrap_angles(x)
    return jnp.where(jnp.asarray(is_angular, dtype=bool), wrapped, x)


def wrapped_mean_jnp(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Circular mean via atan2 of mean sin/cos (NaN-tolerant)."""
    sin = jnp.nanmean(jnp.sin(x), axis=axis)
    cos = jnp.nanmean(jnp.cos(x), axis=axis)
    return jnp.arctan2(sin, cos)


def angular_difference(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Signed smallest difference a-b on the circle, in [-pi, pi)."""
    return wrap_angles(a - b)
