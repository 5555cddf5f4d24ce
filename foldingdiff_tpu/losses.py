"""
Wrapped-angle regression losses and the rotation/shift-invariant pairwise
distance loss, as masked, fully-vectorized jit-able functions.

Reference behavior: foldingdiff/losses.py. Semantics preserved exactly:
- radian_l1_loss: mean |wrap(target - input)|             (losses.py:12-26)
- radian_smooth_l1_loss: huber on wrap(target - input),   (losses.py:29-63)
  optional circle penalty on trunc(|input| / pi)
- pairwise_dist_loss: MSE over all intra-length pairwise CA distances,
  meaned over valid pairs across the batch                (losses.py:66-149)

Differences by design: the reference computes F.pdist per batch item in a
python loop on variable-length slices; here we compute the full (B, N, N)
distance matrix once and mask pairs (i < j < length) -- static shapes, MXU/VPU
friendly, identical mean because each valid pair is counted exactly once.
Masked means are used instead of fancy indexing (TPU-friendly).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from foldingdiff_tpu.ops.angles import wrap_angles


def _masked_mean(values: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(values)
    mask = mask.astype(values.dtype)
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def radian_l1_loss(input: jnp.ndarray, target: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """
    Mean absolute wrapped angular difference.

    >>> import numpy as np
    >>> float(np.round(radian_l1_loss(np.float32(0.1), np.float32(2 * np.pi)), 4))
    0.1
    >>> float(np.round(radian_l1_loss(np.float32(0.1), np.float32(2 * np.pi - 0.1)), 4))
    0.2
    """
    d = wrap_angles(target % (2 * np.pi) - input % (2 * np.pi))
    return _masked_mean(jnp.abs(d), mask)


def radian_smooth_l1_loss(
    input: jnp.ndarray,
    target: jnp.ndarray,
    beta: float = 1.0,
    circle_penalty: float = 0.0,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """
    Smooth-L1 (huber) on the wrapped angular difference:
    0.5 d^2/beta if |d| < beta else |d| - 0.5 beta.

    >>> import numpy as np
    >>> float(np.round(radian_smooth_l1_loss(np.float32(-17.0466), np.float32(-1.3888), beta=0.1), 4))
    3.0414
    """
    assert beta > 0
    d = wrap_angles(target - input)
    abs_d = jnp.abs(d)
    elementwise = jnp.where(abs_d < beta, 0.5 * (d**2) / beta, abs_d - 0.5 * beta)
    retval = _masked_mean(elementwise, mask)
    if circle_penalty > 0:
        turns = jnp.trunc(jnp.abs(input) / np.pi)
        retval = retval + circle_penalty * _masked_mean(turns, mask)
    return retval


def smooth_l1_loss(
    input: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Plain (non-wrapped) huber loss for non-angular features."""
    d = target - input
    abs_d = jnp.abs(d)
    elementwise = jnp.where(abs_d < beta, 0.5 * (d**2) / beta, abs_d - 0.5 * beta)
    return _masked_mean(elementwise, mask)


def l1_loss(input: jnp.ndarray, target: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Plain L1 loss for non-angular features."""
    return _masked_mean(jnp.abs(target - input), mask)


def _pair_mask(lengths: jnp.ndarray, n: int) -> jnp.ndarray:
    """(B, N, N) mask of pairs (i, j) with i < j < length_b."""
    idx = jnp.arange(n)
    upper = idx[None, :, None] < idx[None, None, :]  # i < j
    within = idx[None, None, :] < lengths[:, None, None]  # j < length
    return (upper & within).astype(jnp.float32)


def pairwise_dist_loss(
    input: jnp.ndarray,
    target: jnp.ndarray,
    lengths: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """
    MSE between the pairwise-distance sets of input and target coordinates.

    input/target: (B, N, 3); lengths: (B,) valid point counts; weights: scalar
    or (B,) per-item coefficient. Mean over all valid pairs in the batch, so
    longer items contribute more pairs -- identical to the reference's
    flatten-then-mean (losses.py:136-149).
    """
    assert input.ndim == 3 and input.shape[-1] == 3

    def pdists(x):
        diff = x[:, :, None, :] - x[:, None, :, :]
        sq = jnp.sum(diff * diff, axis=-1)
        # Safe sqrt: zero diagonal would give nan grads
        return jnp.sqrt(jnp.maximum(sq, 1e-12))

    mask = _pair_mask(lengths, input.shape[1])
    se = (pdists(input) - pdists(target)) ** 2
    if weights is not None:
        w = jnp.asarray(weights, dtype=se.dtype)
        if w.ndim >= 1:
            w = w.reshape(-1)[:, None, None]
        se = se * w
    return jnp.sum(se * mask) / jnp.maximum(jnp.sum(mask), 1.0)
