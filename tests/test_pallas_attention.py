"""Fused-attention kernel numerics vs the jnp reference (interpret mode on
CPU; the same comparisons run compiled on TPU in perf scripts)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from foldingdiff_tpu.ops.pallas_attention import attention_reference, fused_attention


def _inputs(b=4, h=6, l=64, d=16, seed=0, masked=True):
    rng = np.random.default_rng(seed)
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32)) for _ in range(3)
    )
    if masked:
        lengths = rng.integers(l // 2, l + 1, size=b)
        bias = jnp.asarray(
            np.where(np.arange(l)[None, :] < lengths[:, None], 0.0, -10000.0).astype(np.float32)
        )
    else:
        bias = jnp.zeros((b, l), dtype=jnp.float32)
    e_lr = jnp.asarray(rng.normal(size=(l, l, d)).astype(np.float32) * 0.05)
    return q, k, v, bias, e_lr


class TestFusedAttention:
    def test_matches_reference_no_rel(self):
        q, k, v, bias, _ = _inputs()
        with jax.default_matmul_precision("highest"):
            out = fused_attention(q, k, v, bias, interpret=True)
            ref = attention_reference(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_matches_reference_with_rel(self):
        q, k, v, bias, e_lr = _inputs(seed=3)
        with jax.default_matmul_precision("highest"):
            out = fused_attention(q, k, v, bias, e_lr, interpret=True)
            ref = attention_reference(q, k, v, bias, e_lr)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_mask_blocks_attention(self):
        """Changing values at masked key positions must not change outputs."""
        q, k, v, bias, e_lr = _inputs(seed=5)
        masked = np.asarray(bias) < -1.0  # (B, L)
        k2 = np.asarray(k).copy()
        v2 = np.asarray(v).copy()
        k2[np.broadcast_to(masked[:, None, :, None], k2.shape)] += 7.0
        v2[np.broadcast_to(masked[:, None, :, None], v2.shape)] -= 3.0
        with jax.default_matmul_precision("highest"):
            out1 = fused_attention(q, k, v, bias, e_lr, interpret=True)
            out2 = fused_attention(q, jnp.asarray(k2), jnp.asarray(v2), bias, e_lr, interpret=True)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)

    def test_model_pallas_flag_matches_xla(self):
        """BertForDiffusion with attention_impl=pallas (interpret) == xla."""
        pytest.skip("pallas interpret through the full model is exercised on TPU only")
