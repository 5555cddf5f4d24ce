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


class TestFusedAttentionV2:
    """v2: batched-head MXU matmuls + qE-matmul/skew relative scores, taking
    the RAW distance table (no (L, L, D) gather)."""

    def _table(self, m, d, seed=7):
        rng = np.random.default_rng(seed)
        return jnp.asarray(rng.normal(size=(2 * m - 1, d)).astype(np.float32) * 0.05)

    def test_matches_reference_no_rel(self):
        from foldingdiff_tpu.ops.pallas_attention import fused_attention_v2

        q, k, v, bias, _ = _inputs()
        with jax.default_matmul_precision("highest"):
            out = fused_attention_v2(q, k, v, bias, interpret=True)
            ref = attention_reference(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    @pytest.mark.parametrize("l", [64, 32])  # l == m and the l < m window
    def test_matches_reference_with_rel(self, l):
        from foldingdiff_tpu.ops.pallas_attention import fused_attention_v2

        m = 64
        q, k, v, bias, _ = _inputs(l=l, seed=3)
        table = self._table(m, q.shape[-1])
        pos = np.arange(l)
        e_lr = table[(pos[:, None] - pos[None, :]) + m - 1]
        with jax.default_matmul_precision("highest"):
            out = fused_attention_v2(q, k, v, bias, table, m=m, interpret=True)
            ref = attention_reference(q, k, v, bias, e_lr)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_model_level_equality(self):
        """BertForDiffusion(attention_impl=pallas_v2) == XLA path."""
        import dataclasses

        from foldingdiff_tpu.models import BertForDiffusion, ModelConfig
        from foldingdiff_tpu.models import io as model_io
        from foldingdiff_tpu.ops import pallas_attention as pa
        import foldingdiff_tpu.ops.pallas_attention as mod

        config = ModelConfig(
            hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=96, max_position_embeddings=32,
            position_embedding_type="relative_key", matmul_precision="highest",
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        )
        model = BertForDiffusion(config)
        variables = model_io.init_model_variables(model, jax.random.PRNGKey(0), pad=32)
        rng = np.random.default_rng(2)
        b, l = 3, 32
        x = jnp.asarray(rng.uniform(-np.pi, np.pi, (b, l, 6)).astype(np.float32))
        t = jnp.asarray(rng.integers(0, 100, b))
        mask = jnp.asarray((np.arange(l)[None] < rng.integers(16, 33, (b, 1))).astype(np.float32))
        ref = model.apply(variables, x, t, mask, deterministic=True)

        # interpret mode on CPU: patch pallas_call through interpret
        orig = pa.fused_attention_v2
        def patched(*args, **kw):
            kw["interpret"] = True
            return orig(*args, **kw)
        mod.fused_attention_v2 = patched
        try:
            model2 = BertForDiffusion(dataclasses.replace(config, attention_impl="pallas_v2"))
            out = model2.apply(variables, x, t, mask, deterministic=True)
        finally:
            mod.fused_attention_v2 = orig
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
