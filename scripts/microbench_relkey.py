"""
Micro-benchmark of relative_key score formulations on the real TPU.

The relative-position score term rel[b,h,l,r] = q[b,h,l,:] . E[l-r+M-1,:]
(HF BertSelfAttention `relative_key`) was measured at ~2.4 ms of the 5.5 ms
B=64/L=128 sampling step in round 1 -- the single largest line item. This
script times the full 12-layer forward under each candidate formulation
(config.relative_scores_impl) with a jitted 100-step scan so per-dispatch
overhead amortizes.

Usage: python scripts/microbench_relkey.py [impl ...]
Default impls: gather skew onedot
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from foldingdiff_tpu.models.bert import BertForDiffusion
from foldingdiff_tpu.models.config import ModelConfig
from foldingdiff_tpu.models import io as model_io

B = int(__import__("os").environ.get("MB_B", "64"))
L = int(__import__("os").environ.get("MB_L", "128"))
STEPS = int(__import__("os").environ.get("MB_STEPS", "100"))


def time_impl(impl: str) -> float:
    # impl "absolute" times the absolute-position model (no relative term at
    # all) -- the lower bound any relative_key formulation could reach.
    # impl "pallas"/"pallas_v2" selects the fused attention kernels.
    config = ModelConfig(
        hidden_size=384,
        num_hidden_layers=12,
        num_attention_heads=12,
        intermediate_size=768,
        max_position_embeddings=L,
        position_embedding_type="absolute" if impl == "absolute" else "relative_key",
        relative_scores_impl=impl if impl in ("gather", "skew", "onedot") else "gather",
        attention_impl=impl if impl in ("pallas", "pallas_v2") else "auto",
    )
    model = BertForDiffusion(config)
    variables = model_io.init_model_variables(model, jax.random.PRNGKey(0), pad=L)

    @jax.jit
    def loop(x0, mask):
        def step(x, t):
            eps = model.apply(variables, x, jnp.full((B,), t, jnp.int32), mask,
                              deterministic=True)
            return x - 1e-3 * eps, None

        x, _ = jax.lax.scan(step, x0, jnp.arange(STEPS, dtype=jnp.int32))
        return x

    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(B, L, 6)), jnp.float32)
    mask = jnp.ones((B, L), jnp.float32)
    jax.block_until_ready(loop(x0, mask))  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x0, mask))
        times.append(time.perf_counter() - t0)
    return min(times) / STEPS * 1000.0


def check_parity(ref_impl: str, impl: str) -> float:
    config_kw = dict(
        hidden_size=384, num_hidden_layers=2, num_attention_heads=12,
        intermediate_size=768, max_position_embeddings=L,
        position_embedding_type="relative_key", matmul_precision="highest",
    )
    model_a = BertForDiffusion(ModelConfig(relative_scores_impl=ref_impl, **config_kw))
    model_b = BertForDiffusion(ModelConfig(relative_scores_impl=impl, **config_kw))
    variables = model_io.init_model_variables(model_a, jax.random.PRNGKey(0), pad=L)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, L, 6)), jnp.float32)
    t = jnp.zeros((4,), jnp.int32)
    mask = jnp.ones((4, L), jnp.float32)
    apply_a = jax.jit(lambda v, x, t, m: model_a.apply(v, x, t, m, deterministic=True))
    apply_b = jax.jit(lambda v, x, t, m: model_b.apply(v, x, t, m, deterministic=True))
    a = apply_a(variables, x, t, mask)
    b = apply_b(variables, x, t, mask)
    return float(jnp.max(jnp.abs(a - b)))


if __name__ == "__main__":
    impls = sys.argv[1:] or ["gather", "skew", "onedot"]
    print(f"B={B} L={L} steps={STEPS} platform={jax.devices()[0].platform}")
    for impl in impls:
        # pallas kernels' numerics are covered by tests/test_pallas_attention
        # (interpret mode); parity here only for the jnp formulations
        if impl not in ("gather", "absolute", "pallas", "pallas_v2"):
            print(f"{impl}: max|diff| vs gather = {check_parity('gather', impl):.2e}")
        ms = time_impl(impl)
        print(f"{impl}: {ms:.3f} ms/step", flush=True)
