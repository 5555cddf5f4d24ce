"""
Fused BERT attention as a Pallas TPU kernel.

Why: the denoiser's hot loop is 12 layers of full attention at L<=128. The
naive XLA lowering materializes the (B, H, L, L) score tensor -- ~0.8 GB at
B=256 -- in HBM several times per layer (qk^T, +relative scores, softmax,
probs@v), making sampling HBM-bound (~34 ms/step measured vs ~5 ms of MXU
work). This kernel computes qk^T, the HF `relative_key` position scores,
masking, softmax, and probs@v entirely in VMEM, so HBM traffic drops to the
q/k/v/out tensors.

Layout: everything is computed TRANSPOSED, scores_t[r, l] (keys on sublanes,
queries on lanes), because the relative_key contraction
  rel[l, r] = sum_d q[l, d] * E[l - r + M - 1, d]
then becomes an accumulation over the MAJOR axis d of (D, L, L) arrays --
full-width VPU work -- instead of a cross-lane reduction (which measured ~7x
slower). q arrives pre-transposed (B, H, D, L); the softmax reduces over
sublanes; probs_t contracts with v via dot_general's natural lhs-transpose, so
no in-kernel relayouts at all.

The (L, L, D) gathered embedding tensor is parameter-dependent only, so XLA
hoists its construction out of the sampling scan.

Numerics match the jnp path exactly (tests/test_pallas_attention.py).
Forward-only (sampling/eval); training uses the jnp path (dropout + grads).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _one_head_t(q_t, k, v, bias_col, elt, scale):
    """Transposed attention for one head.

    q_t: (D, L) queries; k, v: (L, D); bias_col: (L, 1) additive key bias;
    elt: (D, L, L) with elt[d, r, l] = E[dist(l, r), d], or None.
    Returns (L, D) context.
    """
    # scores_t[r, l] = sum_d k[r, d] q_t[d, l]
    scores_t = jax.lax.dot_general(
        k, q_t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if elt is not None:
        # rel_t[r, l] = sum_d q_t[d, l] * elt[d, r, l]: major-axis reduction
        rel_t = jnp.sum(q_t[:, None, :].astype(jnp.float32) * elt, axis=0)
        scores_t = scores_t + rel_t
    scores_t = scores_t * scale + bias_col
    scores_t = scores_t - jnp.max(scores_t, axis=0, keepdims=True)
    probs_t = jnp.exp(scores_t)
    probs_t = probs_t / jnp.sum(probs_t, axis=0, keepdims=True)
    # out[l, d] = sum_r probs_t[r, l] v[r, d]
    return jax.lax.dot_general(
        probs_t.astype(v.dtype), v, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float, n_heads: int):
    bb = q_ref.shape[0]

    def body(i, _):
        b_i = i // n_heads
        h_i = i % n_heads
        out = _one_head_t(
            q_ref[b_i, h_i], k_ref[b_i, h_i], v_ref[b_i, h_i], bias_ref[b_i], None, scale
        )
        out_ref[b_i, h_i] = out.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bb * n_heads, body, 0)


def _attn_rel_kernel(
    q_ref, k_ref, v_ref, bias_ref, elt_ref, out_ref, *, scale: float, n_heads: int
):
    bb = q_ref.shape[0]
    elt = elt_ref[:].astype(jnp.float32)

    def body(i, _):
        b_i = i // n_heads
        h_i = i % n_heads
        out = _one_head_t(
            q_ref[b_i, h_i], k_ref[b_i, h_i], v_ref[b_i, h_i], bias_ref[b_i], elt, scale
        )
        out_ref[b_i, h_i] = out.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bb * n_heads, body, 0)


def fused_attention(
    q: jnp.ndarray,  # (B, H, L, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask_bias: jnp.ndarray,  # (B, L) additive bias per key (-10000 masked)
    e_lr: jnp.ndarray | None = None,  # (L, L, D) gathered distance embeddings
    batch_block: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, l, d = q.shape
    scale = 1.0 / (d**0.5)
    bb = batch_block if b % batch_block == 0 else 1
    grid = (b // bb,)

    q_t = jnp.swapaxes(q, 2, 3)  # (B, H, D, L), one HBM transpose
    bias_col = mask_bias[:, :, None]  # (B, L, 1)

    qt_spec = pl.BlockSpec((bb, h, d, l), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((bb, h, l, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((bb, l, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bb, h, l, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)

    vmem_bytes = (3 * bb * h * l * d + 2 * l * l * d + bb * h * l * d) * 4 + (1 << 21)

    if e_lr is None:
        kernel = functools.partial(_attn_kernel, scale=scale, n_heads=h)
        in_specs = [qt_spec, kv_spec, kv_spec, bias_spec]
        args = (q_t, k, v, bias_col)
    else:
        kernel = functools.partial(_attn_rel_kernel, scale=scale, n_heads=h)
        elt = jnp.transpose(e_lr, (2, 1, 0))  # (D, L_r, L_l)
        elt_spec = pl.BlockSpec((d, l, l), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        in_specs = [qt_spec, kv_spec, kv_spec, bias_spec, elt_spec]
        args = (q_t, k, v, bias_col, elt)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, l, d), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_bytes * 3, 128 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * l * l * d * 2 + (2 * b * h * l * l * d if e_lr is not None else 0),
            bytes_accessed=4 * b * h * l * d * 4,
            transcendentals=b * h * l * l,
        ),
    )(*args)


def attention_reference(q, k, v, mask_bias, e_lr=None):
    """jnp twin of the kernel (and the XLA fallback path) for testing."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    scores = jnp.einsum("bhld,bhmd->bhlm", q, k)
    if e_lr is not None:
        scores = scores + jnp.einsum("bhld,lrd->bhlr", q, e_lr)
    scores = scores * scale + mask_bias[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhlm,bhmd->bhld", probs, v)
