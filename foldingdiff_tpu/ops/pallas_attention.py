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


def _skew_rows(x: jnp.ndarray, l: int) -> jnp.ndarray:
    """
    Per-row left shift: given x (l, 2l) return y[r, j] = x[r, (l-1-r) + j]
    for j < l. The shift amount s = l-1-r is decomposed into powers of two:
    log2(l) static-amount lane rolls, each applied per-row via a select on
    the shift's bit. No flatten/restride (unsupported in Mosaic) and no
    per-row dynamic gather (unvectorizable). Max shift is l-1 and x is 2l
    wide, so the columns read never see roll wrap-around.
    """
    shift = (l - 1) - jax.lax.broadcasted_iota(jnp.int32, (l, 2 * l), 0)
    k = 1
    while k < l:
        x = jnp.where((shift & k) != 0, jnp.roll(x, -k, axis=1), x)
        k *= 2
    return x[:, :l]


def _attn_kernel_v2(
    q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float, m: int
):
    """All-heads batched attention for one batch item (no relative scores)."""
    q = q_ref[0].astype(jnp.float32)  # (h, L, d)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (h, Lq, Lk)
    scores = scores * scale + bias_ref[0]  # bias block (1, 1, L) broadcasts over (h, Lq, Lk)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    ctx = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (h, L, d)
    out_ref[0] = ctx.astype(out_ref.dtype)


def _attn_rel_kernel_v2(
    q_ref, k_ref, v_ref, bias_ref, table_rev_ref, out_ref, *, scale: float, m: int
):
    """
    All-heads batched attention for one batch item WITH HF relative_key
    scores, computed as ONE MXU matmul against the (reversed) distance table
    plus an in-VMEM skew -- instead of v1's per-head 32-step VPU accumulation
    against a gathered (D, L, L) tensor.

    Math: rel[l, j] = sum_d q[l, d] * E[l - j + M - 1, d]. With the table
    pre-reversed (Erev[c] = E[2M-2-c]) and the window [M-L, M+L-1) sliced,
    rel[l, j] = qErev_win[l, (L-1-l) + j] -- an increasing per-row left
    shift, realized by _skew_rows (binary-decomposed static rolls; Mosaic
    rejects the classic pad/flatten/restride skew -- "unsupported shape cast"
    on the (L, 2L) -> (2L*L,) flatten).
    """
    q = q_ref[0].astype(jnp.float32)  # (h, L, d)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    h, l, d = q.shape

    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (h, Lq, Lk)

    # (h*L, 2M-1) = (h*L, d) @ (2M-1, d)^T -- one MXU matmul for all heads
    qe = jax.lax.dot_general(
        q.reshape(h * l, d), table_rev_ref[:].astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    qe = qe[:, m - l : m + l - 1]  # (h*L, 2L-1) distance window for seq len l

    rel_rows = []
    for head in range(h):
        x = qe[head * l : (head + 1) * l]          # (L, 2L-1)
        x = jnp.pad(x, ((0, 0), (0, 1)))           # (L, 2L)
        rel_rows.append(_skew_rows(x, l))          # rel[l_, j] per head
    rel = jnp.stack(rel_rows)                      # (h, L, L)

    scores = (scores + rel) * scale + bias_ref[0]  # bias block (1, 1, L)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    ctx = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = ctx.astype(out_ref.dtype)


def fused_attention_v2(
    q: jnp.ndarray,  # (B, H, L, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask_bias: jnp.ndarray,  # (B, L) additive bias per key (-10000 masked)
    rel_table: jnp.ndarray | None = None,  # (2M-1, D) distance embedding table
    m: int | None = None,  # max_position_embeddings
    interpret: bool = False,
) -> jnp.ndarray:
    """
    v2 fused attention: grid over batch, all heads per step via batched
    dot_generals (MXU), relative_key scores via one qE matmul + VMEM skew.
    Takes the RAW distance table -- no (L, L, D) gather anywhere.
    """
    b, h, l, d = q.shape
    scale = 1.0 / (d**0.5)
    grid = (b,)

    qkv_spec = pl.BlockSpec((1, h, l, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    # Bias carried as (B, 1, 1, L): Mosaic requires the last two block dims be
    # (8k, 128k) or equal to the array dims -- a (1, L) block on (B, L) is
    # rejected; (1, L) on (B, 1, 1, L) satisfies "equal" + "divisible".
    bias4 = mask_bias[:, None, None, :]
    bias_spec = pl.BlockSpec((1, 1, 1, l), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)

    if rel_table is None:
        kernel = functools.partial(_attn_kernel_v2, scale=scale, m=m or l)
        in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec]
        args = (q, k, v, bias4)
    else:
        assert m is not None and rel_table.shape[0] == 2 * m - 1
        assert l <= m
        table_rev = rel_table[::-1]  # reversed once in XLA-land (hoisted)
        table_spec = pl.BlockSpec(
            (2 * m - 1, d), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        kernel = functools.partial(_attn_rel_kernel_v2, scale=scale, m=m)
        in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec, table_spec]
        args = (q, k, v, bias4, table_rev)

    flops = 2 * b * h * l * l * d * 2 + (2 * b * h * l * (2 * m - 1 if m else l) * d if rel_table is not None else 0)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, l, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, l, d), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
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
