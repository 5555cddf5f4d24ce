"""
BERT-for-diffusion denoiser in Flax.

Numerically compatible with the reference model (foldingdiff/modelling.py:
211-484, which wraps HF transformers BertEncoder):
- continuous 6-feature inputs projected to hidden dim (modelling.py:267-269)
- optional absolute position embeddings, LayerNorm(eps=1e-12) + dropout
  (BertEmbeddings, modelling.py:132-170)
- time embedding broadcast-added to every position (modelling.py:471-472)
- post-LN BERT encoder with `relative_key` relative-position attention
  scoring (HF BertSelfAttention semantics: raw q@k^T plus
  einsum('bhld,lrd->bhlr', q, dist_emb) BEFORE the 1/sqrt(d) scale)
- additive -10000 attention mask (modelling.py:450-452)
- MLP angle head: dense -> gelu -> LayerNorm -> dense (modelling.py:173-208)

Parameter tree names mirror the HF module paths (encoder/layer_N/attention/...)
so reference torch checkpoints convert by name mapping alone (models/io.py).

TPU notes: everything static-shaped; attention runs as plain jnp einsums that
XLA fuses onto the MXU (L<=512, H<=768 -- the whole layer fits in VMEM). A
Pallas fused-attention path can be slotted in `SelfAttention.__call__`.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from foldingdiff_tpu.models.config import ModelConfig
from foldingdiff_tpu.models.time_embed import get_time_encoder


def _act(name: str):
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if name == "gelu_new":
        return lambda x: nn.gelu(x, approximate=True)
    if name == "relu":
        return nn.relu
    raise ValueError(f"Unsupported activation {name}")


def _relative_scores_skew(q: jnp.ndarray, table: jnp.ndarray, max_pos: int) -> jnp.ndarray:
    """
    relative_key scores rel[b,h,l,r] = q[b,h,l] . table[l-r+M-1] computed as
    ONE well-shaped matmul against the (reversed) embedding table plus a
    pad/reshape "skew" realignment -- instead of the naive
    einsum('bhld,lrd->bhlr') which lowers to L tiny (BH x D x L) batched
    matmuls (measured 2.4 ms/step of the 5.5 ms sampling step at B=64).
    Numerically identical (same dot products, reassociation-free).
    """
    b, h, l, d = q.shape
    m = max_pos
    p = jnp.einsum("bhld,kd->bhlk", q, table[::-1])  # (B, H, L, 2M-1)
    p = jnp.pad(p, ((0, 0), (0, 0), (0, 0), (1, 0)))  # (B, H, L, 2M)
    flat = p.reshape(b, h, l * 2 * m)
    need = m + l * (2 * m - 1)
    if need > flat.shape[-1]:
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, need - flat.shape[-1])))
    flat = jax.lax.dynamic_slice_in_dim(flat, m, l * (2 * m - 1), axis=2)
    return flat.reshape(b, h, l, 2 * m - 1)[..., :l]


def _relative_scores_onedot(q: jnp.ndarray, table: jnp.ndarray, max_pos: int) -> jnp.ndarray:
    """
    relative_key scores via ONE (B*L*H, D) x (D, 2M-1) matmul against the full
    embedding table followed by a take_along_axis gather of the (l, r) ->
    l-r+M-1 diagonals. Avoids both the L tiny batched matmuls the gather
    einsum lowers to AND the skew trick's padded HBM intermediate. q is
    (B, L, H, D); returns (B, H, L, L). Numerically identical to the gather
    path (same dot products, no reassociation).
    """
    b, l, h, d = q.shape
    p = jnp.einsum("blhd,kd->blhk", q, table)  # (B, L, H, 2M-1)
    idx = (jnp.arange(l)[:, None] - jnp.arange(l)[None, :]) + (max_pos - 1)  # (L, L)
    rel = jnp.take_along_axis(p, jnp.broadcast_to(idx[None, :, None, :], (b, l, h, l)), axis=-1)
    return rel.transpose(0, 2, 1, 3)


class SelfAttention(nn.Module):
    """HF BertSelfAttention numerics incl. relative_key position scoring.

    Two numerically-identical execution paths: XLA einsums (differentiable,
    supports attention dropout) and the fused Pallas VMEM kernel
    (ops/pallas_attention.py) for deterministic TPU forward passes, which
    avoids materializing the (B, H, L, L) score tensor in HBM.
    """

    config: ModelConfig

    def _use_pallas(self, deterministic: bool) -> bool:
        impl = self.config.attention_impl
        if impl in ("pallas", "pallas_v2"):
            return True
        # "auto" currently resolves to the XLA path: measured on v5e at
        # B<=256/L=128, XLA's own attention fusion outperforms the VMEM
        # kernel (2.9 ms vs 4.0 ms per layer at B=256; throughput-optimal
        # sampling batch is ~64 where XLA is ~0.5 ms/layer). The kernel
        # remains selectable and tested for larger-L regimes.
        return False

    @nn.compact
    def __call__(self, hidden, attn_bias_2d, position_ids, deterministic: bool):
        cfg = self.config
        b, l, _ = hidden.shape
        h, d = cfg.num_attention_heads, cfg.attention_head_size

        def proj(name):
            # Keep (B, L, H, D) layout: explicit head transposes showed up as
            # ~27% of step time (layout copies) in the TPU profile; einsums
            # below contract directly from this layout
            return nn.Dense(h * d, name=name)(hidden).reshape(b, l, h, d)

        q = proj("query")
        k = proj("key")
        v = proj("value")

        m = cfg.max_position_embeddings
        table = None
        use_skew = (
            cfg.relative_scores_impl == "skew"
            and cfg.position_embedding_type == "relative_key"
        )
        if cfg.position_embedding_type in ("relative_key", "relative_key_query"):
            dist_module = nn.Embed(
                2 * m - 1,
                d,
                name="distance_embedding",
                embedding_init=nn.initializers.normal(stddev=cfg.initializer_range),
            )
            # Identity lookup materializes the full table (and creates the
            # params); XLA folds it away
            table = dist_module(jnp.arange(2 * m - 1))

        def gather_dist_emb():
            # distance matrix from the (shared) position ids; HF computes it
            # from arange, equivalent for our always-arange position_ids
            pos = position_ids[0]
            distance = pos[:, None] - pos[None, :]  # (L, L)
            return table[distance + m - 1]

        if (
            self._use_pallas(deterministic)
            and cfg.position_embedding_type != "relative_key_query"
        ):
            if cfg.attention_impl == "pallas_v2":
                from foldingdiff_tpu.ops.pallas_attention import fused_attention_v2

                ctx = fused_attention_v2(
                    q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                    v.transpose(0, 2, 1, 3), attn_bias_2d,
                    rel_table=table, m=m if table is not None else None,
                )
            else:
                from foldingdiff_tpu.ops.pallas_attention import fused_attention

                ctx = fused_attention(
                    q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                    v.transpose(0, 2, 1, 3), attn_bias_2d,
                    gather_dist_emb() if table is not None else None,
                )
            return ctx.transpose(0, 2, 1, 3).reshape(b, l, h * d)

        scores = jnp.einsum("blhd,bmhd->bhlm", q, k)
        if table is not None:
            if use_skew:
                scores = scores + _relative_scores_skew(
                    q.transpose(0, 2, 1, 3), table, m
                )
            elif (
                cfg.relative_scores_impl == "onedot"
                and cfg.position_embedding_type == "relative_key"
            ):
                scores = scores + _relative_scores_onedot(q, table, m)
            else:
                dist_emb = gather_dist_emb()
                scores = scores + jnp.einsum("blhd,lrd->bhlr", q, dist_emb)
                if cfg.position_embedding_type == "relative_key_query":
                    scores = scores + jnp.einsum("brhd,lrd->bhlr", k, dist_emb)

        scores = scores / jnp.sqrt(jnp.asarray(d, dtype=scores.dtype))
        scores = scores + attn_bias_2d[:, None, None, :]
        probs = nn.softmax(scores, axis=-1)
        probs = nn.Dropout(cfg.attention_probs_dropout_prob)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhlm,bmhd->blhd", probs, v)
        return ctx.reshape(b, l, h * d)


class Layer(nn.Module):
    """One post-LN BERT layer (attention + FFN), HF module naming."""

    config: ModelConfig

    @nn.compact
    def __call__(self, hidden, attn_bias_2d, position_ids, deterministic: bool):
        cfg = self.config
        act = _act(cfg.hidden_act)

        attn_out = SelfAttention(cfg, name="attention_self")(
            hidden, attn_bias_2d, position_ids, deterministic
        )
        attn_out = nn.Dense(cfg.hidden_size, name="attention_output_dense")(attn_out)
        attn_out = nn.Dropout(cfg.hidden_dropout_prob)(attn_out, deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="attention_output_LayerNorm")(
            attn_out + hidden
        )

        ff = nn.Dense(cfg.intermediate_size, name="intermediate_dense")(hidden)
        ff = act(ff)
        ff = nn.Dense(cfg.hidden_size, name="output_dense")(ff)
        ff = nn.Dropout(cfg.hidden_dropout_prob)(ff, deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="output_LayerNorm")(ff + hidden)
        return hidden


class Embeddings(nn.Module):
    """Reference BertEmbeddings (modelling.py:132-170): abs pos emb only when
    position_embedding_type == absolute; LayerNorm + dropout always."""

    config: ModelConfig

    @nn.compact
    def __call__(self, input_embeds, position_ids, deterministic: bool):
        cfg = self.config
        emb = input_embeds
        if cfg.position_embedding_type == "absolute":
            pos = nn.Embed(
                cfg.max_position_embeddings,
                cfg.hidden_size,
                name="position_embeddings",
                embedding_init=nn.initializers.normal(stddev=cfg.initializer_range),
            )(position_ids)
            emb = emb + pos
        emb = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="LayerNorm")(emb)
        return nn.Dropout(cfg.hidden_dropout_prob)(emb, deterministic=deterministic)


class AnglesPredictor(nn.Module):
    """dense -> act -> LayerNorm -> dense head (modelling.py:173-208)."""

    d_model: int
    d_out: int
    activation: str = "gelu"
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.d_model, name="dense1")(x)
        x = _act(self.activation)(x)
        x = nn.LayerNorm(epsilon=self.eps, name="layer_norm")(x)
        return nn.Dense(self.d_out, name="dense2")(x)


class BertForDiffusion(nn.Module):
    """
    Noise-prediction transformer: (x_t, t, mask) -> predicted noise.

    apply signature:
      model.apply({'params': p, 'constants': c}, inputs, timestep, attention_mask,
                  position_ids=None, deterministic=True, rngs={'dropout': key})
    """

    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        inputs: jnp.ndarray,  # (B, L, F)
        timestep: jnp.ndarray,  # (B,) or (B, 1)
        attention_mask: jnp.ndarray,  # (B, L), 1 = keep
        position_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        if cfg.matmul_precision != "default":
            with jax.default_matmul_precision(cfg.matmul_precision):
                return self._forward(inputs, timestep, attention_mask, position_ids, deterministic)
        return self._forward(inputs, timestep, attention_mask, position_ids, deterministic)

    def _forward(self, inputs, timestep, attention_mask, position_ids, deterministic):
        cfg = self.config
        assert inputs.ndim == 3
        b, l, _ = inputs.shape

        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(l, dtype=jnp.int32)[None, :], (b, l))

        attn_bias_2d = (1.0 - attention_mask.astype(inputs.dtype)) * -10000.0

        upscaled = nn.Dense(cfg.hidden_size, name="inputs_to_hidden_dim")(inputs)
        upscaled = Embeddings(cfg, name="embeddings")(upscaled, position_ids, deterministic)

        time_encoded = get_time_encoder(cfg.time_encoding, cfg.hidden_size)(timestep)
        hidden = upscaled + time_encoded[:, None, :]

        # nn.remat subclasses Layer without renaming, so the params tree (and
        # every saved checkpoint) is identical with remat on or off.
        # static_argnums counts __call__ args with self at 0 -> deterministic
        # (a python bool branching dropout) is arg 4.
        layer_cls = (
            nn.remat(Layer, static_argnums=(4,)) if cfg.remat else Layer
        )
        for i in range(cfg.num_hidden_layers):
            hidden = layer_cls(cfg, name=f"encoder_layer_{i}")(
                hidden, attn_bias_2d, position_ids, deterministic
            )

        if cfg.decoder == "mlp":
            out = AnglesPredictor(cfg.hidden_size, cfg.n_inputs, name="token_decoder")(hidden)
        elif cfg.decoder == "linear":
            out = nn.Dense(cfg.n_inputs, name="token_decoder")(hidden)
        else:
            raise ValueError(f"Unrecognized decoder: {cfg.decoder}")
        return out
