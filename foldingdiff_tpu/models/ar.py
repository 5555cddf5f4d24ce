"""
Autoregressive baseline: next-angle-set prediction.

Reference: BertForAutoregressive(Base) (modelling.py:807-1009). Same encoder
body as the diffusion model; differences:
- no timesteps: the time embedding is REUSED to encode the sequence length,
  added to the upscaled inputs BEFORE the embedding LayerNorm
  (modelling.py:823-828) -- note the diffusion model adds its time embedding
  AFTER embeddings; this ordering difference is reproduced exactly
- training predicts the angle set at position `causal_idx` given a causal
  prefix mask; loss is wrapped smooth-L1 (modelling.py:921-938)
- generation grows the prefix one residue at a time with a full forward pass
  per step (reference modelling.py:864-893, no KV cache); here the whole
  generation loop is one `lax.fori_loop` inside jit instead of a python loop
  with a host round-trip per residue.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from foldingdiff_tpu.models.bert import AnglesPredictor, Embeddings, Layer
from foldingdiff_tpu.models.config import ModelConfig
from foldingdiff_tpu.models.time_embed import get_time_encoder


class BertForAutoregressive(nn.Module):
    """(angles, causal_mask, seq_lengths) -> predicted next angle set per position."""

    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        inputs: jnp.ndarray,  # (B, L, F)
        attention_mask: jnp.ndarray,  # (B, L) causal prefix mask
        seq_lengths: jnp.ndarray,  # (B,)
        position_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        if cfg.matmul_precision != "default":
            with jax.default_matmul_precision(cfg.matmul_precision):
                return self._forward(inputs, attention_mask, seq_lengths, position_ids, deterministic)
        return self._forward(inputs, attention_mask, seq_lengths, position_ids, deterministic)

    def _forward(self, inputs, attention_mask, seq_lengths, position_ids, deterministic):
        cfg = self.config
        b, l, _ = inputs.shape
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(l, dtype=jnp.int32)[None, :], (b, l))

        attn_bias_2d = (1.0 - attention_mask.astype(inputs.dtype)) * -10000.0

        upscaled = nn.Dense(cfg.hidden_size, name="inputs_to_hidden_dim")(inputs)
        len_embed = get_time_encoder(cfg.time_encoding, cfg.hidden_size)(seq_lengths)
        upscaled = upscaled + len_embed[:, None, :]
        hidden = Embeddings(cfg, name="embeddings")(upscaled, position_ids, deterministic)

        for i in range(cfg.num_hidden_layers):
            hidden = Layer(cfg, name=f"encoder_layer_{i}")(
                hidden, attn_bias_2d, position_ids, deterministic
            )

        if cfg.decoder == "mlp":
            return AnglesPredictor(cfg.hidden_size, cfg.n_inputs, name="token_decoder")(hidden)
        return nn.Dense(cfg.n_inputs, name="token_decoder")(hidden)


def ar_sample(
    model: BertForAutoregressive,
    params,
    constants,
    seed_angles: jnp.ndarray,  # (B, L, F), first num_seed positions filled
    seq_lengths: jnp.ndarray,  # (B,)
    num_seed: int = 2,
) -> jnp.ndarray:
    """
    Greedy AR generation as one jitted fori_loop (reference modelling.py:
    864-893). Positions beyond each item's seq_length are still generated
    (as in the reference) and should be trimmed by the caller.
    """
    variables = {"params": params, "constants": constants}
    b, l, f = seed_angles.shape
    max_len = int(np.max(np.asarray(seq_lengths)))

    @jax.jit
    def run(seed_angles, seq_lengths):
        def body(i, retval):
            mask = (jnp.arange(l)[None, :] < i).astype(seed_angles.dtype)
            mask = jnp.broadcast_to(mask, (b, l))
            preds = model.apply(variables, retval, mask, seq_lengths, deterministic=True)
            next_angles = jax.lax.dynamic_slice_in_dim(preds, i, 1, axis=1)
            return jax.lax.dynamic_update_slice_in_dim(retval, next_angles, i, axis=1)

        return jax.lax.fori_loop(num_seed, max_len, body, seed_angles)

    return run(seed_angles, seq_lengths)
