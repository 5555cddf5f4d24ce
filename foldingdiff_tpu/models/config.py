"""
Model configuration.

A frozen dataclass standing in for the HF BertConfig subset the reference
actually uses (bin/train.py:425-435), plus the foldingdiff-specific knobs
(ft_is_angular, time_encoding, decoder head; reference modelling.py:239-287).
Hashable so it can be a static arg under jit.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    # Transformer body (HF BertConfig subset)
    hidden_size: int = 384
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 768
    max_position_embeddings: int = 128
    position_embedding_type: str = "relative_key"  # absolute | relative_key | relative_key_query
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"
    initializer_range: float = 0.02
    # foldingdiff head/inputs
    ft_is_angular: Tuple[bool, ...] = (True, True, True, True, True, True)
    ft_names: Tuple[str, ...] = ("phi", "psi", "omega", "tau", "CA:C:1N", "C:1N:1CA")
    time_encoding: str = "gaussian_fourier"  # gaussian_fourier | sinusoidal
    decoder: str = "mlp"  # mlp | linear
    # Matmul precision for the whole forward pass: "default" lets the backend
    # pick (bf16 inputs on TPU MXU -- fastest), "float32"/"highest" force f32
    # accumulation for bitwise-style parity with the torch reference.
    matmul_precision: str = "default"
    # Attention implementation: "auto" resolves to XLA einsums (measured
    # fastest at B<=256/L=128 on v5e); "xla" forces the einsum path (needed
    # for gradients/dropout); "pallas" forces the v1 VMEM kernel (per-head,
    # gathered (L,L,D) rel tensor); "pallas_v2" forces the v2 kernel
    # (all-heads batched MXU matmuls, rel scores via one qE matmul against
    # the raw distance table + in-VMEM skew).
    attention_impl: str = "auto"
    # relative_key score computation: "gather" = HF-style einsum over gathered
    # embeddings; "skew" = one matmul against the reversed table + pad/reshape
    # realignment; "onedot" = one matmul against the full table + a
    # take_along_axis diagonal gather. All numerically identical (same dot
    # products). Measured on v5e at B=64/L=128: gather 5.5, skew 14.7,
    # onedot ~2500 ms/step (take_along_axis's (B,L,H,L)-index gather does not
    # vectorize on TPU); see scripts/microbench_relkey.py for the A/B harness.
    relative_scores_impl: str = "gather"
    # Rematerialize (jax.checkpoint) each encoder layer: trades recompute for
    # activation memory. Same params tree (checkpoints interchangeable);
    # outputs equal to float-reassociation tolerance (~2e-6, fusion order
    # changes under checkpoint). Off by default -- see docs/performance.md.
    remat: bool = False

    @property
    def n_inputs(self) -> int:
        return len(self.ft_is_angular)

    @property
    def attention_head_size(self) -> int:
        assert self.hidden_size % self.num_attention_heads == 0
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_train_args(cls, train_args: dict, ft_is_angular=None, ft_names=None) -> "ModelConfig":
        """Build from a reference-style training_args.json dict."""
        from foldingdiff_tpu.data.feature_sets import (
            FEATURE_SET_NAMES_TO_ANGULARITY,
            FEATURE_SET_NAMES_TO_FEATURE_NAMES,
        )

        key = train_args.get("angles_definitions", "canonical-full-angles")
        if ft_is_angular is None:
            ft_is_angular = FEATURE_SET_NAMES_TO_ANGULARITY[key]
        if ft_names is None:
            ft_names = FEATURE_SET_NAMES_TO_FEATURE_NAMES[key]
        time_key = "time_encoding" if "time_encoding" in train_args else "seq_len_encoding"
        return cls(
            hidden_size=train_args["hidden_size"],
            num_hidden_layers=train_args["num_hidden_layers"],
            num_attention_heads=train_args["num_heads"],
            intermediate_size=train_args["intermediate_size"],
            max_position_embeddings=train_args["max_seq_len"],
            position_embedding_type=train_args.get("position_embedding_type", "absolute"),
            hidden_dropout_prob=train_args.get("dropout_p", 0.1),
            attention_probs_dropout_prob=train_args.get("dropout_p", 0.1),
            ft_is_angular=tuple(ft_is_angular),
            ft_names=tuple(ft_names),
            time_encoding=train_args.get(time_key, "gaussian_fourier"),
            decoder=train_args.get("decoder", "mlp"),
        )

    @classmethod
    def from_hf_config_json(cls, fname: str, **overrides) -> "ModelConfig":
        """Build the transformer body from an HF config.json artifact."""
        with open(fname) as f:
            cfg = json.load(f)
        fields = dict(
            hidden_size=cfg["hidden_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            intermediate_size=cfg["intermediate_size"],
            max_position_embeddings=cfg["max_position_embeddings"],
            position_embedding_type=cfg.get("position_embedding_type", "absolute"),
            hidden_dropout_prob=cfg.get("hidden_dropout_prob", 0.1),
            attention_probs_dropout_prob=cfg.get("attention_probs_dropout_prob", 0.1),
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-12),
            hidden_act=cfg.get("hidden_act", "gelu"),
        )
        fields.update(overrides)
        return cls(**fields)

    def to_hf_config_dict(self) -> dict:
        """Export the transformer body as an HF-style config.json dict."""
        return {
            "architectures": ["BertModel"],
            "attention_probs_dropout_prob": self.attention_probs_dropout_prob,
            "classifier_dropout": None,
            "hidden_act": self.hidden_act,
            "hidden_dropout_prob": self.hidden_dropout_prob,
            "hidden_size": self.hidden_size,
            "initializer_range": self.initializer_range,
            "intermediate_size": self.intermediate_size,
            "layer_norm_eps": self.layer_norm_eps,
            "max_position_embeddings": self.max_position_embeddings,
            "model_type": "bert",
            "num_attention_heads": self.num_attention_heads,
            "num_hidden_layers": self.num_hidden_layers,
            "pad_token_id": 0,
            "position_embedding_type": self.position_embedding_type,
            "type_vocab_size": 2,
            "use_cache": False,
            "vocab_size": 30522,
        }
