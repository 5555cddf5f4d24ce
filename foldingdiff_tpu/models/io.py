"""
Model checkpoint I/O and reference-torch weight conversion.

Capabilities mirrored from the reference:
- `from_dir` loads a reference-style model directory: training_args.json +
  config.json + models/best_by_{valid,train}/*.ckpt sorted by epoch
  (modelling.py:297-382). Torch .ckpt checkpoints (pytorch-lightning state
  dicts) are converted tensor-by-name to the flax parameter tree.
- `save_model_dir` exports the same artifact layout from our flax models so
  downstream tooling (sampling, scTM) is interchangeable, with weights stored
  as flax msgpack instead of torch pickles.

The GaussianFourier `time_embed.W` buffer is loaded (never redrawn) -- it is
part of the function computed by a trained model (modelling.py:55-57).
"""
from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from flax.core import freeze, unfreeze

from foldingdiff_tpu.models.bert import BertForDiffusion
from foldingdiff_tpu.models.config import ModelConfig


def init_model_variables(model, key: jax.Array, pad: int = 128, n_inputs: Optional[int] = None):
    """Initialize a model's {params, constants} with dummy inputs."""
    n_inputs = n_inputs if n_inputs is not None else model.config.n_inputs
    dummy = jnp.zeros((1, pad, n_inputs), dtype=jnp.float32)
    t = jnp.zeros((1,), dtype=jnp.int32)
    mask = jnp.ones((1, pad), dtype=jnp.float32)
    return model.init({"params": key}, dummy, t, mask, deterministic=True)


def _split_qkv_dense(tree: Dict, torch_prefix: str, torch_sd: Dict[str, np.ndarray], flax_name: str):
    tree[flax_name] = {
        "kernel": torch_sd[f"{torch_prefix}.weight"].T,
        "bias": torch_sd[f"{torch_prefix}.bias"],
    }


def _ln(torch_prefix: str, torch_sd) -> Dict[str, np.ndarray]:
    return {
        "scale": torch_sd[f"{torch_prefix}.weight"],
        "bias": torch_sd[f"{torch_prefix}.bias"],
    }


def convert_torch_state_dict(
    torch_sd: Dict[str, Any], config: ModelConfig
) -> Tuple[Dict, Dict]:
    """
    Reference/torch state dict -> (params, constants) flax trees.

    Accepts reference BertForDiffusion(Base) naming; tensors may be torch
    tensors or numpy arrays.
    """
    sd = {}
    for k, v in torch_sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k] = np.asarray(v)

    params: Dict[str, Any] = {}
    constants: Dict[str, Any] = {}

    _split_qkv_dense(params, "inputs_to_hidden_dim", sd, "inputs_to_hidden_dim")

    emb: Dict[str, Any] = {"LayerNorm": _ln("embeddings.LayerNorm", sd)}
    if "embeddings.position_embeddings.weight" in sd:
        emb["position_embeddings"] = {"embedding": sd["embeddings.position_embeddings.weight"]}
    params["embeddings"] = emb

    for i in range(config.num_hidden_layers):
        pre = f"encoder.layer.{i}"
        self_attn: Dict[str, Any] = {}
        for name in ["query", "key", "value"]:
            _split_qkv_dense(self_attn, f"{pre}.attention.self.{name}", sd, name)
        dist_key = f"{pre}.attention.self.distance_embedding.weight"
        if dist_key in sd:
            self_attn["distance_embedding"] = {"embedding": sd[dist_key]}
        layer: Dict[str, Any] = {"attention_self": self_attn}
        _split_qkv_dense(layer, f"{pre}.attention.output.dense", sd, "attention_output_dense")
        layer["attention_output_LayerNorm"] = _ln(f"{pre}.attention.output.LayerNorm", sd)
        _split_qkv_dense(layer, f"{pre}.intermediate.dense", sd, "intermediate_dense")
        _split_qkv_dense(layer, f"{pre}.output.dense", sd, "output_dense")
        layer["output_LayerNorm"] = _ln(f"{pre}.output.LayerNorm", sd)
        params[f"encoder_layer_{i}"] = layer

    if config.decoder == "mlp":
        dec: Dict[str, Any] = {}
        _split_qkv_dense(dec, "token_decoder.dense1", sd, "dense1")
        dec["layer_norm"] = _ln("token_decoder.layer_norm", sd)
        _split_qkv_dense(dec, "token_decoder.dense2", sd, "dense2")
        params["token_decoder"] = dec
    else:
        _split_qkv_dense(params, "token_decoder", sd, "token_decoder")

    if "time_embed.W" in sd:
        constants["time_embed"] = {"W": sd["time_embed.W"]}

    to_jnp = lambda x: jnp.asarray(x, dtype=jnp.float32)
    params = jax.tree.map(to_jnp, params)
    constants = jax.tree.map(to_jnp, constants)
    return params, constants


def load_torch_checkpoint(ckpt_path: str, config: ModelConfig) -> Tuple[Dict, Dict]:
    """Load a torch/.ckpt file (lightning or raw state dict) and convert."""
    import torch

    loaded = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = loaded.get("state_dict", loaded) if isinstance(loaded, dict) else loaded
    return convert_torch_state_dict(sd, config)


# ---------------------------------------------------------------------------
# Native model-directory format (artifact-parity with the reference layout)
# ---------------------------------------------------------------------------

def save_model_dir(
    dirname: str,
    config: ModelConfig,
    params: Dict,
    constants: Dict,
    train_args: Dict,
    mean_offset: Optional[np.ndarray] = None,
    epoch: int = 0,
    best_by: str = "valid",
    keep_top_k: int = 5,
) -> str:
    """
    Write training_args.json, config.json, training_mean_offset.npy, and
    weights under models/best_by_{valid,train}/epoch=N.msgpack -- the reference
    artifact layout (bin/train.py:214-233, 255-284, 363-367, 463).
    """
    os.makedirs(dirname, exist_ok=True)
    with open(os.path.join(dirname, "training_args.json"), "w") as f:
        json.dump(train_args, f, indent=4, default=str)
    with open(os.path.join(dirname, "config.json"), "w") as f:
        json.dump(config.to_hf_config_dict(), f, indent=2)
    if mean_offset is not None:
        np.save(os.path.join(dirname, "training_mean_offset.npy"), np.asarray(mean_offset))
    subdir = os.path.join(dirname, "models", f"best_by_{best_by}")
    os.makedirs(subdir, exist_ok=True)
    payload = serialization.msgpack_serialize(
        {"params": unfreeze(freeze(params)), "constants": unfreeze(freeze(constants))}
    )
    out = os.path.join(subdir, f"epoch={epoch}.msgpack")
    with open(out, "wb") as f:
        f.write(payload)
    # Keep only the newest k checkpoints (reference keeps top-5)
    ckpts = sorted(glob.glob(os.path.join(subdir, "*.msgpack")), key=_epoch_from_fname)
    for stale in ckpts[:-keep_top_k]:
        os.remove(stale)
    return out


def _epoch_from_fname(fname: str) -> int:
    m = re.findall(r"epoch=([0-9]+)", os.path.basename(fname))
    return int(m[-1]) if m else -1


def resolve_model_dir(name_or_dir: str) -> str:
    """
    Resolve a model reference to a local directory: an existing path is
    returned as-is; a Hugging Face hub model id (e.g. "wukevin/foldingdiff")
    is snapshot-downloaded and its local cache path returned (reference
    bin/sample.py:302-307 + utils.is_huggingface_hub_id). Offline hosts fall
    through to the local-path error.
    """
    from foldingdiff_tpu.utils import is_huggingface_hub_id

    if os.path.isdir(name_or_dir):
        return name_or_dir
    if is_huggingface_hub_id(name_or_dir):
        from huggingface_hub import snapshot_download

        local = snapshot_download(name_or_dir)
        # The reference hub layout nests the artifact dir under models/
        nested = os.path.join(local, "models")
        if not os.path.isfile(os.path.join(local, "training_args.json")) and os.path.isdir(nested):
            for sub in sorted(os.listdir(nested)):
                cand = os.path.join(nested, sub)
                if os.path.isfile(os.path.join(cand, "training_args.json")):
                    return cand
        return local
    raise FileNotFoundError(
        f"{name_or_dir} is neither a local model directory nor a reachable hub id"
    )


def from_dir(
    dirname: str,
    idx: int = -1,
    best_by: str = "valid",
    load_weights: bool = True,
) -> Tuple[BertForDiffusion, Dict, Dict, Dict]:
    """
    Load a model directory (reference layout or native) or Hugging Face hub
    model id. Returns (model, params, constants, train_args). Checkpoints are
    globbed from models/best_by_{valid,train}/ and sorted by epoch; idx
    selects which (default latest), matching reference modelling.from_dir
    (297-382) + the hub path of bin/sample.py:302-307.
    """
    dirname = resolve_model_dir(dirname)
    with open(os.path.join(dirname, "training_args.json")) as f:
        train_args = json.load(f)
    cfg_json = os.path.join(dirname, "config.json")
    if os.path.isfile(cfg_json):
        body = ModelConfig.from_hf_config_json(cfg_json)
        config = ModelConfig.from_train_args(train_args)
        # config.json wins for the transformer body
        config = ModelConfig(
            **{
                **config.__dict__,
                **{k: getattr(body, k) for k in (
                    "hidden_size", "num_hidden_layers", "num_attention_heads",
                    "intermediate_size", "max_position_embeddings",
                    "position_embedding_type", "layer_norm_eps", "hidden_act",
                )},
            }
        )
    else:
        config = ModelConfig.from_train_args(train_args)

    model = BertForDiffusion(config)
    variables = init_model_variables(model, jax.random.PRNGKey(0), pad=train_args.get("max_seq_len", 128))
    params, constants = variables["params"], variables.get("constants", {})

    if load_weights:
        subdir = os.path.join(dirname, "models", f"best_by_{best_by}")
        native = sorted(glob.glob(os.path.join(subdir, "*.msgpack")), key=_epoch_from_fname)
        torch_ckpts = sorted(glob.glob(os.path.join(subdir, "*.ckpt")), key=_epoch_from_fname)
        if native:
            with open(native[idx], "rb") as f:
                loaded = serialization.msgpack_restore(f.read())
            params, constants = loaded["params"], loaded["constants"]
        elif torch_ckpts:
            params, constants = load_torch_checkpoint(torch_ckpts[idx], config)
        else:
            raise FileNotFoundError(f"No checkpoints under {subdir}")
    return model, params, constants, train_args
