"""
2-D mesh (data x model) tensor parallelism for the denoiser.

The reference model (<=25M params) needs only data parallelism, but the mesh
layer is written to generalize (SURVEY.md section 2.5). This module provides
Megatron-style parameter shardings for the BERT body over a ("data", "model")
mesh: attention q/k/v and the FFN up-projection shard their OUTPUT features
(column parallel), the attention output projection and FFN down-projection
shard their INPUT features (row parallel); LayerNorms/embeddings/head
replicate. Under jit, XLA GSPMD propagates these shardings through the
einsums and inserts the reduce-scatter/all-reduce collectives -- no
hand-written communication.

Equality with single-device execution is tested on the virtual 8-device CPU
mesh (tests/test_tensor_parallel.py).
"""
from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(n_data: int, n_model: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= n_data * n_model
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def _spec_for(path: str) -> P:
    """PartitionSpec for a flattened parameter path (flax tree, '/'-joined)."""
    # Column parallel (shard output dim = last axis of the kernel):
    if re.search(r"attention_self/(query|key|value)/kernel", path):
        return P(None, "model")
    if re.search(r"intermediate_dense/kernel", path):
        return P(None, "model")
    # Row parallel (shard input dim = first axis):
    if re.search(r"attention_output_dense/kernel", path):
        return P("model", None)
    if re.search(r"output_dense/kernel", path) and "attention" not in path:
        return P("model", None)
    # Matching biases of column-parallel layers shard on their only axis
    if re.search(r"attention_self/(query|key|value)/bias", path):
        return P("model")
    if re.search(r"intermediate_dense/bias", path):
        return P("model")
    # distance_embedding rides with the per-head dim only if heads shard
    # cleanly; keep replicated for correctness (it is tiny)
    return P()


def _path_str(kp) -> str:
    """'/'-joined key path covering DictKey(.key), SequenceKey(.idx), and
    GetAttrKey(.name) entries -- the one stringification both the param and
    train-state sharding builders use (a second divergent copy could silently
    un-shard params whose paths stringify differently)."""
    parts = []
    for p in kp:
        for attr in ("key", "idx", "name"):
            if hasattr(p, attr):
                parts.append(str(getattr(p, attr)))
                break
        else:
            parts.append(str(p))
    return "/".join(parts)


def _validated_put(x, s: NamedSharding, mesh: Mesh):
    """device_put with a clear divisibility check on every sharded dim (a
    non-divisible kernel otherwise fails with an opaque GSPMD error)."""
    for dim, axis in enumerate(s.spec):
        if axis is not None:
            size = mesh.shape[axis]
            assert x.shape[dim] % size == 0, (
                f"dim {dim} of {x.shape} not divisible by mesh axis {axis}={size}"
            )
    return jax.device_put(x, s)


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for the model params over a 2-D mesh."""

    def to_sharding(kp, leaf):
        return NamedSharding(mesh, _spec_for(_path_str(kp)))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(params, mesh: Mesh):
    """Place params with TP shardings; head-dim divisibility is validated for
    the sharded kernels."""
    shardings = param_shardings(params, mesh)
    return jax.tree.map(lambda x, s: _validated_put(x, s, mesh), params, shardings)


class TPRunner:
    """
    Reusable tensor-parallel forward runner: params are placed with TP
    shardings ONCE at construction and the jitted apply is cached on the
    instance -- per-call re-sharding paid a full params transfer every
    invocation.
    """

    def __init__(self, model, params, constants, mesh: Mesh):
        self.model = model
        self.mesh = mesh
        self.params = shard_params(params, mesh)
        self.constants = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), constants
        )
        self._data_sharding = NamedSharding(mesh, P("data"))
        self._jit_cache = {}

    def __call__(self, batch_args, batch_kwargs=None):
        batch_kwargs = batch_kwargs or {}
        batch_args = tuple(jax.device_put(a, self._data_sharding) for a in batch_args)
        # kwargs like deterministic=True are config, closed over per distinct
        # kwargs set (one jit cache entry each)
        key = tuple(sorted(batch_kwargs.items()))
        if key not in self._jit_cache:
            model = self.model

            @jax.jit
            def fwd(p, c, *args):
                return model.apply({"params": p, "constants": c}, *args, **dict(key))

            self._jit_cache[key] = fwd
        return self._jit_cache[key](self.params, self.constants, *batch_args)


def tp_forward_sharded(model, params, constants, mesh: Mesh, batch_args, batch_kwargs=None):
    """One-shot TP forward (shards params per call; for repeated calls build
    a TPRunner once instead)."""
    return TPRunner(model, params, constants, mesh)(batch_args, batch_kwargs)


def train_state_shardings(state, mesh: Mesh):
    """
    NamedSharding pytree for a full TrainState over the 2-D mesh: model
    params AND the optimizer moments (whose leaf paths embed the param paths,
    so the same pattern rules apply) get TP shardings; scalars/constants
    replicate. distance_embedding stays replicated by design -- its head-dim
    axis is used whole per attention head and the table is tiny.
    """

    def to_sharding(kp, leaf):
        return NamedSharding(mesh, _spec_for(_path_str(kp)))

    return jax.tree_util.tree_map_with_path(to_sharding, state)


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState (params + optimizer moments) with TP shardings."""
    shardings = train_state_shardings(state, mesh)
    return jax.tree.map(lambda x, s: _validated_put(x, s, mesh), state, shardings)


def tp_train_step(trainer, state, batch, rng, mesh: Mesh):
    """
    One tensor-parallel training step: batch sharded on the data axis, state
    pre-placed by shard_train_state. Reuses the trainer's jitted step; XLA
    GSPMD propagates the Megatron shardings through forward, backward, and
    the adamw update, inserting the collectives. Output state keeps the TP
    placement (donated input), so steps chain without re-sharding.
    """
    data_sharding = NamedSharding(mesh, P("data"))
    batch = {k: jax.device_put(v, data_sharding) for k, v in batch.items()}
    return trainer._train_step(state, batch, rng)
