"""
Device-mesh layer: data-parallel sharding over ICI.

The reference's only gradient parallelism is lightning DDP over NCCL
(bin/train.py:469-476); the TPU-native equivalent is a 1-D `jax.sharding.Mesh`
over all local devices with the batch axis sharded and parameters replicated.
XLA inserts the gradient psum; no hand-written collectives needed for a model
this size (<= 25M params, L <= 512). The mesh axes are named so the layer
generalizes: ("data",) today; a ("data", "model") 2-D mesh drops in for tensor
parallelism without touching call sites.

Sampling uses the same mesh: the 780-chain manuscript sweep shards its batch
axis across devices (replacing the reference's process-per-GPU fan-out,
bin/omegafold_across_gpus.py:136-159).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) across the mesh; everything else replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, k: int) -> int:
    return -(-n // k) * k


def shard_batch(mesh: Mesh, *arrays, axis_name: str = "data"):
    """
    Place arrays batch-sharded on the mesh. Falls back to replication when the
    batch dim is not divisible by the mesh size (e.g. ragged tail chunks).
    """
    import logging

    divisible = all(a.shape[0] % mesh.size == 0 for a in arrays)
    if not divisible:
        logging.debug(
            f"Batch {arrays[0].shape[0]} not divisible by mesh size {mesh.size}; replicating"
        )
    sharding = batch_sharding(mesh, axis_name) if divisible else replicated_sharding(mesh)
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (e.g. model params) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
