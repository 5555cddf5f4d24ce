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


def _spans_processes(mesh: Mesh) -> bool:
    return len({d.process_index for d in mesh.devices.flat}) > 1


def _global_put(arr: np.ndarray, sharding: NamedSharding):
    """
    Place a host array onto a (possibly multi-process) sharding.

    Single-process: plain device_put. Multi-process: every process holds the
    same FULL value (the per-host data loader materializes the whole batch
    deterministically) and transfers only the shards its addressable devices
    own -- the cross-host "assembly" is just metadata
    (make_array_from_single_device_arrays), no communication. This is the
    jax.distributed replacement for the reference's per-rank DataLoader
    sharding under lightning DDP (reference bin/train.py:374-393).
    """
    if not _spans_processes(sharding.mesh):
        # No host copy: device_put handles device->device placement directly
        # (np.asarray here would force a host round-trip per leaf, seconds
        # each through a remote-dispatch tunnel)
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    idx_map = sharding.addressable_devices_indices_map(arr.shape)
    shards = [jax.device_put(arr[idx], d) for d, idx in idx_map.items()]
    return jax.make_array_from_single_device_arrays(arr.shape, sharding, shards)


def shard_batch(mesh: Mesh, *arrays, axis_name: str = "data"):
    """
    Place arrays batch-sharded on the mesh. Ragged batches (dim 0 not
    divisible by the mesh size) are ZERO-padded to the next multiple so every
    chunk keeps full data parallelism -- never replicated. Zero padding is
    loss-exact for this framework's batch dicts: a padded row has
    attn_mask == 0 and length == 0, so every masked loss (sum(err*mask)/
    sum(mask), losses.py:_masked_mean/_pair_mask) and the sampler's
    output-row mapping (which indexes only the first true-batch rows) are
    bitwise unchanged. Callers that consume raw model outputs must slice the
    first `true_batch` rows themselves.
    """
    n = arrays[0].shape[0]
    assert all(a.shape[0] == n for a in arrays), "batch dims differ"
    target = pad_to_multiple(n, mesh.size)
    if target != n:
        arrays = tuple(
            np.concatenate(
                [np.asarray(a), np.zeros((target - n,) + a.shape[1:], dtype=a.dtype)]
            )
            for a in arrays
        )
    sharding = batch_sharding(mesh, axis_name)
    out = tuple(_global_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (e.g. model params) across the mesh. Works
    across processes: each host must hold the same value (true for seeded
    init and identically-restored checkpoints)."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: _global_put(x, sharding), tree)
