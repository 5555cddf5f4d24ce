"""
Multi-host execution: jax.distributed over a global device mesh.

The reference's multi-node story is lightning DDP with one process per GPU
(reference bin/train.py:469-476); the TPU-native equivalent is
`jax.distributed.initialize()` + ONE global `jax.sharding.Mesh` spanning every
chip of every host. All communication stays GSPMD-inserted -- the single-host
and multi-host programs are the same jitted train step over a bigger mesh;
`parallel.mesh.shard_batch`/`replicate` handle cross-process placement (each
host transfers only the shards its addressable devices own).

Proven offline by a 2-process CPU run (4 virtual devices per process, one
global 8-device mesh, Gloo collectives): tests/test_multihost.py asserts the
2-process DP train-step loss equals the single-process 8-device loss.
On a real TPU pod slice, `scripts/tpu_pod_launch.sh` launches
`bin/train.py --multihost` on every host and `initialize()` picks the
coordinator up from the TPU environment.
"""
from __future__ import annotations

import logging
from typing import Optional

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """
    Join the jax.distributed runtime. With no arguments, autodetects from the
    TPU pod environment (the production path). Explicit arguments support
    launching N cooperating CPU processes on one machine -- the offline
    validation path (e.g. coordinator_address="localhost:12345",
    num_processes=2, process_id=0/1).
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    logging.info(
        f"jax.distributed initialized: process {jax.process_index()}/"
        f"{jax.process_count()}, {jax.local_device_count()} local / "
        f"{jax.device_count()} global devices"
    )


def is_primary() -> bool:
    """Whether this process should write artifacts (reference rank-0-only
    logging, modelling.py:744-749)."""
    import jax

    return jax.process_index() == 0


def dp_train_step_demo(seed: int = 0, n_devices: "int | None" = None) -> float:
    """
    One data-parallel diffusion train step over the GLOBAL mesh (all devices
    of all processes) on tiny shapes, returning the scalar loss. Pure SPMD:
    every process runs this same function; the batch and init are derived
    from `seed`, so the returned loss is identical on every process AND
    identical to a single-process run over the same number of devices --
    which is exactly what tests/test_multihost.py asserts.

    `n_devices` restricts the mesh to the first N global devices (and scales
    the batch to 2*N). The single-process comparison side passes this so the
    reference math matches the workers' device count even when the ambient
    platform has more devices than the dryrun was asked for.
    """
    import jax

    from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
    from foldingdiff_tpu.models.bert import BertForDiffusion
    from foldingdiff_tpu.models.config import ModelConfig
    from foldingdiff_tpu.parallel.mesh import make_mesh, shard_batch
    from foldingdiff_tpu.training.trainer import Trainer, TrainConfig

    if n_devices is None:
        n_devices = jax.device_count()
    assert n_devices <= jax.device_count()
    config = ModelConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=16,
        position_embedding_type="relative_key",
        matmul_precision="highest",
    )
    mesh = make_mesh(jax.devices()[:n_devices])
    schedule = DiffusionSchedule.create("linear", 10)
    tcfg = TrainConfig(lr=1e-4, batch_size=2 * n_devices, max_epochs=1, lr_scheduler=None)
    trainer = Trainer(BertForDiffusion(config), schedule, tcfg, steps_per_epoch=1, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(seed), pad=16)

    rng = np.random.default_rng(seed)
    b, l = 2 * n_devices, 16
    batch = {
        "angles": rng.uniform(-np.pi, np.pi, size=(b, l, 6)).astype(np.float32),
        "attn_mask": np.ones((b, l), dtype=np.float32),
        "lengths": np.full((b,), l, dtype=np.int32),
    }
    batch = dict(zip(batch.keys(), shard_batch(mesh, *batch.values())))
    _, avg, _ = trainer._train_step(state, batch, jax.random.PRNGKey(seed + 1))
    return float(jax.device_get(avg))
