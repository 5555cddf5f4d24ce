"""
Full-train-state checkpointing with mid-training resume -- an upgrade over the
reference, which only saves model weights and cannot resume optimizer state
(SURVEY.md section 5: "No mid-training resume").

State (params, constants, optimizer moments, step) is serialized to msgpack
under <results>/train_state/; `latest` tracks the newest epoch. Orbax is
available in this image but msgpack keeps the artifact dependency-free and
inspectable.
"""
from __future__ import annotations

import glob
import os
import re
from typing import Optional, Tuple

import jax
from flax import serialization


def save_train_state(results_dir: str, state, epoch: int, keep: int = 2) -> str:
    out_dir = os.path.join(results_dir, "train_state")
    os.makedirs(out_dir, exist_ok=True)
    payload = serialization.msgpack_serialize(
        serialization.to_state_dict(
            {
                "step": jax.device_get(state.step),
                "params": jax.device_get(state.params),
                "constants": jax.device_get(state.constants),
                "opt_state": jax.device_get(state.opt_state),
                "epoch": epoch,
            }
        )
    )
    path = os.path.join(out_dir, f"state_epoch={epoch}.msgpack")
    with open(path, "wb") as f:
        f.write(payload)
    ckpts = sorted(glob.glob(os.path.join(out_dir, "state_epoch=*.msgpack")), key=_epoch_of)
    for stale in ckpts[:-keep]:
        os.remove(stale)
    return path


def _epoch_of(path: str) -> int:
    m = re.search(r"epoch=(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else -1


def latest_train_state(results_dir: str) -> Optional[str]:
    ckpts = sorted(
        glob.glob(os.path.join(results_dir, "train_state", "state_epoch=*.msgpack")),
        key=_epoch_of,
    )
    return ckpts[-1] if ckpts else None


def restore_train_state(path: str, state) -> Tuple[object, int]:
    """Restore into an initialized TrainState template; returns
    (state, next_epoch)."""
    with open(path, "rb") as f:
        restored = serialization.msgpack_restore(f.read())
    template = {
        "step": jax.device_get(state.step),
        "params": jax.device_get(state.params),
        "constants": jax.device_get(state.constants),
        "opt_state": jax.device_get(state.opt_state),
        "epoch": 0,
    }
    restored = serialization.from_state_dict(template, restored)
    new_state = state.replace(
        step=jax.numpy.asarray(restored["step"]),
        params=restored["params"],
        constants=restored["constants"],
        opt_state=restored["opt_state"],
    )
    return new_state, int(restored["epoch"]) + 1
