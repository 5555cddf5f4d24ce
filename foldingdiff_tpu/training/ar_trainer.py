"""
Autoregressive-baseline training (reference bin/train_autoregressive.py +
BertForAutoregressive._get_loss, modelling.py:896-968).

Each step: per item, draw causal_len ~ U[1, length), mask the prefix, predict
the angle set at position causal_len, wrapped smooth-L1 loss against the true
angles there. The causal draw happens on device inside the jitted step.
"""
from __future__ import annotations

import dataclasses
import logging
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from foldingdiff_tpu import losses as loss_lib
from foldingdiff_tpu.models import io as model_io
from foldingdiff_tpu.models.ar import BertForAutoregressive
from foldingdiff_tpu.training.trainer import (
    TrainConfig,
    TrainState,
    append_metrics_csv,
    build_optimizer,
)


class ARTrainer:
    def __init__(self, model: BertForAutoregressive, train_cfg: TrainConfig, steps_per_epoch: int, mesh=None):
        self.model = model
        self.cfg = train_cfg
        self.mesh = mesh
        self.tx = build_optimizer(train_cfg, steps_per_epoch)
        self._train_step = jax.jit(self._step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._loss_impl)

    def init_state(self, key: jax.Array, pad: int) -> TrainState:
        # AR model takes (inputs, mask, seq_lengths); init via direct call
        dummy = jnp.zeros((1, pad, self.model.config.n_inputs))
        variables = self.model.init(
            {"params": key}, dummy, jnp.ones((1, pad)), jnp.full((1,), pad), deterministic=True
        )
        params, constants = variables["params"], variables.get("constants", {})
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params, constants=constants,
            opt_state=self.tx.init(params), tx=self.tx,
        )
        if self.mesh is not None:
            from foldingdiff_tpu.parallel.mesh import replicate

            state = state.replace(
                params=replicate(self.mesh, state.params),
                constants=replicate(self.mesh, state.constants),
                opt_state=replicate(self.mesh, state.opt_state),
            )
        return state

    def _loss(self, params, constants, batch, rng, deterministic):
        angles = batch["angles"]
        lengths = batch["lengths"]
        b, l, _ = angles.shape
        c_key, d_key = jax.random.split(rng)
        # causal_len ~ U[1, length) per item (reference datasets.py:660)
        u = jax.random.uniform(c_key, (b,))
        causal_len = (1 + u * (lengths.astype(jnp.float32) - 1)).astype(jnp.int32)
        causal_len = jnp.clip(causal_len, 1, l - 1)
        causal_mask = (jnp.arange(l)[None, :] < causal_len[:, None]).astype(angles.dtype)
        preds = self.model.apply(
            {"params": params, "constants": constants},
            angles, causal_mask, lengths,
            deterministic=deterministic,
            rngs={"dropout": d_key} if not deterministic else {},
        )
        pred_at = jnp.take_along_axis(preds, causal_len[:, None, None], axis=1)[:, 0, :]
        target = jnp.take_along_axis(angles, causal_len[:, None, None], axis=1)[:, 0, :]
        # Exclude zero-length rows: shard_batch zero-pads ragged batches to the
        # mesh size (parallel/mesh.py), and unlike the diffusion losses this
        # per-row loss is not attn_mask-masked -- without this, padded rows
        # would train the model toward predicting zero angles.
        valid = jnp.broadcast_to((lengths > 0)[:, None], pred_at.shape)
        return loss_lib.radian_smooth_l1_loss(pred_at, target, beta=np.pi / 10, mask=valid)

    def _loss_impl(self, params, constants, batch, rng):
        return self._loss(params, constants, batch, rng, deterministic=True)

    def _step_impl(self, state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(
            lambda p: self._loss(p, state.constants, batch, rng, deterministic=False)
        )(state.params)
        return state.apply_gradients(grads), loss

    def fit(
        self,
        state: TrainState,
        train_data: Dict[str, np.ndarray],
        valid_data: Optional[Dict[str, np.ndarray]] = None,
        results_dir: Optional[str] = None,
        model_config=None,
        train_args: Optional[dict] = None,
        mean_offset=None,
        log_every: int = 0,
        train_data_refresh=None,
    ) -> Tuple[TrainState, List[Dict[str, float]]]:
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed)
        host_rng = np.random.default_rng(cfg.seed)
        rows: List[Dict[str, float]] = []
        csv_flushed = 0
        best: List[Tuple[float, int, str]] = []
        if results_dir is not None:
            import os

            stale = os.path.join(results_dir, "logs", "metrics.csv")
            if os.path.exists(stale):
                os.remove(stale)
        for epoch in range(cfg.max_epochs):
            t0 = time.time()
            if train_data_refresh is not None:
                # Per-epoch randomcrop re-cropping of >pad structures (same
                # hook as the diffusion Trainer; reference datasets.py:411-438)
                train_data = train_data_refresh(epoch)
            tl = []
            n = train_data["angles"].shape[0]
            idx = host_rng.permutation(n)
            for start in range(0, max(n - cfg.batch_size + 1, 1), cfg.batch_size):
                sel = idx[start : start + cfg.batch_size]
                batch = {k: train_data[k][sel] for k in ("angles", "attn_mask", "lengths")}
                if self.mesh is not None:
                    from foldingdiff_tpu.parallel.mesh import shard_batch

                    batch = dict(zip(batch.keys(), shard_batch(self.mesh, *batch.values())))
                key, sk = jax.random.split(key)
                state, loss = self._train_step(state, batch, sk)
                tl.append(loss)
            # Fetch per-step losses ONCE at epoch end: a float() per step is a
            # blocking host round-trip that serializes the step pipeline
            # (seconds each through a remote-dispatch tunnel) -- same pattern
            # as the diffusion Trainer.fit
            tl = jax.device_get(tl)
            train_loss = float(np.mean(tl)) if len(tl) else np.nan

            val_loss = np.nan
            if valid_data is not None:
                vl = []
                nv = valid_data["angles"].shape[0]
                for start in range(0, max(nv - cfg.batch_size + 1, 1), cfg.batch_size):
                    batch = {k: valid_data[k][start : start + cfg.batch_size] for k in ("angles", "attn_mask", "lengths")}
                    key, sk = jax.random.split(key)
                    vl.append(self._eval_step(state.params, state.constants, batch, sk))
                vl = jax.device_get(vl)
                val_loss = float(np.mean(vl)) if len(vl) else np.nan

            rows.append({
                "epoch": epoch, "step": int(state.step), "train_loss": train_loss,
                "val_loss": val_loss, "epoch_seconds": time.time() - t0,
            })
            if log_every and epoch % log_every == 0:
                logging.info(f"AR epoch {epoch}: train {train_loss:.4f} val {val_loss:.4f}")
            if results_dir is not None:
                csv_flushed = append_metrics_csv(
                    results_dir, rows, already_flushed=csv_flushed
                )
            if results_dir is not None and model_config is not None:
                metric = val_loss if valid_data is not None else train_loss
                if not np.isnan(metric) and (len(best) < 5 or metric < max(b[0] for b in best)):
                    path = model_io.save_model_dir(
                        results_dir, model_config, jax.device_get(state.params),
                        jax.device_get(state.constants), train_args or {},
                        mean_offset=mean_offset, epoch=epoch, best_by="valid",
                        keep_top_k=10**9,
                    )
                    best.append((metric, epoch, path))
                    best.sort()
                    while len(best) > 5:
                        _, _, stale = best.pop()
                        import os

                        if os.path.exists(stale):
                            os.remove(stale)
        return state, rows
