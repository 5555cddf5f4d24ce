"""
Training loop: the TPU-native replacement for the reference's
pytorch-lightning trainer (bin/train.py:287-507 + modelling.py:487-804).

Semantics preserved:
- loss: per-feature wrapped smooth-L1 (beta=pi/10) on predicted vs known noise
  over unmasked positions, averaged over features (modelling.py:553-706);
  optional circle penalty, L1/L2 regularization, and the pairwise-CA-distance
  auxiliary loss computed through NeRF (modelling.py:616-677)
- AdamW (weight_decay=l2) + gradient clip, LinearWarmup stepped per EPOCH with
  10% warmup (modelling.py:762-804), or OneCycle-style schedule
- checkpointing: top-5 by val_loss and by train_loss into
  models/best_by_{valid,train}/ (bin/train.py:214-233)
- CSV metrics (per-feature losses + lr) like the lightning CSVLogger

TPU-native differences:
- forward noising q(x_t|x_0) runs ON DEVICE inside the jitted train step
  (one fused program: noise -> forward -> loss -> grads -> update) instead of
  CPU Dataset workers
- data parallelism is a jax.sharding Mesh: batch sharded, params replicated,
  XLA inserts the gradient all-reduce -- replacing lightning DDP/NCCL
  (bin/train.py:469-476)
- the GaussianFourier time-embed buffer lives in a `constants` collection,
  excluded from the optimizer by construction
"""
from __future__ import annotations

import csv
import dataclasses
import json
import logging
import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from foldingdiff_tpu import losses as loss_lib
from foldingdiff_tpu.diffusion.noise import q_sample, sample_wrapped_noise
from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
from foldingdiff_tpu.geometry import nerf
from foldingdiff_tpu.models import io as model_io
from foldingdiff_tpu.models.bert import BertForDiffusion
from foldingdiff_tpu.models.config import ModelConfig


@dataclasses.dataclass
class TrainConfig:
    lr: float = 5e-5
    loss: str = "smooth_l1"  # smooth_l1 | l1
    l2_norm: float = 0.0
    l1_norm: float = 0.0
    circle_reg: float = 0.0
    gradient_clip: float = 1.0
    batch_size: int = 64
    min_epochs: Optional[int] = None
    max_epochs: int = 10000
    lr_scheduler: Optional[str] = "LinearWarmup"  # LinearWarmup | OneCycleLR | None
    early_stop_patience: int = 0
    use_pdist_loss: Any = 0.0  # float or (min, max) interpolated over timesteps
    angular_variance: float = 1.0
    nonangular_variance: float = 1.0
    use_swa: bool = False  # stochastic weight averaging over the last 20% of epochs
    seed: int = 42
    # Dispatch K train steps as ONE device execution (lax.scan over K stacked
    # batches inside jit). Identical math to K separate steps (same key
    # sequence); cuts the per-step host dispatch overhead, which dominates on
    # a 1-core host driving a remote-dispatch TPU. 1 = off. Only full groups
    # of K are fused; the remainder runs through the single-step path.
    fused_steps: int = 1


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    constants: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt_state,
        )


def make_lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """LR as a function of the global step, mirroring the reference's
    per-epoch-stepped schedules (modelling.py:772-800)."""
    total_epochs = max(cfg.max_epochs, 1)
    if cfg.lr_scheduler is None:
        return lambda step: cfg.lr
    if cfg.lr_scheduler == "LinearWarmup":
        warmup_epochs = int(total_epochs * 0.1)

        def schedule(step):
            epoch = step // max(steps_per_epoch, 1)
            if warmup_epochs > 0:
                warm = jnp.minimum((epoch.astype(jnp.float32) + 0.0) / warmup_epochs, 1.0)
            else:
                warm = 1.0
            decay = jnp.maximum(
                (total_epochs - epoch.astype(jnp.float32)) / max(total_epochs - warmup_epochs, 1),
                0.0,
            )
            return cfg.lr * jnp.where(epoch < warmup_epochs, warm, jnp.minimum(decay, 1.0))

        return schedule
    if cfg.lr_scheduler == "OneCycleLR":
        total_steps = total_epochs * max(steps_per_epoch, 1)
        return optax.cosine_onecycle_schedule(transition_steps=total_steps, peak_value=1e-2)
    raise ValueError(f"Unknown lr scheduler {cfg.lr_scheduler}")


def build_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    return optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip) if cfg.gradient_clip else optax.identity(),
        optax.adamw(learning_rate=schedule, weight_decay=cfg.l2_norm),
    )


def append_metrics_csv(
    results_dir: str, rows: List[Dict[str, float]], already_flushed: int = 0
) -> int:
    """Append rows[already_flushed:] to <results_dir>/logs/metrics.csv,
    writing the header only when the file is new/empty, and return the new
    flushed count. Shared by the diffusion Trainer and the ARTrainer so the
    truncate-on-fresh-run / one-header / append-per-epoch contract lives in
    exactly one place."""
    os.makedirs(os.path.join(results_dir, "logs"), exist_ok=True)
    out = os.path.join(results_dir, "logs", "metrics.csv")
    new_rows = rows[already_flushed:]
    if not new_rows:
        return already_flushed
    write_header = not os.path.exists(out) or os.path.getsize(out) == 0
    with open(out, "a", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        if write_header:
            writer.writeheader()
        writer.writerows(new_rows)
    return len(rows)


def _per_feature_losses(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    is_angular: Tuple[bool, ...],
    loss_name: str,
    circle_reg: float,
) -> jnp.ndarray:
    """Per-feature masked losses, stacked (F,). Angular features use the
    wrapped loss with beta=pi/10 (modelling.py:228-233)."""
    terms = []
    m = mask  # (B, L)
    for i, ang in enumerate(is_angular):
        p, t = pred[..., i], target[..., i]
        if loss_name == "smooth_l1":
            if ang:
                terms.append(
                    loss_lib.radian_smooth_l1_loss(
                        p, t, beta=np.pi / 10, circle_penalty=circle_reg, mask=m
                    )
                )
            else:
                terms.append(loss_lib.smooth_l1_loss(p, t, beta=1.0, mask=m))
        elif loss_name == "l1":
            terms.append(
                loss_lib.radian_l1_loss(p, t, mask=m) if ang else loss_lib.l1_loss(p, t, mask=m)
            )
        else:
            raise ValueError(f"Unknown loss {loss_name}")
    return jnp.stack(terms)


class Trainer:
    """
    Orchestrates jitted train/val steps over stacked host arrays.

    data format: dict with "angles" (N, pad, F), "attn_mask" (N, pad),
    "lengths" (N,) -- the output of AngleDataset.to_arrays().
    """

    def __init__(
        self,
        model: BertForDiffusion,
        schedule: DiffusionSchedule,
        train_cfg: TrainConfig,
        steps_per_epoch: int,
        mesh=None,
    ) -> None:
        self.model = model
        self.schedule = schedule
        self.cfg = train_cfg
        self.mesh = mesh
        self.tx = build_optimizer(train_cfg, steps_per_epoch)
        self.lr_schedule = make_lr_schedule(train_cfg, steps_per_epoch)
        self.is_angular = tuple(model.config.ft_is_angular)
        self.ft_names = tuple(model.config.ft_names)
        self._train_step = jax.jit(self._step_impl, static_argnames=("train",), donate_argnums=(0,))
        self._eval_step = jax.jit(self._loss_impl)
        # Jitted once per Trainer here (compilation itself is lazy): attaching
        # these on first use via hasattr hid per-instance recompiles
        self._train_step_pre = jax.jit(self._step_precorrupted_impl, donate_argnums=(0,))
        self._eval_at_t = jax.jit(self._eval_at_t_impl)
        self._multi_train_step = jax.jit(self._multi_step_impl, donate_argnums=(0,))
        # SWA running average stays ON DEVICE: one jitted dispatch per epoch
        # instead of a full-params device_get (a seconds-scale round-trip on a
        # remote-dispatch TPU). The output is a fresh buffer, so it never
        # aliases params that the donating train step invalidates.
        self._swa_update = jax.jit(
            lambda avg, new, cnt: jax.tree.map(lambda a, n: a + (n - a) / cnt, avg, new),
            donate_argnums=(0,),
        )
        self._csv_rows_flushed = 0

    def init_state(self, key: jax.Array, pad: int) -> TrainState:
        variables = model_io.init_model_variables(self.model, key, pad=pad)
        params, constants = variables["params"], variables.get("constants", {})
        state = TrainState(
            step=jnp.zeros((), dtype=jnp.int32),
            params=params,
            constants=constants,
            opt_state=self.tx.init(params),
            tx=self.tx,
        )
        if self.mesh is not None:
            from foldingdiff_tpu.parallel.mesh import replicate

            state = state.replace(
                params=replicate(self.mesh, state.params),
                constants=replicate(self.mesh, state.constants),
                opt_state=replicate(self.mesh, state.opt_state),
            )
        return state

    # -- core loss ----------------------------------------------------------
    def _loss_terms(self, params, constants, batch, rng, deterministic):
        cfg = self.cfg
        x0 = batch["angles"]
        mask = batch["attn_mask"]
        t_key, n_key, d_key = jax.random.split(rng, 3)
        b = x0.shape[0]
        t = jax.random.randint(t_key, (b,), 0, self.schedule.timesteps)
        noise = sample_wrapped_noise(
            n_key, x0.shape, self.is_angular, cfg.angular_variance, cfg.nonangular_variance,
            dtype=x0.dtype,
        )
        corrupted = q_sample(x0, t, noise, self.schedule, self.is_angular)
        pred = self.model.apply(
            {"params": params, "constants": constants},
            corrupted,
            t,
            mask,
            deterministic=deterministic,
            rngs={"dropout": d_key} if not deterministic else {},
        )
        terms = _per_feature_losses(
            pred, noise, mask, self.is_angular, cfg.loss, cfg.circle_reg
        )

        use_pdist = cfg.use_pdist_loss
        if (isinstance(use_pdist, (list, tuple)) and use_pdist[0] > 0) or (
            not isinstance(use_pdist, (list, tuple)) and use_pdist > 0
        ):
            terms = jnp.concatenate(
                [terms, self._pdist_loss(batch, corrupted, pred, t)[None]]
            )
        return terms

    def _pdist_loss(self, batch, corrupted, pred, t):
        """Auxiliary pairwise-CA-distance loss (modelling.py:616-677)."""
        cfg = self.cfg
        names = list(self.ft_names)
        sqrt_ac = self.schedule.sqrt_alphas_cumprod[t][:, None, None]
        sqrt_omac = self.schedule.sqrt_one_minus_alphas_cumprod[t][:, None, None]
        denoised = (corrupted - sqrt_omac * pred) / sqrt_ac
        known = batch["angles"]

        def build(angles):
            return nerf.nerf_build_batch(
                phi=angles[:, :, names.index("phi")],
                psi=angles[:, :, names.index("psi")],
                omega=angles[:, :, names.index("omega")],
                bond_angle_n_ca_c=angles[:, :, names.index("tau")],
                bond_angle_ca_c_n=angles[:, :, names.index("CA:C:1N")],
                bond_angle_c_n_ca=angles[:, :, names.index("C:1N:1CA")],
            )

        inferred_ca = build(known)[:, 1::3, :]
        denoised_ca = build(denoised)[:, 1::3, :]
        if isinstance(cfg.use_pdist_loss, (list, tuple)):
            min_c, max_c = cfg.use_pdist_loss[:2]
            max_t = self.schedule.timesteps
            coef = min_c + (max_c - min_c) * ((max_t - t.astype(jnp.float32)) / max_t)
        else:
            coef = jnp.asarray(cfg.use_pdist_loss, dtype=jnp.float32)
        return loss_lib.pairwise_dist_loss(
            denoised_ca, inferred_ca, lengths=batch["lengths"], weights=coef
        )

    def _loss_impl(self, params, constants, batch, rng):
        return self._loss_terms(params, constants, batch, rng, deterministic=True)

    # -- pre-corrupted path (debug noisers / exhaustive-t validation) -------
    def _loss_terms_precorrupted(self, params, constants, batch, rng, deterministic):
        """Loss on host-noised batches: batch carries corrupted/t/known_noise
        (the reference's Dataset-noising contract, datasets.py:873-879), used
        by the synthetic debug noisers and exhaustive-t validation."""
        pred = self.model.apply(
            {"params": params, "constants": constants},
            batch["corrupted"],
            batch["t"].reshape(-1),
            batch["attn_mask"],
            deterministic=deterministic,
            rngs={"dropout": rng} if not deterministic else {},
        )
        is_angular = self.is_angular[: pred.shape[-1]]
        return _per_feature_losses(
            pred, batch["known_noise"], batch["attn_mask"], is_angular,
            self.cfg.loss, self.cfg.circle_reg,
        )

    def _step_precorrupted_impl(self, state: TrainState, batch, rng):
        def loss_fn(params):
            terms = self._loss_terms_precorrupted(
                params, state.constants, batch, rng, deterministic=False
            )
            return jnp.mean(terms), terms

        (avg, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), avg, terms

    def train_step_precorrupted(self, state: TrainState, batch, rng):
        """One update from a host-noised batch."""
        return self._train_step_pre(state, batch, rng)

    def eval_exhaustive_t(
        self, state: TrainState, data: Dict[str, np.ndarray], n_t: int = 16, seed: int = 0
    ) -> np.ndarray:
        """Low-variance validation: per-feature losses averaged over a
        stratified grid of timesteps (the reference's exhaustive_t validation
        mode, datasets.py:812-825, without the len*T dataset blowup). Batches
        are weighted by their unmasked-position count so the ragged tail batch
        doesn't carry equal weight."""
        ts = np.linspace(0, self.schedule.timesteps - 1, num=n_t).astype(np.int32)
        key = jax.random.PRNGKey(seed)
        all_terms, weights = [], []
        bs = self.cfg.batch_size
        n = data["angles"].shape[0]
        for t in ts:
            for start in range(0, n, bs):
                batch = {k: jnp.asarray(v[start : start + bs]) for k, v in data.items()
                         if k in ("angles", "attn_mask", "lengths")}
                key, sk = jax.random.split(key)
                all_terms.append(np.asarray(self._eval_at_t(
                    state.params, state.constants, batch, jnp.asarray(int(t)), sk
                )))
                weights.append(float(np.sum(data["attn_mask"][start : start + bs])))
        return np.average(np.stack(all_terms), axis=0, weights=weights)

    def _eval_at_t_impl(self, params, constants, batch, t_scalar, rng):
        x0 = batch["angles"]
        b = x0.shape[0]
        t = jnp.full((b,), t_scalar, dtype=jnp.int32)
        noise = sample_wrapped_noise(
            rng, x0.shape, self.is_angular,
            self.cfg.angular_variance, self.cfg.nonangular_variance,
        )
        corrupted = q_sample(x0, t, noise, self.schedule, self.is_angular)
        pred = self.model.apply(
            {"params": params, "constants": constants},
            corrupted, t, batch["attn_mask"], deterministic=True,
        )
        return _per_feature_losses(
            pred, noise, batch["attn_mask"], self.is_angular,
            self.cfg.loss, self.cfg.circle_reg,
        )

    def _step_impl(self, state: TrainState, batch, rng, train: bool = True):
        def loss_fn(params):
            terms = self._loss_terms(params, state.constants, batch, rng, deterministic=False)
            avg = jnp.mean(terms)
            if self.cfg.l1_norm > 0:
                l1 = sum(
                    jnp.sum(jnp.abs(p)) for p in jax.tree.leaves(params)
                )
                avg = avg + self.cfg.l1_norm * l1
            return avg, terms

        (avg, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, avg, terms

    def _multi_step_impl(self, state: TrainState, batches, rngs):
        """K sequential train steps as one lax.scan (batches/rngs stacked on
        the leading axis). Same per-step math as _step_impl."""

        def body(st, scan_in):
            batch, rng = scan_in
            st, avg, terms = self._step_impl(st, batch, rng)
            return st, (avg, terms)

        return jax.lax.scan(body, state, (batches, rngs))

    # -- epoch loops ---------------------------------------------------------
    def _batches(
        self, data: Dict[str, np.ndarray], rng: np.random.Generator, shuffle: bool,
        shard: bool = True,
    ):
        """Yields (batch, weight) where weight is the unmasked-position count,
        computed host-side BEFORE any mesh sharding (so it costs no device
        round-trip and ignores zero-padded rows). shard=False yields raw host
        batches (the fused-dispatch path stacks then places them itself)."""
        n = data["angles"].shape[0]
        idx = rng.permutation(n) if shuffle else np.arange(n)
        bs = self.cfg.batch_size
        # Keep the ragged tail (reference DataLoader drop_last=False); under a
        # mesh, shard_batch zero-pads non-divisible batches (loss-exact: the
        # padded rows carry attn_mask=0 / length=0)
        for start in range(0, n, bs):
            sel = idx[start : start + bs]
            batch = {
                "angles": data["angles"][sel],
                "attn_mask": data["attn_mask"][sel],
                "lengths": data["lengths"][sel],
            }
            weight = float(np.sum(batch["attn_mask"]))
            if shard and self.mesh is not None:
                batch = self._place_batch(batch)
            yield batch, weight

    def _place_batch(self, batch):
        if self.mesh is None:
            return batch
        from foldingdiff_tpu.parallel.mesh import shard_batch

        return dict(zip(batch.keys(), shard_batch(self.mesh, *batch.values())))

    def _place_stacked(self, stacked):
        """Place a (K, B, ...) stacked batch dict: scan axis replicated,
        batch axis sharded (with the same loss-exact zero padding as
        shard_batch when B is not divisible by the mesh)."""
        if self.mesh is None:
            return stacked
        from jax.sharding import NamedSharding, PartitionSpec as P

        from foldingdiff_tpu.parallel.mesh import _global_put, pad_to_multiple

        b = stacked["angles"].shape[1]
        target = pad_to_multiple(b, self.mesh.size)
        if target != b:
            stacked = {
                k: np.concatenate(
                    [v, np.zeros((v.shape[0], target - b) + v.shape[2:], dtype=v.dtype)],
                    axis=1,
                )
                for k, v in stacked.items()
            }
        sharding = NamedSharding(self.mesh, P(None, "data"))
        # _global_put, not jax.device_put: under multi-host jax.distributed
        # the mesh spans non-addressable devices and a plain device_put of a
        # host array raises (see parallel/mesh.py)
        return {k: _global_put(v, sharding) for k, v in stacked.items()}

    def fit(
        self,
        state: TrainState,
        train_data: Dict[str, np.ndarray],
        valid_data: Optional[Dict[str, np.ndarray]] = None,
        results_dir: Optional[str] = None,
        model_config: Optional[ModelConfig] = None,
        train_args: Optional[dict] = None,
        mean_offset: Optional[np.ndarray] = None,
        log_every: int = 0,
        resume: bool = False,
        save_state_every: int = 0,
        write_preds_to_dir: Optional[str] = None,
        handle_preemption: bool = True,
        exhaustive_t_validation: bool = False,
        exhaustive_t_points: int = 16,
        train_data_refresh=None,
    ) -> Tuple[TrainState, List[Dict[str, float]]]:
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed)
        host_rng = np.random.default_rng(cfg.seed)
        metrics_rows: List[Dict[str, float]] = []
        # Multi-host: every process runs the same SPMD compute (metric values
        # are replicated, so early-stop/top-k decisions stay consistent), but
        # only process 0 WRITES artifacts (reference rank-0 logging,
        # modelling.py:744-749). Resume restores on process 0 and broadcasts.
        primary = jax.process_index() == 0

        # Preemption handling (absent in the reference, SURVEY.md section 5):
        # on SIGTERM/SIGINT finish the current step, checkpoint the full train
        # state, and exit cleanly; restart with resume=True continues.
        preempted = {"flag": False}
        if handle_preemption and results_dir is not None:
            import signal

            def _on_term(signum, frame):
                logging.warning(f"Signal {signum}: checkpointing train state at epoch end")
                preempted["flag"] = True

            try:
                signal.signal(signal.SIGTERM, _on_term)
            except ValueError:
                pass  # not the main thread

        start_epoch = 0
        if resume and results_dir is not None:
            from foldingdiff_tpu.training.checkpoint import latest_train_state, restore_train_state

            ckpt = latest_train_state(results_dir)
            if jax.process_count() > 1:
                # Multi-host: per-host disks mean only some processes may
                # find the checkpoint (pod relaunch after preemption).
                # Restoring on process 0 and broadcasting keeps the
                # replicate() invariant (identical params/opt-state/epoch on
                # every process); without this, hosts without the file would
                # silently restart from epoch 0 with fresh weights.
                import numpy as _np
                from jax.experimental import multihost_utils as _mhu

                restored_state, restored_epoch = state, 0
                if primary and ckpt is not None:
                    restored_state, restored_epoch = restore_train_state(ckpt, state)
                payload = _mhu.broadcast_one_to_all(
                    {
                        "has": _np.int32(primary and ckpt is not None),
                        "epoch": _np.int32(restored_epoch),
                        "step": jax.device_get(restored_state.step),
                        "params": jax.device_get(restored_state.params),
                        "constants": jax.device_get(restored_state.constants),
                        "opt_state": jax.device_get(restored_state.opt_state),
                    }
                )
                if int(payload["has"]):
                    state = state.replace(
                        step=jnp.asarray(payload["step"]),
                        params=payload["params"],
                        constants=payload["constants"],
                        opt_state=payload["opt_state"],
                    )
                    start_epoch = int(payload["epoch"])
                    logging.info(
                        f"Resumed train state at epoch {start_epoch} "
                        f"(restored on process 0, broadcast to {jax.process_count()} processes)"
                    )
            elif ckpt is not None:
                state, start_epoch = restore_train_state(ckpt, state)
                logging.info(f"Resumed train state from {ckpt} at epoch {start_epoch}")
        # metrics.csv is APPENDED to per epoch (O(1) host I/O per epoch, not
        # O(epochs)): a resumed run continues the existing file; a fresh run
        # into a reused results_dir truncates it first.
        self._csv_rows_flushed = 0
        if primary and results_dir is not None and start_epoch == 0:
            stale = os.path.join(results_dir, "logs", "metrics.csv")
            if os.path.exists(stale):
                os.remove(stale)
        pseudo_names = list(self.ft_names)
        if (isinstance(cfg.use_pdist_loss, (list, tuple)) and cfg.use_pdist_loss[0] > 0) or (
            not isinstance(cfg.use_pdist_loss, (list, tuple)) and cfg.use_pdist_loss > 0
        ):
            pseudo_names.append("pairwise_dist_loss")

        best_valid: List[Tuple[float, int, str]] = []
        best_train: List[Tuple[float, int, str]] = []
        patience_count, best_val_loss = 0, float("inf")
        # SWA (reference: lightning StochasticWeightAveraging callback,
        # bin/train.py:236-243): average params over the last 20% of epochs
        swa_start = int(cfg.max_epochs * 0.8)
        swa_params, swa_count = None, 0

        for epoch in range(start_epoch, cfg.max_epochs):
            t0 = time.time()
            if train_data_refresh is not None:
                # Per-epoch data augmentation hook (randomcrop re-cropping of
                # >pad structures, reference datasets.py:411-438). Keyed by
                # epoch, so a resumed run sees the same crop sequence and all
                # multi-host processes derive identical batches.
                train_data = train_data_refresh(epoch)
            # Keep per-step losses as device arrays and fetch ONCE at epoch
            # end: a float()/np.asarray() per step is a blocking host
            # round-trip (seconds each through a remote-dispatch tunnel) that
            # serializes the step pipeline.
            train_losses = []
            fused = max(int(cfg.fused_steps), 1)
            if fused == 1:
                for batch, _ in self._batches(train_data, host_rng, shuffle=True):
                    key, step_key = jax.random.split(key)
                    state, avg, terms = self._train_step(state, batch, step_key)
                    train_losses.append((avg, terms))
            else:
                # Fused dispatch: scan K same-shape steps inside one jit
                # (identical math and key sequence to the loop above; the
                # ragged tail batch falls through to the single-step path)
                batches = [b for b, _ in self._batches(
                    train_data, host_rng, shuffle=True, shard=False
                )]
                i = 0
                while i < len(batches):
                    group = [batches[i]]
                    while (
                        len(group) < fused
                        and i + len(group) < len(batches)
                        and batches[i + len(group)]["angles"].shape[0]
                        == group[0]["angles"].shape[0]
                    ):
                        group.append(batches[i + len(group)])
                    i += len(group)
                    step_keys = []
                    for _ in group:
                        key, sk = jax.random.split(key)
                        step_keys.append(sk)
                    if len(group) == 1:
                        state, avg, terms = self._train_step(
                            state, self._place_batch(group[0]), step_keys[0]
                        )
                    else:
                        stacked = {
                            k: np.stack([g[k] for g in group]) for k in group[0]
                        }
                        state, (avg, terms) = self._multi_train_step(
                            state, self._place_stacked(stacked), jnp.stack(step_keys)
                        )
                    train_losses.append((avg, terms))
            train_losses = jax.device_get(train_losses)
            # avg entries are scalars (single step) or (K,) (fused group);
            # terms entries are (F,) or (K, F)
            train_loss = (
                float(np.mean(np.concatenate([np.atleast_1d(a) for a, _ in train_losses])))
                if train_losses else np.nan
            )
            train_terms = (
                np.mean(np.concatenate([np.atleast_2d(t) for _, t in train_losses]), axis=0)
                if train_losses
                else np.full(len(pseudo_names), np.nan)
            )

            val_loss, val_terms = np.nan, np.full(len(pseudo_names), np.nan)
            if valid_data is not None and exhaustive_t_validation:
                # Reference exhaustive-t validation (bin/train.py:329,358;
                # datasets.py:812-825): losses over a stratified timestep grid
                # instead of one random t per item -- much lower variance, so
                # top-k-by-val selection stops chasing sampling noise. Seeded
                # per epoch so repeated runs are reproducible.
                # exhaustive_t_points <= 0 selects the FULL per-timestep
                # sweep (every t in [0, T) -- the reference's len*T exhaustive
                # validation set, datasets.py:812-825); positive values use a
                # stratified grid of that many timesteps (cheaper, low
                # variance). linspace with num=T enumerates every integer t.
                n_t = (
                    self.schedule.timesteps
                    if exhaustive_t_points <= 0
                    else min(int(exhaustive_t_points), self.schedule.timesteps)
                )
                ex_terms = self.eval_exhaustive_t(
                    state, valid_data, n_t=n_t, seed=cfg.seed + epoch
                )
                val_terms[: len(ex_terms)] = ex_terms
                val_loss = float(np.mean(ex_terms))
                if write_preds_to_dir:
                    # exhaustive-t validation must not silently drop the
                    # user's write_valid_preds request: dump preds for the
                    # first valid batch exactly like the per-batch branch.
                    # (key split on ALL processes -- only the write is
                    # primary-gated -- so multi-host key streams stay equal)
                    key, step_key = jax.random.split(key)
                    if primary:
                        # shard=False: this block runs on process 0 only, so
                        # the batch must stay host-local (a global-mesh put
                        # from one process would hang under multi-host)
                        first_batch = next(
                            iter(self._batches(valid_data, host_rng, shuffle=False, shard=False))
                        )[0]
                        self._write_val_preds(
                            write_preds_to_dir, state, first_batch, step_key, epoch,
                            ex_terms,
                        )
            elif valid_data is not None:
                vlosses, vweights = [], []
                first_val = None
                for bi, (batch, w) in enumerate(self._batches(valid_data, host_rng, shuffle=False)):
                    key, step_key = jax.random.split(key)
                    vlosses.append(self._eval_step(state.params, state.constants, batch, step_key))
                    vweights.append(w)
                    if primary and write_preds_to_dir and bi == 0:
                        first_val = (batch, step_key)
                vlosses = jax.device_get(vlosses)
                if vlosses:
                    # Weight by each batch's unmasked-position count: the
                    # ragged tail batch must not carry equal weight (it would
                    # bias val_loss and thus top-k checkpoint selection)
                    val_terms = np.average(np.stack(vlosses), axis=0, weights=vweights)
                    val_loss = float(np.mean(val_terms))
                if first_val is not None:
                    self._write_val_preds(
                        write_preds_to_dir, state, first_val[0], first_val[1], epoch,
                        vlosses[0],
                    )

            row = {"epoch": epoch, "step": int(state.step), "train_loss": train_loss,
                   "val_loss": val_loss, "lr": float(self.lr_schedule(jnp.asarray(int(state.step)))),
                   "epoch_seconds": time.time() - t0}
            for name, tv, vv in zip(pseudo_names, train_terms, val_terms):
                row[f"train_loss_{name}"] = float(tv)
                row[f"val_loss_{name}"] = float(vv)
            metrics_rows.append(row)
            if log_every and epoch % log_every == 0:
                logging.info(
                    f"epoch {epoch}: train {train_loss:.4f} val {val_loss:.4f} ({row['epoch_seconds']:.1f}s)"
                )

            if primary and results_dir is not None and model_config is not None:
                self._write_metrics_csv(results_dir, metrics_rows)
                # Fetch params to host ONLY when a metric actually enters a
                # top-k set: the full-params device_get is a seconds-scale
                # round-trip on a remote-dispatch TPU, wasted on non-improving
                # epochs (most of them).
                valid_metric = val_loss if valid_data is not None else train_loss
                admit_valid = self._topk_admits(best_valid, valid_metric)
                admit_train = self._topk_admits(best_train, train_loss)
                if admit_valid or admit_train:
                    params_host = jax.device_get(state.params)
                    constants_host = jax.device_get(state.constants)
                    if admit_valid:
                        self._save_topk(
                            results_dir, model_config, params_host, constants_host,
                            train_args or {}, mean_offset, epoch,
                            valid_metric, "valid", best_valid,
                        )
                    if admit_train:
                        self._save_topk(
                            results_dir, model_config, params_host, constants_host,
                            train_args or {}, mean_offset, epoch, train_loss, "train", best_train,
                        )

            if cfg.use_swa and epoch >= swa_start:
                # Running average kept on device; avg + (new - avg)/1 == new,
                # so seeding with zeros gives the exact first-epoch value
                if swa_params is None:
                    swa_params = jax.tree.map(jnp.zeros_like, state.params)
                swa_count += 1
                swa_params = self._swa_update(swa_params, state.params, float(swa_count))

            if primary and results_dir is not None and save_state_every and (epoch + 1) % save_state_every == 0:
                from foldingdiff_tpu.training.checkpoint import save_train_state

                save_train_state(results_dir, state, epoch)

            if preempted["flag"]:
                if primary:
                    from foldingdiff_tpu.training.checkpoint import save_train_state

                    path = save_train_state(results_dir, state, epoch)
                    logging.warning(f"Preemption checkpoint written to {path}; stopping")
                break

            # Early stopping on val loss (reference EarlyStopping callback)
            if cfg.early_stop_patience and valid_data is not None:
                if val_loss < best_val_loss:
                    best_val_loss, patience_count = val_loss, 0
                else:
                    patience_count += 1
                min_ep = cfg.min_epochs or 0
                if patience_count >= cfg.early_stop_patience and epoch + 1 >= min_ep:
                    logging.info(f"Early stopping at epoch {epoch}")
                    break

        if primary and cfg.use_swa and swa_params is not None and results_dir is not None and model_config is not None:
            logging.info(f"Saving SWA weights averaged over {swa_count} epochs")
            model_io.save_model_dir(
                results_dir, model_config, jax.device_get(swa_params), jax.device_get(state.constants),
                train_args or {}, mean_offset=mean_offset, epoch=cfg.max_epochs,
                best_by="swa", keep_top_k=1,
            )
        return state, metrics_rows

    @staticmethod
    def _topk_admits(heap: List[Tuple[float, int, str]], metric: float, k: int = 5) -> bool:
        """Whether `metric` would enter the top-k set (strictly better than
        the current worst, or the set is not yet full)."""
        if np.isnan(metric):
            return False
        return len(heap) < k or metric < max(h[0] for h in heap)

    def _save_topk(
        self, results_dir, model_config, params, constants, train_args, mean_offset,
        epoch, metric, best_by, heap: List[Tuple[float, int, str]], k: int = 5,
    ):
        if not self._topk_admits(heap, metric, k):
            return
        path = model_io.save_model_dir(
            results_dir, model_config, params, constants, train_args,
            mean_offset=mean_offset, epoch=epoch, best_by=best_by, keep_top_k=10**9,
        )
        heap.append((metric, epoch, path))
        heap.sort()
        while len(heap) > k:
            _, _, stale = heap.pop()
            if os.path.exists(stale):
                os.remove(stale)

    def _write_val_preds(self, out_dir, state, batch, rng, epoch, loss_terms):
        """Per-epoch validation prediction dump (reference write_preds_to_dir,
        modelling.py:547-551, 606-614): known vs predicted noise + mask."""
        import json as _json

        os.makedirs(out_dir, exist_ok=True)
        t_key, n_key = jax.random.split(rng)
        x0 = batch["angles"]
        b = np.asarray(x0).shape[0]
        t = jax.random.randint(t_key, (b,), 0, self.schedule.timesteps)
        noise = sample_wrapped_noise(n_key, np.asarray(x0).shape, self.is_angular)
        corrupted = q_sample(jnp.asarray(x0), t, noise, self.schedule, self.is_angular)
        pred = self.model.apply(
            {"params": state.params, "constants": state.constants},
            corrupted, t, jnp.asarray(batch["attn_mask"]), deterministic=True,
        )
        payload = {
            "known_noise": np.asarray(noise).tolist(),
            "predicted_noise": np.asarray(pred).tolist(),
            "attn_mask": np.asarray(batch["attn_mask"]).tolist(),
            "losses": [float(x) for x in loss_terms],
        }
        with open(os.path.join(out_dir, f"{epoch}_preds.json"), "w") as f:
            _json.dump(payload, f)

    def _write_metrics_csv(self, results_dir: str, rows: List[Dict[str, float]]):
        """Append rows not yet flushed (O(1) host I/O per epoch; rewriting the
        whole file every epoch was O(epochs^2) on a host that also feeds the
        TPU tunnel). A resumed run appends to the previous session's file."""
        self._csv_rows_flushed = append_metrics_csv(
            results_dir, rows, already_flushed=self._csv_rows_flushed
        )
