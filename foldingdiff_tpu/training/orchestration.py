"""
Training orchestration: config dict -> datasets -> trainer -> artifacts.

Reference: bin/train.py:111-507 (get_train_valid_test_sets + train). Keeps the
same config-JSON surface (every key in config_jsons/*.json) so reference
configs drive this framework unchanged.
"""
from __future__ import annotations

import json
import logging
import os
import subprocess
import time
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from foldingdiff_tpu.data import datasets as dsets
from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
from foldingdiff_tpu.models.bert import BertForDiffusion
from foldingdiff_tpu.models.config import ModelConfig
from foldingdiff_tpu.training.trainer import Trainer, TrainConfig


def get_train_valid_test_sets(
    dataset_key: str = "cath",
    angles_definitions: str = "canonical-full-angles",
    max_seq_len: int = 512,
    min_seq_len: int = 0,
    seq_trim_strategy: str = "leftalign",
    toy: int = 0,
    train_only: bool = False,
    cache_dir: Optional[str] = None,
    n_workers: Optional[int] = None,
    zero_center: bool = True,
) -> Tuple:
    """Clean split datasets with the train-split mean shared to valid/test
    (reference bin/train.py:111-163). zero_center=False skips the wrapped-mean
    centering (cart-coords never centers regardless)."""
    clean_cls = dsets.DATASET_CLASSES[angles_definitions]
    splits = ["train"] if train_only else ["train", "validation", "test"]
    clean = [
        clean_cls(
            pdbs=dataset_key,
            split=s,
            pad=max_seq_len,
            min_length=min_seq_len,
            trim_strategy=seq_trim_strategy,
            zero_center=zero_center and angles_definitions != "cart-coords",
            toy=toy,
            cache_dir=cache_dir,
            n_workers=n_workers,
        )
        for s in splits
    ]
    if len(clean) > 1 and clean[0].means is not None:
        logging.info(f"Sharing train mean offset to valid/test: {clean[0].means}")
        for ds in clean[1:]:
            ds.means = clean[0].means
    while len(clean) < 3:
        clean.append(None)
    return tuple(clean)


def record_args_and_metadata(func_args: Dict, results_folder: Path) -> None:
    """training_args.json + git SHA (reference bin/train.py:255-284)."""
    os.makedirs(results_folder, exist_ok=True)
    with open(results_folder / "training_args.json", "w") as f:
        json.dump(func_args, f, indent=4, default=str)
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        if sha:
            with open(results_folder / "git_sha.txt", "w") as f:
                f.write(sha + "\n")
    except Exception:
        logging.warning("Could not record git SHA")


def train(
    results_dir: str = "./results",
    dataset_key: str = "cath",
    angles_definitions: str = "canonical-full-angles",
    max_seq_len: int = 512,
    min_seq_len: int = 0,
    trim_strategy: str = "leftalign",
    timesteps: int = 250,
    variance_schedule: str = "linear",
    variance_scale: float = 1.0,
    time_encoding: str = "gaussian_fourier",
    num_hidden_layers: int = 12,
    hidden_size: int = 384,
    intermediate_size: int = 768,
    num_heads: int = 12,
    position_embedding_type: str = "absolute",
    dropout_p: float = 0.1,
    decoder: str = "mlp",
    gradient_clip: float = 1.0,
    batch_size: int = 64,
    lr: float = 5e-5,
    loss: str = "smooth_l1",
    use_pdist_loss=0.0,
    l2_norm: float = 0.0,
    l1_norm: float = 0.0,
    circle_reg: float = 0.0,
    min_epochs: Optional[int] = None,
    max_epochs: int = 10000,
    early_stop_patience: int = 0,
    lr_scheduler: Optional[str] = None,
    use_swa: bool = False,  # stochastic weight averaging over final 20% of epochs
    fused_steps: int = 1,  # dispatch K train steps as one device execution
    # Misc / debugging
    multithread: bool = True,
    subset=False,
    exhaustive_validation_t: bool = False,
    validation_t_points: int = 16,  # timestep grid size; <=0 = every t in [0, T)
    syn_noiser: str = "",
    single_angle_debug: int = -1,
    single_timestep_debug: bool = False,
    cpu_only: bool = False,
    ngpu: int = -1,
    write_valid_preds: bool = False,
    dryrun: bool = False,
    seed: int = 42,
    zero_center: bool = True,
    use_mesh: bool = True,
    resume: bool = False,
    save_state_every: int = 25,
):
    """Main training entry, mirroring reference bin/train.py:287-507."""
    func_args = dict(locals())
    results_folder = Path(results_dir)
    # Under multi-host (jax.distributed), only process 0 writes artifacts
    # (reference rank-0-only record_args_and_metadata, bin/train.py:255-284);
    # all processes still execute the same SPMD compute
    from foldingdiff_tpu.parallel.multihost import is_primary

    primary = is_primary()
    if primary:
        record_args_and_metadata(func_args, results_folder)

    t0 = time.time()
    train_ds, valid_ds, test_ds = get_train_valid_test_sets(
        dataset_key=dataset_key,
        angles_definitions=angles_definitions,
        max_seq_len=max_seq_len,
        min_seq_len=min_seq_len,
        seq_trim_strategy=trim_strategy,
        toy=subset,
        n_workers=None if multithread else 1,
        zero_center=zero_center,
    )
    logging.info(f"Featurization took {time.time() - t0:.1f}s")

    mean_offset = train_ds.get_masked_means()
    if primary:
        if mean_offset is not None:
            np.save(results_folder / "training_mean_offset.npy", mean_offset)
        for name, ds in zip(["train", "valid", "test"], [train_ds, valid_ds, test_ds]):
            if ds is not None:
                with open(results_folder / f"{name}_files.txt", "w") as f:
                    f.write("\n".join(ds.filenames))

    ft_key = "coords" if angles_definitions == "cart-coords" else "angles"

    # Debug/synthetic noisers (reference bin/train.py:165-195): noise on host
    # via the wrapper datasets and feed pre-corrupted batches
    debug_noiser = None
    if syn_noiser:
        from foldingdiff_tpu.data.debug_noisers import SynNoisedByPositionDataset

        assert syn_noiser == "halfhalf", f"Unknown synthetic noiser {syn_noiser}"
        debug_noiser = SynNoisedByPositionDataset(
            train_ds, dset_key=ft_key, timesteps=timesteps, beta_schedule=variance_schedule
        )
    elif single_angle_debug > 0 and single_timestep_debug:
        from foldingdiff_tpu.data.debug_noisers import SingleNoisedAngleAndTimeDataset

        debug_noiser = SingleNoisedAngleAndTimeDataset(
            dset=train_ds, dset_key=ft_key, timesteps=timesteps,
            beta_schedule=variance_schedule, ft_idx=single_angle_debug, seed=seed,
        )
    elif single_angle_debug > 0:
        from foldingdiff_tpu.data.debug_noisers import SingleNoisedAngleDataset

        debug_noiser = SingleNoisedAngleDataset(
            dset=train_ds, dset_key=ft_key, timesteps=timesteps,
            beta_schedule=variance_schedule, ft_idx=single_angle_debug, seed=seed,
        )
    elif single_timestep_debug:
        from foldingdiff_tpu.data.debug_noisers import SingleNoisedAngleAndTimeDataset

        debug_noiser = SingleNoisedAngleAndTimeDataset(
            dset=train_ds, dset_key=ft_key, timesteps=timesteps,
            beta_schedule=variance_schedule, seed=seed,
        )

    model_config = ModelConfig(
        hidden_size=hidden_size,
        num_hidden_layers=num_hidden_layers,
        num_attention_heads=num_heads,
        intermediate_size=intermediate_size,
        max_position_embeddings=max_seq_len,
        position_embedding_type=position_embedding_type,
        hidden_dropout_prob=dropout_p,
        attention_probs_dropout_prob=dropout_p,
        ft_is_angular=tuple(train_ds.feature_is_angular[ft_key]),
        ft_names=tuple(train_ds.feature_names[ft_key]),
        time_encoding=time_encoding,
        decoder=decoder,
    )

    schedule = DiffusionSchedule.create(variance_schedule, timesteps)

    def _as_train_arrays(ds):
        arrays = ds.to_arrays()
        # cart-coords items carry "coords" instead of "angles"; the trainer's
        # feature key is uniform (is_angular flags handle the semantics)
        if "angles" not in arrays and "coords" in arrays:
            arrays["angles"] = arrays.pop("coords")
        return arrays

    train_data = _as_train_arrays(train_ds)
    valid_data = _as_train_arrays(valid_ds) if valid_ds is not None else None
    steps_per_epoch = max(len(train_ds) // batch_size, 1)

    # Per-epoch randomcrop augmentation (reference datasets.py:411-438: a
    # fresh pad-window of each >pad structure at every __getitem__, i.e. every
    # epoch). Only the long items are re-stacked -- O(n_long) host work per
    # epoch. Validation crops stay frozen for a deterministic val metric
    # (documented deviation, docs/migration.md).
    train_data_refresh = None
    if trim_strategy == "randomcrop" and train_ds.over_pad_indices:
        logging.info(
            f"randomcrop: re-cropping {len(train_ds.over_pad_indices)} structures "
            f"> pad={max_seq_len} at every epoch"
        )

        def train_data_refresh(epoch, _arrays=train_data, _ds=train_ds, _seed=seed):
            return _ds.refresh_crops_(_arrays, epoch_seed=_seed * 1_000_003 + epoch)

    tcfg = TrainConfig(
        lr=lr,
        loss=loss,
        l2_norm=l2_norm,
        l1_norm=l1_norm,
        circle_reg=circle_reg,
        gradient_clip=gradient_clip,
        batch_size=batch_size,
        min_epochs=min_epochs,
        max_epochs=max_epochs,
        lr_scheduler=lr_scheduler,
        early_stop_patience=early_stop_patience,
        use_pdist_loss=use_pdist_loss,
        angular_variance=variance_scale,
        use_swa=use_swa,
        seed=seed,
        fused_steps=fused_steps,
    )

    # Pre-training diagnostics: KL(noised || noise) over timesteps and the
    # per-timestep distributions (reference bin/train.py:395-410)
    if not dryrun and primary:
        try:
            from foldingdiff_tpu.data.datasets import NoisedAnglesDataset
            from foldingdiff_tpu.metrics.kl import kl_from_dset
            from foldingdiff_tpu.metrics.plotting import plot_kl_divergence

            plots_folder = results_folder / "plots"
            os.makedirs(plots_folder, exist_ok=True)
            noised = NoisedAnglesDataset(
                train_ds, dset_key=ft_key, timesteps=timesteps,
                beta_schedule=variance_schedule,
                angular_variance=variance_scale, seed=seed,
            )
            kl_vals = kl_from_dset(noised, seed=seed)
            plot_kl_divergence(
                kl_vals, list(train_ds.feature_names[ft_key]),
                str(plots_folder / "kl_divergence_timesteps.pdf"),
            )
            # Per-timestep corrupted-value distributions (reference
            # bin/train.py:52-80)
            from foldingdiff_tpu.metrics.plotting import plot_timestep_distributions

            plot_timestep_distributions(noised, timesteps, str(plots_folder))
        except Exception as e:
            logging.warning(f"KL diagnostics failed: {e}")

    mesh = None
    if use_mesh and not cpu_only:
        import jax

        if len(jax.devices()) > 1 and batch_size % len(jax.devices()) == 0:
            from foldingdiff_tpu.parallel.mesh import make_mesh

            mesh = make_mesh()
            logging.info(f"Data-parallel mesh over {mesh.size} devices")

    import jax

    if debug_noiser is not None:
        # n_inputs auto-detected from the noiser output (reference
        # bin/train.py:421-423)
        sample_item = debug_noiser[0]
        n_in = sample_item["corrupted"].shape[-1]
        model_config = ModelConfig(
            **{
                **model_config.__dict__,
                "ft_is_angular": tuple(train_ds.feature_is_angular[ft_key][:n_in]),
                "ft_names": tuple(train_ds.feature_names[ft_key][:n_in]),
            }
        )

    model = BertForDiffusion(model_config)
    trainer = Trainer(model, schedule, tcfg, steps_per_epoch=steps_per_epoch, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(seed), pad=max_seq_len)

    if debug_noiser is not None:
        logging.warning(f"Training from debug noiser {type(debug_noiser).__name__}")
        key = jax.random.PRNGKey(seed)
        rows = []
        for epoch in range(max_epochs):
            order = np.random.default_rng(seed + epoch).permutation(len(debug_noiser))
            losses_e = []
            for start in range(0, len(order) - batch_size + 1, batch_size):
                items = [debug_noiser[int(i)] for i in order[start : start + batch_size]]
                batch = {
                    k: np.stack([it[k] for it in items])
                    for k in ("corrupted", "t", "known_noise", "attn_mask")
                }
                key, sk = jax.random.split(key)
                state, avg, _ = trainer.train_step_precorrupted(state, batch, sk)
                losses_e.append(float(avg))
            rows.append({"epoch": epoch, "train_loss": float(np.mean(losses_e))})
            logging.info(f"debug epoch {epoch}: {rows[-1]['train_loss']:.4f}")
        return state, rows
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    logging.info(f"Model has {n_params} trainable parameters")

    state, metrics = trainer.fit(
        state,
        train_data,
        valid_data=valid_data,
        results_dir=str(results_folder),
        model_config=model_config,
        train_args=func_args,
        mean_offset=mean_offset,
        log_every=1,
        resume=resume,
        save_state_every=save_state_every,
        write_preds_to_dir=str(results_folder / "valid_preds") if write_valid_preds else None,
        exhaustive_t_validation=exhaustive_validation_t,
        exhaustive_t_points=validation_t_points,
        train_data_refresh=train_data_refresh,
    )

    if not dryrun and primary:
        try:
            from foldingdiff_tpu.metrics.plotting import plot_losses

            plots_folder = results_folder / "plots"
            os.makedirs(plots_folder, exist_ok=True)
            plot_losses(
                str(results_folder / "logs" / "metrics.csv"),
                out_fname=str(plots_folder / "losses.pdf"),
            )
        except Exception as e:
            logging.warning(f"Loss plotting failed: {e}")
    return state, metrics
