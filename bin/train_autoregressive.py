#!/usr/bin/env python
"""
Train the autoregressive baseline (reference bin/train_autoregressive.py):
causal next-angle-set prediction with the same encoder body.

Usage: python bin/train_autoregressive.py config_jsons/cath_full_angles_cosine.json -o ar_results
"""
import argparse
import json
import logging
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from foldingdiff_tpu.utils import update_dict_nonnull


def main():
    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("config", nargs="?", default="", type=str)
    parser.add_argument("-o", "--outdir", default="./ar_results", type=str)
    parser.add_argument("--dataset", default=None, type=str)
    parser.add_argument("--toy", default=None, type=int)
    parser.add_argument("--epochs", default=None, type=int)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    from foldingdiff_tpu.utils_platform import maybe_force_cpu

    maybe_force_cpu(args.cpu)

    import jax

    from foldingdiff_tpu.models.ar import BertForAutoregressive
    from foldingdiff_tpu.models.config import ModelConfig
    from foldingdiff_tpu.training.ar_trainer import ARTrainer
    from foldingdiff_tpu.training.orchestration import get_train_valid_test_sets, record_args_and_metadata
    from foldingdiff_tpu.training.trainer import TrainConfig

    config = {}
    if args.config:
        with open(args.config) as f:
            config = json.load(f)
    config = update_dict_nonnull(
        config,
        {k: v for k, v in {
            "dataset_key": args.dataset, "max_epochs": args.epochs, "subset": args.toy,
        }.items() if v is not None},
    )

    results = Path(args.outdir)
    record_args_and_metadata(dict(config), results)

    train_ds, valid_ds, _ = get_train_valid_test_sets(
        dataset_key=config.get("dataset_key", "cath"),
        angles_definitions=config.get("angles_definitions", "canonical-full-angles"),
        max_seq_len=config.get("max_seq_len", 128),
        min_seq_len=config.get("min_seq_len", 40),
        seq_trim_strategy=config.get("trim_strategy", "leftalign"),
        toy=config.get("subset") or 0,
    )
    mean_offset = train_ds.get_masked_means()
    if mean_offset is not None:
        np.save(results / "training_mean_offset.npy", mean_offset)

    model_config = ModelConfig(
        hidden_size=config.get("hidden_size", 384),
        num_hidden_layers=config.get("num_hidden_layers", 12),
        num_attention_heads=config.get("num_heads", 12),
        intermediate_size=config.get("intermediate_size", 768),
        max_position_embeddings=config.get("max_seq_len", 128),
        position_embedding_type=config.get("position_embedding_type", "absolute"),
        hidden_dropout_prob=config.get("dropout_p", 0.1),
        attention_probs_dropout_prob=config.get("dropout_p", 0.1),
        ft_is_angular=tuple(train_ds.feature_is_angular["angles"]),
        ft_names=tuple(train_ds.feature_names["angles"]),
        time_encoding=config.get("time_encoding", "gaussian_fourier"),
        decoder=config.get("decoder", "mlp"),
    )
    tcfg = TrainConfig(
        lr=config.get("lr", 5e-5),
        batch_size=config.get("batch_size", 64),
        max_epochs=config.get("max_epochs", 100),
        lr_scheduler=config.get("lr_scheduler"),
        l2_norm=config.get("l2_norm", 0.0),
        gradient_clip=config.get("gradient_clip", 1.0),
    )
    train_data = train_ds.to_arrays()
    valid_data = valid_ds.to_arrays() if valid_ds is not None else None
    # Per-epoch randomcrop augmentation for >pad structures (reference
    # datasets.py:411-438), same wiring as the diffusion orchestration
    train_data_refresh = None
    if config.get("trim_strategy") == "randomcrop" and train_ds.over_pad_indices:
        seed0 = int(config.get("seed", 42))

        def train_data_refresh(epoch, _arrays=train_data, _ds=train_ds, _seed=seed0):
            return _ds.refresh_crops_(_arrays, epoch_seed=_seed * 1_000_003 + epoch)
    trainer = ARTrainer(
        BertForAutoregressive(model_config), tcfg,
        steps_per_epoch=max(len(train_ds) // tcfg.batch_size, 1),
    )
    state = trainer.init_state(jax.random.PRNGKey(0), pad=model_config.max_position_embeddings)
    # Record seq_len_encoding key for from_dir's AR detection (reference
    # modelling.py:324-327)
    train_args = dict(config)
    train_args.setdefault("angles_definitions", "canonical-full-angles")
    train_args["seq_len_encoding"] = train_args.pop("time_encoding", "gaussian_fourier")
    train_args.setdefault("num_heads", model_config.num_attention_heads)
    state, rows = trainer.fit(
        state, train_data, valid_data=valid_data, results_dir=str(results),
        model_config=model_config, train_args=train_args, mean_offset=mean_offset,
        log_every=1, train_data_refresh=train_data_refresh,
    )
    logging.info(f"AR training done: final train loss {rows[-1]['train_loss']:.4f}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
