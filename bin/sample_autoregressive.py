#!/usr/bin/env python
"""
Sample from the autoregressive baseline seeded with angles from real
structures (reference bin/sample_autoregressive.py).

Usage: python bin/sample_autoregressive.py -m ar_results --data <pdb_dir> -n 32 -o ar_sampled
"""
import argparse
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sample_initial_angles(ds, n: int, num_seed: int, rng) -> np.ndarray:
    """Seed angles from random real structures (reference
    bin/sample_autoregressive.py:20-52)."""
    idx = rng.choice(len(ds), size=n, replace=len(ds) < n)
    seeds = []
    for i in idx:
        item = ds[int(i)]
        seeds.append(item["angles"][:num_seed])
    return np.stack(seeds)


def main():
    import pandas as pd

    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("-m", "--model", type=str, required=True)
    parser.add_argument("--data", type=str, required=True, help="PDB dir for seed angles")
    parser.add_argument("-n", "--num", type=int, default=32)
    parser.add_argument("--numseed", type=int, default=4)
    parser.add_argument("-o", "--outdir", type=str, default="ar_sampled")
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--cpu", action="store_true", help="force CPU platform")
    args = parser.parse_args()

    from foldingdiff_tpu.utils_platform import maybe_force_cpu

    maybe_force_cpu(args.cpu)

    import json

    import jax.numpy as jnp

    from foldingdiff_tpu.data import datasets as dsets
    from foldingdiff_tpu.geometry.featurize import create_new_chain_nerf
    from foldingdiff_tpu.models import io as model_io
    from foldingdiff_tpu.models.ar import BertForAutoregressive, ar_sample
    from foldingdiff_tpu.models.config import ModelConfig

    with open(os.path.join(args.model, "training_args.json")) as f:
        train_args = json.load(f)
    config = ModelConfig.from_train_args(train_args)
    model = BertForAutoregressive(config)
    _, params, constants, _ = model_io.from_dir(args.model)

    ds_cls = dsets.DATASET_CLASSES[train_args["angles_definitions"]]
    ds = ds_cls(
        pdbs=args.data, split="test", pad=train_args["max_seq_len"],
        min_length=train_args.get("min_seq_len", 0),
        trim_strategy=train_args.get("trim_strategy", "leftalign"),
    )
    # Seeds must be centered with the TRAINING mean offset (the space the
    # model was trained in), not this split's own mean; outputs are
    # un-shifted by the same offset below
    offset_file = os.path.join(args.model, "training_mean_offset.npy")
    mean_offset = np.load(offset_file) if os.path.isfile(offset_file) else None
    if mean_offset is not None:
        ds.set_masked_means(mean_offset)
    rng = np.random.default_rng(args.seed)
    pad = train_args["max_seq_len"]
    num_seed = args.numseed

    seeds = sample_initial_angles(ds, args.num, num_seed, rng)
    seed_angles = np.zeros((args.num, pad, seeds.shape[-1]), dtype=np.float32)
    seed_angles[:, :num_seed] = seeds
    lengths = np.asarray(ds.sample_length(args.num) if args.num > 1 else [ds.sample_length()])

    out = ar_sample(
        model, params, constants, jnp.asarray(seed_angles), lengths, num_seed=num_seed
    )
    out = np.asarray(out)

    os.makedirs(args.outdir, exist_ok=True)
    angles_dir = os.path.join(args.outdir, "sampled_angles")
    pdb_dir = os.path.join(args.outdir, "sampled_pdb")
    os.makedirs(angles_dir, exist_ok=True)
    os.makedirs(pdb_dir, exist_ok=True)
    ft_names = list(ds.feature_names["angles"])
    from foldingdiff_tpu.utils import modulo_with_wrapped_range

    for i, l in enumerate(lengths):
        angles = out[i, : int(l)]
        if mean_offset is not None:
            angles = angles + np.asarray(mean_offset)
        angles = modulo_with_wrapped_range(angles)
        df = pd.DataFrame(angles, columns=ft_names)
        df.to_csv(os.path.join(angles_dir, f"ar_generated_{i}.csv.gz"), index=False)
        create_new_chain_nerf(os.path.join(pdb_dir, f"ar_generated_{i}.pdb"), df)
    logging.info(f"Wrote {len(lengths)} AR samples to {args.outdir}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
