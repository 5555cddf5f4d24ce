#!/usr/bin/env python
"""
Baseline: randomly resample per-feature angle values from the test set into
"structures" (reference bin/sample_random_angles.py). These destroy the joint
angle structure while preserving marginals -- the null model for scTM.

Usage: python bin/sample_random_angles.py -m results --data <pdb_dir> -n 100 -o random_baseline
"""
import argparse
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("-m", "--model", type=str, required=True, help="model dir (for config)")
    parser.add_argument("--data", type=str, required=True, help="PDB dir")
    parser.add_argument("-n", "--num", type=int, default=100)
    parser.add_argument("-o", "--outdir", type=str, default="random_baseline")
    parser.add_argument("--seed", type=int, default=1234)
    args = parser.parse_args()

    import json

    import pandas as pd

    from foldingdiff_tpu.data import datasets as dsets
    from foldingdiff_tpu.geometry.featurize import create_new_chain_nerf

    with open(os.path.join(args.model, "training_args.json")) as f:
        train_args = json.load(f)
    ds_cls = dsets.DATASET_CLASSES[train_args["angles_definitions"]]
    ds = ds_cls(
        pdbs=args.data,
        split="test",
        pad=train_args["max_seq_len"],
        min_length=train_args.get("min_seq_len", 0),
        trim_strategy=train_args.get("trim_strategy", "leftalign"),
        zero_center=False,
    )
    ft_names = list(ds.feature_names["angles"])

    # Pool all observed per-feature values
    rows = []
    for i in range(len(ds)):
        item = ds.__getitem__(i, ignore_zero_center=True)
        rows.append(item["angles"][: int(item["lengths"])])
    pool = np.concatenate(rows)
    rng = np.random.default_rng(args.seed)

    os.makedirs(args.outdir, exist_ok=True)
    pdb_dir = os.path.join(args.outdir, "sampled_pdb")
    os.makedirs(pdb_dir, exist_ok=True)
    lengths = rng.choice([len(r) for r in rows], size=args.num, replace=True)
    n_ok = 0
    for i, l in enumerate(lengths):
        # Resample each feature column independently (destroys joint structure)
        angles = np.stack(
            [rng.choice(pool[:, j], size=l, replace=True) for j in range(pool.shape[1])],
            axis=1,
        )
        df = pd.DataFrame(angles, columns=ft_names)
        out = create_new_chain_nerf(os.path.join(pdb_dir, f"random_{i}.pdb"), df)
        n_ok += bool(out)
    logging.info(f"Wrote {n_ok}/{args.num} random-angle baseline structures to {pdb_dir}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
