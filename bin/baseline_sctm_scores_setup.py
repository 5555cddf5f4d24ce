#!/usr/bin/env python
"""
Baseline for scTM: run REAL test-set structures (NeRF round-tripped, so they
go through the same representation bottleneck as generated ones) through the
scTM pipeline (reference bin/baseline_sctm_scores_setup.py:55-95).

Usage: python bin/baseline_sctm_scores_setup.py -m results --data <pdb_dir> -o real_baseline
"""
import argparse
import json
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("-m", "--model", type=str, required=True)
    parser.add_argument("--data", type=str, required=True, help="PDB dir")
    parser.add_argument("-n", "--num", type=int, default=0, help="subset; 0 = all")
    parser.add_argument("-o", "--outdir", type=str, default="real_baseline")
    args = parser.parse_args()

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

    os.makedirs(args.outdir, exist_ok=True)
    pdb_dir = os.path.join(args.outdir, "sampled_pdb")
    os.makedirs(pdb_dir, exist_ok=True)
    n = args.num or len(ds)
    n_ok = 0
    for i in range(min(n, len(ds))):
        item = ds.__getitem__(i, ignore_zero_center=True)
        angles = item["angles"][: int(item["lengths"])]
        df = pd.DataFrame(angles, columns=ft_names)
        name = os.path.splitext(os.path.basename(ds.filenames[i]))[0]
        out = create_new_chain_nerf(os.path.join(pdb_dir, f"{name}.pdb"), df)
        n_ok += bool(out)
    logging.info(
        f"NeRF round-tripped {n_ok} real test structures into {pdb_dir}; "
        "run the inverse-fold + refold + sctm.py pipeline on them"
    )


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
