#!/usr/bin/env python
"""
Evaluation of the trained autoregressive baseline (VERDICT round-2 item 5:
actually train and evaluate the AR model the reference's paper compares the
diffusion model against -- reference modelling.py:807-1009,
bin/train_autoregressive.py, bin/sample_autoregressive.py).

Pipeline: load analysis/ar_baseline/results -> greedy AR generation seeded
with 4 real residues from the held-out TEST split (reference
bin/sample_autoregressive.py:20-52) -> KS of generated angle marginals vs the
test split -> SS/clash structural stats -> training summary from metrics.csv.

Writes ks_tests.json + report.json next to this script (committed artifacts;
weights stay out of git). Run the diffusion flagship's evaluate.py for the
numbers this baseline is compared against (analysis/README.md).

Usage: python analysis/ar_baseline/evaluate.py [-n 128]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    parser = argparse.ArgumentParser(usage=__doc__)
    parser.add_argument("--results", default=os.path.join(HERE, "results"))
    parser.add_argument("-n", "--num", type=int, default=128)
    parser.add_argument("--numseed", type=int, default=4)
    parser.add_argument("--n-pdb", type=int, default=128)
    parser.add_argument("--seed", type=int, default=31)
    args = parser.parse_args()

    import jax.numpy as jnp
    import pandas as pd

    from foldingdiff_tpu.data import datasets as dsets
    from foldingdiff_tpu.geometry.featurize import EXHAUSTIVE_ANGLES, create_new_chain_nerf
    from foldingdiff_tpu.metrics.clashes import count_clashes
    from foldingdiff_tpu.metrics.kl import ks_feature_tests
    from foldingdiff_tpu.metrics.ss import count_structures_in_pdb
    from foldingdiff_tpu.models import io as model_io
    from foldingdiff_tpu.models.ar import BertForAutoregressive, ar_sample
    from foldingdiff_tpu.models.config import ModelConfig
    from foldingdiff_tpu.utils import modulo_with_wrapped_range

    with open(os.path.join(args.results, "training_args.json")) as f:
        train_args = json.load(f)
    config = ModelConfig.from_train_args(train_args)
    model = BertForAutoregressive(config)
    _, params, constants, _ = model_io.from_dir(args.results)

    pad = int(train_args["max_seq_len"])
    ds_cls = dsets.DATASET_CLASSES[train_args["angles_definitions"]]
    ds = ds_cls(
        pdbs=train_args["dataset_key"], split="test", pad=pad,
        min_length=int(train_args.get("min_seq_len", 0)),
        trim_strategy=train_args.get("trim_strategy", "leftalign"),
    )
    offset_file = os.path.join(args.results, "training_mean_offset.npy")
    mean_offset = np.load(offset_file) if os.path.isfile(offset_file) else None
    if mean_offset is not None:
        ds.set_masked_means(mean_offset)

    # Seed angles from random real test structures (reference
    # bin/sample_autoregressive.py:20-52), lengths drawn from the empirical
    # length distribution
    rng = np.random.default_rng(args.seed)
    idx = rng.choice(len(ds), size=args.num, replace=len(ds) < args.num)
    seeds = np.stack([ds[int(i)]["angles"][: args.numseed] for i in idx])
    seed_angles = np.zeros((args.num, pad, seeds.shape[-1]), dtype=np.float32)
    seed_angles[:, : args.numseed] = seeds
    lengths = np.asarray(ds.sample_length(args.num))

    t0 = time.time()
    out = np.asarray(
        ar_sample(
            model, params, constants, jnp.asarray(seed_angles),
            jnp.asarray(lengths), num_seed=args.numseed,
        )
    )
    sample_sec = time.time() - t0
    print(f"AR-generated {args.num} structures in {sample_sec:.1f}s")

    sampled = []
    for i, l in enumerate(lengths):
        angles = out[i, : int(l)]
        if mean_offset is not None:
            angles = angles + np.asarray(mean_offset)
        sampled.append(modulo_with_wrapped_range(angles))

    # KS vs held-out test split (un-centered space on both sides)
    rows = []
    for i in range(len(ds)):
        item = ds.__getitem__(i, ignore_zero_center=True)
        rows.append(item["angles"][: int(item["lengths"])])
    test_angles = np.concatenate(rows)
    gen_angles = np.concatenate(sampled)
    ks = ks_feature_tests(gen_angles, test_angles, EXHAUSTIVE_ANGLES)
    with open(os.path.join(HERE, "ks_tests.json"), "w") as f:
        json.dump(ks, f, indent=2)
    print(json.dumps(ks, indent=2))

    gen_dir = os.path.join(args.results, "sampled_pdb")
    os.makedirs(gen_dir, exist_ok=True)
    ss_counts, clash_counts = [], []
    for i, s in enumerate(sampled[: args.n_pdb]):
        outp = create_new_chain_nerf(
            os.path.join(gen_dir, f"ar_gen_{i}.pdb"),
            pd.DataFrame(s, columns=EXHAUSTIVE_ANGLES),
        )
        if outp:
            ss = count_structures_in_pdb(outp)
            if ss != (-1, -1):
                ss_counts.append(ss)
            clash_counts.append(count_clashes(outp))
    alpha = [a for a, _ in ss_counts]
    beta = [b for _, b in ss_counts]

    metrics = pd.read_csv(os.path.join(args.results, "logs", "metrics.csv"))
    med_epoch_s = float(metrics["epoch_seconds"].median())
    report = {
        "train": {
            "epochs": int(metrics["epoch"].max()) + 1,
            "final_train_loss": float(metrics["train_loss"].iloc[-1]),
            "final_val_loss": float(metrics["val_loss"].iloc[-1]),
            "best_val_loss": float(metrics["val_loss"].min()),
            "median_epoch_seconds": med_epoch_s,
        },
        "sampling": {
            "n_structures": len(sampled),
            "num_seed_residues": args.numseed,
            "wall_clock_sec_incl_compile": sample_sec,
        },
        "ks_max_stat": max(v["stat"] for v in ks.values()),
        "ks_rejects_subsampled": sum(v["reject_subsampled"] for v in ks.values()),
        "structures": {
            "n_scored": len(ss_counts),
            "mean_alpha_elements": float(np.mean(alpha)) if alpha else float("nan"),
            "mean_beta_elements": float(np.mean(beta)) if beta else float("nan"),
            "frac_with_helix": float(np.mean([a > 0 for a in alpha])) if alpha else float("nan"),
            "mean_clashes": float(np.mean(clash_counts)) if clash_counts else float("nan"),
        },
    }
    with open(os.path.join(HERE, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
