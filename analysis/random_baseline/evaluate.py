#!/usr/bin/env python
"""
Random-angle null baseline (reference bin/sample_random_angles.py, used by the
paper as the scTM null model): resample each angle feature INDEPENDENTLY from
the held-out test pool, build chains through NeRF, and score them with the
same metrics as the diffusion flagship and the AR baseline.

By construction the marginals match the test split (KS passes trivially); the
point is that the JOINT structure is destroyed -- secondary-structure content
and clash counts collapse, showing that matching marginals alone (which this
baseline does better than the diffusion model) does not make protein
backbones. Complements analysis/ar_baseline (matches joints locally but mode
collapses) and the flagship (matches both).

Writes report.json + ks_tests.json next to this script (committed artifacts).

Usage: python analysis/random_baseline/evaluate.py [-n 128]
"""
import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    parser = argparse.ArgumentParser(usage=__doc__)
    parser.add_argument("--model", default=os.path.join(REPO, "analysis/synthetic_flagship/results"))
    parser.add_argument("--data", default=os.path.join(REPO, "data/synthetic_2k"))
    parser.add_argument("-n", "--num", type=int, default=128)
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--outdir", default="/tmp/random_baseline")
    args = parser.parse_args()

    import pandas as pd

    from foldingdiff_tpu.data import datasets as dsets
    from foldingdiff_tpu.geometry.featurize import EXHAUSTIVE_ANGLES, create_new_chain_nerf
    from foldingdiff_tpu.metrics.clashes import count_clashes
    from foldingdiff_tpu.metrics.kl import ks_feature_tests
    from foldingdiff_tpu.metrics.ss import count_structures_in_pdb

    with open(os.path.join(args.model, "training_args.json")) as f:
        train_args = json.load(f)
    ds_cls = dsets.DATASET_CLASSES[train_args["angles_definitions"]]
    ds = ds_cls(
        pdbs=args.data, split="test", pad=int(train_args["max_seq_len"]),
        min_length=int(train_args.get("min_seq_len", 0)),
        trim_strategy=train_args.get("trim_strategy", "leftalign"),
        zero_center=False,
    )
    ft_names = list(ds.feature_names["angles"])

    rows = []
    for i in range(len(ds)):
        item = ds.__getitem__(i, ignore_zero_center=True)
        rows.append(item["angles"][: int(item["lengths"])])
    pool = np.concatenate(rows)
    rng = np.random.default_rng(args.seed)

    pdb_dir = os.path.join(args.outdir, "sampled_pdb")
    os.makedirs(pdb_dir, exist_ok=True)
    lengths = rng.choice([len(r) for r in rows], size=args.num, replace=True)
    sampled, ss_counts, clash_counts = [], [], []
    for i, l in enumerate(lengths):
        angles = np.stack(
            [rng.choice(pool[:, j], size=l, replace=True) for j in range(pool.shape[1])],
            axis=1,
        )
        sampled.append(angles)
        out = create_new_chain_nerf(
            os.path.join(pdb_dir, f"random_{i}.pdb"),
            pd.DataFrame(angles, columns=ft_names),
        )
        if out:
            ss = count_structures_in_pdb(out)
            if ss != (-1, -1):
                ss_counts.append(ss)
            clash_counts.append(count_clashes(out))

    ks = ks_feature_tests(np.concatenate(sampled), pool, EXHAUSTIVE_ANGLES)
    with open(os.path.join(HERE, "ks_tests.json"), "w") as f:
        json.dump(ks, f, indent=2)

    alpha = [a for a, _ in ss_counts]
    beta = [b for _, b in ss_counts]
    report = {
        "n_structures": len(sampled),
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
