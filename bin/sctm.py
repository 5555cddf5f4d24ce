#!/usr/bin/env python
"""
scTM designability metric: max TM-score between each generated backbone and
its <=8 refolded structures (reference bin/sctm.py). Expects a folded dir
where each generated_N.pdb has matches generated_N_*_residues_*.pdb (the
inverse-fold + refold pipeline's naming). Writes sctm_scores.json/csv + plots.

Designability = scTM >= 0.5 (reference sctm.py:127-130).

Usage: python bin/sctm.py -p sampled_pdb -f omegafold_predictions -o sctm_scores
"""
import argparse
import functools
import json
import logging
import multiprocessing as mp
import os
import sys
from glob import glob
from pathlib import Path
from typing import Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from foldingdiff_tpu.eval import tmscore
from foldingdiff_tpu.geometry.pdb import get_pdb_length
from foldingdiff_tpu.metrics.ss import count_structures_in_pdb


def get_sctm_score(orig_pdb, folded_dirname) -> Tuple[float, str]:
    """Max TM over <=8 refolded structures (reference sctm.py:30-44)."""
    bname = os.path.splitext(os.path.basename(orig_pdb))[0] + "_*_residues_*.pdb"
    folded_pdbs = sorted(glob(os.path.join(folded_dirname, bname)))
    if len(folded_pdbs) > 8:
        folded_pdbs = folded_pdbs[:8]
    if len(folded_pdbs) < 8:
        logging.warning(f"Fewer than 8 (n={len(folded_pdbs)}) structures for {orig_pdb}")
    if not folded_pdbs:
        return np.nan, ""
    return tmscore.max_tm_across_refs(str(orig_pdb), folded_pdbs, parallel=False)


def build_parser():
    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("-p", "--predicted", type=str,
                        default=os.path.join(os.getcwd(), "sampled_pdb"))
    parser.add_argument("-f", "--folded", type=str,
                        default=os.path.join(os.getcwd(), "omegafold_predictions"))
    parser.add_argument("-o", "--outprefix", type=str,
                        default=os.path.join(os.getcwd(), "sctm_scores"))
    parser.add_argument("-t", "--trainingtms", type=str, default="",
                        help="optional tm_scores.json of training-set max TM for joint plot")
    return parser


def main():
    args = build_parser().parse_args()
    assert os.path.isdir(args.predicted), f"Missing {args.predicted}"
    assert os.path.isdir(args.folded), f"Missing {args.folded}"

    backbones = sorted(glob(os.path.join(args.predicted, "*.pdb")))
    logging.info(f"Computing scTM for {len(backbones)} generated structures")
    names = [os.path.splitext(os.path.basename(f))[0] for f in backbones]
    lengths = {n: get_pdb_length(f) for n, f in zip(names, backbones)}

    nproc = os.cpu_count() or 1
    if nproc > 1 and len(backbones) > 8:
        with mp.Pool(nproc) as pool:
            ss_counts = list(pool.map(count_structures_in_pdb, backbones, chunksize=10))
            pfunc = functools.partial(get_sctm_score, folded_dirname=Path(args.folded))
            raw = list(pool.map(pfunc, backbones, chunksize=5))
    else:
        ss_counts = [count_structures_in_pdb(f) for f in backbones]
        raw = [get_sctm_score(f, Path(args.folded)) for f in backbones]

    ok = [i for i, (v, _) in enumerate(raw) if not np.isnan(v)]
    scores = {names[i]: raw[i][0] for i in ok}
    refs = {names[i]: raw[i][1] for i in ok}
    vals = np.array(list(scores.values()))
    passing = int(np.sum(vals >= 0.5))
    logging.info(
        f"{len(vals)} scored; {passing} designable (scTM >= 0.5) = {passing / max(len(vals),1):.3f}"
    )

    with open(args.outprefix + ".json", "w") as f:
        json.dump(scores, f, indent=4)
    with open(args.outprefix + "_refs.json", "w") as f:
        json.dump(refs, f, indent=4)

    # Per-length breakdown (reference sctm.py:150-179)
    import pandas as pd

    df = pd.DataFrame({
        "name": list(scores.keys()),
        "sctm": list(scores.values()),
        "length": [lengths[n] for n in scores],
        "n_alpha": [ss_counts[names.index(n)][0] for n in scores],
        "n_beta": [ss_counts[names.index(n)][1] for n in scores],
    })
    df["designable"] = df["sctm"] >= 0.5
    df.to_csv(args.outprefix + ".csv", index=False)
    short = df[df["length"] <= 70]
    long = df[df["length"] > 70]
    for label, sub in [("short (<=70)", short), ("long (>70)", long), ("all", df)]:
        if len(sub):
            logging.info(
                f"{label}: {sub['designable'].sum()}/{len(sub)} designable, "
                f"median scTM {sub['sctm'].median():.3f}"
            )

    # Plots
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, ax = plt.subplots(dpi=300)
    ax.hist(vals, bins=40)
    ax.axvline(0.5, color="red", linestyle="--", label="designability cutoff")
    ax.set(xlabel="scTM", ylabel="count",
           title=f"scTM scores ({passing}/{len(vals)} designable)")
    ax.legend()
    fig.savefig(args.outprefix + "_hist.pdf", bbox_inches="tight")

    if args.trainingtms and os.path.isfile(args.trainingtms):
        with open(args.trainingtms) as f:
            train_tm = json.load(f)
        common = [n for n in scores if n in train_tm]
        if common:
            fig, ax = plt.subplots(dpi=300, figsize=(5, 5))
            ax.scatter([train_tm[n] for n in common], [scores[n] for n in common], s=8, alpha=0.5)
            ax.axhline(0.5, color="red", linestyle="--", alpha=0.5)
            ax.set(xlabel="max TM to training set", ylabel="scTM",
                   title="scTM vs training similarity")
            fig.savefig(args.outprefix + "_vs_training.pdf", bbox_inches="tight")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
