#!/usr/bin/env python
"""
Max TM-score of each generated structure against the entire training set --
the novelty / memorization check (reference bin/tmscore_training.py). Writes
tm_scores.json + tm_scores_ref.json into the sampled dir.

Usage: python bin/tmscore_training.py -d sampled_pdb --trainfiles results/train_files.txt
"""
import argparse
import json
import logging
import os
import sys
from glob import glob
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from foldingdiff_tpu.eval import tmscore


def compute_training_tm_scores(pdb_files, train_files, outdir: Path, nthreads=None):
    nthreads = nthreads or (os.cpu_count() or 1)
    all_scores, all_refs = {}, {}
    for i, fname in enumerate(pdb_files):
        name = os.path.splitext(os.path.basename(fname))[0]
        score, ref = tmscore.max_tm_across_refs(fname, train_files, n_threads=nthreads)
        all_scores[name] = score
        all_refs[name] = ref
        if i % 10 == 0:
            logging.info(f"{i}/{len(pdb_files)}: {name} max TM {score:.3f}")
    with open(outdir / "tm_scores.json", "w") as f:
        json.dump(all_scores, f, indent=4)
    with open(outdir / "tm_scores_ref.json", "w") as f:
        json.dump(all_refs, f, indent=4)
    return all_scores


def main():
    # Configure here (not only under __main__) so the subsample "lower bound"
    # caveat is emitted even when main() is invoked programmatically
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("-d", "--dirname", type=str,
                        default=os.path.join(os.getcwd(), "sampled_pdb"))
    parser.add_argument("--trainfiles", type=str, required=True,
                        help="train_files.txt from training, or a directory of PDBs")
    parser.add_argument("-n", "--nsubset", type=int, default=0)
    parser.add_argument("--train-subsample", type=int, default=0,
                        help="score against a seeded random subset of the "
                        "training set instead of all of it (makes the check "
                        "tractable at CATH-scale corpora; 0 = use all)")
    parser.add_argument("--subsample-seed", type=int, default=1234)
    args = parser.parse_args()

    pdb_files = sorted(glob(os.path.join(args.dirname, "*.pdb")))
    if args.nsubset:
        pdb_files = pdb_files[: args.nsubset]
    if os.path.isdir(args.trainfiles):
        train_files = sorted(glob(os.path.join(args.trainfiles, "*")))
    else:
        with open(args.trainfiles) as f:
            train_files = [l.strip() for l in f if l.strip()]
    train_files = [f for f in train_files if os.path.isfile(f)]
    if args.train_subsample and args.train_subsample < len(train_files):
        rng = np.random.default_rng(args.subsample_seed)
        idx = rng.choice(len(train_files), args.train_subsample, replace=False)
        train_files = [train_files[i] for i in sorted(idx)]
        logging.info(
            f"Subsampled training refs to {len(train_files)} "
            f"(seed {args.subsample_seed}); reported max-TM novelty is a "
            f"lower bound on the full-corpus value"
        )
    logging.info(f"{len(pdb_files)} generated vs {len(train_files)} training structures")
    compute_training_tm_scores(pdb_files, train_files, Path(args.dirname))


if __name__ == "__main__":
    main()
