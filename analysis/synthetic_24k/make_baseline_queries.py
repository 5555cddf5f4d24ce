#!/usr/bin/env python
"""
Build the held-out novelty BASELINE query set for the 24k run.

The generated-samples novelty number (novelty_summary.json: median max-TM
0.61 over all 780 samples vs the entire 19,200-structure training split) only
means something next to a yardstick: how close does an IDEAL non-memorizing
generator -- one that draws genuinely fresh structures from the corpus
distribution -- sit to the training set? The model is trained on random
length<=128 crops of the training split, so the matching ideal draw is a
seeded random crop of a HELD-OUT test structure with the same length
distribution as the generated sweep (lengths 50..127, reference
bin/sample.py:243-255 sweep semantics).

This script deterministically rebuilds the split listings (same featurization
+ seed-6489 shuffle the trainer used, so train_files.txt is byte-identical to
the training artifact) and writes --per-length seeded CA-trace crops per sweep
length into results/test_query_pdb/. Score them with:

    python analysis/synthetic_24k/novelty_sweep.py \
        --sampled analysis/synthetic_24k/results/test_query_pdb

which writes novelty_summary_test_query_pdb.json next to this file.

Reference protocol being baselined: bin/tmscore_training.py:22-42 (max TM of
each sample against the entire training set).
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
    p = argparse.ArgumentParser(usage=__doc__)
    p.add_argument("--config", default=os.path.join(
        REPO, "config_jsons", "synthetic24k_full_angles_cosine.json"))
    p.add_argument("--results", default=os.path.join(HERE, "results"))
    p.add_argument("--lengths", default="50:128",
                   help="sweep length range lo:hi (hi exclusive), matching "
                   "the generated sweep's 780 = 78 lengths x 10 samples")
    p.add_argument("--per-length", type=int, default=2)
    p.add_argument("--seed", type=int, default=245)
    args = p.parse_args()

    with open(args.config) as f:
        cfg = json.load(f)

    from foldingdiff_tpu.training.orchestration import get_train_valid_test_sets
    from foldingdiff_tpu.geometry.pdb import extract_backbone_coords, write_ca_trace_to_pdb

    train_ds, _, test_ds = get_train_valid_test_sets(
        dataset_key=cfg["dataset_key"],
        angles_definitions=cfg["angles_definitions"],
        max_seq_len=cfg["max_seq_len"],
        min_seq_len=cfg["min_seq_len"],
        seq_trim_strategy=cfg["trim_strategy"],
    )

    os.makedirs(args.results, exist_ok=True)
    # Byte-identical to the trainer's artifact (orchestration.py:164-167)
    with open(os.path.join(args.results, "train_files.txt"), "w") as f:
        f.write("\n".join(train_ds.filenames))
    print(f"train_files.txt: {len(train_ds.filenames)} paths", flush=True)

    lo, hi = (int(x) for x in args.lengths.split(":"))
    qdir = os.path.join(args.results, "test_query_pdb")
    os.makedirs(qdir, exist_ok=True)

    test_files = np.array(test_ds.filenames)
    test_lens = np.array(test_ds.all_lengths)
    rng = np.random.default_rng(args.seed)
    n_written = 0
    for L in range(lo, hi):
        eligible = np.where(test_lens >= L)[0]
        picks = rng.choice(eligible, size=min(args.per_length, len(eligible)),
                           replace=False)
        for qi, ti in enumerate(picks):
            ca = extract_backbone_coords(str(test_files[ti]), atoms=("CA",))
            if ca is None or len(ca) < L:  # featurized length can exceed CA count
                continue                   # only on malformed files; skip those
            start = int(rng.integers(0, len(ca) - L + 1))
            src = os.path.splitext(os.path.basename(str(test_files[ti])))[0]
            out = os.path.join(qdir, f"testcrop_L{L:03d}_{qi}_{src}.pdb")
            write_ca_trace_to_pdb(np.asarray(ca[start:start + L]), out)
            n_written += 1
    print(f"wrote {n_written} baseline queries (lengths {lo}..{hi - 1}, "
          f"{args.per_length}/length, seed {args.seed}) to {qdir}", flush=True)


if __name__ == "__main__":
    main()
