#!/usr/bin/env python
"""
Real-structure control: the held-out TEST split NeRF-round-tripped through
the angle representation (reference bin/baseline_sctm_scores_setup.py:55-95,
whose purpose is to push REAL structures through the same representation
bottleneck as generated ones so baselines are comparable), scored with the
same SS/clash metrics as the diffusion flagship, the AR baseline, and the
random-angle null.

This is the ceiling row of the comparison table: what "perfect" generation
would score under our annotators and the angle->NeRF bottleneck. (The full
reference pipeline continues into inverse-folding + refolding for scTM;
ProteinMPNN/OmegaFold are not installable in this sandbox -- see
docs/eval_tools.md.)

Writes report.json next to this script (committed artifact).

Usage: python analysis/real_baseline/evaluate.py
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    parser = argparse.ArgumentParser(usage=__doc__)
    parser.add_argument("--model", default=os.path.join(REPO, "analysis/synthetic_flagship/results"))
    parser.add_argument("--data", default=os.path.join(REPO, "data/synthetic_2k"))
    parser.add_argument("--pdbdir", default="", help="existing round-trip dir; built if empty")
    args = parser.parse_args()

    from glob import glob

    from foldingdiff_tpu.metrics.clashes import count_clashes
    from foldingdiff_tpu.metrics.ss import count_structures_in_pdb

    pdb_dir = args.pdbdir
    if not pdb_dir:
        tmp = tempfile.mkdtemp(prefix="real_baseline_")
        subprocess.run(
            [sys.executable, os.path.join(REPO, "bin", "baseline_sctm_scores_setup.py"),
             "-m", args.model, "--data", args.data, "-o", tmp],
            check=True,
        )
        pdb_dir = os.path.join(tmp, "sampled_pdb")

    fnames = sorted(glob(os.path.join(pdb_dir, "*.pdb")))
    ss_counts, clash_counts = [], []
    for f in fnames:
        ss = count_structures_in_pdb(f)
        if ss != (-1, -1):
            ss_counts.append(ss)
        clash_counts.append(count_clashes(f))
    alpha = [a for a, _ in ss_counts]
    beta = [b for _, b in ss_counts]
    report = {
        "n_structures": len(fnames),
        "structures": {
            "n_scored": len(ss_counts),
            "mean_alpha_elements": float(np.mean(alpha)),
            "mean_beta_elements": float(np.mean(beta)),
            "frac_with_helix": float(np.mean([a > 0 for a in alpha])),
            "mean_clashes": float(np.mean(clash_counts)),
        },
    }
    with open(os.path.join(HERE, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
