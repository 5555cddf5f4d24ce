#!/usr/bin/env python
"""
Per-feature dispersion diagnosis for the 24k run (VERDICT round-4 item 2):
why do the narrow bond-angle marginals keep rejecting KS at alpha=0.01?

Compares the generated marginals (re-featurized from the written sample
PDBs, so exactly what landed on disk) against the held-out TEST split:
circular mean/std, robust core std (IQR/1.349), tail mass beyond 0.5 rad of
the data median, and the implied per-feature noise-temperature calibration
gamma = test_core_std / gen_core_std.

Findings from the epoch-786 samples (committed in dispersion_check.json):
the narrow features are 10-15% UNDER-dispersed at the core (std ratio
0.83-0.91), which alone predicts the observed KS band (for Gaussians,
KS(N(0,s), N(0,1)) ~ 0.05 at s=0.85), and the data's ~0.36% segment-junction
outlier tail is absent from samples. The calibration knob this motivates is
sampling.p_sample_step(noise_scale=...), evaluated in report_cal.json.
"""
import argparse
import glob
import json
import os
import sys
import warnings

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
HERE = os.path.dirname(os.path.abspath(__file__))


def circ_stats(x):
    x = x[~np.isnan(x)]
    c, s = np.mean(np.cos(x)), np.mean(np.sin(x))
    r = np.hypot(c, s)
    return float(np.arctan2(s, c)), float(np.sqrt(-2 * np.log(max(r, 1e-12))))


def main():
    parser = argparse.ArgumentParser(usage=__doc__)
    parser.add_argument("--results", default=os.path.join(HERE, "results"))
    parser.add_argument("--sampled", default="sampled_pdb",
                        help="subdir of --results holding the generated PDBs")
    parser.add_argument("--out", default=os.path.join(HERE, "dispersion_check.json"))
    args = parser.parse_args()
    warnings.filterwarnings("ignore")

    from foldingdiff_tpu.geometry.featurize import (
        EXHAUSTIVE_ANGLES,
        canonical_distances_and_dihedrals,
    )
    from foldingdiff_tpu.training.orchestration import get_train_valid_test_sets

    gen_rows = []
    for f in sorted(glob.glob(os.path.join(args.results, args.sampled, "gen_*.pdb"))):
        df = canonical_distances_and_dihedrals(f, distances=[], angles=EXHAUSTIVE_ANGLES)
        if df is not None:
            gen_rows.append(df[EXHAUSTIVE_ANGLES].values)
    gen = np.concatenate(gen_rows)

    with open(os.path.join(args.results, "training_args.json")) as f:
        ta = json.load(f)
    _, _, test_ds = get_train_valid_test_sets(
        dataset_key=ta["dataset_key"], angles_definitions=ta["angles_definitions"],
        max_seq_len=int(ta["max_seq_len"]), min_seq_len=int(ta["min_seq_len"]),
        seq_trim_strategy=ta["trim_strategy"],
    )
    rows = []
    for i in range(len(test_ds)):
        it = test_ds.__getitem__(i, ignore_zero_center=True)
        rows.append(it["angles"][: int(it["lengths"])])
    test = np.concatenate(rows)

    report = {"n_gen_residues": int(len(gen)), "n_test_residues": int(len(test)),
              "features": {}}
    for j, name in enumerate(EXHAUSTIVE_ANGLES):
        g = gen[~np.isnan(gen[:, j]), j]
        t = test[~np.isnan(test[:, j]), j]
        gm, gs = circ_stats(g)
        tm, ts = circ_stats(t)
        g_core = float(np.subtract(*np.percentile(g, [75, 25])) / 1.349)
        t_core = float(np.subtract(*np.percentile(t, [75, 25])) / 1.349)
        med = np.median(t)
        report["features"][name] = {
            "gen_circ_mean": gm, "test_circ_mean": tm,
            "gen_circ_std": gs, "test_circ_std": ts,
            "gen_core_std": g_core, "test_core_std": t_core,
            "core_std_ratio_gen_over_test": g_core / t_core,
            "gen_tail_frac_gt0.5": float(np.mean(np.abs(g - med) > 0.5)),
            "test_tail_frac_gt0.5": float(np.mean(np.abs(t - med) > 0.5)),
            "implied_noise_scale_gamma": t_core / g_core,
        }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
