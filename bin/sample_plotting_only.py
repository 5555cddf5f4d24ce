#!/usr/bin/env python
"""
Re-generate the distribution plots from an existing sample directory without
re-sampling (reference bin/sample_plotting_only.py).

Usage: python bin/sample_plotting_only.py -d sampled -o sampled/plots
"""
import argparse
import logging
import os
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import pandas as pd

    from foldingdiff_tpu.metrics import plotting as plots
    from foldingdiff_tpu.metrics.ss import count_structures_parallel

    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("-d", "--sampled", type=str, default="sampled")
    parser.add_argument("-o", "--outdir", type=str, default="")
    args = parser.parse_args()

    outdir = args.outdir or os.path.join(args.sampled, "plots")
    os.makedirs(outdir, exist_ok=True)
    csvs = sorted(glob(os.path.join(args.sampled, "sampled_angles", "*.csv.gz")))
    assert csvs, f"No angle CSVs under {args.sampled}/sampled_angles"
    dfs = [pd.read_csv(f) for f in csvs]
    ft_names = list(dfs[0].columns)
    all_angles = np.concatenate([df.values for df in dfs])

    if "phi" in ft_names and "psi" in ft_names:
        plots.plot_ramachandran(
            all_angles[:, ft_names.index("phi")],
            all_angles[:, ft_names.index("psi")],
            os.path.join(outdir, "ramachandran_generated.pdf"),
            annot_ss=True,
            title=f"Ramachandran, {len(dfs)} generated structures",
        )
    plots.plot_distribution_overlap(
        {"generated": all_angles},
        os.path.join(outdir, "generated_distributions.pdf"),
        ft_names,
    )
    plots.plot_distribution_overlap(
        {"generated": all_angles},
        os.path.join(outdir, "generated_distributions_cdf.pdf"),
        ft_names,
        cumulative=True,
    )
    pdbs = sorted(glob(os.path.join(args.sampled, "sampled_pdb", "*.pdb")))
    if pdbs:
        counts = [c for c in count_structures_parallel(pdbs) if c != (-1, -1)]
        if counts:
            a, b = zip(*counts)
            plots.plot_ss_cooccurrence(
                a, b, os.path.join(outdir, "ss_cooccurrence_generated.pdf"),
                json_file=os.path.join(outdir, "ss_counts.json"),
            )
    logging.info(f"Plots written to {outdir}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
