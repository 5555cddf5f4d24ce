#!/usr/bin/env python
"""
Plot angle distributions across reverse-diffusion timesteps from the
--fullhistory CSVs written by bin/sample.py (reference bin/plot_angles_over_time.py).

Usage: python bin/plot_angles_over_time.py sampled/sampled_angles/sample_history -o plots/angles_over_time.pdf
"""
import argparse
import logging
import os
import re
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timestep_from_fname(fname: str) -> int:
    m = re.search(r"timestep_(\d+)", os.path.basename(fname))
    assert m, f"Cannot parse timestep from {fname}"
    return int(m.group(1))


def get_angle_files(history_dir: str):
    """{timestep: [csv files]} across all generated_* subdirs."""
    files = glob(os.path.join(history_dir, "generated_*", "timestep_*.csv.gz"))
    out = {}
    for f in files:
        out.setdefault(timestep_from_fname(f), []).append(f)
    return dict(sorted(out.items()))


def main():
    import pandas as pd

    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("history_dir", type=str)
    parser.add_argument("-o", "--outpdf", type=str, default="angles_over_time.pdf")
    parser.add_argument("--nsteps", type=int, default=6, help="number of timesteps to show")
    args = parser.parse_args()

    by_t = get_angle_files(args.history_dir)
    assert by_t, f"No history CSVs under {args.history_dir}"
    ts = np.linspace(0, len(by_t) - 1, num=min(args.nsteps, len(by_t))).astype(int)
    keys = list(by_t.keys())
    chosen = [keys[i] for i in ts]

    first = pd.read_csv(by_t[chosen[0]][0])
    ft_names = list(first.columns)
    fig, axes = plt.subplots(
        dpi=300, nrows=len(chosen), ncols=len(ft_names),
        figsize=(2.6 * len(ft_names), 1.8 * len(chosen)), sharex="col",
    )
    for row, t in enumerate(chosen):
        vals = pd.concat([pd.read_csv(f) for f in by_t[t]])
        for col, ft in enumerate(ft_names):
            ax = axes[row][col] if len(chosen) > 1 else axes[col]
            ax.hist(vals[ft].dropna(), bins=50, density=True)
            if row == 0:
                ax.set_title(ft)
            if col == 0:
                ax.set_ylabel(f"t index {t}")
    fig.suptitle("Angle distributions over reverse-diffusion time", y=1.01)
    fig.savefig(args.outpdf, bbox_inches="tight")
    logging.info(f"Wrote {args.outpdf}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
