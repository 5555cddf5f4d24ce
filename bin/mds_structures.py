#!/usr/bin/env python
"""
MDS embedding of generated structures from the pairwise TM distance matrix,
colored by scTM / length / secondary structure (reference bin/mds_structures.py;
UMAP omitted -- not in this image -- MDS covers the capability).

Usage: python bin/mds_structures.py sampled_pdb -o mds --sctm sctm_scores.json
"""
import argparse
import json
import logging
import os
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bin.hclust_structures import get_pairwise_tmscores  # noqa: E402
from foldingdiff_tpu.geometry.pdb import get_pdb_length  # noqa: E402
from foldingdiff_tpu.metrics.ss import count_structures_in_pdb  # noqa: E402


def main():
    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("dirname", type=str)
    parser.add_argument("-o", "--outprefix", type=str, default="mds")
    parser.add_argument("--sctm", type=str, default="", help="sctm_scores.json for coloring")
    parser.add_argument("--matrix", type=str, default="", help="precomputed TM matrix .npy")
    parser.add_argument("--nsubset", type=int, default=0)
    args = parser.parse_args()

    fnames = sorted(glob(os.path.join(args.dirname, "*.pdb")))
    if args.nsubset:
        fnames = fnames[: args.nsubset]
    names = [os.path.splitext(os.path.basename(f))[0] for f in fnames]

    if args.matrix and os.path.isfile(args.matrix):
        tm_matrix = np.load(args.matrix)
    else:
        tm_matrix = get_pairwise_tmscores(fnames)

    from sklearn.manifold import MDS

    dist = 1.0 - tm_matrix
    np.fill_diagonal(dist, 0.0)
    dist = (dist + dist.T) / 2
    emb = MDS(n_components=2, dissimilarity="precomputed", random_state=0).fit_transform(dist)

    colorings = {"length": [get_pdb_length(f) for f in fnames]}
    ss = [count_structures_in_pdb(f) for f in fnames]
    colorings["n_alpha"] = [a for a, _ in ss]
    colorings["n_beta"] = [b for _, b in ss]
    if args.sctm and os.path.isfile(args.sctm):
        with open(args.sctm) as f:
            sctm = json.load(f)
        colorings["scTM"] = [sctm.get(n, np.nan) for n in names]

    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    n = len(colorings)
    fig, axes = plt.subplots(dpi=300, ncols=n, figsize=(4.2 * n, 4))
    if n == 1:
        axes = [axes]
    for (label, vals), ax in zip(colorings.items(), axes):
        sc = ax.scatter(emb[:, 0], emb[:, 1], c=vals, s=12, cmap="viridis")
        fig.colorbar(sc, ax=ax, label=label)
        ax.set(title=f"MDS of TM distances, colored by {label}")
    fig.savefig(args.outprefix + ".pdf", bbox_inches="tight")
    np.save(args.outprefix + "_embedding.npy", emb)
    logging.info(f"Wrote {args.outprefix}.pdf")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
