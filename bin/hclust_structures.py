#!/usr/bin/env python
"""
Hierarchical clustering of generated structures by pairwise TM distance
(reference bin/hclust_structures.py). Writes the linkage dendrogram plot and a
json of cluster assignments.

Usage: python bin/hclust_structures.py sampled_pdb -o hclust
"""
import argparse
import itertools
import json
import logging
import multiprocessing as mp
import os
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from foldingdiff_tpu.eval import tmscore


def get_pairwise_tmscores(fnames, nthreads=None):
    """Symmetric pairwise TM-score matrix (reference hclust_structures.py:38-70).

    When the in-repo C++ TM-align is available, every PDB is parsed into a CA
    trace exactly once and all O(n^2) alignments run in memory — the file-level
    path would re-parse each structure n-1 times, which dominates wall-clock at
    the 780-sample scale (303,810 pairs)."""
    pairs = list(itertools.combinations(range(len(fnames)), 2))
    try:
        from foldingdiff_tpu.eval import tmalign_native as tn
    except ImportError:
        tn = None
    if tn is not None and tn.available():
        traces = [tmscore._load_ca(f) for f in fnames]
        traces = [
            None if c is None or len(c) < 5
            else np.ascontiguousarray(c, dtype=np.float64)
            for c in traces
        ]
        values = [
            tn.tm_align_coords(traces[i], traces[j])
            if traces[i] is not None and traces[j] is not None else float("nan")
            for i, j in pairs
        ]
    else:
        args = [(fnames[i], fnames[j]) for i, j in pairs]
        nthreads = nthreads or (os.cpu_count() or 1)
        if nthreads > 1 and len(args) > 16:
            with mp.Pool(nthreads) as pool:
                values = pool.starmap(tmscore.run_tmalign, args, chunksize=16)
        else:
            values = [tmscore.run_tmalign(*a) for a in args]
    mat = np.eye(len(fnames))
    for (i, j), v in zip(pairs, values):
        mat[i, j] = mat[j, i] = v if not np.isnan(v) else 0.0
    return mat


def main():
    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("dirname", type=str, help="directory of PDB files")
    parser.add_argument("-o", "--outprefix", type=str, default="hclust")
    parser.add_argument("--nclusters", type=int, default=10)
    parser.add_argument("--nsubset", type=int, default=0)
    args = parser.parse_args()

    fnames = sorted(glob(os.path.join(args.dirname, "*.pdb")))
    if args.nsubset:
        fnames = fnames[: args.nsubset]
    logging.info(f"Clustering {len(fnames)} structures")
    tm_matrix = get_pairwise_tmscores(fnames)
    np.save(args.outprefix + "_tm_matrix.npy", tm_matrix)

    from scipy.cluster import hierarchy
    from scipy.spatial.distance import squareform

    dist = 1.0 - tm_matrix
    np.fill_diagonal(dist, 0.0)
    dist = (dist + dist.T) / 2
    linkage = hierarchy.linkage(squareform(dist, checks=False), method="average")
    labels = hierarchy.fcluster(linkage, t=args.nclusters, criterion="maxclust")
    with open(args.outprefix + "_clusters.json", "w") as f:
        json.dump(
            {os.path.basename(n): int(l) for n, l in zip(fnames, labels)}, f, indent=4
        )

    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, ax = plt.subplots(dpi=300, figsize=(10, 4))
    hierarchy.dendrogram(linkage, ax=ax, no_labels=len(fnames) > 50)
    ax.set(title=f"Hierarchical clustering of {len(fnames)} structures (1 - TM)")
    fig.savefig(args.outprefix + "_dendrogram.pdf", bbox_inches="tight")
    logging.info(f"Wrote {args.outprefix}_clusters.json ({len(set(labels))} clusters)")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
