#!/usr/bin/env python
"""
Count secondary-structure elements (alpha/beta) per PDB with the native P-SEA
and plot their co-occurrence (reference bin/annot_secondary_structures.py).

Usage: python bin/annot_secondary_structures.py sampled_pdb/*.pdb plots/ss_cooccurrence.pdf
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from foldingdiff_tpu.geometry.pdb import get_pdb_length
from foldingdiff_tpu.metrics.plotting import plot_ss_cooccurrence
from foldingdiff_tpu.metrics.ss import count_structures_parallel


def main():
    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("pdb_files", nargs="+", type=str)
    parser.add_argument("outpdf", type=str)
    parser.add_argument("--json", type=str, default="", help="also write counts json")
    parser.add_argument("--maxlen", type=int, default=0, help="filter to length <= maxlen")
    parser.add_argument("--title", type=str, default="Secondary structure co-occurrence")
    parser.add_argument("--backend", choices=("psea", "dssp"), default="psea",
                        help="SS annotation backend: native P-SEA (default) or "
                        "the external DSSP binary (reference "
                        "bin/annot_secondary_structures.py:89-99)")
    args = parser.parse_args()

    pdb_files = args.pdb_files
    if args.maxlen > 0:
        orig = len(pdb_files)
        pdb_files = [p for p in pdb_files if get_pdb_length(p) <= args.maxlen]
        logging.info(f"Length filter {args.maxlen}: {orig} -> {len(pdb_files)}")

    counts = count_structures_parallel(pdb_files, backend=args.backend)
    counts = [c for c in counts if c != (-1, -1)]
    alpha, beta = zip(*counts)
    plot_ss_cooccurrence(alpha, beta, args.outpdf, json_file=args.json, title=args.title)
    logging.info(f"Wrote {args.outpdf} over {len(counts)} structures")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
