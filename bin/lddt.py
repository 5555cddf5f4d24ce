#!/usr/bin/env python
"""
lDDT between each sampled structure and its corresponding folded structures
(the scTM pairing), using the NATIVE lDDT implementation instead of the
reference's OpenStructure docker image (reference foldingdiff/lddt.py CLI).

Usage: python bin/lddt.py sampled_pdb omegafold_predictions -o lddt.json
"""
import argparse
import logging
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from foldingdiff_tpu.metrics.lddt import lddt_pdb, lddt_sampled_folded


def main():
    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("sampled_dir", type=str)
    parser.add_argument("folded_dir", type=str, nargs="?", default="")
    parser.add_argument("-o", "--out", type=str, default="lddt.json")
    parser.add_argument("--pair", nargs=2, type=str, default=None,
                        help="score one query/ref pair instead of directories")
    parser.add_argument("--ca-only", action="store_true",
                        help="score the CA trace only (default: all backbone "
                        "atoms, the reference OpenStructure convention)")
    args = parser.parse_args()

    from foldingdiff_tpu.metrics.lddt import BACKBONE_ATOM_NAMES

    atoms = ("CA",) if args.ca_only else BACKBONE_ATOM_NAMES
    if args.pair:
        print(lddt_pdb(args.pair[0], args.pair[1], atoms=atoms))
        return
    assert args.folded_dir, "folded_dir required (or use --pair)"
    lddt_sampled_folded(
        Path(args.sampled_dir), Path(args.folded_dir), out_path=args.out, atoms=atoms
    )


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
