#!/usr/bin/env python
"""
Graft an amino-acid sequence's idealized side chains onto a generated backbone
(reference bin/splice_aa_onto_backbone.py).

Usage: python bin/splice_aa_onto_backbone.py backbone.pdb SEQVENCE -o full.pdb
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from foldingdiff_tpu.geometry.sidechains import add_sidechains_to_backbone


def main():
    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("backbone", type=str)
    parser.add_argument("sequence", type=str, help="1-letter AA sequence or a .fasta file")
    parser.add_argument("-o", "--out", type=str, required=True)
    args = parser.parse_args()

    seq = args.sequence
    if os.path.isfile(seq):
        lines = [l.strip() for l in open(seq) if not l.startswith(">")]
        seq = "".join(lines)
    out = add_sidechains_to_backbone(args.backbone, seq, args.out)
    logging.info(f"Wrote {out}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
