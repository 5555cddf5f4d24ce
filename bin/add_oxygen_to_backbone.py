#!/usr/bin/env python
"""
Add carbonyl oxygens to N/CA/C backbone PDBs (needed by some downstream
tools; reference bin/add_oxygen_to_backbone.py).

Usage: python bin/add_oxygen_to_backbone.py sampled_pdb -o sampled_pdb_with_o
"""
import argparse
import logging
import os
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from foldingdiff_tpu.geometry.sidechains import add_oxygen_to_backbone


def main():
    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("dirname", type=str, help="directory of backbone PDBs (or one file)")
    parser.add_argument("-o", "--outdir", type=str, required=True)
    args = parser.parse_args()

    if os.path.isdir(args.dirname):
        fnames = sorted(glob(os.path.join(args.dirname, "*.pdb")))
    else:
        fnames = [args.dirname]
    os.makedirs(args.outdir, exist_ok=True)
    for f in fnames:
        out = os.path.join(args.outdir, os.path.basename(f))
        add_oxygen_to_backbone(f, out)
    logging.info(f"Added oxygens to {len(fnames)} files -> {args.outdir}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
