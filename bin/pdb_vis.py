#!/usr/bin/env python
"""
Structure rendering CLI: PDB -> PNG / batch PNG / denoising-trajectory GIF
(reference foldingdiff/pymol_vis.py CLI, without the PyMOL dependency).

Usage:
  python bin/pdb_vis.py pdb2png structure.pdb -o structure.png
  python bin/pdb_vis.py pdb2png_batch sampled_pdb/*.pdb -o pngs/
  python bin/pdb_vis.py pdb2gif frame_*.pdb -o trajectory.gif
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from foldingdiff_tpu.metrics.struct_vis import pdb2gif, pdb2png, pdb2png_batch


def main():
    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    sub = parser.add_subparsers(dest="cmd", required=True)

    p1 = sub.add_parser("pdb2png")
    p1.add_argument("pdb", type=str)
    p1.add_argument("-o", "--out", type=str, required=True)

    p2 = sub.add_parser("pdb2png_batch")
    p2.add_argument("pdbs", nargs="+", type=str)
    p2.add_argument("-o", "--out", type=str, required=True)

    p3 = sub.add_parser("pdb2gif")
    p3.add_argument("pdbs", nargs="+", type=str, help="ordered trajectory frames")
    p3.add_argument("-o", "--out", type=str, required=True)
    p3.add_argument("--duration", type=int, default=100, help="ms per frame")
    p3.add_argument("--stride", type=int, default=1)

    args = parser.parse_args()
    if args.cmd == "pdb2png":
        pdb2png(args.pdb, args.out)
    elif args.cmd == "pdb2png_batch":
        pdb2png_batch(args.pdbs, args.out)
    elif args.cmd == "pdb2gif":
        pdb2gif(args.pdbs, args.out, duration_ms=args.duration, stride=args.stride)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
