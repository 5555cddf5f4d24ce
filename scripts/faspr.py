#!/usr/bin/env python
"""
Side-chain packing via the FASPR C++ binary (reference scripts/faspr.py).
FASPR is an external tool; this wrapper orchestrates it over a directory and
falls back with a clear error when the binary is absent.

Usage: python scripts/faspr.py backbones_with_seq/*.pdb -o packed/
"""
import argparse
import logging
import os
import shutil
import subprocess
import sys

FASPR_BIN = os.environ.get("FASPR_BIN", shutil.which("FASPR") or shutil.which("faspr"))


def run_faspr(pdb_in: str, pdb_out: str) -> str:
    assert FASPR_BIN, "FASPR binary not found (set FASPR_BIN or add to PATH)"
    subprocess.run([FASPR_BIN, "-i", pdb_in, "-o", pdb_out], check=True)
    return pdb_out


def main():
    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("pdbs", nargs="+", type=str)
    parser.add_argument("-o", "--outdir", type=str, required=True)
    args = parser.parse_args()
    if not FASPR_BIN:
        raise SystemExit("FASPR binary not found -- set FASPR_BIN or install to PATH")
    os.makedirs(args.outdir, exist_ok=True)
    for pdb in args.pdbs:
        run_faspr(pdb, os.path.join(args.outdir, os.path.basename(pdb)))
    logging.info(f"Packed {len(args.pdbs)} structures into {args.outdir}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
