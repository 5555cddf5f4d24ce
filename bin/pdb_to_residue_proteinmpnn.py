#!/usr/bin/env python
"""
Inverse folding via ProteinMPNN: 8 sequences per generated backbone at T=0.1
with --ca_only (the scTM protocol, reference bin/pdb_to_residue_proteinmpnn.py).
Requires a ProteinMPNN checkout (PROTEINMPNN_DIR env var or --mpnn_dir).

Usage: python bin/pdb_to_residue_proteinmpnn.py sampled_pdb -o proteinmpnn_residues
"""
import argparse
import logging
import os
import subprocess
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def generate_residues_proteinmpnn(
    pdb_file: str, outdir: str, mpnn_dir: str, n_seq: int = 8, temperature: float = 0.1
):
    """One backbone -> n_seq sequences (reference pdb_to_residue_proteinmpnn.py:64-87)."""
    runner = os.path.join(mpnn_dir, "protein_mpnn_run.py")
    assert os.path.isfile(runner), f"Missing {runner}"
    cmd = [
        sys.executable, runner,
        "--pdb_path", pdb_file,
        "--out_folder", outdir,
        "--num_seq_per_target", str(n_seq),
        "--sampling_temp", str(temperature),
        "--ca_only",
        "--seed", "1234",
        "--batch_size", "1",
    ]
    subprocess.run(cmd, check=True)


def main():
    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("dirname", type=str, help="directory of backbone PDBs")
    parser.add_argument("-o", "--outdir", type=str, default="proteinmpnn_residues")
    parser.add_argument("--mpnn_dir", type=str, default=os.environ.get("PROTEINMPNN_DIR", ""))
    parser.add_argument("-n", "--nseq", type=int, default=8)
    parser.add_argument("-t", "--temperature", type=float, default=0.1)
    args = parser.parse_args()

    if not args.mpnn_dir or not os.path.isdir(args.mpnn_dir):
        raise SystemExit(
            "ProteinMPNN checkout not found -- set PROTEINMPNN_DIR or --mpnn_dir "
            "(external tool; this wrapper only orchestrates)"
        )
    pdbs = sorted(glob(os.path.join(args.dirname, "*.pdb")))
    os.makedirs(args.outdir, exist_ok=True)
    for pdb in pdbs:
        generate_residues_proteinmpnn(
            pdb, args.outdir, args.mpnn_dir, n_seq=args.nseq, temperature=args.temperature
        )
    logging.info(f"Inverse-folded {len(pdbs)} backbones into {args.outdir}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
