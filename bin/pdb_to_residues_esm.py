#!/usr/bin/env python
"""
Inverse folding via ESM-IF1 (reference bin/pdb_to_residues_esm.py). Requires
fair-esm + torch_geometric in a separate environment; this wrapper samples
n sequences per backbone and re-draws invalid samples, writing one fasta per
structure.

Usage: python bin/pdb_to_residues_esm.py sampled_pdb -o esm_residues -n 8
"""
import argparse
import logging
import os
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VALID_AA = set("ACDEFGHIKLMNPQRSTVWY")


def generate_residues(pdb_file: str, n: int, temperature: float):
    """Sample sequences with ESM-IF1; invalid samples are re-drawn
    (reference pdb_to_residues_esm.py:66-91)."""
    try:
        import esm
        import esm.inverse_folding
    except ImportError as e:
        raise SystemExit(
            "fair-esm not installed -- ESM inverse folding runs in a separate env "
            f"(see reference README). Import error: {e}"
        )
    model, alphabet = esm.pretrained.esm_if1_gvp4_t16_142M_UR50()
    model = model.eval()
    coords, _seq = esm.inverse_folding.util.load_coords(pdb_file, "A")
    seqs = []
    attempts = 0
    while len(seqs) < n and attempts < n * 4:
        sampled = model.sample(coords, temperature=temperature)
        attempts += 1
        if set(sampled).issubset(VALID_AA):
            seqs.append(sampled)
    return seqs


def main():
    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("dirname", type=str)
    parser.add_argument("-o", "--outdir", type=str, default="esm_residues")
    parser.add_argument("-n", "--nseq", type=int, default=8)
    parser.add_argument("-t", "--temperature", type=float, default=1.0)
    args = parser.parse_args()

    pdbs = sorted(glob(os.path.join(args.dirname, "*.pdb")))
    os.makedirs(args.outdir, exist_ok=True)
    for pdb in pdbs:
        name = os.path.splitext(os.path.basename(pdb))[0]
        seqs = generate_residues(pdb, args.nseq, args.temperature)
        with open(os.path.join(args.outdir, f"{name}.fasta"), "w") as f:
            for i, s in enumerate(seqs):
                f.write(f">{name}_{i}_residues_esm\n{s}\n")
    logging.info(f"Wrote sequences for {len(pdbs)} backbones to {args.outdir}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
