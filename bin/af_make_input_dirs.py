#!/usr/bin/env python
"""
Shard FASTA sequences into per-sequence a3m input directories for AlphaFold
cluster jobs (reference bin/af_make_input_dirs.py).

Usage: python bin/af_make_input_dirs.py seqs.fasta -o af_inputs -n 50
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bin.omegafold_across_hosts import read_fasta


def main():
    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("fastas", nargs="+", type=str)
    parser.add_argument("-o", "--outdir", type=str, default="af_inputs")
    parser.add_argument("-n", "--per_dir", type=int, default=50, help="sequences per shard dir")
    args = parser.parse_args()

    seqs = {}
    for f in args.fastas:
        seqs.update(read_fasta(f))
    names = sorted(seqs)
    for shard_i in range(0, len(names), args.per_dir):
        shard_dir = os.path.join(args.outdir, f"shard_{shard_i // args.per_dir:04d}")
        os.makedirs(shard_dir, exist_ok=True)
        for name in names[shard_i : shard_i + args.per_dir]:
            # single-sequence a3m (no MSA) per AF single-seq protocol
            with open(os.path.join(shard_dir, f"{name}.a3m"), "w") as f:
                f.write(f">{name}\n{seqs[name]}\n")
    n_shards = (len(names) + args.per_dir - 1) // args.per_dir
    logging.info(f"Wrote {len(names)} a3m files into {n_shards} shard dirs under {args.outdir}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
