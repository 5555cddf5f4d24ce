"""Generate the CATH-scale synthetic training corpus (reference-scale data
stand-in while CATH egress is blocked: reference data/download_cath.sh fetches
~24k S40 domains; this writes the same count with a realistic lognormal
length distribution reaching well past the pad-128 training window, so the
per-epoch randomcrop augmentation path is load-bearing).

Usage: python scripts/make_synthetic_corpus.py [-n 24000] [-o data/synthetic_24k]
Prints generation throughput; safe to re-run (resumes by filename).
"""
import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.synthetic_proteins import make_cath_scale_corpus  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-n", type=int, default=24000)
    p.add_argument("-o", "--out", default="data/synthetic_24k")
    p.add_argument("--seed", type=int, default=24)
    args = p.parse_args()

    t0 = time.time()
    files = make_cath_scale_corpus(args.out, n=args.n, seed=args.seed)
    dt = time.time() - t0
    logging.info(
        f"Wrote {len(files)}/{args.n} structures to {args.out} in {dt:.0f}s "
        f"({len(files) / max(dt, 1e-9):.1f} structs/s)"
    )


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
