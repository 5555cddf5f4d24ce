#!/usr/bin/env python
"""
Fold FASTA sequences with OmegaFold, sharded across worker processes/hosts.

TPU-native replacement for the reference's GPU fan-out
(bin/omegafold_across_gpus.py:136-159, which shards via CUDA_VISIBLE_DEVICES):
sequences are shuffled (load balancing) and round-robin sharded across worker
subprocesses; on a multi-host TPU pod, run one instance per host with
--shard <i> --nshards <n>. Requires the external `omegafold` binary on PATH.

Usage: python bin/omegafold_across_hosts.py seqs1.fasta seqs2.fasta -o folded -j 4
"""
import argparse
import logging
import multiprocessing as mp
import os
import shutil
import subprocess
import sys
from typing import Dict, List

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_fasta(fname: str) -> Dict[str, str]:
    """(reference omegafold_across_gpus.py:19-44)"""
    seqs = {}
    cur = None
    with open(fname) as f:
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                cur = line[1:].split()[0]
                seqs[cur] = ""
            elif cur is not None:
                seqs[cur] += line
    return seqs


def write_fasta(seqs: Dict[str, str], fname: str) -> str:
    with open(fname, "w") as f:
        for k, v in seqs.items():
            f.write(f">{k}\n{v}\n")
    return fname


def run_omegafold(fasta: str, outdir: str, extra_args: List[str]):
    """One worker invocation (reference omegafold_across_gpus.py:62-79)."""
    cmd = ["omegafold", fasta, outdir] + extra_args
    logging.info(f"Running: {' '.join(cmd)}")
    subprocess.run(cmd, check=True)


def main():
    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("fastas", nargs="+", type=str)
    parser.add_argument("-o", "--outdir", type=str, default="omegafold_predictions")
    parser.add_argument("-j", "--workers", type=int, default=1, help="local worker processes")
    parser.add_argument("--shard", type=int, default=0, help="this host's shard index")
    parser.add_argument("--nshards", type=int, default=1, help="total hosts")
    parser.add_argument("--subbatch", type=int, default=64)
    parser.add_argument("--seed", type=int, default=1234)
    args = parser.parse_args()

    if shutil.which("omegafold") is None:
        raise SystemExit(
            "omegafold binary not found on PATH -- install it in a separate env "
            "(this wrapper only orchestrates; see reference README)"
        )

    all_seqs: Dict[str, str] = {}
    for f in args.fastas:
        all_seqs.update(read_fasta(f))
    names = sorted(all_seqs.keys())
    # Shuffle for load balance (long sequences cluster otherwise), then shard
    import random

    random.Random(args.seed).shuffle(names)
    names = names[args.shard :: args.nshards]
    shards = [names[i :: args.workers] for i in range(args.workers)]

    os.makedirs(args.outdir, exist_ok=True)
    procs = []
    for i, shard in enumerate(shards):
        if not shard:
            continue
        fasta_i = os.path.join(args.outdir, f"_shard_{args.shard}_{i}.fasta")
        write_fasta({n: all_seqs[n] for n in shard}, fasta_i)
        p = mp.Process(
            target=run_omegafold,
            args=(fasta_i, args.outdir, ["--subbatch_size", str(args.subbatch)]),
        )
        p.start()
        procs.append(p)
    for p in procs:
        p.join()
    logging.info(f"Folded {len(names)} sequences into {args.outdir}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
