#!/usr/bin/env python
"""
Diffusion-training CLI: config JSON -> datasets -> TPU trainer.

Mirrors the reference bin/train.py CLI (549-570): positional config json,
-o/--outdir, --toy, --dryrun, --cpu; CLI overrides merged over the config with
update_dict_nonnull. Reference config_jsons/*.json files work unchanged.

Usage: python bin/train.py config_jsons/cath_full_angles_cosine.json -o results
"""
import argparse
import json
import logging
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from foldingdiff_tpu.utils import update_dict_nonnull


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("config", nargs="?", default="", type=str, help="config json")
    parser.add_argument("-o", "--outdir", default="./results", type=str, help="results dir")
    parser.add_argument("--dataset", default=None, type=str, help="dataset key or PDB dir")
    parser.add_argument("--toy", default=None, type=int, help="subset to n structures")
    parser.add_argument("--debug_single_time", action="store_true")
    parser.add_argument("--cpu", action="store_true", help="force CPU platform")
    parser.add_argument("--ngpu", default=-1, type=int, help="unused; device count is automatic")
    parser.add_argument("--dryrun", action="store_true", help="skip plots and extras")
    parser.add_argument("--epochs", default=None, type=int, help="override max/min epochs")
    parser.add_argument("--batchsize", default=None, type=int)
    parser.add_argument(
        "--seed", default=None, type=int,
        help="override the training seed (init, noising, split shuffles; "
        "train() default 42) — enables training-seed robustness sweeps",
    )
    parser.add_argument(
        "--multihost", action="store_true",
        help="initialize jax.distributed (TPU pod slices; mesh spans all hosts)",
    )
    parser.add_argument(
        "--coordinator", default=None, type=str,
        help="explicit coordinator host:port (omit on TPU pods: autodetected)",
    )
    parser.add_argument("--nprocs", default=None, type=int, help="process count for --coordinator")
    parser.add_argument("--procid", default=None, type=int, help="this process's id for --coordinator")
    parser.add_argument("--resume", action="store_true", help="resume from train_state checkpoint")
    return parser


def maybe_init_distributed(
    multihost: bool, coordinator=None, nprocs=None, procid=None
) -> bool:
    """
    --multihost: initialize jax.distributed so all hosts join one global mesh
    (launched per-host by scripts/tpu_pod_launch.sh; on pods the coordinator
    is autodetected from the TPU environment). Explicit --coordinator/
    --nprocs/--procid support N cooperating processes on ordinary hosts --
    the path exercised end-to-end by tests/test_multihost.py (2 CPU
    processes, one global 8-device mesh, loss equal to single-process).
    """
    if not multihost:
        return False
    from foldingdiff_tpu.parallel import multihost as mh

    mh.initialize(
        coordinator_address=coordinator, num_processes=nprocs, process_id=procid
    )
    return True


def main():
    args = build_parser().parse_args()
    from foldingdiff_tpu.utils_platform import maybe_force_cpu, tpu_job_lock_if_tpu

    maybe_force_cpu(args.cpu)
    maybe_init_distributed(args.multihost, args.coordinator, args.nprocs, args.procid)

    from foldingdiff_tpu.training.orchestration import train

    config = {}
    if args.config:
        with open(args.config) as f:
            config = json.load(f)
    overrides = {
        "results_dir": args.outdir,
        "subset": args.toy,
        "single_timestep_debug": args.debug_single_time or None,
        "cpu_only": args.cpu or None,
        "dryrun": args.dryrun or None,
        "dataset_key": args.dataset,
        "max_epochs": args.epochs,
        "min_epochs": args.epochs,
        "batch_size": args.batchsize,
        "seed": args.seed,
        "resume": args.resume or None,
    }
    config = update_dict_nonnull(config, {k: v for k, v in overrides.items() if v is not None})
    # Accepted-for-parity keys that train() does not take
    config.pop("multithread_plotting", None)
    # Advisory busy-host sentinel: lets a concurrently-running test suite
    # skip its contention-sensitive multihost e2e tests instead of timing out
    with tpu_job_lock_if_tpu():
        train(**config)


if __name__ == "__main__":
    curr_time = datetime.now().strftime("%y%m%d_%H%M%S")
    logging.basicConfig(
        level=logging.INFO,
        handlers=[
            logging.StreamHandler(),
            logging.FileHandler(f"training_{curr_time}.log"),
        ],
    )
    main()
