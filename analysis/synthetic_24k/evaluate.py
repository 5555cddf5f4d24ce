#!/usr/bin/env python
"""
Post-training evaluation of the CATH-SCALE (24k-structure) synthetic run
(VERDICT round-3 item 2: reference-scale data + budget, with the per-epoch
randomcrop augmentation load-bearing -- ~58% of the corpus exceeds pad=128).

Pipeline: load analysis/synthetic_24k/results -> sample the manuscript
protocol (10 backbones per length in [50,128) = 780, T=1000 DDPM) on the TPU
-> KS of sampled angle marginals vs the held-out TEST split -> SS/clash
structural stats -> training-throughput summary from metrics.csv.

Writes ks_tests.json + report.json next to this script (committed artifacts;
the trained weights stay out of git -- see .gitignore).

Usage: python analysis/synthetic_24k/evaluate.py [--nsample-lengths 10]
"""
import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    parser = argparse.ArgumentParser(usage=__doc__)
    parser.add_argument("--results", default=os.path.join(HERE, "results"))
    parser.add_argument("--n", type=int, default=10, help="samples per length")
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--n-pdb", type=int, default=128,
                        help="how many sampled structures to write as PDBs for "
                        "structural stats")
    parser.add_argument("--method", choices=["ddpm", "ddim", "dpmpp"], default="ddpm",
                        help="ddpm = reference-parity ancestral sampling; ddim/"
                        "dpmpp = the accelerated samplers (quality evidence "
                        "for the speedups; --ddim-steps sets both)")
    parser.add_argument("--ddim-steps", type=int, default=50)
    parser.add_argument("--ddim-eta", type=float, default=0.0)
    parser.add_argument("--noise-scale", type=str, default="",
                        help="per-feature DDPM sampling temperature, 6 comma-"
                        "separated floats (see sampling.p_sample_step); "
                        "artifacts get a _cal suffix")
    parser.add_argument("--best-by", choices=["valid", "train", "swa"],
                        default="valid",
                        help="which checkpoint family to load (swa = the "
                        "tail-averaged weights saved by TrainConfig.use_swa)")
    parser.add_argument("--suffix", default="",
                        help="extra artifact-name suffix (e.g. _seed7 for a "
                        "training-seed robustness run evaluated from its own "
                        "--results dir)")
    args = parser.parse_args()
    from foldingdiff_tpu.utils_platform import maybe_force_cpu

    maybe_force_cpu()  # honor an inherited JAX_PLATFORMS=cpu
    # Persistent compile cache (same knob as bench.py): this script is run
    # several times per study (ddpm + dpmpp at multiple step counts) and the
    # sampler chunk shapes are identical across runs
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    # DDIM/SWA results go to suffixed artifacts so the reference-parity DDPM
    # artifacts are never clobbered
    suffix = "" if args.method == "ddpm" else (
        f"_{args.method}{args.ddim_steps}"
        + (f"_eta{args.ddim_eta:g}" if args.ddim_eta else "")
    )
    if args.best_by != "valid":
        suffix += f"_{args.best_by}"
    noise_scale = 1.0
    if args.noise_scale:
        noise_scale = np.array([float(v) for v in args.noise_scale.split(",")])
        assert noise_scale.shape == (6,)
        suffix += "_cal"
    suffix += args.suffix

    import pandas as pd

    from foldingdiff_tpu.diffusion import sampling as samp
    from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
    from foldingdiff_tpu.geometry.featurize import EXHAUSTIVE_ANGLES, create_new_chain_nerf
    from foldingdiff_tpu.metrics.clashes import count_clashes
    from foldingdiff_tpu.metrics.ss import count_structures_in_pdb
    from foldingdiff_tpu.models import io as model_io
    from foldingdiff_tpu.training.orchestration import get_train_valid_test_sets

    model, params, constants, train_args = model_io.from_dir(
        args.results, best_by=args.best_by
    )
    sched = DiffusionSchedule.create(
        train_args["variance_schedule"], train_args["timesteps"]
    )
    mean_offset = np.load(os.path.join(args.results, "training_mean_offset.npy"))

    import time

    t0 = time.time()
    sampled = samp.sample(
        model, params, constants, sched,
        is_angular=[True] * 6, pad=int(train_args["max_seq_len"]),
        n=args.n, sweep_lengths=(50, 128), batch_size=args.batch,
        mean_offset=mean_offset, seed=31,
        method=args.method, ddim_steps=args.ddim_steps, ddim_eta=args.ddim_eta,
        noise_scale=noise_scale,
    )
    sample_sec = time.time() - t0
    print(f"sampled {len(sampled)} structures in {sample_sec:.1f}s")

    # Held-out comparison: the TEST split of the same corpus (the split logic
    # reproduces training's seed-6489 80/10/10 shuffle)
    train_ds, _, test_ds = get_train_valid_test_sets(
        dataset_key=train_args["dataset_key"],
        angles_definitions=train_args["angles_definitions"],
        max_seq_len=int(train_args["max_seq_len"]),
        min_seq_len=int(train_args["min_seq_len"]),
        seq_trim_strategy=train_args["trim_strategy"],
    )
    rows = []
    for i in range(len(test_ds)):
        item = test_ds.__getitem__(i, ignore_zero_center=True)
        rows.append(item["angles"][: int(item["lengths"])])
    test_angles = np.concatenate(rows)
    gen_angles = np.concatenate(sampled)

    from foldingdiff_tpu.metrics.kl import ks_feature_tests

    ks = ks_feature_tests(gen_angles, test_angles, EXHAUSTIVE_ANGLES)
    with open(os.path.join(HERE, f"ks_tests{suffix}.json"), "w") as f:
        json.dump(ks, f, indent=2)
    print(json.dumps(ks, indent=2))

    # Structural stats on a subset written to PDB
    gen_dir = os.path.join(args.results, f"sampled_pdb{suffix}")
    os.makedirs(gen_dir, exist_ok=True)
    ss_counts, clash_counts = [], []
    for i, s in enumerate(sampled[: args.n_pdb]):
        out = create_new_chain_nerf(
            os.path.join(gen_dir, f"gen_{i}.pdb"),
            pd.DataFrame(s, columns=EXHAUSTIVE_ANGLES),
        )
        if out:
            ss = count_structures_in_pdb(out)
            if ss != (-1, -1):  # annotation-failure sentinel, like bin/annot_secondary_structures.py
                ss_counts.append(ss)
            clash_counts.append(count_clashes(out))
    alpha = [a for a, _ in ss_counts]
    beta = [b for _, b in ss_counts]

    # Corpus shape facts: how much of the data the per-epoch randomcrop
    # augmentation actually touches (the whole point of this run)
    train_files = open(os.path.join(args.results, "train_files.txt")).read().splitlines()
    corpus = {
        "n_train_structures": len(train_files),
        "n_train_over_pad": len(train_ds.over_pad_indices),
        "frac_train_over_pad": len(train_ds.over_pad_indices) / max(len(train_ds), 1),
        "pad": int(train_args["max_seq_len"]),
        "train_length_min_max": [int(min(train_ds.all_lengths)), int(max(train_ds.all_lengths))],
    }

    # Training throughput from metrics.csv
    metrics = pd.read_csv(os.path.join(args.results, "logs", "metrics.csv"))
    n_train = len(train_files)
    # ceil: the trainer keeps the ragged tail batch (drop_last=False semantics)
    steps_per_epoch = max(-(-n_train // int(train_args["batch_size"])), 1)
    med_epoch_s = float(metrics["epoch_seconds"].median())
    report = {
        "corpus": corpus,
        "train": {
            "epochs": int(metrics["epoch"].max()) + 1,
            "final_train_loss": float(metrics["train_loss"].iloc[-1]),
            "final_val_loss": float(metrics["val_loss"].iloc[-1]),
            "best_val_loss": float(metrics["val_loss"].min()),
            "median_epoch_seconds": med_epoch_s,
            "steps_per_sec": steps_per_epoch / med_epoch_s,
            "samples_per_sec": n_train / med_epoch_s,  # true examples/epoch, tail batch partial
        },
        "sampling": {
            "method": args.method + ("" if args.method == "ddpm" else f"-{args.ddim_steps}"),
            "noise_scale": ([float(v) for v in noise_scale] if args.noise_scale else 1.0),
            "n_structures": len(sampled),
            # Includes jit compiles of every chunk shape (this script builds a
            # fresh sampler); bench.py is the steady-state throughput number.
            "wall_clock_sec_incl_compile": sample_sec,
        },
        "ks_max_stat": max(v["stat"] for v in ks.values()),
        "ks_rejects_subsampled": sum(
            v["reject_subsampled"] for v in ks.values()
        ),
        "structures": {
            "n_scored": len(ss_counts),
            "mean_alpha_elements": float(np.mean(alpha)),
            "mean_beta_elements": float(np.mean(beta)),
            "frac_with_helix": float(np.mean([a > 0 for a in alpha])),
            "mean_clashes": float(np.mean(clash_counts)),
        },
    }
    with open(os.path.join(HERE, f"report{suffix}.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    # Advisory busy-host sentinel (utils_platform): a concurrently-running
    # test suite skips its contention-sensitive multihost e2e tests instead
    # of timing out while this eval holds the single host core
    from foldingdiff_tpu.utils_platform import tpu_job_lock_if_tpu

    with tpu_job_lock_if_tpu():
        main()
