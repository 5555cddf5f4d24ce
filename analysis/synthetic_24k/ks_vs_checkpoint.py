#!/usr/bin/env python
"""
KS-vs-checkpoint sweep for the 24k run (VERDICT round-4 item 2): the
epoch-320 eval rejected 2 bond-angle marginals while the full-budget
epoch-786 eval rejected psi + C:1N:1CA with a LARGER max KS -- at nearly
identical val losses (0.0640 vs 0.0642). Before concluding anything about
training budget, measure how much per-feature KS varies checkpoint to
checkpoint: sample the full manuscript protocol (780 structures, DDPM
T=1000, seed 31 -- identical to evaluate.py) at EVERY kept best-by-valid
checkpoint and compute the same KS tests + structural stats.

One compiled sampler serves all checkpoints (build_sampler params_as_arg=True
+ functools.partial), so the sweep costs ~45 s device time per checkpoint
instead of a multi-minute recompile each.

Writes ks_vs_checkpoint.json next to this script.
"""
import argparse
import functools
import glob
import json
import os
import re
import sys
import tempfile
import time

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
                        help="structures per checkpoint scored for SS/clashes")
    parser.add_argument("--families", nargs="+", default=["valid"],
                        help="checkpoint families to sweep (valid/train)")
    parser.add_argument("--extra", nargs="+", default=[],
                        help="extra checkpoint .msgpack paths to include")
    parser.add_argument("--out", default=os.path.join(HERE, "ks_vs_checkpoint.json"))
    args = parser.parse_args()

    from foldingdiff_tpu.utils_platform import maybe_force_cpu

    maybe_force_cpu()
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import pandas as pd
    from flax import serialization

    from foldingdiff_tpu.diffusion import sampling as samp
    from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
    from foldingdiff_tpu.geometry.featurize import EXHAUSTIVE_ANGLES, create_new_chain_nerf
    from foldingdiff_tpu.metrics.clashes import count_clashes
    from foldingdiff_tpu.metrics.kl import ks_feature_tests
    from foldingdiff_tpu.metrics.ss import count_structures_in_pdb
    from foldingdiff_tpu.models import io as model_io
    from foldingdiff_tpu.training.orchestration import get_train_valid_test_sets

    model, _, _, train_args = model_io.from_dir(args.results, load_weights=False)
    sched = DiffusionSchedule.create(train_args["variance_schedule"], train_args["timesteps"])
    mean_offset = np.load(os.path.join(args.results, "training_mean_offset.npy"))
    pad = int(train_args["max_seq_len"])

    # Checkpoint list: every kept .msgpack in the requested families + extras
    ckpts = []
    for fam in args.families:
        for p in sorted(
            glob.glob(os.path.join(args.results, "models", f"best_by_{fam}", "*.msgpack"))
        ):
            ckpts.append((fam, p))
    ckpts += [("extra", p) for p in args.extra]
    assert ckpts, "no checkpoints found"

    def epoch_of(path):
        m = re.search(r"epoch=(\d+)", os.path.basename(path))
        return int(m.group(1)) if m else -1

    # Test-split comparison angles (featurization cache makes this fast)
    _, _, test_ds = get_train_valid_test_sets(
        dataset_key=train_args["dataset_key"],
        angles_definitions=train_args["angles_definitions"],
        max_seq_len=pad,
        min_seq_len=int(train_args["min_seq_len"]),
        seq_trim_strategy=train_args["trim_strategy"],
    )
    rows_ = []
    for i in range(len(test_ds)):
        item = test_ds.__getitem__(i, ignore_zero_center=True)
        rows_.append(item["angles"][: int(item["lengths"])])
    test_angles = np.concatenate(rows_)

    # Val-loss lookup so each row records where it sits on the curve
    metrics = pd.read_csv(os.path.join(args.results, "logs", "metrics.csv"))
    val_by_epoch = dict(zip(metrics["epoch"], metrics["val_loss"]))

    # ONE sampler for the whole sweep: weights are a runtime argument
    first = serialization.msgpack_restore(open(ckpts[0][1], "rb").read())
    sampler = samp.build_sampler(
        model, first["params"], first["constants"], sched,
        np.asarray([True] * 6), gen_noise=True, n_ft=6, params_as_arg=True,
    )

    rows = []
    for fam, path in ckpts:
        loaded = serialization.msgpack_restore(open(path, "rb").read())
        t0 = time.time()
        sampled = samp.sample(
            model, loaded["params"], loaded["constants"], sched,
            is_angular=[True] * 6, pad=pad, n=args.n, sweep_lengths=(50, 128),
            batch_size=args.batch, mean_offset=mean_offset, seed=31,
            sampler=functools.partial(sampler, loaded["params"]),
        )
        wall = time.time() - t0
        ks = ks_feature_tests(np.concatenate(sampled), test_angles, EXHAUSTIVE_ANGLES)

        ss_counts, clash_counts = [], []
        with tempfile.TemporaryDirectory() as td:
            for i, s in enumerate(sampled[: args.n_pdb]):
                out = create_new_chain_nerf(
                    os.path.join(td, f"gen_{i}.pdb"),
                    pd.DataFrame(s, columns=EXHAUSTIVE_ANGLES),
                )
                if out:
                    ss = count_structures_in_pdb(out)
                    if ss != (-1, -1):
                        ss_counts.append(ss)
                    clash_counts.append(count_clashes(out))
        row = {
            "family": fam,
            "epoch": epoch_of(path),
            "val_loss": float(val_by_epoch.get(epoch_of(path), float("nan"))),
            "sample_wall_sec": wall,
            "ks": ks,
            "ks_max_stat": max(v["stat"] for v in ks.values()),
            "rejects_subsampled": sorted(
                k for k, v in ks.items() if v["reject_subsampled"]
            ),
            "structures": {
                "n_scored": len(clash_counts),
                "mean_clashes": float(np.mean(clash_counts)),
                "frac_with_helix": float(np.mean([a > 0 for a, _ in ss_counts])),
                "mean_alpha_elements": float(np.mean([a for a, _ in ss_counts])),
                "mean_beta_elements": float(np.mean([b for _, b in ss_counts])),
            },
        }
        rows.append(row)
        print(
            f"[{fam} epoch={row['epoch']}] val={row['val_loss']:.4f} "
            f"ks_max={row['ks_max_stat']:.3f} rejects={row['rejects_subsampled']} "
            f"clashes={row['structures']['mean_clashes']:.2f} wall={wall:.0f}s",
            flush=True,
        )

    with open(args.out, "w") as f:
        json.dump({"protocol": {"n_structures": args.n * 78, "seed": 31,
                                "method": "ddpm", "alpha": 0.01},
                   "checkpoints": rows}, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    from foldingdiff_tpu.utils_platform import tpu_job_lock_if_tpu

    with tpu_job_lock_if_tpu():
        main()
