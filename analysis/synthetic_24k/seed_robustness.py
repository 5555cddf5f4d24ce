#!/usr/bin/env python
"""
Sampling-seed robustness of the 24k KS marginals (round-5 follow-up to the
ks_vs_checkpoint.py sweep).

The checkpoint sweep showed the subsampled-KS rejection set flickering from
checkpoint to checkpoint (psi stat 0.044 -> 0.135 across the best-by-valid
family). Before reading that as model drift, this measures the other noise
source: the manuscript protocol itself (780 structures, seed-31 draw,
500-point KS subsample) re-drawn at several sampling seeds on ONE fixed
checkpoint (the final best-by-valid), for both the reference-parity DDPM
T=1000 sampler and the accelerated DPM++-20. If the across-seed spread of a
feature's full-sample KS stat is comparable to its across-checkpoint spread,
the flicker is protocol variance, not training dynamics.

One build_sampler per method; every seed reuses the compiled sampler (the
seed only changes device data, not the jaxpr).

Reference anchor: same 780-structure length sweep as the reference's
bin/sample.py defaults (sampling.py:135-224); KS gate identical to
evaluate.py's (metrics/kl.ks_feature_tests, alpha=0.01 on 500-pt subsamples).

Writes seed_robustness.json next to this script.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    parser = argparse.ArgumentParser(usage=__doc__)
    parser.add_argument("--results", default=os.path.join(HERE, "results"))
    parser.add_argument("--seeds", type=int, nargs="+", default=[31, 41, 51, 61, 71])
    parser.add_argument("--n", type=int, default=10)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--out", default=os.path.join(HERE, "seed_robustness.json"))
    args = parser.parse_args()

    from foldingdiff_tpu.utils_platform import maybe_force_cpu

    maybe_force_cpu()
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from foldingdiff_tpu.diffusion import sampling as samp
    from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
    from foldingdiff_tpu.geometry.featurize import EXHAUSTIVE_ANGLES
    from foldingdiff_tpu.metrics.kl import ks_feature_tests
    from foldingdiff_tpu.models import io as model_io
    from foldingdiff_tpu.training.orchestration import get_train_valid_test_sets

    model, params, constants, train_args = model_io.from_dir(args.results)
    sched = DiffusionSchedule.create(
        train_args["variance_schedule"], train_args["timesteps"]
    )
    mean_offset = np.load(os.path.join(args.results, "training_mean_offset.npy"))
    pad = int(train_args["max_seq_len"])
    n_ft = len(EXHAUSTIVE_ANGLES)

    _, _, test_ds = get_train_valid_test_sets(
        dataset_key=train_args["dataset_key"],
        angles_definitions=train_args["angles_definitions"],
        max_seq_len=pad,
        min_seq_len=int(train_args["min_seq_len"]),
        seq_trim_strategy=train_args["trim_strategy"],
    )
    rows = []
    for i in range(len(test_ds)):
        item = test_ds.__getitem__(i, ignore_zero_center=True)
        rows.append(item["angles"][: int(item["lengths"])])
    test_angles = np.concatenate(rows)

    methods = {"ddpm_1000": {}, "dpmpp_20": dict(method="dpmpp", ddim_steps=20)}
    results = {}
    for mname, kw in methods.items():
        sampler = samp.build_sampler(
            model, params, constants, sched, np.asarray([True] * n_ft),
            gen_noise=True, n_ft=n_ft, **kw,
        )
        per_seed = {}
        for seed in args.seeds:
            t0 = time.time()
            sampled = samp.sample(
                model, params, constants, sched,
                is_angular=[True] * n_ft, pad=pad, n=args.n,
                sweep_lengths=(50, 128), batch_size=args.batch,
                mean_offset=mean_offset, seed=seed, sampler=sampler, **kw,
            )
            ks = ks_feature_tests(np.concatenate(sampled), test_angles, EXHAUSTIVE_ANGLES)
            per_seed[seed] = ks
            print(f"[{mname} seed={seed}] "
                  f"stats={[round(ks[f]['stat'], 3) for f in EXHAUSTIVE_ANGLES]} "
                  f"rejects={sorted(f for f in ks if ks[f]['reject_subsampled'])} "
                  f"wall={time.time()-t0:.0f}s", flush=True)
        spread = {}
        for f in EXHAUSTIVE_ANGLES:
            stats_ = np.array([per_seed[s][f]["stat"] for s in args.seeds])
            spread[f] = {
                "stat_min": float(stats_.min()),
                "stat_max": float(stats_.max()),
                "stat_mean": float(stats_.mean()),
                "stat_range": float(stats_.max() - stats_.min()),
                "n_rejects_subsampled": int(
                    sum(per_seed[s][f]["reject_subsampled"] for s in args.seeds)
                ),
            }
        results[mname] = {"per_seed": per_seed, "spread": spread}
        print(f"[{mname}] across-seed stat ranges: "
              f"{ {f: round(spread[f]['stat_range'], 3) for f in EXHAUSTIVE_ANGLES} }",
              flush=True)

    out = {
        "protocol": {
            "checkpoint": "final best_by_valid",
            "n_structures": args.n * 78,
            "seeds": args.seeds,
            "alpha": 0.01,
            "comparison_split": "test",
        },
        "methods": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    from foldingdiff_tpu.utils_platform import tpu_job_lock_if_tpu

    with tpu_job_lock_if_tpu():
        main()
