#!/usr/bin/env python
"""
Honest checkpoint-selection + dispersion-calibration protocol for the 24k
run (VERDICT round-4 item 2, final stage).

Background (committed evidence): ks_vs_checkpoint.json shows no single
best-by-valid checkpoint passes 6/6 KS at alpha=0.01 with temperature 1.0 --
the rejection set flickers (psi passes in the epoch ~276-323 band, drifts to
stat ~0.12 late; the bond angles reject in the mid band) -- and
report_cal.json shows per-feature noise-scale calibration fixes the
bond-angle dispersion on the final checkpoint but cannot fix psi's late-
checkpoint shape drift. The combination (mid-band checkpoint + calibrated
bond angles) is the obvious candidate, but picking both knobs on the test
split would be selection bias. This script does it honestly:

  Stage 1 (VALIDATION split, selection seed): sample the full 780-structure
    protocol at every best-by-valid checkpoint, KS vs the VALIDATION split,
    and fit per-feature gamma = valid_core_std / gen_core_std (the IQR-based
    robust std of dispersion_check.py). Select the checkpoint with the
    fewest subsampled rejects, ties by smallest max KS stat.
  Stage 2 (VALIDATION split, selection seed): on the selected checkpoint,
    evaluate two calibrations -- the full gamma vector, and gamma restricted
    to the features that rejected in stage 1 (others pinned to 1.0). Keep
    whichever has fewer rejects (ties: smaller max stat; both compared
    against the uncalibrated stage-1 row).
  Stage 3 (TEST split, manuscript seed 31): one final run with the selected
    checkpoint + selected calibration; KS vs TEST + full structural scoring
    of all 780 backbones. Nothing about the test split influenced any choice.

One compiled sampler serves every (checkpoint, gamma) pair via
build_sampler(params_as_arg=True, noise_scale_as_arg=True) -- the sweep
costs ~45 s device time per row instead of a multi-minute recompile.

Reference anchor: the manuscript protocol this calibrates is the reference's
780-structure length sweep (bin/sample.py defaults; sampling.py:135-224);
the KS-vs-test comparison mirrors its Fig. 2 marginal tests.

Writes calibrated_protocol.json (all stages), ks_tests_final.json,
report_final.json, and results/sampled_pdb_final/ next to the other
artifacts.
"""
import argparse
import functools
import glob
import json
import os
import re
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
HERE = os.path.dirname(os.path.abspath(__file__))


def core_std(x):
    """IQR-based robust std (dispersion_check.py's estimator)."""
    x = x[~np.isnan(x)]
    return float(np.subtract(*np.percentile(x, [75, 25])) / 1.349)


def split_angles(ds):
    rows = []
    for i in range(len(ds)):
        item = ds.__getitem__(i, ignore_zero_center=True)
        rows.append(item["angles"][: int(item["lengths"])])
    return np.concatenate(rows)


def ks_row(ks):
    return {
        "ks_max_stat": max(v["stat"] for v in ks.values()),
        "rejects_subsampled": sorted(k for k, v in ks.items() if v["reject_subsampled"]),
    }


def main():
    parser = argparse.ArgumentParser(usage=__doc__)
    parser.add_argument("--results", default=os.path.join(HERE, "results"))
    parser.add_argument("--n", type=int, default=10, help="samples per length")
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--selection-seed", type=int, default=41,
                        help="sampling seed for stages 1-2 (distinct from the "
                        "manuscript seed so stage 3 is a fresh draw)")
    parser.add_argument("--final-seed", type=int, default=31)
    parser.add_argument("--gamma-clip", type=float, nargs=2, default=(0.8, 1.5))
    parser.add_argument("--sweep-lengths", type=int, nargs=2, default=(50, 128),
                        help="[lo, hi) generated-length sweep (manuscript: 50 128)")
    parser.add_argument("--out", default=os.path.join(HERE, "calibrated_protocol.json"))
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
    n_ft = len(EXHAUSTIVE_ANGLES)

    _, valid_ds, test_ds = get_train_valid_test_sets(
        dataset_key=train_args["dataset_key"],
        angles_definitions=train_args["angles_definitions"],
        max_seq_len=pad,
        min_seq_len=int(train_args["min_seq_len"]),
        seq_trim_strategy=train_args["trim_strategy"],
    )
    valid_angles = split_angles(valid_ds)
    test_angles = split_angles(test_ds)

    ckpts = sorted(
        glob.glob(os.path.join(args.results, "models", "best_by_valid", "*.msgpack")),
        key=lambda p: int(re.search(r"epoch=(\d+)", p).group(1)),
    )
    assert ckpts, "no best_by_valid checkpoints found"

    first = serialization.msgpack_restore(open(ckpts[0], "rb").read())
    sampler = samp.build_sampler(
        model, first["params"], first["constants"], sched,
        np.asarray([True] * n_ft), gen_noise=True, n_ft=n_ft,
        params_as_arg=True, noise_scale_as_arg=True,
    )
    ones = np.ones(n_ft)

    def run(params, gamma, seed):
        t0 = time.time()
        sampled = samp.sample(
            model, params, first["constants"], sched,
            is_angular=[True] * n_ft, pad=pad, n=args.n, sweep_lengths=(50, 128),
            batch_size=args.batch, mean_offset=mean_offset, seed=seed,
            sampler=functools.partial(sampler, params, np.asarray(gamma, dtype=np.float32)),
        )
        return sampled, time.time() - t0

    # ---- Stage 1: per-checkpoint validation KS + gamma fit -----------------
    stage1 = []
    for path in ckpts:
        epoch = int(re.search(r"epoch=(\d+)", path).group(1))
        loaded = serialization.msgpack_restore(open(path, "rb").read())
        sampled, wall = run(loaded["params"], ones, args.selection_seed)
        gen = np.concatenate(sampled)
        ks = ks_feature_tests(gen, valid_angles, EXHAUSTIVE_ANGLES)
        gamma = [
            float(np.clip(core_std(valid_angles[:, j]) / max(core_std(gen[:, j]), 1e-9),
                          *args.gamma_clip))
            for j in range(n_ft)
        ]
        row = {"epoch": epoch, "path": path, "wall_sec": wall,
               "gamma_fit": gamma, "ks_valid": ks, **ks_row(ks)}
        stage1.append(row)
        print(f"[stage1 epoch={epoch}] ks_max={row['ks_max_stat']:.3f} "
              f"rejects={row['rejects_subsampled']} gamma={np.round(gamma, 3).tolist()} "
              f"wall={wall:.0f}s", flush=True)

    best = min(stage1, key=lambda r: (len(r["rejects_subsampled"]), r["ks_max_stat"]))
    print(f"selected epoch={best['epoch']} "
          f"(rejects={best['rejects_subsampled']}, ks_max={best['ks_max_stat']:.3f})",
          flush=True)
    sel = serialization.msgpack_restore(open(best["path"], "rb").read())

    # ---- Stage 2: pick the calibration on the validation split -------------
    gamma_full = np.asarray(best["gamma_fit"])
    gamma_rej = np.where(
        np.isin(EXHAUSTIVE_ANGLES, best["rejects_subsampled"]), gamma_full, 1.0
    )
    candidates = {"uncalibrated": ones, "gamma_full": gamma_full,
                  "gamma_rejects_only": gamma_rej}
    stage2 = {}
    for name, g in candidates.items():
        if name == "uncalibrated":
            ks = best["ks_valid"]  # stage-1 row, same seed/gamma -- reuse
            wall = 0.0
        else:
            sampled, wall = run(sel["params"], g, args.selection_seed)
            ks = ks_feature_tests(np.concatenate(sampled), valid_angles, EXHAUSTIVE_ANGLES)
        stage2[name] = {"gamma": np.asarray(g).tolist(), "wall_sec": wall,
                        "ks_valid": ks, **ks_row(ks)}
        print(f"[stage2 {name}] ks_max={stage2[name]['ks_max_stat']:.3f} "
              f"rejects={stage2[name]['rejects_subsampled']}", flush=True)

    chosen_name = min(
        stage2, key=lambda k: (len(stage2[k]["rejects_subsampled"]), stage2[k]["ks_max_stat"])
    )
    chosen_gamma = np.asarray(stage2[chosen_name]["gamma"])
    print(f"selected calibration: {chosen_name} gamma={np.round(chosen_gamma, 3).tolist()}",
          flush=True)

    # ---- Stage 3: final run, TEST split, manuscript seed --------------------
    sampled, wall = run(sel["params"], chosen_gamma, args.final_seed)
    ks_final = ks_feature_tests(np.concatenate(sampled), test_angles, EXHAUSTIVE_ANGLES)
    with open(os.path.join(HERE, "ks_tests_final.json"), "w") as f:
        json.dump(ks_final, f, indent=2)

    gen_dir = os.path.join(args.results, "sampled_pdb_final")
    os.makedirs(gen_dir, exist_ok=True)
    ss_counts, clash_counts = [], []
    for i, s in enumerate(sampled):
        out = create_new_chain_nerf(
            os.path.join(gen_dir, f"gen_{i}.pdb"),
            pd.DataFrame(s, columns=EXHAUSTIVE_ANGLES),
        )
        if out:
            ss = count_structures_in_pdb(out)
            if ss != (-1, -1):
                ss_counts.append(ss)
            clash_counts.append(count_clashes(out))
    structures = {
        "n_scored": len(clash_counts),
        "mean_clashes": float(np.mean(clash_counts)),
        "frac_with_helix": float(np.mean([a > 0 for a, _ in ss_counts])),
        "mean_alpha_elements": float(np.mean([a for a, _ in ss_counts])),
        "mean_beta_elements": float(np.mean([b for _, b in ss_counts])),
    }

    report = {
        "protocol": {
            "n_structures": args.n * 78, "method": "ddpm",
            "selection_seed": args.selection_seed, "final_seed": args.final_seed,
            "selection_split": "valid", "report_split": "test", "alpha": 0.01,
        },
        "selected": {"epoch": best["epoch"], "calibration": chosen_name,
                     "gamma": chosen_gamma.tolist()},
        "sampling": {"wall_clock_sec_incl_compile": wall, "n_structures": args.n * 78},
        "ks_test": {k: v for k, v in ks_final.items()},
        **ks_row(ks_final),
        "structures": structures,
    }
    with open(os.path.join(HERE, "report_final.json"), "w") as f:
        json.dump(report, f, indent=2)
    with open(args.out, "w") as f:
        json.dump({"stage1": stage1, "stage2": stage2, "final": report}, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    from foldingdiff_tpu.utils_platform import tpu_job_lock_if_tpu

    with tpu_job_lock_if_tpu():
        main()
