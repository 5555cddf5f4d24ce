#!/usr/bin/env python
"""Training-seed robustness at 24k scale: compare a SECOND, independently
trained run (seed 7: fresh init + noise draws + crop schedule; identical
corpus, identical fixed-6489 data split, identical 320-epoch budget) against
the committed seed-42 epoch-320 artifacts.

Closes the loop the round-5 diagnosis left open: seed_robustness.py showed
SAMPLING-seed KS spread is small (<=0.018/feature) while the across-CHECKPOINT
spread within one run is the dominant noise source (psi 0.044->0.135,
ks_vs_checkpoint.json). This script measures the remaining axis — a whole
independent training trajectory — the analogue of retraining the reference
(bin/train.py:41-43 fixes torch seeds; the reference never varies them).

Inputs (all produced by evaluate.py):
  seed 42: ks_tests_epoch320.json / report_epoch320.json
           ks_tests_dpmpp20_epoch320.json / report_dpmpp20_epoch320.json
  seed 7:  ks_tests_seed7.json / report_seed7.json
           ks_tests_dpmpp20_seed7.json / report_dpmpp20_seed7.json
           (evaluate.py --results results_seed7 --suffix _seed7 [--method dpmpp])

Writes train_seed_robustness.json next to this script.
"""
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def _load(name):
    path = os.path.join(HERE, name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def main():
    runs = {
        "seed42": {
            "ddpm": ("ks_tests_epoch320.json", "report_epoch320.json"),
            "dpmpp20": ("ks_tests_dpmpp20_epoch320.json", "report_dpmpp20_epoch320.json"),
        },
        "seed7": {
            "ddpm": ("ks_tests_seed7.json", "report_seed7.json"),
            "dpmpp20": ("ks_tests_dpmpp20_seed7.json", "report_dpmpp20_seed7.json"),
        },
    }
    out = {"protocol": {
        "budget_epochs": 320,
        "corpus": "data/synthetic_24k (seeded, byte-identical across runs)",
        "split": "fixed seed 6489 (reference parity) — both runs share the "
                 "identical train/valid/test partition",
        "varied": "train(seed): model init, q-sample noise draws, per-epoch "
                  "randomcrop schedule, sampling keys",
    }, "methods": {}}

    for method in ("ddpm", "dpmpp20"):
        entry = {"per_feature": {}, "runs": {}}
        ks_by_run, rep_by_run = {}, {}
        for run, files in runs.items():
            ks = _load(files[method][0])
            rep = _load(files[method][1])
            if ks is None or rep is None:
                entry["runs"][run] = "MISSING — run evaluate.py first"
                continue
            ks_by_run[run] = ks
            rep_by_run[run] = rep
            entry["runs"][run] = {
                "best_val_loss": rep["train"]["best_val_loss"],
                "epochs": rep["train"]["epochs"],
                "ks_max_stat": rep["ks_max_stat"],
                "ks_rejects_subsampled": rep["ks_rejects_subsampled"],
                "mean_clashes": rep["structures"]["mean_clashes"],
                "frac_with_helix": rep["structures"]["frac_with_helix"],
                "mean_alpha_elements": rep["structures"]["mean_alpha_elements"],
                "mean_beta_elements": rep["structures"]["mean_beta_elements"],
            }
        if len(ks_by_run) == 2:
            feats = list(ks_by_run["seed42"].keys())
            deltas = []
            for ft in feats:
                s42 = ks_by_run["seed42"][ft]["stat"]
                s7 = ks_by_run["seed7"][ft]["stat"]
                deltas.append(abs(s42 - s7))
                entry["per_feature"][ft] = {
                    "stat_seed42": s42,
                    "stat_seed7": s7,
                    "abs_delta": abs(s42 - s7),
                    "reject_seed42": ks_by_run["seed42"][ft]["reject_subsampled"],
                    "reject_seed7": ks_by_run["seed7"][ft]["reject_subsampled"],
                }
            entry["max_abs_stat_delta"] = max(deltas)
            entry["reject_set_seed42"] = sorted(
                ft for ft in feats if ks_by_run["seed42"][ft]["reject_subsampled"])
            entry["reject_set_seed7"] = sorted(
                ft for ft in feats if ks_by_run["seed7"][ft]["reject_subsampled"])
        out["methods"][method] = entry

    with open(os.path.join(HERE, "train_seed_robustness.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
