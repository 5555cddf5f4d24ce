#!/usr/bin/env python
"""
Evaluation of the raw-coordinates ablation (the reference paper's key design
argument: diffusing internal angles beats diffusing cartesian coordinates --
reference config_jsons/cath_raw_coordinates.json trained via bin/train.py,
discussed in the paper's ablation section).

Pipeline: load analysis/cart_ablation/results (a cart-coords diffusion model
trained on the same synthetic 2k corpus as the flagship angle model) ->
sample CA coordinate sets -> compute CA-trace geometry features
(adjacent CA-CA distance, CA pseudo bond angle, CA pseudo dihedral) for
(a) cart-model samples, (b) the flagship angle model's samples, and (c) the
held-out test split -> KS tests + bond-geometry validity fractions.

The angle model builds chains through NeRF, so its local geometry is valid by
construction; the cart model must LEARN the 3.8 A CA spacing from data --
the paper's point is that it does not. Writes report.json + ks_tests.json
next to this script (committed artifacts; weights stay out of git).

Usage: python analysis/cart_ablation/evaluate.py [-n 2]
"""
import argparse
import json
import os
import sys
import time
from glob import glob

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
HERE = os.path.dirname(os.path.abspath(__file__))

CA_FEATURES = ["ca_dist", "ca_angle", "ca_dihedral"]
# Real backbones space consecutive CA atoms at ~3.8 A (trans peptide)
BOND_OK_RANGE = (3.65, 3.95)


def ca_geometry(coords: np.ndarray) -> dict:
    """CA-trace features for one (L, 3) chain: adjacent distances (L-1),
    pseudo bond angles (L-2, radians), pseudo dihedrals (L-3, radians)."""
    coords = np.asarray(coords, dtype=np.float64)
    v = np.diff(coords, axis=0)
    d = np.linalg.norm(v, axis=1)
    # angle at atom i between bonds (i-1->i) and (i->i+1)
    u1, u2 = v[:-1], v[1:]
    cosang = np.sum(u1 * u2, axis=1) / np.clip(
        np.linalg.norm(u1, axis=1) * np.linalg.norm(u2, axis=1), 1e-9, None
    )
    theta = np.pi - np.arccos(np.clip(cosang, -1.0, 1.0))
    # pseudo dihedral over 4 consecutive CAs
    b0, b1, b2 = v[:-2], v[1:-1], v[2:]
    n1 = np.cross(b0, b1)
    n2 = np.cross(b1, b2)
    m1 = np.cross(n1, b1 / np.clip(np.linalg.norm(b1, axis=1, keepdims=True), 1e-9, None))
    x = np.sum(n1 * n2, axis=1)
    y = np.sum(m1 * n2, axis=1)
    dih = np.arctan2(y, x)
    return {"ca_dist": d, "ca_angle": theta, "ca_dihedral": dih}


def pool_features(chains) -> dict:
    feats = {k: [] for k in CA_FEATURES}
    for c in chains:
        if len(c) < 4:
            continue
        g = ca_geometry(c)
        for k in CA_FEATURES:
            feats[k].append(g[k])
    return {k: np.concatenate(v) for k, v in feats.items()}


def ks_by_feature(gen: dict, ref: dict) -> dict:
    from foldingdiff_tpu.metrics.kl import ks_feature_tests

    out = {}
    for k in CA_FEATURES:
        out[k] = ks_feature_tests(gen[k][:, None], ref[k][:, None], [k])[k]
    return out


def summarize(feats: dict) -> dict:
    d = feats["ca_dist"]
    lo, hi = BOND_OK_RANGE
    return {
        "n_bonds": int(len(d)),
        "ca_dist_mean": float(np.mean(d)),
        "ca_dist_std": float(np.std(d)),
        "frac_bond_ok": float(np.mean((d >= lo) & (d <= hi))),
    }


def main():
    parser = argparse.ArgumentParser(usage=__doc__)
    parser.add_argument("--results", default=os.path.join(HERE, "results"))
    parser.add_argument("-n", "--num", type=int, default=2, help="samples per length")
    parser.add_argument("--seed", type=int, default=31)
    parser.add_argument(
        "--flagship-pdbs",
        default=os.path.join(REPO, "analysis", "synthetic_flagship", "results", "sampled_pdb"),
    )
    args = parser.parse_args()

    import pandas as pd

    from foldingdiff_tpu.data import datasets as dsets
    from foldingdiff_tpu.diffusion.sampling import sample_simple
    from foldingdiff_tpu.geometry.pdb import extract_backbone_coords, write_ca_trace_to_pdb

    with open(os.path.join(args.results, "training_args.json")) as f:
        train_args = json.load(f)
    assert train_args["angles_definitions"] == "cart-coords"

    t0 = time.time()
    dfs = sample_simple(args.results, n=args.num, sweep_lengths=(50, 128), seed=args.seed)
    sample_sec = time.time() - t0
    print(f"Sampled {len(dfs)} CA coordinate sets in {sample_sec:.1f}s")

    gen_dir = os.path.join(args.results, "sampled_pdb")
    os.makedirs(gen_dir, exist_ok=True)
    gen_chains = []
    for i, df in enumerate(dfs):
        ca = df[["x", "y", "z"]].values
        gen_chains.append(ca)
        # write_ca_trace_to_pdb recenters and guards PDB column width itself
        try:
            write_ca_trace_to_pdb(ca, os.path.join(gen_dir, f"generated_{i}.pdb"))
        except ValueError:
            pass  # drifted coord model; skip rather than emit garbage

    # Held-out test split, un-centered CA coords
    ds = dsets.DATASET_CLASSES["cart-coords"](
        pdbs=train_args["dataset_key"], split="test",
        pad=int(train_args["max_seq_len"]),
        min_length=int(train_args.get("min_seq_len", 0)),
        trim_strategy=train_args.get("trim_strategy", "leftalign"),
        zero_center=False,
    )
    test_chains = []
    for i in range(len(ds)):
        item = ds.__getitem__(i, ignore_zero_center=True)
        test_chains.append(item["coords"][: int(item["lengths"])])

    # The flagship ANGLE model's samples, via their NeRF-built PDBs
    flagship_chains = []
    for f in sorted(glob(os.path.join(args.flagship_pdbs, "*.pdb"))):
        ca = extract_backbone_coords(f, atoms=["CA"])
        if ca is not None:
            flagship_chains.append(ca)

    gen_f = pool_features(gen_chains)
    test_f = pool_features(test_chains)
    report = {
        "train": {},
        "sampling": {
            "n_structures": len(gen_chains),
            "wall_clock_sec_incl_compile": sample_sec,
        },
        "cart_model": summarize(gen_f),
        "test_split": summarize(test_f),
        "ks_cart_vs_test": ks_by_feature(gen_f, test_f),
    }
    if flagship_chains:
        flag_f = pool_features(flagship_chains)
        report["flagship_angle_model"] = summarize(flag_f)
        report["ks_flagship_vs_test"] = ks_by_feature(flag_f, test_f)

    metrics_csv = os.path.join(args.results, "logs", "metrics.csv")
    if os.path.isfile(metrics_csv):
        metrics = pd.read_csv(metrics_csv)
        report["train"] = {
            "epochs": int(metrics["epoch"].max()) + 1,
            "final_train_loss": float(metrics["train_loss"].iloc[-1]),
            "final_val_loss": float(metrics["val_loss"].iloc[-1]),
            "best_val_loss": float(metrics["val_loss"].min()),
            "median_epoch_seconds": float(metrics["epoch_seconds"].median()),
        }

    with open(os.path.join(HERE, "ks_tests.json"), "w") as f:
        json.dump(report["ks_cart_vs_test"], f, indent=2)
    with open(os.path.join(HERE, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
