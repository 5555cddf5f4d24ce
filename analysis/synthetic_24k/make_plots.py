#!/usr/bin/env python
"""
Committed, human-inspectable plots for the CATH-scale 24k synthetic run (VERDICT
round-3 item 2): loss curves, Ramachandran, per-feature distribution/CDF
overlap vs the held-out test split, SS co-occurrence, and struct_vis renders
of generated backbones -- the reference's bin/sample.py:400-469 +
plotting.py:93-143 outputs, produced from the existing flagship artifacts.

Everything except --traj-gif is host-CPU only (re-featurizes the committed
sampled PDBs); --traj-gif additionally runs one DDIM-history sample on the
device to animate a denoising trajectory.

Usage: python analysis/synthetic_24k/make_plots.py [--traj-gif]
Outputs: analysis/synthetic_24k/plots/*.png|gif (committed to git).
"""
import argparse
import glob
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
    parser.add_argument("--outdir", default=os.path.join(HERE, "plots"))
    parser.add_argument("--n-render", type=int, default=3)
    parser.add_argument("--traj-gif", action="store_true",
                        help="sample one DDIM denoising trajectory on the "
                        "device and animate it (compiles a small scan)")
    args = parser.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    from foldingdiff_tpu.geometry.featurize import (
        EXHAUSTIVE_ANGLES,
        canonical_distances_and_dihedrals,
    )
    from foldingdiff_tpu.metrics import plotting as plots
    from foldingdiff_tpu.metrics.ss import count_structures_parallel
    from foldingdiff_tpu.metrics.struct_vis import pdb2png
    from foldingdiff_tpu.training.orchestration import get_train_valid_test_sets

    # 1. Loss curves from the training metrics CSV
    out = plots.plot_losses(
        os.path.join(args.results, "logs", "metrics.csv"),
        os.path.join(args.outdir, "losses.png"),
    )
    print(f"wrote {out}")

    # 1b. Training-set novelty: histogram of each sample's max TM-score
    # against the full training set (reference jupyter/training_tm;
    # bin/tmscore_training.py writes tm_scores.json)
    tm_json = next(
        (p for p in (os.path.join(HERE, "tm_scores.json"),
                     os.path.join(args.results, "sampled_pdb", "tm_scores.json"))
         if os.path.isfile(p)), None)
    if tm_json:
        import matplotlib
        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        with open(tm_json) as f:
            # novelty_sweep.py adds a "__coverage__" resume sentinel
            tm_vals = np.array(
                [v for k, v in json.load(f).items() if not k.startswith("__")]
            )
        fig, ax = plt.subplots(dpi=300, figsize=(5.2, 3.2))
        ax.hist(tm_vals, bins=24, range=(0.0, 1.0), color="#4c72b0", edgecolor="white")
        ax.axvline(0.5, color="0.35", lw=1.2, ls="--")
        ax.text(0.505, 0.97, "same-fold cutoff (TM=0.5)", transform=ax.get_xaxis_transform(),
                fontsize=7, color="0.35", va="top")
        ax.set(xlabel="max TM-score vs training set", ylabel="generated structures",
               title=f"Training-set novelty of {len(tm_vals)} samples "
                     f"(median {np.median(tm_vals):.2f}, max {tm_vals.max():.2f})")
        ax.spines[["top", "right"]].set_visible(False)
        out = os.path.join(args.outdir, "training_tm_novelty.png")
        fig.savefig(out, bbox_inches="tight")
        plt.close(fig)
        print(f"wrote {out}")

    # 2. Angles of the generated structures (re-featurized from the sampled
    # PDBs, so these plots reflect exactly what was written to disk)
    def featurize_pdb_dir(pdb_dir):
        """Re-featurize every PDB in a directory -> stacked (N, 6) angles, or
        None if the dir is empty (shared by the DDPM plots and the sampler-
        comparison panel so all curves use identical featurization)."""
        rows = []
        for f in sorted(glob.glob(os.path.join(pdb_dir, "*.pdb"))):
            df = canonical_distances_and_dihedrals(f, distances=[], angles=EXHAUSTIVE_ANGLES)
            if df is not None:
                rows.append(df.values)
        return np.concatenate(rows) if rows else None

    sampled_pdbs = sorted(glob.glob(os.path.join(args.results, "sampled_pdb", "*.pdb")))
    assert sampled_pdbs, f"no sampled PDBs under {args.results}"
    gen_angles = featurize_pdb_dir(os.path.join(args.results, "sampled_pdb"))
    print(f"featurized {len(sampled_pdbs)} generated structures -> {len(gen_angles)} residues")

    # Held-out test split of the training corpus (same seed-6489 split)
    with open(os.path.join(args.results, "training_args.json")) as f:
        train_args = json.load(f)
    train_ds, _, test_ds = get_train_valid_test_sets(
        dataset_key=train_args["dataset_key"],
        angles_definitions=train_args["angles_definitions"],
        max_seq_len=int(train_args["max_seq_len"]),
        min_seq_len=int(train_args["min_seq_len"]),
        seq_trim_strategy=train_args["trim_strategy"],
    )
    test_rows = []
    for i in range(len(test_ds)):
        item = test_ds.__getitem__(i, ignore_zero_center=True)
        test_rows.append(np.asarray(item["angles"][: int(item["lengths"])]))
    test_angles = np.concatenate(test_rows)

    # 2b. Corpus length distribution vs the pad-128 training window: every
    # structure right of the dashed line gets a FRESH random 128-residue crop
    # each epoch (the augmentation this run exists to exercise; reference
    # datasets.py:411-438)
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    lengths = np.asarray(train_ds.all_lengths)
    pad = int(train_args["max_seq_len"])
    fig, ax = plt.subplots(dpi=300, figsize=(5.2, 3.2))
    ax.hist(lengths, bins=60, color="#4c72b0", edgecolor="white", lw=0.3)
    ax.axvline(pad, color="0.2", lw=1.2, ls="--")
    frac_over = float(np.mean(lengths > pad))
    ax.text(pad + 6, 0.95, f"pad={pad}; {frac_over:.0%} of training split\n"
            "re-cropped every epoch (randomcrop)", transform=ax.get_xaxis_transform(),
            fontsize=7, color="0.2", va="top")
    ax.set(xlabel="structure length (residues)", ylabel="training structures",
           title=f"Training-split length distribution, 24k corpus "
                 f"(median {int(np.median(lengths))})")
    ax.spines[["top", "right"]].set_visible(False)
    out = os.path.join(args.outdir, "corpus_length_distribution.png")
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)
    print(f"wrote {out}")

    # 3. Ramachandran: generated vs test split
    phi_i, psi_i = EXHAUSTIVE_ANGLES.index("phi"), EXHAUSTIVE_ANGLES.index("psi")

    def _finite_pairs(arr):
        phi, psi = arr[:, phi_i], arr[:, psi_i]
        ok = np.isfinite(phi) & np.isfinite(psi)
        return phi[ok], psi[ok]

    out = plots.plot_ramachandran(
        *_finite_pairs(gen_angles),
        os.path.join(args.outdir, "ramachandran_generated.png"),
        annot_ss=True, title="Ramachandran: generated (DDPM, 780-sweep subset)",
    )
    print(f"wrote {out}")
    out = plots.plot_ramachandran(
        *_finite_pairs(test_angles),
        os.path.join(args.outdir, "ramachandran_test.png"),
        annot_ss=True, title="Ramachandran: held-out test split",
    )
    print(f"wrote {out}")

    # 4. Per-feature distribution + CDF overlap
    values = {"test split": test_angles, "generated": gen_angles}
    out = plots.plot_distribution_overlap(
        values, os.path.join(args.outdir, "dist_overlap.png"), EXHAUSTIVE_ANGLES,
        title="Angle marginals: generated vs test",
    )
    print(f"wrote {out}")
    out = plots.plot_distribution_overlap(
        values, os.path.join(args.outdir, "dist_overlap_cdf.png"), EXHAUSTIVE_ANGLES,
        cumulative=True, title="Angle CDFs: generated vs test",
    )
    print(f"wrote {out}")

    # 4b. Sampler comparison: marginal CDFs of every accelerated sampler's
    # sweep that has a sampled_pdb_<suffix> dir, overlaid on DDPM + test
    # (the quality table in analysis/README.md, as a picture)
    sampler_values = {"test split": test_angles, "DDPM-1000": gen_angles}
    for suffix, label in [("ddim50", "DDIM-50"), ("dpmpp20", "DPM++-20")]:
        angles = featurize_pdb_dir(os.path.join(args.results, f"sampled_pdb_{suffix}"))
        if angles is not None:
            sampler_values[label] = angles
    if len(sampler_values) > 2:
        out = plots.plot_distribution_overlap(
            sampler_values, os.path.join(args.outdir, "sampler_comparison_cdf.png"),
            EXHAUSTIVE_ANGLES, cumulative=True,
            title="Angle CDFs by sampler vs test split",
        )
        print(f"wrote {out}")

    # 5. SS co-occurrence: generated + test structures
    ss_gen = [s for s in count_structures_parallel(sampled_pdbs) if s != (-1, -1)]
    out = plots.plot_ss_cooccurrence(
        [a for a, _ in ss_gen], [b for _, b in ss_gen],
        os.path.join(args.outdir, "ss_cooccurrence_generated.png"),
        title=f"SS co-occurrence: {len(ss_gen)} generated",
    )
    print(f"wrote {out}")
    test_files = open(os.path.join(args.results, "test_files.txt")).read().splitlines()
    ss_test = [s for s in count_structures_parallel(test_files) if s != (-1, -1)]
    out = plots.plot_ss_cooccurrence(
        [a for a, _ in ss_test], [b for _, b in ss_test],
        os.path.join(args.outdir, "ss_cooccurrence_test.png"),
        title=f"SS co-occurrence: {len(ss_test)} test structures",
    )
    print(f"wrote {out}")

    # 6. Static 3D renders of a few generated backbones
    for i, f in enumerate(sampled_pdbs[: args.n_render]):
        out = pdb2png(
            f, os.path.join(args.outdir, f"render_generated_{i}.png"),
            title=os.path.basename(f),
        )
        print(f"wrote {out}")

    # 7. Optional: denoising-trajectory GIF (DDIM-50 history, one structure)
    if args.traj_gif:
        import tempfile

        import pandas as pd

        from foldingdiff_tpu.diffusion import sampling as samp
        from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
        from foldingdiff_tpu.geometry.featurize import create_new_chain_nerf
        from foldingdiff_tpu.metrics.struct_vis import pdb2gif
        from foldingdiff_tpu.models import io as model_io

        model, params, constants, targs = model_io.from_dir(args.results)
        sched = DiffusionSchedule.create(
            targs["variance_schedule"], targs["timesteps"]
        )
        mean_offset = np.load(os.path.join(args.results, "training_mean_offset.npy"))
        hist = samp.sample(
            model, params, constants, sched,
            is_angular=[True] * 6, pad=int(targs["max_seq_len"]),
            n=1, sweep_lengths=None, lengths=[64], batch_size=1,
            mean_offset=mean_offset, seed=17, return_history=True,
            method="ddim", ddim_steps=50,
        )[0]  # (50, 64, 6)
        with tempfile.TemporaryDirectory() as td:
            frames = []
            for t in range(hist.shape[0]):
                f = os.path.join(td, f"frame_{t:03d}.pdb")
                if create_new_chain_nerf(
                    f, pd.DataFrame(hist[t], columns=EXHAUSTIVE_ANGLES)
                ):
                    frames.append(f)
            out = pdb2gif(
                frames, os.path.join(args.outdir, "denoising_trajectory.gif"),
                duration_ms=120,
            )
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
