#!/usr/bin/env python
"""
Sampling CLI: load a trained model dir, sweep lengths, write angle CSVs + PDB
files + distribution plots.

Mirrors reference bin/sample.py (237-287): -m model dir, -n per-length count,
-l length sweep, -b batch size, --fullhistory, --seed. Outputs:
  sampled_angles/*.csv.gz   per-structure final angles
  sampled_pdb/*.pdb         NeRF-reconstructed backbones
  plots/*.pdf               Ramachandran + distributions + SS co-occurrence
  model_snapshot/           minimal copy of the model artifacts

Usage: python bin/sample.py -m results -l 50 128 -n 10 -b 512 -o sampled
"""
import argparse
import json
import logging
import multiprocessing as mp
import os
import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("-m", "--model", type=str, required=True, help="model directory")
    parser.add_argument("-o", "--outdir", type=str, default="./sampled", help="output dir")
    parser.add_argument("-n", "--num", type=int, default=10, help="samples per length")
    parser.add_argument(
        "-l", "--lengths", type=int, nargs=2, default=[50, 128], help="length sweep [min max)"
    )
    parser.add_argument("-b", "--batchsize", type=int, default=512)
    parser.add_argument("--seed", type=int, default=int("0x1234", 16))
    parser.add_argument(
        "--method", type=str, default="ddpm", choices=["ddpm", "ddim", "dpmpp"],
        help="ddpm = reference-parity ancestral; ddim = accelerated; "
             "dpmpp = DPM-Solver++(2M), fewest steps (--ddim_steps sets both)",
    )
    parser.add_argument("--ddim_steps", type=int, default=50)
    parser.add_argument("--ddim_eta", type=float, default=0.0)
    parser.add_argument(
        "--noise-scale", type=str, default="",
        help="DDPM posterior-noise temperature: one float, or comma-separated "
             "per-feature floats (calibrates marginal dispersion -- fit with "
             "analysis/synthetic_24k/dispersion_check.py). DDPM only.",
    )
    parser.add_argument("--fullhistory", action="store_true", help="write per-timestep angles")
    parser.add_argument("--nopdb", action="store_true", help="skip PDB writing")
    parser.add_argument("--noplot", action="store_true", help="skip plots")
    parser.add_argument(
        "--testcomparison", type=str, default="",
        help="PDB dir: overlay generated vs test-split angle distributions",
    )
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--profile", type=str, default="",
                        help="write a JAX profiler trace (xplane) to this dir")
    return parser


def write_preds_pdb_folder(sampled_dfs, pdb_dir: str, threads: int = 0) -> list:
    """Write each sampled angle table to a PDB via NeRF (reference
    bin/sample.py:105-128). Cart-coords tables (x/y/z columns) skip NeRF and
    write CA-trace PDBs directly."""
    import functools

    from foldingdiff_tpu.geometry.featurize import create_new_chain_nerf

    os.makedirs(pdb_dir, exist_ok=True)
    if sampled_dfs and list(sampled_dfs[0].columns) == ["x", "y", "z"]:
        from foldingdiff_tpu.geometry.pdb import write_ca_trace_to_pdb

        files = []
        for i, df in enumerate(sampled_dfs):
            try:
                files.append(write_ca_trace_to_pdb(
                    df.values, os.path.join(pdb_dir, f"generated_{i}.pdb")
                ))
            except ValueError as e:
                # writer recenters + guards PDB column width; a drifted
                # coord model can still overflow -- skip, don't emit garbage
                logging.warning(f"Skipping sample {i}: {e}")
        return files
    args = [
        (os.path.join(pdb_dir, f"generated_{i}.pdb"), df)
        for i, df in enumerate(sampled_dfs)
    ]
    threads = threads or (os.cpu_count() or 1)
    if threads > 1 and len(args) > 8:
        with mp.Pool(threads) as pool:
            files = pool.starmap(create_new_chain_nerf, args, chunksize=8)
    else:
        files = [create_new_chain_nerf(f, df) for f, df in args]
    return [f for f in files if f]


def main():
    import pandas as pd

    args = build_parser().parse_args()
    if args.noise_scale and args.method != "ddpm":
        raise SystemExit("--noise-scale is a DDPM posterior-noise temperature; "
                         f"method={args.method!r} takes none")
    from foldingdiff_tpu.utils_platform import maybe_force_cpu

    maybe_force_cpu(args.cpu)

    from foldingdiff_tpu.data.datasets import AnglesEmptyDataset
    from foldingdiff_tpu.diffusion import sampling as samp
    from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
    from foldingdiff_tpu.models import io as model_io

    outdir = Path(args.outdir)
    os.makedirs(outdir, exist_ok=True)
    assert not os.listdir(outdir) or all(
        d.startswith(".") for d in os.listdir(outdir)
    ) or True  # allow non-empty, we overwrite

    # Resolve hub model ids (e.g. wukevin/foldingdiff) to a local snapshot
    # (reference bin/sample.py:302-307)
    args.model = model_io.resolve_model_dir(args.model)
    model, params, constants, train_args = model_io.from_dir(args.model)
    schedule = DiffusionSchedule.create(
        train_args["variance_schedule"], train_args["timesteps"]
    )
    empty = AnglesEmptyDataset.from_dir(args.model)
    # cart-coords models store features under "coords" (reference
    # datasets.py:94-98); everything else uses "angles"
    ft_key = next(iter(empty.feature_names))
    ft_names = list(empty.feature_names[ft_key])

    # Snapshot the model artifacts alongside outputs (reference 340-343)
    snapshot = outdir / "model_snapshot"
    if snapshot.exists():
        shutil.rmtree(snapshot)
    shutil.copytree(
        args.model, snapshot,
        ignore=shutil.ignore_patterns("logs", "plots", "*.log", "valid_preds", "train_state"),
    )

    import jax

    devices = jax.devices()
    shard_fn = None
    if len(devices) > 1:
        from foldingdiff_tpu.parallel.mesh import make_mesh, shard_batch

        mesh = make_mesh(devices)
        shard_fn = lambda *arrs: shard_batch(mesh, *arrs)

    try:
        mean_offset = empty.get_masked_means()
    except NotImplementedError:
        mean_offset = None

    noise_scale = 1.0
    if args.noise_scale:
        vals = [float(v) for v in args.noise_scale.split(",")]
        if len(vals) == 1:
            noise_scale = vals[0]
        elif len(vals) == len(ft_names):
            noise_scale = np.asarray(vals, dtype=np.float32)
        else:
            raise SystemExit(
                f"--noise-scale needs 1 or {len(ft_names)} values, got {len(vals)}"
            )

    from foldingdiff_tpu.utils_profiling import maybe_profile, phase_timer

    with maybe_profile(args.profile), phase_timer("sampling"):
        sampled = samp.sample(
            model, params, constants, schedule,
            is_angular=empty.feature_is_angular[ft_key],
            pad=empty.pad,
            n=args.num,
            sweep_lengths=tuple(args.lengths),
            batch_size=args.batchsize,
            angular_variance=train_args.get("variance_scale", 1.0),
            mean_offset=mean_offset,
            seed=args.seed,
            return_history=args.fullhistory,
            method=args.method,
            ddim_steps=args.ddim_steps,
            ddim_eta=args.ddim_eta,
            noise_scale=noise_scale,
            shard_fn=shard_fn,
        )
    final = [s[-1] if args.fullhistory else s for s in sampled]
    sampled_dfs = [pd.DataFrame(s, columns=ft_names) for s in final]

    angles_dir = outdir / "sampled_angles"
    os.makedirs(angles_dir, exist_ok=True)
    for i, df in enumerate(sampled_dfs):
        df.to_csv(angles_dir / f"generated_{i}.csv.gz", index=False)
    logging.info(f"Wrote {len(sampled_dfs)} angle CSVs to {angles_dir}")

    if args.fullhistory:
        hist_dir = angles_dir / "sample_history"
        os.makedirs(hist_dir, exist_ok=True)
        for i, s in enumerate(sampled):
            sub = hist_dir / f"generated_{i}"
            os.makedirs(sub, exist_ok=True)
            for t_idx in range(s.shape[0]):
                pd.DataFrame(s[t_idx], columns=ft_names).to_csv(
                    sub / f"timestep_{t_idx}.csv.gz", index=False
                )

    if not args.nopdb:
        pdb_files = write_preds_pdb_folder(sampled_dfs, str(outdir / "sampled_pdb"))
        logging.info(f"Wrote {len(pdb_files)} PDB files")

    if not args.noplot:
        from foldingdiff_tpu.metrics import plotting as plots
        from foldingdiff_tpu.metrics.ss import count_structures_parallel

        plots_dir = outdir / "plots"
        os.makedirs(plots_dir, exist_ok=True)
        all_angles = np.concatenate([df.values for df in sampled_dfs])
        if "phi" in ft_names and "psi" in ft_names:
            plots.plot_ramachandran(
                all_angles[:, ft_names.index("phi")],
                all_angles[:, ft_names.index("psi")],
                str(plots_dir / "ramachandran_generated.pdf"),
                annot_ss=True,
                title=f"Ramachandran, {len(sampled_dfs)} generated structures",
            )
        dists = {"generated": all_angles}
        if args.testcomparison:
            # Overlay against the real test split (reference bin/sample.py:
            # 49-102, 400-447)
            from foldingdiff_tpu.data.datasets import DATASET_CLASSES

            ds_cls = DATASET_CLASSES[train_args["angles_definitions"]]
            test_ds = ds_cls(
                pdbs=args.testcomparison,
                split="test",
                pad=train_args["max_seq_len"],
                min_length=train_args.get("min_seq_len", 0),
                trim_strategy=train_args.get("trim_strategy", "leftalign"),
                zero_center=False,
            )
            rows = []
            for i in range(len(test_ds)):
                item = test_ds.__getitem__(i, ignore_zero_center=True)
                feats = item["angles"] if "angles" in item else item["coords"]
                rows.append(feats[: int(item["lengths"])])
            dists["test data"] = np.concatenate(rows)
        plots.plot_distribution_overlap(
            dists, str(plots_dir / "generated_distributions.pdf"), ft_names,
        )
        plots.plot_distribution_overlap(
            dists, str(plots_dir / "generated_distributions_cdf.pdf"), ft_names,
            cumulative=True,
        )
        if args.testcomparison and "test data" in dists:
            from scipy import stats

            ks = {
                ft_names[i]: tuple(
                    map(float, stats.ks_2samp(all_angles[:, i], dists["test data"][:, i]))
                )
                for i in range(len(ft_names))
            }
            with open(plots_dir / "ks_tests.json", "w") as f:
                json.dump(ks, f, indent=2)
            logging.info(f"KS statistics vs test data: {ks}")
        if not args.nopdb and pdb_files:
            counts = count_structures_parallel(pdb_files)
            counts = [c for c in counts if c != (-1, -1)]
            if counts:
                a, b = zip(*counts)
                plots.plot_ss_cooccurrence(
                    a, b, str(plots_dir / "ss_cooccurrence_generated.pdf"),
                    json_file=str(plots_dir / "ss_counts.json"),
                )
    logging.info("Sampling complete")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
