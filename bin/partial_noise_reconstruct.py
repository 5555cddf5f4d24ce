#!/usr/bin/env python
"""
Partial-noise reconstruction: noise real test-set structures t steps forward,
denoise with the model, report TM-score reconstruction fidelity
(reference bin/partial_noise_reconstruct.py + sampling.py:287-356).

Usage: python bin/partial_noise_reconstruct.py -m results -t 250 --data <pdb_dir>
"""
import argparse
import json
import logging
import multiprocessing as mp
import os
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _score_one(recon_angles, truth_angles, truth_pdb, ft_names):
    """TM of reconstructed vs truth angles (reference sampling._score_angles)."""
    import pandas as pd

    from foldingdiff_tpu.eval import tmscore
    from foldingdiff_tpu.geometry.featurize import create_new_chain_nerf

    with tempfile.TemporaryDirectory() as td:
        truth_path = os.path.join(td, "truth.pdb")
        recon_path = os.path.join(td, "recon.pdb")
        truth_pdb_out = create_new_chain_nerf(
            truth_path, pd.DataFrame(truth_angles, columns=ft_names)
        )
        recon_pdb_out = create_new_chain_nerf(
            recon_path, pd.DataFrame(recon_angles, columns=ft_names)
        )
        if not truth_pdb_out or not recon_pdb_out:
            return np.nan, np.nan
        score = tmscore.run_tmalign(recon_pdb_out, truth_pdb_out)
        score_coord = (
            tmscore.run_tmalign(recon_pdb_out, truth_pdb) if truth_pdb else np.nan
        )
    return score, score_coord


def main():
    parser = argparse.ArgumentParser(
        usage=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("-m", "--model", type=str, required=True)
    parser.add_argument("--data", type=str, required=True, help="PDB dir for the test split")
    parser.add_argument("-t", "--timesteps", type=int, default=250, help="forward-noise steps")
    parser.add_argument("-b", "--batchsize", type=int, default=512)
    parser.add_argument("-o", "--outjson", type=str, default="reconstruction_tm.json")
    parser.add_argument("--nsubset", type=int, default=0)
    parser.add_argument("--cpu", action="store_true", help="force CPU platform")
    args = parser.parse_args()

    from foldingdiff_tpu.utils_platform import maybe_force_cpu

    maybe_force_cpu(args.cpu)

    from foldingdiff_tpu.data import datasets as dsets
    from foldingdiff_tpu.diffusion import sampling as samp
    from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
    from foldingdiff_tpu.models import io as model_io

    model, params, constants, train_args = model_io.from_dir(args.model)
    schedule = DiffusionSchedule.create(
        train_args["variance_schedule"], train_args["timesteps"]
    )
    ds_cls = dsets.DATASET_CLASSES[train_args["angles_definitions"]]
    ds = ds_cls(
        pdbs=args.data,
        split="test",
        pad=train_args["max_seq_len"],
        min_length=train_args.get("min_seq_len", 0),
        trim_strategy=train_args.get("trim_strategy", "leftalign"),
    )
    # Re-apply the stored training mean offset (reference
    # bin/partial_noise_reconstruct.py:44)
    offset_file = os.path.join(args.model, "training_mean_offset.npy")
    mean_offset = np.load(offset_file) if os.path.isfile(offset_file) else None
    if mean_offset is not None:
        ds.set_masked_means(mean_offset)

    data = ds.to_arrays()
    filenames = ds.filenames
    if args.nsubset:
        data = {k: v[: args.nsubset] for k, v in data.items()}
        filenames = filenames[: args.nsubset]

    recons = samp.get_reconstruction_error(
        model, params, constants, schedule, data,
        is_angular=ds.feature_is_angular["angles"],
        noise_timesteps=args.timesteps,
        batch_size=args.batchsize,
        mean_offset=mean_offset,
    )
    truths = [
        data["angles"][i, : int(data["lengths"][i])] + (mean_offset if mean_offset is not None else 0)
        for i in range(len(recons))
    ]
    from foldingdiff_tpu.utils import modulo_with_wrapped_range

    truths = [modulo_with_wrapped_range(t) for t in truths]

    ft_names = list(ds.feature_names["angles"])
    jobs = list(zip(recons, truths, filenames))
    nproc = os.cpu_count() or 1
    if nproc > 1 and len(jobs) > 4:
        with mp.Pool(nproc) as pool:
            results = pool.starmap(
                _score_one, [(r, t, f, ft_names) for r, t, f in jobs], chunksize=4
            )
    else:
        results = [_score_one(r, t, f, ft_names) for r, t, f in jobs]
    scores, coord_scores = zip(*results)
    scores = np.array(scores)
    logging.info(
        f"t={args.timesteps}: reconstruction TM mean {np.nanmean(scores):.3f} "
        f"median {np.nanmedian(scores):.3f}"
    )
    with open(args.outjson, "w") as f:
        json.dump(
            {
                "noise_timesteps": args.timesteps,
                "tm_scores": {os.path.basename(f): s for (_, _, f), s in zip(jobs, scores.tolist())},
                "tm_scores_coords": list(np.asarray(coord_scores)),
            },
            f, indent=4, default=float,
        )


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
