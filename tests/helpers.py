"""Shared test fixtures: synthesize a directory of valid PDB files by
perturbing 1CRN's internal angles and rebuilding chains via NeRF."""
import os

import numpy as np

from foldingdiff_tpu.geometry import featurize

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
CRN = os.path.join(DATA_DIR, "1CRN.pdb")


def make_synthetic_pdb_dir(out_dir: str, n: int = 24, seed: int = 0, min_len: int = 20):
    """Write n synthetic backbone PDBs with varying lengths into out_dir."""
    os.makedirs(out_dir, exist_ok=True)
    feats = featurize.canonical_distances_and_dihedrals(
        CRN, distances=featurize.EXHAUSTIVE_DISTS, angles=featurize.EXHAUSTIVE_ANGLES
    )
    rng = np.random.default_rng(seed)
    fnames = []
    for i in range(n):
        df = feats.copy()
        vals = df.values
        noise = rng.normal(scale=0.08, size=vals.shape)
        noise[:, :3] *= 0.02  # keep bond lengths sane
        df.iloc[:, :] = vals + noise
        length = int(rng.integers(min_len, len(df) + 1))
        df = df.iloc[:length]
        out = os.path.join(out_dir, f"synth_{i:03d}.pdb")
        written = featurize.create_new_chain_nerf(out, df)
        assert written, f"Failed to build {out}"
        fnames.append(out)
    return fnames
