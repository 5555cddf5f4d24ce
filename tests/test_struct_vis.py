"""Structure visualization smoke tests (PNG render + trajectory GIF)."""
import os

import numpy as np

from foldingdiff_tpu.geometry.pdb import read_pdb, write_coords_to_pdb
from foldingdiff_tpu.metrics.struct_vis import pdb2gif, pdb2png, pdb2png_batch

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
CRN = os.path.join(DATA_DIR, "1CRN.pdb")


def test_pdb2png(tmp_path):
    out = pdb2png(CRN, str(tmp_path / "t.png"))
    assert os.path.getsize(out) > 1000


def test_pdb2png_batch(tmp_path):
    outs = pdb2png_batch([CRN], str(tmp_path / "pngs"))
    assert len(outs) == 1 and os.path.isfile(outs[0])


def test_trajectory_gif(tmp_path):
    bb = read_pdb(CRN).backbone_coords()
    rng = np.random.default_rng(0)
    frames = []
    for i in range(4):
        f = str(tmp_path / f"f{i}.pdb")
        write_coords_to_pdb(bb + rng.normal(scale=0.5 * (4 - i), size=bb.shape), f)
        frames.append(f)
    gif = pdb2gif(frames, str(tmp_path / "traj.gif"), duration_ms=50)
    assert os.path.getsize(gif) > 1000
