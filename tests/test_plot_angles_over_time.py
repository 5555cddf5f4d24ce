"""bin/plot_angles_over_time.py (the reference's scissor/lever notebook
pipeline, reference bin/plot_angles_over_time.py): consume the
--fullhistory per-timestep CSV layout written by bin/sample.py and render
the angle-distribution-over-time grid."""
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FT = ["phi", "psi", "omega"]


@pytest.fixture()
def history_dir(tmp_path):
    """Fabricate the bin/sample.py --fullhistory layout: per-structure
    subdirs with timestep_<i>.csv.gz, early steps ~uniform noise, late
    steps concentrated (mimicking the reverse process sharpening)."""
    rng = np.random.default_rng(0)
    root = tmp_path / "sample_history"
    for s in range(2):
        sub = root / f"generated_{s}"
        os.makedirs(sub)
        for t in range(5):
            frac = t / 4.0
            vals = (1 - frac) * rng.uniform(-np.pi, np.pi, size=(30, 3)) + frac * rng.normal(
                loc=[-1.0, 1.2, 3.0], scale=0.1, size=(30, 3)
            )
            pd.DataFrame(vals, columns=FT).to_csv(sub / f"timestep_{t}.csv.gz", index=False)
    return root


def test_get_angle_files(history_dir):
    from bin.plot_angles_over_time import get_angle_files

    by_t = get_angle_files(str(history_dir))
    assert sorted(by_t) == [0, 1, 2, 3, 4]
    assert all(len(v) == 2 for v in by_t.values())


def test_cli_renders_pdf(history_dir, tmp_path):
    out = tmp_path / "angles_over_time.pdf"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", "plot_angles_over_time.py"),
         str(history_dir), "-o", str(out), "--nsteps", "3"],
        capture_output=True, text=True, timeout=300,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.is_file() and out.stat().st_size > 1000
