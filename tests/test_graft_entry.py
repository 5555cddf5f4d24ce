"""
Driver-contract regression tests for __graft_entry__.py.

The driver compile-checks entry() on one chip and runs dryrun_multichip(n)
on an n-device virtual CPU platform; both breaking unnoticed would cost a
whole round of driver evidence, so they are guarded here. conftest.py
already forces the 8-device virtual CPU platform, which means
dryrun_multichip takes its in-process path (no subprocess respawn needed).
"""
import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[0].shape[0], args[0].shape[1], 6)
    assert np.isfinite(np.asarray(out)).all()


def test_entry_is_deterministic():
    fn, args = graft.entry()
    a = jax.jit(fn)(*args)
    b = jax.jit(fn)(*args)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dryrun_multichip_8(capsys):
    graft.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "data-parallel train step OK" in out
    assert "batch-sharded sampling (ragged chunk) OK" in out
    assert "tensor-parallel TRAIN step" in out


def test_dryrun_multichip_odd_count(capsys):
    """Odd device counts skip the TP leg but must still pass DP + sampling."""
    graft.dryrun_multichip(5)
    out = capsys.readouterr().out
    assert "data-parallel train step OK" in out
    assert "batch-sharded sampling (ragged chunk) OK" in out
    assert "tensor-parallel" not in out
