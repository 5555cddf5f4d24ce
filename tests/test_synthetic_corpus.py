"""CATH-scale synthetic corpus generator (scripts/make_synthetic_corpus.py /
examples/synthetic_proteins.make_cath_scale_corpus).

The corpus stands in for the reference's CATH S40 download
(reference data/download_cath.sh) while egress is blocked, so two properties
are load-bearing: (1) the length distribution actually exercises the
randomcrop-over-pad path (a realistic share of structures must exceed the
pad-128 training window), and (2) generation is seeded AND resumable -- an
interrupted run must continue on the same RNG stream and produce the exact
bytes an uninterrupted run would (the corpus is gitignored and regenerated
between sessions; training depends on the bytes matching).
"""
import os

import numpy as np

from examples.synthetic_proteins import cath_like_lengths, make_cath_scale_corpus


def _read_all(d):
    out = {}
    for f in sorted(os.listdir(d)):
        with open(os.path.join(d, f), "rb") as fh:
            out[f] = fh.read()
    return out


def test_cath_like_lengths_distribution():
    rng = np.random.default_rng(0)
    lens = cath_like_lengths(rng, 5000)
    assert lens.min() >= 40 and lens.max() <= 512
    # median ~140 residues, CATH-S40-like
    assert 120 <= np.median(lens) <= 160
    # the randomcrop path must be load-bearing: a majority exceeds pad=128
    frac_over = float((lens > 128).mean())
    assert 0.4 <= frac_over <= 0.75, frac_over
    # seeded determinism
    np.testing.assert_array_equal(lens, cath_like_lengths(np.random.default_rng(0), 5000))


def test_corpus_resume_produces_identical_bytes(tmp_path):
    """Delete a strict subset of an existing corpus, regenerate with
    resume=True: remaining files must come out byte-identical to the
    uninterrupted run (the angle draw advances the RNG even on skip)."""
    full_dir, resumed_dir = str(tmp_path / "full"), str(tmp_path / "resumed")
    make_cath_scale_corpus(full_dir, n=5, seed=3)
    make_cath_scale_corpus(resumed_dir, n=5, seed=3)
    # simulate an interruption: drop files 2 and 4, keep 0/1/3
    for i in (2, 4):
        os.remove(os.path.join(resumed_dir, f"synthprot_{i:05d}.pdb"))
    files = make_cath_scale_corpus(resumed_dir, n=5, seed=3, resume=True)
    assert len(files) == 5
    full, resumed = _read_all(full_dir), _read_all(resumed_dir)
    assert full.keys() == resumed.keys()
    for name in full:
        assert full[name] == resumed[name], f"{name} diverged after resume"


def test_corpus_resume_rewrites_truncated_file(tmp_path):
    """A generation killed mid-write must not poison a resumed run: PDB
    writes are atomic (geometry.pdb._atomic_write), and resume additionally
    validates files end with 'END' before skipping, so a truncated file left
    by an older writer (or a partial copy) gets rewritten, preserving the
    byte-parity guarantee."""
    full_dir, resumed_dir = str(tmp_path / "full"), str(tmp_path / "resumed")
    make_cath_scale_corpus(full_dir, n=4, seed=3)
    make_cath_scale_corpus(resumed_dir, n=4, seed=3)
    # simulate a mid-write interruption on file 1: cut it in half
    victim = os.path.join(resumed_dir, "synthprot_00001.pdb")
    blob = open(victim, "rb").read()
    with open(victim, "wb") as fh:
        fh.write(blob[: len(blob) // 2])
    files = make_cath_scale_corpus(resumed_dir, n=4, seed=3, resume=True)
    assert len(files) == 4
    full, resumed = _read_all(full_dir), _read_all(resumed_dir)
    assert full.keys() == resumed.keys()
    for name in full:
        assert full[name] == resumed[name], f"{name} diverged after truncated resume"
    # and no temp droppings left behind
    assert not [f for f in os.listdir(resumed_dir) if ".tmp." in f]


def test_corpus_seed_changes_content(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    make_cath_scale_corpus(a, n=2, seed=1)
    make_cath_scale_corpus(b, n=2, seed=2)
    fa, fb = _read_all(a), _read_all(b)
    assert fa.keys() == fb.keys()
    assert any(fa[k] != fb[k] for k in fa)
