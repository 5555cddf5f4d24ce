#!/usr/bin/env python
"""
FastRelax via PyRosetta (reference scripts/run_pyrosetta_relax.py). PyRosetta
is a separately-licensed external package; this wrapper errors clearly when
absent.

Usage: python scripts/run_pyrosetta_relax.py in.pdb -o relaxed.pdb
"""
import argparse
import logging


def relax_pdb(pdb_in: str, pdb_out: str) -> str:
    try:
        import pyrosetta
        from pyrosetta.rosetta.protocols.relax import FastRelax
    except ImportError as e:
        raise SystemExit(f"PyRosetta not installed (licensed package): {e}")
    pyrosetta.init("-mute all")
    pose = pyrosetta.pose_from_pdb(pdb_in)
    scorefxn = pyrosetta.get_fa_scorefxn()
    relax = FastRelax()
    relax.set_scorefxn(scorefxn)
    relax.apply(pose)
    pose.dump_pdb(pdb_out)
    return pdb_out


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(usage=__doc__)
    parser.add_argument("pdb", type=str)
    parser.add_argument("-o", "--out", type=str, required=True)
    args = parser.parse_args()
    relax_pdb(args.pdb, args.out)
