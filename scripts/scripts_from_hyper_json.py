#!/usr/bin/env python
"""
Hyperparameter-sweep generator: a JSON whose values are lists expands to the
cartesian product of training commands (reference
scripts/scripts_from_hyper_json.py).

Usage: python scripts/scripts_from_hyper_json.py sweep.json -o sweep_scripts/
"""
import argparse
import itertools
import json
import logging
import os


def params_to_cli_args(params: dict) -> str:
    """Render a param dict as a config-override json + flags."""
    return json.dumps(params)


def params_to_filename(params: dict, sweep_keys) -> str:
    parts = []
    for k in sweep_keys:
        v = params[k]
        parts.append(f"{k}_{v}".replace(".", "p").replace("/", "-"))
    return "_".join(parts) or "run"


def main():
    parser = argparse.ArgumentParser(usage=__doc__)
    parser.add_argument("hyperjson", type=str)
    parser.add_argument("-o", "--outdir", type=str, default="sweep_scripts")
    parser.add_argument("--train_script", type=str, default="bin/train.py")
    args = parser.parse_args()

    with open(args.hyperjson) as f:
        hyper = json.load(f)
    sweep_keys = [k for k, v in hyper.items() if isinstance(v, list)]
    fixed = {k: v for k, v in hyper.items() if not isinstance(v, list)}
    combos = list(itertools.product(*[hyper[k] for k in sweep_keys]))
    os.makedirs(args.outdir, exist_ok=True)

    for combo in combos:
        params = dict(fixed)
        params.update(dict(zip(sweep_keys, combo)))
        name = params_to_filename(params, sweep_keys)
        cfg_path = os.path.join(args.outdir, f"{name}.json")
        with open(cfg_path, "w") as f:
            json.dump(params, f, indent=2)
        sh_path = os.path.join(args.outdir, f"{name}.sh")
        with open(sh_path, "w") as f:
            f.write("#!/bin/bash\n")
            f.write(f"python {args.train_script} {cfg_path} -o results_{name}\n")
        os.chmod(sh_path, 0o755)
    logging.info(f"Wrote {len(combos)} sweep configs+scripts to {args.outdir}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
