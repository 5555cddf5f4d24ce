#!/bin/bash
# Multi-host TPU-pod training launch -- the TPU equivalent of the reference's
# Azure cluster spec (scripts/amlt.yaml). Runs the same train command on every
# host of a TPU pod slice via gcloud. `--multihost` makes bin/train.py call
# jax.distributed.initialize() (coordinator autodetected from the TPU pod
# environment) before building the ONE global mesh that spans all chips of
# all hosts; only process 0 writes artifacts.
#
# This is exactly the code path proven offline by tests/test_multihost.py:
# N cooperating processes (there: 2 CPU processes with explicit
# --coordinator/--nprocs/--procid), one global mesh, per-host batch feeding,
# loss identical to the single-process run.
#
# Usage: TPU_NAME=my-pod ZONE=us-central2-b bash scripts/tpu_pod_launch.sh \
#            config_jsons/cath_full_angles_cosine.json results_dir
set -euo pipefail

TPU_NAME=${TPU_NAME:?set TPU_NAME}
ZONE=${ZONE:?set ZONE}
CONFIG=${1:-config_jsons/cath_full_angles_cosine.json}
OUTDIR=${2:-results}

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all --command "
  cd ~/foldingdiff_tpu &&
  python bin/train.py $CONFIG -o $OUTDIR --multihost
"
