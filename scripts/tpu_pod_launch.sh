#!/bin/bash
# Multi-host TPU-pod training launch -- the TPU equivalent of the reference's
# Azure cluster spec (scripts/amlt.yaml). Runs the same train command on every
# host of a TPU pod slice via gcloud; jax.distributed initializes from the TPU
# environment automatically and the data-parallel mesh spans all chips.
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
  python - <<'PY'
import jax
jax.distributed.initialize()  # picks up TPU pod env
PY
  python bin/train.py $CONFIG -o $OUTDIR
"
