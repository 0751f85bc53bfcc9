#!/bin/bash
# Multi-host TPU pod launch (replaces the reference's ezpz/PBS/mpiexec zoo,
# reference scripts/aurora-general.sh): every host runs the SAME command;
# jax.distributed.initialize() discovers peers from the TPU metadata, and
# the single named mesh spans all chips (ICI in-slice, DCN across slices).
#
# On Cloud TPU VMs:
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all --command \
#     "cd swift-tpu && bash scripts/tpu-pod.sh era5-swinv2-1.4-scm [overrides]"
#
# No per-fabric env tuning is needed: there is no backend selection layer.

set -euo pipefail
EXPERIMENT=${1:?usage: tpu-pod.sh <experiment> [overrides...]}
shift || true
exec python -m swift_tpu.train "experiment=${EXPERIMENT}" "$@"
