#!/bin/bash
# Chained resume-based long training (the TPU analogue of the reference's
# PBS afterany chains, reference scripts/chain-resume.sh:37-43): run COUNT
# segments, each resuming the previous run id, so preemptions / TPU
# maintenance events only cost one segment.
#
#   bash scripts/chain-resume.sh -s 0 -n 4 -e era5-swinv2-1.4-scm [-- extra overrides]
#
# Scheduler integration: set LAUNCH to the command that runs one training
# process on the pod (default: plain python). For GKE/queued resources wrap
# this script in your job spec; each segment writes results/<exp>/<part-id>.

set -euo pipefail

START=0
COUNT=1
EXPERIMENT="era5-swinv2-1.4-scm"
LAUNCH=${LAUNCH:-python}

while getopts "s:n:e:" opt; do
  case $opt in
    s) START=$OPTARG ;;
    n) COUNT=$OPTARG ;;
    e) EXPERIMENT=$OPTARG ;;
    *) echo "usage: $0 [-s start] [-n count] [-e experiment] [-- overrides]"; exit 1 ;;
  esac
done
shift $((OPTIND - 1))
EXTRA=("$@")

for ((i = START; i < START + COUNT; i++)); do
  PART=$(printf "%03d" "$i")
  RESUME=()
  if ((i > START)) || [[ -d "results/${EXPERIMENT}/$(printf "%03d" $((i - 1)))" ]]; then
    ((i > 0)) && RESUME=("resume=$(printf "%03d" $((i - 1)))")
  fi
  echo "=== segment ${PART} (resume: ${RESUME[*]:-none}) ==="
  RUN_ID=${PART} ${LAUNCH} -m swift_tpu.train \
    "experiment=${EXPERIMENT}" "${RESUME[@]}" "${EXTRA[@]}"
done
