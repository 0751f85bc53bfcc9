#!/bin/bash
# Sampler hyper-parameter sweeps over a trained run (reference
# scripts/polaris-hp-{loss,layers}.sh split PBS node files across jobs; on
# TPU each sweep is one process using the whole mesh).
#
#   bash scripts/hp-sweep.sh results/era5-swinv2-1.4-scm/000

set -euo pipefail
RUN=${1:?usage: hp-sweep.sh <run_dir>}
shift || true
exec python -m swift_tpu.eval.sampler --input "$RUN" \
  --num-steps 32 16 8 4 2 1 --sigma-min 0.02 --sigma-max 200.0 "$@"
