#!/bin/bash
# Round-5 horizon gate, remaining arms (shipped s2 was interrupted; corner
# arms never started). Seeds 0/1 of the shipped profile already sit in
# outputs/quality_horizon; after these four runs a combined --eval-only
# pass regenerates the full report from all six checkpoints.
set -x
cd /root/repo
python -m presight_tpu.scripts.quality_study \
  --variants grid-n48-cap4x-p64x32 \
  --iters 10000 --seeds 2 --experts 16 --batch 4096 \
  --dense-fixture \
  --out outputs/quality_horizon/report_partial.md \
  --out-root outputs/quality_horizon || exit 1
python -m presight_tpu.scripts.quality_study \
  --variants corner \
  --iters 10000 --seeds 0 1 2 --experts 16 --batch 4096 \
  --dense-fixture \
  --out outputs/quality_horizon/report_partial.md \
  --out-root outputs/quality_horizon || exit 1
python -m presight_tpu.scripts.quality_study \
  --variants grid-n48-cap4x-p64x32 corner \
  --eval-only \
  --iters 10000 --seeds 0 1 2 --experts 16 --batch 4096 \
  --dense-fixture \
  --out outputs/quality_horizon/report.md \
  --out-root outputs/quality_horizon
echo "HORIZON-DONE rc=$?"
