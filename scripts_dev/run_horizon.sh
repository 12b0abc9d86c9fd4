#!/bin/bash
# Round-5 longer-horizon gate replication (VERDICT item 5): the shipped
# profile vs the reference-exact corner pair at 10,000 iters on the dense
# fixture, 3 seeds (round-4 protocol: 16 experts, batch 4096).
cd /root/repo
exec python -m presight_tpu.scripts.quality_study \
  --variants grid-n48-cap4x-p64x32 corner \
  --iters 10000 --seeds 0 1 2 --experts 16 --batch 4096 \
  --dense-fixture \
  --out outputs/quality_horizon/report.md \
  --out-root outputs/quality_horizon
