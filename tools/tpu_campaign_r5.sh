#!/bin/sh
# Round-5 lever measurement campaign (VERDICT r4 items 1+2): the four A/Bs
# the round-4 campaign staged but never ran, closing the north-star ledger.
#   1. headline --fused_tail --im2col 0   (per-tap GEMM fused form)
#   2. headline --fused_tail --bwd xla    (XLA-backward fused form)
#   3. cfg3     --fused_tail              (siamese: fused tail twice/step)
#   4. cfg5     --fused_tail              (eval-only chain; cfg5 is the one
#                                          config with measured headroom)
# Each A/B is its own process (jit caches don't respect contextvar-scope
# flips, CLAUDE.md).  Appends to .scratch/campaign_r5.log; grep 'ROOFLINE'
# for the machine-readable rows.
#
# Usage: PYTHONPATH=/root/repo:/root/.axon_site sh tools/tpu_campaign_r5.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p .scratch
LOG=.scratch/campaign_r5.log
RC=tools/roofline_configs.py

run() {
  echo "==== $(date -u +%H:%M:%S) python $RC $*" >> "$LOG"
  timeout 3600 python "$RC" "$@" >> "$LOG" 2>&1
  echo "---- rc=$?" >> "$LOG"
}

run headline --fused_tail 1 --im2col 0 --tag _pertap
run headline --fused_tail 1 --bwd xla --tag _xlabwd
run cfg3 --fused_tail 1 --tag _fused
run cfg5 --fused_tail 1 --tag _fused

echo "==== campaign done $(date -u +%H:%M:%S)" >> "$LOG"
