#!/bin/sh
# Round-4 lever measurement campaign (VERDICT r3 items 2+3): sequential
# single-process A/Bs through tools/roofline_configs.py on the one tunneled
# TPU chip.  Each A/B is its own process (jit caches don't respect
# contextvar-scope flips within a process).  Appends to .scratch/campaign.log;
# grep 'ROOFLINE' for the machine-readable rows.
#
# Usage: PYTHONPATH=/root/repo:/root/.axon_site sh tools/tpu_campaign.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p .scratch
LOG=.scratch/campaign.log
RC=tools/roofline_configs.py

run() {
  echo "==== $(date -u +%H:%M:%S) python $RC $*" >> "$LOG"
  timeout 3600 python "$RC" "$@" >> "$LOG" 2>&1
  echo "---- rc=$?" >> "$LOG"
}

# headline: stock re-baseline, then the fused-tail forms, then einsum-1x1
run headline
run headline --fused_tail 1
run headline --fused_tail 1 --im2col 0 --tag _pertap
run headline --fused_tail 1 --bwd xla --tag _xlabwd
run headline --einsum_1x1 1 --tag _einsum
run headline --fused_tail 1 --einsum_1x1 1 --tag _both

# cfg5 (TTA eval, the 1.32x-of-bound config): BN folding A/B + fused chain
run cfg5
run cfg5 --fold_eval_bn 0 --tag _nofold
run cfg5 --fused_tail 1 --tag _fused

# cfg3 (siamese damage): fused tail runs twice per step here
run cfg3
run cfg3 --fused_tail 1 --tag _fused
run cfg3 --einsum_1x1 1 --tag _einsum

echo "==== campaign done $(date -u +%H:%M:%S)" >> "$LOG"
