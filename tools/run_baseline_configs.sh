#!/bin/sh
# The five BASELINE.json parity configs, expressed against this framework's
# CLI (identical to the reference flags).  Assumes xBD at /data with targets
# rasterized (data/convert2png.py) and an index at /data/index.csv
# (data/index.py).  Run from the repo root.
set -e

IDX=${IDX:-/data/index.csv}
RESULTS=${RESULTS:-/results}

# 1. ResNet-50 U-Net localization, ce+dice
python -m xview2_tpu.main --exec_mode train --type pre --encoder resnet50 \
  --loss_str ce+dice --index_csv "$IDX" --results "$RESULTS/cfg1"

# 2. ResNeSt-50 localization, attention decoder + deep supervision, AutoAugment
python -m xview2_tpu.main --exec_mode train --type pre --encoder resnest50 \
  --attention --deep_supervision --loss_str focal+dice --autoaugment \
  --index_csv "$IDX" --results "$RESULTS/cfg2"

# 3. Siamese damage (ohem+dice) initialized from the localization encoder
python -m xview2_tpu.main --exec_mode train --type post --dmg_model siamese \
  --loss_str ohem+dice --ckpt_pre "$RESULTS/cfg1/checkpoints/best" \
  --index_csv "$IDX" --results "$RESULTS/cfg3"

# 4. Fused dual-branch damage with CORAL + PPM
python -m xview2_tpu.main --exec_mode train --type post --dmg_model fused \
  --loss_str coral --ppm --index_csv "$IDX" --results "$RESULTS/cfg4"

# 5. ResNeSt-269 siamese with TTA eval, scored on the holdout
python -m xview2_tpu.main --exec_mode train --type post --dmg_model siamese \
  --encoder resnest269 --index_csv "$IDX" --results "$RESULTS/cfg5"
python -m xview2_tpu.main --exec_mode eval --type post --tta \
  --ckpt "$RESULTS/cfg5/checkpoints/best" --results "$RESULTS/cfg5"
python -m xview2_tpu.utils.post_process --results "$RESULTS/cfg5" --components
python -m xview2_tpu.utils.xview2_metrics \
  "$RESULTS/cfg5/predictions" "$RESULTS/cfg5/targets" "$RESULTS/cfg5/score.json"
