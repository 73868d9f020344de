#!/usr/bin/env bash
# Launch script (reference training/train.sh parity, TPU-native).
#
# The reference branches between single-GPU `python` and multi-GPU `torchrun`
# (train.sh:31-37). On TPU one process drives every local chip through the
# jax mesh, so there is no per-device process fan-out; multi-host pods add
# --coordinator (jax.distributed over DCN).
set -euo pipefail

OUTPUT_DIR=${OUTPUT_DIR:-./runs/flamingo-tpu}
COCO_ROOT=${COCO_ROOT:-}
COCO_ANN=${COCO_ANN:-}
COORDINATOR=${COORDINATOR:-}          # host:port for multi-host runs

ARGS=(
  --output-dir "$OUTPUT_DIR"
  # reference hyperparameters (train.sh:6-27)
  --learning-rate 1e-4
  --warmup-steps 5000
  --per-device-batch-size 8
  --eval-every-steps 1000
  --save-total-limit 2
  --log-every-steps 50
  # reference model config (train.py:149-156)
  --lm facebook/opt-125m
  --clip-model-type openai/clip-vit-large-patch14
  --dim 768
  --dim-visual 1024
  --resampler-act sqrelu
  --xattn-act sqrelu
)

if [[ -n "$COCO_ROOT" ]]; then
  ARGS+=(--coco-root "$COCO_ROOT" --coco-ann-file "$COCO_ANN")
else
  echo "COCO_ROOT not set -> synthetic smoke run"
  ARGS+=(--synthetic-size 512 --max-steps 50)
fi

if [[ -n "$COORDINATOR" ]]; then
  ARGS+=(--coordinator "$COORDINATOR")
fi

exec python "$(dirname "$0")/train.py" "${ARGS[@]}" "$@"
