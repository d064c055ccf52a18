#!/usr/bin/env bash
# Parity target: the reference's scripts/multitask.sh (SURVEY.md SS2.11),
# e.g. `bash scripts/multitask.sh cars data/aol`.
set -euo pipefail
MODEL=${1:?usage: multitask.sh <mnsrf|m_match_tensor|cars> [data_dir]}
DATA=${2:-data/aol}
python -m context_attentive_ir_tpu.cli.main \
  --model_type "$MODEL" \
  --train_file "$DATA/train.jsonl" \
  --dev_file "$DATA/dev.jsonl" \
  --test_file "$DATA/test.jsonl" \
  --embedding_file "${EMBEDDING_FILE:-}" \
  --model_dir "${MODEL_DIR:-runs}" \
  --model_name "${MODEL}_multitask" \
  --valid_metric map \
  --beam_size 5 \
  "${@:3}"
