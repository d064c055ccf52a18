#!/usr/bin/env bash
# Parity target: the reference's scripts/recommender.sh (SURVEY.md SS2.11).
set -euo pipefail
MODEL=${1:?usage: recommender.sh <seq2seq|hredqs|acg> [data_dir]}
DATA=${2:-data/aol}
python -m context_attentive_ir_tpu.cli.main \
  --model_type "$MODEL" \
  --train_file "$DATA/train.jsonl" \
  --dev_file "$DATA/dev.jsonl" \
  --test_file "$DATA/test.jsonl" \
  --embedding_file "${EMBEDDING_FILE:-}" \
  --model_dir "${MODEL_DIR:-runs}" \
  --model_name "${MODEL}_recommender" \
  --valid_metric bleu-1 \
  --beam_size 5 \
  "${@:3}"
