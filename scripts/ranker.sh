#!/usr/bin/env bash
# Parity target: the reference's scripts/ranker.sh (SURVEY.md SS2.11):
#   bash scripts/ranker.sh <MODEL_NAME> [DATA_DIR]
# maps the model name to its flag bundle and runs train then test.
# (No GPU-id argument: device selection is JAX's; on TPU the chip is
# whatever the axon tunnel exposes.)
set -euo pipefail
MODEL=${1:?usage: ranker.sh <esm|dssm|cdssm|duet|arci|arcii|drmm|match_tensor> [data_dir]}
DATA=${2:-data/aol}
python -m context_attentive_ir_tpu.cli.main \
  --model_type "$MODEL" \
  --train_file "$DATA/train.jsonl" \
  --dev_file "$DATA/dev.jsonl" \
  --test_file "$DATA/test.jsonl" \
  --embedding_file "${EMBEDDING_FILE:-}" \
  --model_dir "${MODEL_DIR:-runs}" \
  --model_name "${MODEL}_ranker" \
  --valid_metric map \
  "${@:3}"
