#!/usr/bin/env bash
# NIAH grid for one model/pattern (reference counterpart: scripts/niah.sh)
set -e
MODEL=${1:-Llama-3-8B-Instruct-Gradient-1048k}
PATTERN=${2:-}
SPARSITY=${3:-0.5}
ARGS=(--model "$MODEL" --sparsity "$SPARSITY" --sink 64 --recent 256 \
      --prefill-chunk 8192 --ctx 16384 32768 65536 --depths 10 \
      --output-dir "niah_results/${MODEL}_s${SPARSITY}" --visualize)
[ -n "$PATTERN" ] && ARGS+=(--attn-pattern "$PATTERN")
python -m duo_attention_tpu.evals.niah "${ARGS[@]}"
