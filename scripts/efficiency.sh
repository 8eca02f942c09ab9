#!/usr/bin/env bash
# Decode/prefill latency + memory at one config (reference: scripts/efficiency.sh)
set -e
MODEL=${1:-Llama-3-8B-Instruct-Gradient-1048k}
CTX=${2:-131072}
SPARSITY=${3:-0.5}
python -m duo_attention_tpu.evals.efficiency \
  --model "$MODEL" --ctx-len "$CTX" --sparsity "$SPARSITY" \
  --sink 64 --recent 256 --prefill-chunk 8192
