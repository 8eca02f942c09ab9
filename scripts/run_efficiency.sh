#!/usr/bin/env bash
# Context sweep x sparsity {0, 0.5} (reference: scripts/run_efficiency.sh)
set -e
MODEL=${1:-Llama-3-8B-Instruct-Gradient-1048k}
for ctx in 32768 65536 131072; do
  for s in 0 0.5; do
    bash "$(dirname "$0")/efficiency.sh" "$MODEL" "$ctx" "$s"
  done
done
