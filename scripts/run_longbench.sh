#!/usr/bin/env bash
# Sparsity sweep {0, 0.5, 0.75} x models (reference: scripts/run_longbench.sh)
set -e
for model in Llama-3-8B-Instruct-Gradient-1048k Mistral-7B-Instruct-v0.2; do
  for s in 0 0.5 0.75; do
    bash "$(dirname "$0")/longbench.sh" "$model" "$s"
  done
done
