#!/usr/bin/env bash
# Train gates for the released model set (reference: scripts/run_train.sh)
set -e
for model in Llama-2-7B-32K-Instruct Llama-3-8B-Instruct-Gradient-1048k \
             Llama-3-8B-Instruct-Gradient-4194k Meta-Llama-3.1-8B-Instruct \
             Mistral-7B-Instruct-v0.2; do
  bash "$(dirname "$0")/train.sh" "$model"
done
