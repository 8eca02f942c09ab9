#!/usr/bin/env bash
# Sweep NIAH over the released pattern models (reference: scripts/run_niah.sh)
set -e
for model in Llama-2-7B-32K-Instruct Llama-3-8B-Instruct-Gradient-1048k; do
  bash "$(dirname "$0")/niah.sh" "$model" "" 0.5
done
