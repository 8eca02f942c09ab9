#!/usr/bin/env bash
# Long-context W8A8KV4 serving demo (reference: scripts/run_demo.sh,
# 3.3M tokens on A100-80G; sized here for one 16GB v5e chip).
set -e
python -m duo_attention_tpu.demo --len "${LEN:-262144}" --sparsity 0.5 "$@"
