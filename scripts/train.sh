#!/usr/bin/env bash
# Gate training for one model (reference counterpart: scripts/train.sh).
# The torchrun 8-rank launch becomes a single JAX process with a
# (data, seq) mesh: --dp/--sp control the sharding.
set -e
MODEL=${1:-Llama-3-8B-Instruct-Gradient-1048k}
LR=${2:-0.02}
REG=${3:-0.05}
CTX_MIN=${4:-1000}
CTX_MAX=${5:-32000}
PASSKEYS=${6:-10}
OUT="attn_patterns/${MODEL}/lr=${LR}-reg=${REG}-ctx=${CTX_MIN}_${CTX_MAX}-multi_passkey${PASSKEYS}"
python -m duo_attention_tpu.train.trainer \
  --model "$MODEL" --lr "$LR" --reg-weight "$REG" \
  --num-steps 2000 --sink 128 --recent 256 --batch-size 1 \
  --context-min "$CTX_MIN" --context-max "$CTX_MAX" \
  --num-passkeys "$PASSKEYS" --save-steps 50 \
  --dp "${DP:-1}" --sp "${SP:-8}" \
  --output-dir "$OUT"
