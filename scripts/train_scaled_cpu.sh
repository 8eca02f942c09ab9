#!/usr/bin/env bash
# Long-context sequence-parallel gate-training demonstration:
# sp=8 Ulysses mesh (8 virtual CPU devices), 16k-token passkey samples,
# 100 steps with a checkpoint/resume break at step 40 — the scaled-down
# counterpart of the reference's 8-rank 32k-token torchrun recipe
# (scripts/train.sh:14-34). Output: attn_patterns TSV + opt-state
# checkpoints + loss log under artifacts/scaled_sp8/.
set -e
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/scaled_sp8}
RUN="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu
     XLA_FLAGS=--xla_force_host_platform_device_count=8
     python -m duo_attention_tpu.train.trainer
       --model tiny-sp8 --sp 8 --tokenizer byte
       --context-min 15000 --context-max 15000 --num-passkeys 8
       --pad-to 16384 --block-k 512 --sink 64 --recent 256
       --save-steps 20 --log-every 5 --output-dir $OUT"
mkdir -p "$OUT"
# phase 1: train to step 40 (checkpoints at 20 and 40)
$RUN --num-steps 40 2>&1 | tee "$OUT/train.log"
# phase 2: resume from the step-40 checkpoint and finish
$RUN --num-steps 100 --resume 2>&1 | tee -a "$OUT/train.log"
