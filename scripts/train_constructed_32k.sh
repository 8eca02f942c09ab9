#!/usr/bin/env bash
# Converged gate-training run at the reference's context scale (VERDICT r2
# item 4): the constructed retrieval circuit (KNOWN ground truth: layer-1
# heads {0,1} are the retrieval heads) trained at 32k tokens for 520 steps
# on the real chip — the reference recipe scripts/train.sh:14-34 scaled to
# one v5e. Checkpoints every 100 steps let pattern stability be verified
# across saves. Output: artifacts/constructed_32k/.
set -e
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/constructed_32k}
mkdir -p "$OUT"
python -m duo_attention_tpu.train.trainer \
  --model constructed --tokenizer word \
  --num-steps 520 --lr 0.02 --reg-weight 0.05 \
  --context-min 30000 --context-max 30000 --num-passkeys 8 \
  --pad-to 32768 --block-k 512 --sink 64 --recent 256 \
  --save-steps 100 --log-every 10 --output-dir "$OUT" \
  2>&1 | tee "$OUT/train.log"
