#!/usr/bin/env bash
# Reference-duration gate training ON THE CHIP (VERDICT r4 missing #3):
# 2000 steps at the reference hyperparameters — lr 0.02, reg 0.05,
# sink 128 / recent 256, 10 passkeys, context linspace 1000..32000
# (scripts/train.sh:14-34 and attn_patterns/*/config.json in the
# reference) — on the long-range retrieval circuit (constructed-long).
#
# The run is deliberately KILLED mid-flight (SIGKILL near step ~1000) and
# restarted with --resume, exercising the checkpoint cadence (TSV +
# optimizer state every 50 steps), the *_latest rotation, and the
# fast-forwarding resume path under real duration — the reference's
# train.py:202-236,366-386 behaviors.
#
# Output: artifacts/train_longrun/{pattern/,log_phase1.txt,log_phase2.txt}
# The step=N TSV series IS the gate trajectory (one snapshot per 50
# steps); the logs carry the per-step loss curve.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/train_longrun}
KILL_AFTER_S=${KILL_AFTER_S:-2700}   # SIGKILL phase 1 after this long
mkdir -p "$OUT"

COMMON=(--model constructed-long --lr 0.02 --reg-weight 0.05
        --num-steps 2000 --sink 128 --recent 256 --batch-size 1
        --context-min 1000 --context-max 32000 --num-passkeys 10
        --pad-to 32768 --save-steps 50 --log-every 10
        --output-dir "$OUT/pattern")

if [ ! -f "$OUT/log_phase1.txt" ]; then
  echo "[longrun] phase 1: train until killed (${KILL_AFTER_S}s)"
  # 'timeout -s KILL' = the unclean death; checkpoints must carry the run
  timeout -s KILL "$KILL_AFTER_S" \
    python -m duo_attention_tpu.train.trainer "${COMMON[@]}" \
    2>&1 | tee "$OUT/log_phase1.txt"
  echo "[longrun] phase 1 ended (rc=${PIPESTATUS[0]} — 137 means the intended kill)"
fi

echo "[longrun] phase 2: --resume to step 2000"
python -m duo_attention_tpu.train.trainer "${COMMON[@]}" --resume \
  2>&1 | tee "$OUT/log_phase2.txt"
RC=$?
ls "$OUT/pattern" | grep -c "full_attention_heads_step" \
  | xargs -I{} echo "[longrun] {} gate snapshots (trajectory)"
exit $RC
