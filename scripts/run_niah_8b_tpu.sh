#!/usr/bin/env bash
# NIAH through the FULL 8B-geometry flagship stack on one chip
# (VERDICT r4 missing #1 / next-round #1): retrieval accuracy and
# 8B-scale serving cost attested by the SAME model.
#
# Model: constructed-8b — the long-range retrieval circuit grafted into
# the exact Llama-3-8B geometry (32 layers / 4096 hidden / 32q+8kv /
# head_dim 128 / 128256 vocab; models/constructed.py LONG_8B_SPEC),
# built directly in W8A8 serving form, INT4 KV, bf16 activations.
# Engine configs per context REPLICATE artifacts/efficiency_sweep
# (scripts/run_capacity_sweep.sh): same prefill chunk, max_cache = ctx,
# sink 64 / recent 256 — so the capacity/efficiency rows and these
# accuracy rows describe the same deployment. Reference counterpart:
# the real-checkpoint 3.3M demo + 1M NIAH
# (demo/run_duo_w8a8kv4.py:83-206, scripts/run_niah.sh:2-8).
#
# Phase 0 gate-trains the pattern ON CHIP at the 8B geometry (W8A8 STE +
# per-layer remat) unless artifacts/niah_8b/pattern already exists; the
# NIAH "trained" rows then deploy that TSV at sparsity 0.5 exactly like
# a reference pattern. Ground truth for comparison:
# artifacts/niah_8b/pattern_gt.
#
# Success criterion: trained@0.5 == full == 1.0 at every (ctx, depth);
# inverted (same budget, wrong heads) collapses.
# Usage: scripts/run_niah_8b_tpu.sh [OUT_DIR] [PATTERN_DIR]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-niah_results/8b_geometry}
PATTERN=${2:-artifacts/niah_8b/pattern}

if [ ! -f "$PATTERN/full_attention_heads.tsv" ]; then
  echo "[8b-niah] phase 0: gate-training the 8B pattern on chip"
  python -m duo_attention_tpu.train.trainer \
    --model constructed-8b --lr 0.02 --reg-weight 0.05 \
    --num-steps 300 --sink 64 --recent 256 --batch-size 1 \
    --context-min 1024 --context-max 4096 --num-passkeys 4 \
    --pad-to 4096 --block-k 1024 --save-steps 50 --log-every 10 \
    --output-dir "$PATTERN" \
    2>&1 | tee artifacts/niah_8b/train_log.txt
fi

# ONE engine config for every context: max_cache 327680 + chunk 1024 —
# the capacity sweep's own 320k-frontier row — with --single-bucket so
# the whole grid compiles exactly one prefill and one decode program
# per head-split config (geometric buckets would compile ~9 prefill
# programs per config, each a multi-minute remote compile at 32
# layers). Runtime still scales with the live context: the Pallas
# kernels skip dead KV blocks past the cache length.
run_cfg() {  # run_cfg <outsub> <extra args...>
  local sub="$1"; shift
  python -m duo_attention_tpu.evals.niah \
    --model constructed-8b --w8a8 --kv-quant int4 --single-bucket \
    --prefill-chunk 1024 --max-cache 327680 \
    --ctx 65536 131072 196608 327680 --depths 5 \
    --output-dir "$OUT/$sub" "$@"
}

run_cfg trained  --attn-pattern "$PATTERN" --sparsity 0.5
run_cfg inverted --attn-pattern "$PATTERN" --sparsity 0.5 --invert
run_cfg full     --sparsity 0.0

for cfg_dir in trained inverted full; do
  python -c "from duo_attention_tpu.evals.niah import visualize; \
             print(visualize('$OUT/$cfg_dir'))"
done
python - "$OUT" <<'EOF'
import glob, json, sys
for cfgd in ("trained", "full", "inverted"):
    cells = [json.load(open(p))
             for p in sorted(glob.glob(f"{sys.argv[1]}/{cfgd}/ctx_*.json"))]
    if cells:
        mean = sum(c["word_overlap"] for c in cells) / len(cells)
        print(f"{cfgd}: {len(cells)} cells, mean overlap {mean:.3f}")
EOF
