#!/usr/bin/env bash
# Extends niah_results/long to REFERENCE-PROTOCOL density and beyond:
#
# Phase 1 — density fill at <=1M: 13 context points x 10 depths
#   (the reference protocol is 13 ctx x 10 depths,
#   eval/needle/needle_in_haystack.py:233-260 + scripts/niah.sh:2-8).
#   Keeps max-cache 1056768 so the committed rows' compiled programs are
#   reused from the persistent cache; resume-by-existence skips them.
#
# Phase 2 — ultra rows: 2M and 4.2M-token contexts through the same
#   FLAGSHIP W8A8KV4 engine on ONE 16 GB v5e chip — past the reference's
#   3.3M-token single-A100-80G headline demo
#   (demo/run_duo_w8a8kv4.py:83-206, scripts/run_demo.sh:3
#   --len 3300000). The long-range circuit is designed for a 4.2M
#   positional range (models/constructed.py LONG_SPEC; LP-verified
#   margin over every integer separation in [0, 4.2M]); its INT4 KV at
#   4.2M tokens is ~2.2 GB, so the whole grid fits one chip.
#
# Both phases append to the SAME grid dirs; the final --visualize
# regenerates unified heatmaps over all committed cells.
# Usage: scripts/run_niah_ultra_tpu.sh [OUT_DIR] [PATTERN_DIR]
set -e
cd "$(dirname "$0")/.."
OUT=${1:-niah_results/long}
PATTERN=${2:-artifacts/accuracy_loop_long/pattern}

run_grid() {  # run_grid "<ctx list>" <max_cache> [extra args...]
  local ctx="$1" maxc="$2"; shift 2
  local common=(--model constructed-long --w8a8 --kv-quant int4 \
                --prefill-chunk 8192 --max-cache "$maxc" --ctx $ctx \
                --depths 10 "$@")
  python -m duo_attention_tpu.evals.niah "${common[@]}" \
    --attn-pattern "$PATTERN" --sparsity 0.5 --output-dir "$OUT/trained"
  python -m duo_attention_tpu.evals.niah "${common[@]}" \
    --attn-pattern "$PATTERN" --sparsity 0.5 --invert \
    --output-dir "$OUT/inverted"
  python -m duo_attention_tpu.evals.niah "${common[@]}" \
    --sparsity 0.0 --output-dir "$OUT/full"
}

# 11 points <=1M (6 committed + 5 new; 13 total with the phase-2 ultra
# rows), old max-cache -> warm programs.
run_grid "16384 32768 65536 98304 131072 196608 262144 393216 524288 \
786432 1048576" 1056768

# Ultra rows; 4.2M + 8192 keeps the INT4 8192-token DMA blocks.
run_grid "2097152 4194304" 4202496 --visualize
