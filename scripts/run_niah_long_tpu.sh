#!/usr/bin/env bash
# Long-context NIAH grid through the FLAGSHIP W8A8KV4 engine on the chip
# (VERDICT r3 #1/#5): the long-range constructed circuit at context
# lengths up to 1M tokens x 10 depths x {trained@0.5, inverted, full},
# reference-protocol density (counterpart: scripts/run_niah.sh:2-8 +
# eval/needle/needle_in_haystack.py:233-405, which evals 1M on 8xA100;
# here 1M runs on ONE 16 GB v5e because the 2-layer circuit's INT4 KV at
# 1M is ~0.5 GB).
#
# Resume-by-existence per cell: safe to re-run after an interruption.
# Usage: scripts/run_niah_long_tpu.sh [OUT_DIR] [PATTERN_DIR]
set -e
cd "$(dirname "$0")/.."
OUT=${1:-niah_results/long}
PATTERN=${2:-artifacts/accuracy_loop_long/pattern}
CTX="16384 65536 131072 262144 524288 1048576"
MAXC=1056768   # 1M + 8192 (keep the INT4 8192-token DMA blocks)
COMMON=(--model constructed-long --w8a8 --kv-quant int4 \
        --prefill-chunk 8192 --max-cache "$MAXC" --ctx $CTX --depths 10 \
        --visualize)

python -m duo_attention_tpu.evals.niah "${COMMON[@]}" \
  --attn-pattern "$PATTERN" --sparsity 0.5 \
  --output-dir "$OUT/trained"
python -m duo_attention_tpu.evals.niah "${COMMON[@]}" \
  --attn-pattern "$PATTERN" --sparsity 0.5 --invert \
  --output-dir "$OUT/inverted"
python -m duo_attention_tpu.evals.niah "${COMMON[@]}" \
  --sparsity 0.0 \
  --output-dir "$OUT/full"
