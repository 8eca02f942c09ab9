#!/usr/bin/env bash
# Driver-run NIAH artifact (VERDICT r2 item 6): context x depth retrieval
# grid through the real TPU engine, on the constructed retrieval circuit
# with its TRAINED gate pattern — plus the inverted-pattern ablation.
# Counterpart: eval/needle/needle_in_haystack.py:380-405 + visualize.py.
# Output: niah_results/{trained,inverted}/ctx_*.json + heatmap.png.
set -e
cd "$(dirname "$0")/.."
OUT=${1:-niah_results}
PATTERN=${2:-artifacts/accuracy_loop/pattern}
CTX="4096 16384 32768"
python -m duo_attention_tpu.evals.niah \
  --model constructed --attn-pattern "$PATTERN" --sparsity 0.5 \
  --ctx $CTX --depths 3 --prefill-chunk 2048 --max-cache 40960 \
  --output-dir "$OUT/trained" --visualize
python -m duo_attention_tpu.evals.niah \
  --model constructed --attn-pattern "$PATTERN" --sparsity 0.5 --invert \
  --ctx $CTX --depths 3 --prefill-chunk 2048 --max-cache 40960 \
  --output-dir "$OUT/inverted" --visualize
