#!/usr/bin/env bash
# Prefill-TTFT + decode capacity curve on the real chip: duo @0.5,
# 32-layer 8B W8A8KV4 (the flagship serving stack) at 32k..320k context.
# Counterpart of the reference's speedup-vs-context trend
# (README.md:196-203) + its TTFT metric (BASELINE.json). Every context is
# a multiple of 8192 (the INT4 KV DMA block — see CLAUDE.md invariants).
# Output: artifacts/efficiency_sweep/{benchmark_result.txt,sweep.jsonl}.
set -e
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/efficiency_sweep}
mkdir -p "$OUT"
for CTX in 32768 65536 131072 196608 327680; do
  python -m duo_attention_tpu.evals.efficiency \
    --num-layers 32 --w8a8 --kv-quant int4 --sparsity 0.5 \
    --ctx-len "$CTX" --prefill-chunk 8192 \
    --output "$OUT/benchmark_result.txt" \
    --json-output "$OUT/sweep.jsonl"
done
python - "$OUT/sweep.jsonl" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
for r in rows:
    print(f"ctx={r['ctx']:>7} ttft_p50={r.get('prefill_ttft_p50_s', 0):7.2f}s "
          f"decode={r['decode_tok_s']:6.1f} tok/s kv={r['kv_bytes']/1e9:5.2f} GB")
EOF
