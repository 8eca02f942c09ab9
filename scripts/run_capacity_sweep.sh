#!/usr/bin/env bash
# Prefill-TTFT + decode capacity curve on the real chip: duo @0.5,
# 32-layer 8B W8A8KV4 (the flagship serving stack) at 32k..320k context.
# Counterpart of the reference's speedup-vs-context trend
# (README.md:196-203) + its TTFT metric (BASELINE.json). Every context is
# a multiple of 8192 (the INT4 KV DMA block — see CLAUDE.md invariants).
# Output: artifacts/efficiency_sweep/{benchmark_result.txt,sweep.jsonl}.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/efficiency_sweep}
mkdir -p "$OUT"
touch "$OUT/sweep.jsonl"
FAILED=0
# prefill chunk shrinks with context: the chunk-sized activation temps
# (and the streaming ring's sink+recent+chunk staging x 32 layers) share
# the chip with the growing KV cache + 8 GB of int8 weights — same recipe
# as the demo capacity table (README).
for POINT in 32768:8192 65536:8192 131072:8192 196608:4096 327680:1024; do
  CTX=${POINT%:*} CHUNK=${POINT#*:}
  # resume-by-existence (the NIAH convention): a crashed/interrupted sweep
  # rerun only measures the missing contexts. Anchored on the trailing
  # comma: an unanchored "\"ctx\": $CTX" makes 32768 match 327680's line.
  if grep -q "\"ctx\": $CTX," "$OUT/sweep.jsonl"; then
    echo "[sweep] ctx=$CTX already recorded, skipping"
    continue
  fi
  python -m duo_attention_tpu.evals.efficiency \
    --num-layers 32 --w8a8 --kv-quant int4 --sparsity 0.5 \
    --ctx-len "$CTX" --prefill-chunk "$CHUNK" \
    --output "$OUT/benchmark_result.txt" \
    --json-output "$OUT/sweep.jsonl" \
    || { echo "[sweep] ctx=$CTX FAILED (continuing)"; FAILED=1; }
done
python - "$OUT/sweep.jsonl" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
for r in rows:
    print(f"ctx={r['ctx']:>7} ttft_p50={r.get('prefill_ttft_p50_s', 0):7.2f}s "
          f"decode={r['decode_tok_s']:6.1f} tok/s kv={r['kv_bytes']/1e9:5.2f} GB")
EOF
# continue-on-failure per point, but surface overall failure to callers
# (the driver would otherwise read an all-points-failed sweep as rc=0)
exit $FAILED
