#!/usr/bin/env bash
# Driver-run LongBench artifact: 2-task pred+eval through the real TPU
# engine (VERDICT r2 item 6). No third-party corpora ship with this build,
# so task jsonl files are synthesized in the LongBench record format
# (context/input/answers/all_classes/length). triviaqa's template ends at
# bare {input} (a few-shot task), so samples written in the constructed
# circuit's passkey grammar make prediction quality MEANINGFUL — the
# trained pattern scores high while --invert collapses. passage_count
# exercises the second metric family on the same hardware run.
# Reference counterpart: eval/LongBench/pred.py + eval.py:146-155.
set -e
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/longbench_tpu}
PATTERN=${2:-artifacts/constructed_32k}
DATA="$OUT/data"
mkdir -p "$DATA"
python - "$DATA" <<'EOF'
import json, sys
import numpy as np
from duo_attention_tpu.evals.niah import procedural_haystack
from duo_attention_tpu.train.data import _CODE_WORDS, _NAMES

rng = np.random.default_rng(7)
recs = []
for i in range(8):
    names = rng.choice(_NAMES, size=3, replace=False)
    flat = rng.choice(_CODE_WORDS, size=9, replace=False)
    codes = [" ".join(flat[j * 3:(j + 1) * 3]) for j in range(3)]
    hay = procedural_haystack(12000, seed=300 + i).split(". ")
    ctx_parts = []
    for j, (n, c) in enumerate(zip(names, codes)):
        ctx_parts.append(". ".join(hay[j * 20:(j + 1) * 20]))
        ctx_parts.append(f" Remember this: the secret code of {n} is {c}. ")
    # >256 words of tail so no passkey lands inside the recent window
    ctx_parts.append(". ".join(hay[60:100]))
    qi = int(rng.integers(0, 3))
    recs.append({
        "context": "".join(ctx_parts),
        "input": f"Question: the secret code of {names[qi]} is",
        "answers": [codes[qi]], "all_classes": [],
        "length": sum(len(p.split()) for p in ctx_parts),
    })
with open(sys.argv[1] + "/triviaqa.jsonl", "w") as f:
    for r in recs:
        f.write(json.dumps(r) + "\n")
recs = []
for i in range(8):
    n = int(rng.integers(2, 6))
    ctx = "\n\n".join(procedural_haystack(1200, seed=200 + i * 10 + j)
                      for j in range(n))
    recs.append({"context": ctx, "input": "", "answers": [str(n)],
                 "all_classes": [], "length": len(ctx.split())})
with open(sys.argv[1] + "/passage_count.jsonl", "w") as f:
    for r in recs:
        f.write(json.dumps(r) + "\n")
print("wrote", sys.argv[1])
EOF
RUN="python -m duo_attention_tpu.evals.longbench
     --model constructed
     --data-dir $DATA --max-prompt-len 8000 --max-cache 12288
     --prefill-chunk 1024 --simulation-tokens 16 --max-samples 8"
$RUN --tasks triviaqa --sparsity 0.0 --out-dir "$OUT/full"
$RUN --tasks triviaqa passage_count --attn-pattern "$PATTERN" \
     --sparsity 0.5 --out-dir "$OUT/trained"
$RUN --tasks triviaqa --attn-pattern "$PATTERN" --sparsity 0.5 --invert \
     --out-dir "$OUT/inverted"
