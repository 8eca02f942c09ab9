#!/usr/bin/env bash
# LongBench pred+eval for one model at one sparsity (reference: scripts/longbench.sh)
set -e
MODEL=${1:-Llama-3-8B-Instruct-Gradient-1048k}
SPARSITY=${2:-0.5}
shift 2 || true
python -m duo_attention_tpu.evals.longbench \
  --model "$MODEL" --sparsity "$SPARSITY" --sink 64 --recent 256 \
  --out-dir "longbench_results/${MODEL}_s${SPARSITY}" \
  --tasks narrativeqa qasper multifieldqa_en hotpotqa 2wikimqa musique \
          gov_report qmsum multi_news trec triviaqa samsum \
          passage_count passage_retrieval_en lcc repobench-p "$@"
