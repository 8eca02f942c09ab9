"""End-to-end accuracy loop: pretrain -> gate-train -> 3-way retrieval eval.

The reference's entire validation story is NIAH/LongBench on pretrained
checkpoints (eval/needle/needle_in_haystack.py:183-221); none exist in
this offline environment, so this driver closes the loop with a model
trained from scratch (train/pretrain.py):

1. Pretrain the tiny Llama with FULL attention until it solves the
   procedural multi-passkey task (byte-level induction).
2. Run GateTrainer (reference recipe scripts/train.sh:14-34, scaled) on
   the frozen model to a converged gate pattern TSV.
3. Evaluate passkey retrieval by generation through the REAL engine
   (chunked prefill + decode scan) three ways:
     a. full attention        (sparsity 0 — every head retrieval)
     b. trained pattern @ s   (gates thresholded at the target sparsity)
     c. inverted pattern @ s  (the complement — same head budget, wrong
                               heads kept full)
   Success = (b) scores ~= (a) while (c) collapses, demonstrating the
   framework's central scientific capability: gate identification that
   preserves retrieval accuracy.

Run: python -m duo_attention_tpu.evals.accuracy_loop --out-dir artifacts/accuracy_loop
(defaults sized for the TPU: ~10 min warm). --quick shrinks everything
for the CPU test suite.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DuoConfig, ModelConfig
from ..engine import DuoEngine
from ..models import llama
from ..models.convert import reorder_params
from ..patterns import (
    load_attn_pattern,
    num_full_kv_heads_per_layer,
    sparsify_attention_heads,
)
from ..tokenizer import decode_ids, get_tokenizer
from ..train.data import MultiPasskeyDataset, PasskeyDataConfig, data_iterator
from ..train.pretrain import (
    TINY_LM,
    PretrainConfig,
    answer_token_accuracy,
    load_lm,
    pretrain,
    save_lm,
)
from .metrics import word_overlap_score


def build_engine(params, cfg, binary_heads, sink, recent, max_cache,
                 chunk, dtype=jnp.float32, w8a8=False, kv_quant="none"):
    """Reorder weights for a binary pattern and build the serving engine —
    the same load-path a user of a real checkpoint goes through. With
    ``w8a8``/``kv_quant`` the engine is the FLAGSHIP quantized stack
    (INT8 weights/activations + INT4 KV, the reference demo path
    demo/run_duo_w8a8kv4.py:83-206), quantized after reordering exactly
    like a real deployment."""
    reordered, num_full = reorder_params(params, cfg, binary_heads)
    if w8a8:
        from ..ops.quant import quantize_params_w8a8

        reordered = quantize_params_w8a8(reordered)
    duo = DuoConfig(
        sink_size=sink, recent_size=recent, num_full_kv_heads=num_full,
        max_cache_size=max_cache, prefill_chunk_size=chunk,
    )
    return DuoEngine(reordered, cfg, duo, batch_size=1, dtype=dtype,
                     kv_quant=kv_quant)


def eval_retrieval(engine, tokenizer, dataset, n_samples: int,
                   offset: int = 60_000) -> dict:
    """Generate each sample's first answer through the engine; score by
    word overlap with the expected code (exact_match reported too)."""
    overlaps, exacts = [], []
    for i in range(n_samples):
        ids, answer = dataset.eval_prompt(offset + i)
        # generous budget either way: word tokenizer ~1 token/word, byte
        # tokenizer ~1 token/char
        n_ans = len(answer) + 8
        toks, _ = engine.generate(ids[None], max_new_tokens=n_ans)
        text = decode_ids(tokenizer, toks[0])
        overlaps.append(word_overlap_score(text, answer))
        exacts.append(float(text.strip().startswith(answer)))
    return {
        "word_overlap": float(np.mean(overlaps)),
        "exact_match": float(np.mean(exacts)),
        "n": n_samples,
    }


def run_loop(
    out_dir: str,
    pretrain_steps: int = 3000,
    gate_steps: int = 600,
    eval_samples: int = 16,
    sparsity: float = 0.5,
    cfg: Optional[ModelConfig] = None,
    ctx_min: int = 256,
    ctx_max: int = 1024,
    sink: int = 16,
    recent: int = 64,
    batch_size: int = 8,
    reuse_lm: bool = True,
    lm: str = "constructed",
    quantized_eval: bool = True,
) -> dict:
    from ..train.trainer import GateTrainConfig, GateTrainer
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    os.makedirs(out_dir, exist_ok=True)
    # word-level tokens: passkey retrieval becomes the canonical
    # induction-head copy task (the granularity a real BPE gives the
    # reference's NATO-alphabet passkeys)
    tokenizer = get_tokenizer("word")
    dcfg = PasskeyDataConfig(
        context_length_min=min(128, ctx_min),  # short-range curriculum
        context_length_max=ctx_max,
        num_passkeys=2, passkey_length=3,
    )
    dataset = MultiPasskeyDataset(tokenizer, dcfg, num_samples=100_000)

    # -- 1. obtain a retrieval-capable LM (full attention) ------------------
    # lm="constructed": exact hand-built induction circuit in our Llama
    # architecture (models/constructed.py) — deterministic, and its
    # ground-truth retrieval heads are KNOWN (layer 1, heads 0/1), so the
    # gate trainer is validated against a known answer. lm="pretrain":
    # gradient-trained tiny LM (train/pretrain.py) — retained, but
    # content-based induction did not emerge within this environment's
    # compute budget (see constructed.py docstring for the measurements).
    losses = []
    if lm in ("constructed", "constructed-long"):
        from ..models.constructed import build_params, spec_for

        spec = spec_for(lm)
        cfg = spec.model_config()
        params = build_params(tokenizer, spec=spec)
    else:
        cfg = cfg or TINY_LM
        lm_path = os.path.join(out_dir, "tiny_lm.npz")
        if reuse_lm and os.path.exists(lm_path):
            params = load_lm(lm_path, cfg)
            print(f"[loop] reusing pretrained LM at {lm_path}", flush=True)
        else:
            params, losses = pretrain(
                cfg, PretrainConfig(num_steps=pretrain_steps,
                                    batch_size=batch_size),
                dcfg, tokenizer,
            )
            save_lm(params, lm_path)
    tf_acc = answer_token_accuracy(params, cfg, dataset, n_samples=16,
                                   offset=50_000)
    print(f"[loop] teacher-forced answer accuracy (full attn): {tf_acc:.3f}",
          flush=True)

    # -- 2. gate training ---------------------------------------------------
    pattern_dir = os.path.join(out_dir, "pattern")
    tcfg = GateTrainConfig(
        lr=0.02, reg_weight=0.05, num_steps=gate_steps,
        sink_size=sink, recent_size=recent, batch_size=batch_size,
        save_steps=max(gate_steps // 4, 1), output_dir=pattern_dir,
        block_k=128,
    )
    gates_tsv = os.path.join(pattern_dir, "full_attention_heads.tsv")
    if reuse_lm and os.path.exists(gates_tsv):
        print(f"[loop] reusing gate pattern at {gates_tsv}", flush=True)
    else:
        trainer = GateTrainer(params, cfg, tcfg)
        it = data_iterator(dataset, batch_size, pad_to=ctx_max + 256)
        trainer.train(it, log_every=max(gate_steps // 10, 1))
    gates, p_sink, p_recent = load_attn_pattern(pattern_dir)

    # -- 3. three-way retrieval eval ---------------------------------------
    binary, actual_sparsity = sparsify_attention_heads(gates, sparsity=sparsity)
    inverted = 1.0 - binary
    full = np.ones_like(binary)
    max_cache = ctx_max + 512
    chunk = 256
    results = {}
    variants = [("", {})]
    if quantized_eval:
        # the FLAGSHIP serving stack: W8A8 linears + INT4 KV cache — the
        # reference's whole demo exists to show retrieval accuracy
        # SURVIVES this quantization (demo/run_duo_w8a8kv4.py:83-206);
        # prove the same through the quantized engine here.
        variants.append(("_w8a8kv4", {"w8a8": True, "kv_quant": "int4"}))
    for name, pattern in [
        ("full_attention", full),
        ("trained_pattern", binary),
        ("inverted_pattern", inverted),
    ]:
        for suffix, qkw in variants:
            eng = build_engine(params, cfg, pattern, sink, recent,
                               max_cache, chunk, **qkw)
            results[name + suffix] = eval_retrieval(
                eng, tokenizer, dataset, eval_samples
            )
            print(f"[loop] {name}{suffix}: "
                  f"overlap={results[name + suffix]['word_overlap']:.3f} "
                  f"exact={results[name + suffix]['exact_match']:.3f}",
                  flush=True)

    report = {
        "lm": lm,
        "model": dataclasses.asdict(cfg),
        "pretrain_steps": pretrain_steps,
        "pretrain_loss_curve": losses,
        "teacher_forced_answer_acc": tf_acc,
        "gate_steps": gate_steps,
        "sparsity_target": sparsity,
        "sparsity_actual": float(actual_sparsity),
        "gates": np.asarray(gates).tolist(),
        "sink": sink,
        "recent": recent,
        "results": results,
    }
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return report


def main():
    p = argparse.ArgumentParser(description="end-to-end accuracy loop")
    p.add_argument("--out-dir", default="artifacts/accuracy_loop")
    p.add_argument("--pretrain-steps", type=int, default=3000)
    p.add_argument("--gate-steps", type=int, default=600)
    p.add_argument("--eval-samples", type=int, default=16)
    p.add_argument("--sparsity", type=float, default=0.5)
    p.add_argument("--lm",
                   choices=["constructed", "constructed-long", "pretrain"],
                   default="constructed")
    p.add_argument("--fresh", action="store_true",
                   help="retrain even if artifacts exist")
    p.add_argument("--no-quant", action="store_true",
                   help="skip the W8A8+INT4-KV engine variants")
    args = p.parse_args()
    report = run_loop(
        args.out_dir,
        pretrain_steps=args.pretrain_steps,
        gate_steps=args.gate_steps,
        eval_samples=args.eval_samples,
        sparsity=args.sparsity,
        reuse_lm=not args.fresh,
        lm=args.lm,
        quantized_eval=not args.no_quant,
    )
    r = report["results"]
    print(json.dumps({k: v["word_overlap"] for k, v in r.items()}))


if __name__ == "__main__":
    main()
