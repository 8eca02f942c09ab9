"""W8A8 + INT4-KV long-context serving demo.

Counterpart of demo/run_duo_w8a8kv4.py (SURVEY.md §3.4): INT8
weight/activation matmuls, INT4-quantized full-head KV cache, duo head
split at the requested sparsity, a multi-million-token prompt with a
needle sentence, chunked prefill with live progress/memory readout, then
greedy decode with tokens streamed to stdout.

The reference fits 3.3M tokens of Llama-3-8B on one A100-80G; a v5e chip
has 16 GB, so --num-layers/--len default to a configuration that fits
while exercising the identical code path (the full model runs unchanged
on a larger slice via the mesh in parallel/mesh.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from .cache import kv_memory_bytes
from .config import PRESETS, DuoConfig
from .engine import DuoEngine
from .evals.niah import DEFAULT_ANSWER, DEFAULT_NEEDLE, DEFAULT_QUESTION, load_haystack
from .models import llama
from .ops.quant import quantize_params_w8a8
from .patterns import (
    load_attn_pattern,
    num_full_kv_heads_per_layer,
    sparsify_attention_heads,
)
from .tokenizer import decode_ids, encode_ids, get_tokenizer
from .utils import device_memory_stats, fence


def main():
    from .utils import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(description="duo-attention W8A8KV4 demo")
    p.add_argument("--model", default="Llama-3-8B-Instruct-Gradient-1048k")
    p.add_argument("--num-layers", type=int, default=8)
    p.add_argument("--len", type=int, dest="target_len", default=262144)
    p.add_argument("--sparsity", type=float, default=0.5)
    p.add_argument("--attn-pattern", default=None)
    p.add_argument("--sink", type=int, default=64)
    p.add_argument("--recent", type=int, default=256)
    p.add_argument("--prefill-chunk", type=int, default=32768)
    p.add_argument("--max-new-tokens", type=int, default=128)
    p.add_argument("--tokenizer", default="byte")
    p.add_argument("--no-w8a8", action="store_true")
    p.add_argument("--no-int4-kv", action="store_true")
    p.add_argument("--quantize-embeds", action="store_true",
                   help="int8 embed/lm_head too (~1 GB extra KV budget)")
    args = p.parse_args()

    cfg = PRESETS[args.model]
    if args.num_layers:
        cfg = dataclasses.replace(cfg, num_layers=args.num_layers)
    sink, recent = args.sink, args.recent
    if args.attn_pattern:
        heads, sink, recent = load_attn_pattern(args.attn_pattern)
        heads, _ = sparsify_attention_heads(heads, sparsity=args.sparsity)
        nf = num_full_kv_heads_per_layer(heads)[: cfg.num_layers]
    else:
        nf = (round(cfg.num_kv_heads * (1 - args.sparsity)),) * cfg.num_layers
    # x8192 so the decode kernels get their preferred block sizes (8192
    # tokens for the packed INT4 path, 2048 for bf16 — both ~512KB DMA
    # blocks; a non-divisible buffer falls back to small blocks, several
    # times slower decode attention at this scale)
    max_cache = -(-(args.target_len + args.max_new_tokens + 1024) // 8192) * 8192
    duo = DuoConfig(
        sink_size=sink,
        recent_size=recent,
        num_full_kv_heads=tuple(nf),
        max_cache_size=max_cache,
        prefill_chunk_size=args.prefill_chunk,
    )

    print(f"[demo] building {args.model} x{cfg.num_layers} layers, "
          f"full-kv-heads={nf[0]}/{cfg.num_kv_heads}, target {args.target_len} tokens")
    if not args.no_w8a8:
        # layer-streaming init+quantize: an 8B bf16 model would not fit a
        # 16 GB chip alongside its int8 copy
        from .ops.quant import init_params_w8a8

        params = init_params_w8a8(
            cfg, jax.random.PRNGKey(0), quantize_embeds=args.quantize_embeds
        )
        print("[demo] weights quantized to W8A8 (per-channel int8 + dynamic "
              "per-token activation scales)")
    else:
        params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    engine = DuoEngine(
        params, cfg, duo,
        kv_quant=("none" if args.no_int4_kv else "int4"),
    )

    tokenizer = get_tokenizer(args.tokenizer)
    hay = load_haystack(None, args.target_len * 6)
    ids = encode_ids(tokenizer, hay)
    needle_ids = encode_ids(tokenizer, DEFAULT_NEEDLE)
    q_ids = encode_ids(tokenizer, DEFAULT_QUESTION)
    budget = args.target_len - len(needle_ids) - len(q_ids)
    ids = ids[:budget]
    insert = len(ids) // 2
    prompt = np.asarray(
        ids[:insert] + needle_ids + ids[insert:] + q_ids, np.int32
    )[None]
    print(f"[demo] prompt: {prompt.shape[1]} tokens (needle at 50% depth)")

    # chunked prefill with live stats (reference: run_duo_w8a8kv4.py:172-206).
    # The chunk-sized activation temps (and per-layer staging) share HBM
    # with the growing KV cache and the resident int8 weights, so the
    # largest-chunk program can fail to COMPILE at long contexts even
    # when a smaller chunk serves the same cache fine; on a compile OOM
    # the demo halves the chunk, rebuilds the engine, and restarts —
    # trading TTFT for fit instead of dying (chunk is the demo knob the
    # capacity table sweeps for exactly this reason).
    C = duo.prefill_chunk_size
    while True:
        cache = engine.new_cache()
        t_start = time.perf_counter()
        logits = None
        done = 0
        try:
            for off in range(0, prompt.shape[1], C):
                chunk = prompt[:, off : off + C]
                n_valid = chunk.shape[1]
                if n_valid < C:
                    chunk = np.pad(chunk, ((0, 0), (0, C - n_valid)))
                step = engine._chunk_step_fn(engine.bucket_for(done + C))
                t0 = time.perf_counter()
                cache, logits = step(
                    engine.params, cache, jnp.asarray(chunk),
                    jnp.asarray(n_valid, jnp.int32),
                )
                fence(logits)
                done += n_valid
                dt = time.perf_counter() - t0
                kv_gb = kv_memory_bytes(cache) / 1e9
                print(f"[prefill] {done}/{prompt.shape[1]} tokens | "
                      f"chunk {dt:.2f}s ({n_valid/dt:.0f} tok/s) | "
                      f"KV alloc {kv_gb:.2f} GB")
            break
        except jax.errors.JaxRuntimeError as e:
            oom = ("Ran out of memory" in str(e)
                   or "RESOURCE_EXHAUSTED" in str(e))
            if not oom or C <= 1024:
                raise
            C //= 2
            print(f"[demo] prefill program OOMed on this chip — retrying "
                  f"with chunk {C}")
            duo = dataclasses.replace(duo, prefill_chunk_size=C)
            engine = DuoEngine(
                params, cfg, duo,
                kv_quant=("none" if args.no_int4_kv else "int4"),
            )
    print(f"[prefill] total {time.perf_counter()-t_start:.1f}s")

    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    half = max(args.max_new_tokens // 2, 1)
    fn = engine._decode_fn(
        engine.bucket_for(prompt.shape[1] + args.max_new_tokens), half
    )
    t0 = time.perf_counter()
    tok_a, cache = fn(engine.params, cache, first)
    fence(tok_a)
    dt_cold = time.perf_counter() - t0
    # best-of-3 steady calls: a single tunneled call can absorb transient
    # dispatch hiccups an order above the real step time
    dt = float("inf")
    tok_b = tok_a
    for i in range(3):
        t0 = time.perf_counter()
        tok_c, cache = fn(engine.params, cache, tok_b[:, -1])
        fence(tok_c)
        dt = min(dt, time.perf_counter() - t0)
        if i == 0:
            tok_b = tok_c
    tokens = np.concatenate([np.asarray(tok_a), np.asarray(tok_b)], axis=1)
    text = decode_ids(tokenizer, tokens[0])
    print(f"[decode] {half} tokens in {dt:.2f}s steady "
          f"({half/dt:.1f} tok/s; first call incl. compile {dt_cold:.1f}s)")
    print(f"[decode] response: {text[:400]!r}")
    print(f"[demo] expected needle answer: {DEFAULT_ANSWER!r}")
    for d, s in device_memory_stats().items():
        if s:
            print(f"[mem] {d}: in_use={s.get('bytes_in_use',0)/1e9:.2f} GB, "
                  f"peak={s.get('peak_bytes_in_use',0)/1e9:.2f} GB")


if __name__ == "__main__":
    main()
