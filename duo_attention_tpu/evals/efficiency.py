"""Efficiency benchmarks: prefill latency, decode latency, KV memory.

Counterpart of eval/efficiency/benchmark_{dynamic,static}.py + utils.py
(SURVEY.md §2.3): chunked-prefill latency over the full context, decode
latency averaged over N steps after warmup with the context held fixed,
KV-cache byte accounting, results appended to benchmark_result.txt.
TPU deltas: value-fetch fences instead of CUDA events; the cache length is
pinned per measurement window instead of evict_last (functional caches
have no in-place eviction to undo).
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..cache import kv_memory_bytes
from ..config import PRESETS, DuoConfig
from ..engine import DuoEngine
from ..models import llama
from ..patterns import (
    load_attn_pattern,
    num_full_kv_heads_per_layer,
    sparsify_attention_heads,
)
from ..utils import device_memory_stats, fence


def build_engine(args):
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
    duo = DuoConfig(
        sink_size=sink,
        recent_size=recent,
        num_full_kv_heads=tuple(nf),
        max_cache_size=args.ctx_len,
        prefill_chunk_size=args.prefill_chunk,
    )
    if getattr(args, "w8a8", False):
        # value-independent perf: random int8 weights in one dispatch
        # (bench.py does the same; real weights via models.convert +
        # ops.quant.quantize_params_w8a8)
        from ..ops.quant import init_params_w8a8_random

        params = init_params_w8a8_random(cfg, jax.random.PRNGKey(0))
    else:
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
    batch = getattr(args, "batch_size", 1)
    kv_quant = getattr(args, "kv_quant", "none")
    return (
        DuoEngine(params, cfg, duo, batch_size=batch, kv_quant=kv_quant),
        cfg, duo,
    )


def bench_prefill(engine, ctx_len, runs=3):
    """Chunked prefill latency over ctx_len tokens (median of runs).

    The previous run's cache must be dropped BEFORE the next prefill
    allocates its own: at 32 layers the two caches plus the 8 GB int8
    weights exceed the 16 GB chip from 64k context up (prefill donates
    its cache argument, so only the benchmark's outer reference keeps a
    second copy alive)."""
    ids = np.zeros((1, ctx_len), np.int32)
    # warm compile for every bucket
    cache, logits = engine.prefill(ids)
    fence(logits)
    kv = kv_memory_bytes(cache)
    del cache
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        cache, logits = engine.prefill(ids)
        fence(logits)
        times.append(time.perf_counter() - t0)
        del cache
    return float(np.median(times)), kv


def bench_decode(engine, ctx_len, steps=64, warmup=8, repeats=3):
    """Steady-state decode latency with the cache pre-advanced to ctx_len.
    With engine.batch_size > 1 this measures batched decode (aggregate
    tokens/s amortizes the weight reads across sequences). Headroom is
    sized for every decoded token plus one steps of slack (overrunning
    max_cache_size poisons the decode output — engine._decode_scan)."""
    headroom = repeats * steps + warmup + steps
    cache = engine.new_cache()
    cache = cache._replace(
        length=jnp.asarray(max(ctx_len - headroom, 0), jnp.int32)
    )
    token = jnp.zeros((engine.batch_size,), jnp.int32)
    bucket = engine.bucket_for(ctx_len)
    tokens, cache = engine._decode_fn(bucket, warmup)(engine.params, cache, token)
    fence(tokens)
    fn = engine._decode_fn(bucket, steps)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        tokens, cache = fn(engine.params, cache, tokens[:, -1])
        fence(tokens)
        best = min(best, time.perf_counter() - t0)
    return best / steps, kv_memory_bytes(cache)


def bench_serving(cfg, duo, batch, ctx_len, kv_quant="int4", steps=64,
                  w8a8=True):
    """Aggregate batched-decode throughput of the serving pool.

    Uses the decode-only compact streaming cache (cache.ring_capacity
    decode_only=True — the ServingEngine batch pool) with staggered
    per-sequence lengths, i.e. the continuous-batching steady state.
    Measured (v5e, 32-layer 8B W8A8KV4): 414 tok/s aggregate at batch 8 x
    16k ctx, 19.3 ms/step — batching amortizes the weight reads (one
    sequence decodes at ~15 ms/step base).
    """
    import functools

    from ..cache import init_cache, init_cache_q4
    from ..models import llama
    from ..serving import _batched_decode_step

    if w8a8:
        from ..ops.quant import init_params_w8a8

        params = init_params_w8a8(
            cfg, jax.random.PRNGKey(0), quantize_embeds=True
        )
    else:
        params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    init = init_cache_q4 if kv_quant == "int4" else init_cache
    cache = init(cfg, duo, batch, jnp.bfloat16, decode_only=True)
    # staggered lengths, clamped so every sequence keeps steps+slack of
    # cache headroom (and never goes negative for tiny test configs)
    base = max(ctx_len - steps - 8 - 600, 1)
    lengths = jnp.asarray(
        [max(base - 37 * i, 1) for i in range(batch)], jnp.int32
    )
    cache = cache._replace(length=lengths)
    tokens = jnp.zeros((batch,), jnp.int32)
    active = jnp.ones((batch,), bool)
    one = functools.partial(
        _batched_decode_step, cfg=cfg, duo=duo,
        attn_impl="pallas" if jax.default_backend() == "tpu" else "ref",
        full_bucket=ctx_len,
    )

    def burst(params, cache, tokens, active):
        def body(carry, _):
            toks, cache = carry
            toks, cache = one(params, cache, toks, active)
            return (toks, cache), None

        (tokens, cache), _ = jax.lax.scan(
            body, (tokens, cache), None, length=steps
        )
        return tokens, cache

    fn = jax.jit(burst, donate_argnums=(1,))
    tokens, cache = fn(params, cache, tokens, active)
    fence(tokens.astype(jnp.float32).sum())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        tokens, cache = fn(params, cache, tokens, active)
        fence(tokens.astype(jnp.float32).sum())
        best = min(best, time.perf_counter() - t0)
    return batch * steps / best, kv_memory_bytes(cache)


def main():
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(description="efficiency benchmark")
    p.add_argument("--model", default="Llama-3-8B-Instruct-Gradient-1048k")
    p.add_argument("--num-layers", type=int, default=8)
    p.add_argument("--attn-pattern", default=None)
    p.add_argument("--sparsity", type=float, default=0.5)
    p.add_argument("--sink", type=int, default=64)
    p.add_argument("--recent", type=int, default=256)
    p.add_argument("--ctx-len", type=int, default=131072)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--prefill-chunk", type=int, default=8192)
    p.add_argument("--decode-steps", type=int, default=64)
    p.add_argument("--skip-prefill", action="store_true")
    p.add_argument("--w8a8", action="store_true",
                   help="INT8 weight/activation linears + int8 embeds "
                   "(the reference demo's compute precision)")
    p.add_argument("--kv-quant", choices=["none", "int4"], default="none",
                   help="INT4 token-paired KV cache (W8A8KV4 with --w8a8)")
    p.add_argument("--serving-batch", type=int, default=0,
                   help="also measure serving-pool aggregate decode at this batch")
    p.add_argument("--output", default="benchmark_result.txt")
    p.add_argument("--json-output", default=None,
                   help="also append one JSON object per run (the sweep "
                   "artifact format, scripts/run_capacity_sweep.sh)")
    args = p.parse_args()

    engine, cfg, duo = build_engine(args)
    record = {
        "model": args.model, "layers": cfg.num_layers, "ctx": args.ctx_len,
        "sparsity": args.sparsity, "sink": duo.sink_size,
        "recent": duo.recent_size, "chunk": duo.prefill_chunk_size,
        "batch": args.batch_size, "w8a8": bool(args.w8a8),
        "kv_quant": args.kv_quant, "backend": jax.default_backend(),
    }
    lines = [
        f"model={args.model} layers={cfg.num_layers} ctx={args.ctx_len} "
        f"sparsity={args.sparsity} sink={duo.sink_size} recent={duo.recent_size} "
        f"chunk={duo.prefill_chunk_size}"
    ]
    if not args.skip_prefill:
        t, kv = bench_prefill(engine, args.ctx_len)
        record.update(prefill_ttft_p50_s=t, prefill_tok_s=args.ctx_len / t)
        lines.append(
            f"prefill: {t:.3f} s total, "
            f"{args.ctx_len / t:.0f} tok/s, kv_bytes={kv}"
        )
    t, kv = bench_decode(engine, args.ctx_len, args.decode_steps)
    agg = args.batch_size / t
    record.update(decode_ms_per_step=t * 1e3, decode_tok_s=agg, kv_bytes=kv)
    lines.append(
        f"decode: {t * 1e3:.2f} ms/step, {agg:.1f} tok/s aggregate "
        f"(batch={args.batch_size}), kv_bytes={kv}"
    )
    if args.serving_batch:
        agg, kv = bench_serving(
            cfg, duo, args.serving_batch, args.ctx_len,
            steps=args.decode_steps,
        )
        record.update(serving_batch=args.serving_batch,
                      serving_tok_s=agg, serving_kv_bytes=kv)
        lines.append(
            f"serving: {agg:.1f} tok/s aggregate "
            f"(batch={args.serving_batch}, compact pool), kv_bytes={kv}"
        )
    mem = device_memory_stats()
    for d, s in mem.items():
        if s:
            record["peak_bytes_in_use"] = s.get("peak_bytes_in_use")
            lines.append(
                f"device {d}: peak_bytes_in_use={s.get('peak_bytes_in_use')}"
            )
    report = "\n".join(lines)
    print(report)
    with open(args.output, "a") as f:
        f.write(report + "\n\n")
    if args.json_output:
        import json

        with open(args.json_output, "a") as f:
            f.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
