"""Decompose the headline decode step's cost on the chip.

The serving headline (bench.py) decodes at ~24.5 ms/step for duo@0.5
B=8 @ 32k W8A8KV4. Roofline: ~8 GB int8 weight read (~10 ms at the
measured in-situ 800 GB/s) + 6.2 GB KV read (~7.8 ms) ≈ 18 ms. This
probe separates the three components by measuring the same compiled
64-step burst at (a) near-zero cache length (weights + fixed overhead
only — the kernels' KV loops are length-masked, so DMA volume tracks
the live length) and (b) the benched length, across batch sizes.
Prints a JSON summary to stdout; informs kernel tuning, not a driver
artifact.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def time_burst(eng, length, steps=64, reps=4):
    from duo_attention_tpu.utils import fence

    cache = eng.new_cache()
    cache = cache._replace(length=jnp.asarray(length, jnp.int32))
    tok = jnp.zeros((eng.batch_size,), jnp.int32)
    step_fn = eng._decode_fn(eng.bucket_for(length + steps * (reps + 2)), steps)
    tokens, cache = step_fn(eng.params, cache, tok)
    fence(tokens)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        tokens, cache = step_fn(eng.params, cache, tokens[:, -1])
        fence(tokens)
        times.append((time.perf_counter() - t0) / steps)
    return min(times)  # per-step seconds


def main():
    from bench import build, model_cfg, trace
    from duo_attention_tpu.cache import kv_memory_bytes
    from duo_attention_tpu.ops.quant import init_params_w8a8_random
    from duo_attention_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = model_cfg(32)
    params = init_params_w8a8_random(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    trace("params ready")
    out = {}
    for b in (8, 1):
        eng = build(cfg, 32768, sparsity=0.5, params=params,
                    kv_quant="int4", batch_size=b, chunk=1024)
        t_short = time_burst(eng, 1024)
        live = 32768 - 64 * 6 - 128
        t_long = time_burst(eng, live)
        kv = kv_memory_bytes(eng.new_cache())
        del eng
        # Marginal-read bytes are scaled by live/capacity: the timed
        # bursts run at live length ~32.2k against a 32768-slot cache,
        # and the kernels' length-masked KV loops only DMA live blocks.
        # Still a mild UPPER bound on bandwidth: the streaming half of
        # the heads reads a constant small ring at both lengths, so the
        # numerator slightly overcounts the long-minus-short delta.
        kv_live = kv * live / 32768
        out[f"B{b}"] = {
            "step_ms_short_cache": round(t_short * 1e3, 2),
            "step_ms_32k_cache": round(t_long * 1e3, 2),
            "kv_read_ms": round((t_long - t_short) * 1e3, 2),
            "kv_gb_total": round(kv / 1e9, 2),
            "kv_read_gbps": round(
                kv_live / max(t_long - t_short, 1e-9) / 1e9, 1
            ),
        }
        trace(f"B={b}: short {t_short*1e3:.2f} ms, 32k {t_long*1e3:.2f} ms, "
              f"marginal KV BW {out[f'B{b}']['kv_read_gbps']} GB/s")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
