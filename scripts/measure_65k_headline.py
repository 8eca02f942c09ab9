"""One-off: measure candidate 65k memory-matched serving headline configs
(duo@0.5 B=5 vs full B=3 and B=2, all W8A8KV4) to pick bench.py's
round-5 headline. Also warms the persistent compile cache for whatever
config bench.py ends up using."""
import sys, time
sys.path.insert(0, ".")
import jax

from bench import build, model_cfg, bench_decode, trace, _require_device

def main():
    from duo_attention_tpu.ops.quant import init_params_w8a8_random
    from duo_attention_tpu.utils import enable_compilation_cache

    _require_device()
    enable_compilation_cache()
    cfg = model_cfg(32)
    params = init_params_w8a8_random(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    trace("params ready")
    ctx = 65536
    out = {}
    for sp, b in ((0.5, 5), (0.0, 2), (0.0, 3)):
        key = f"sp{sp}_B{b}"
        try:
            eng = build(cfg, ctx, sparsity=sp, params=params,
                        kv_quant="int4", batch_size=b, chunk=1024)
            tps, best, kv = bench_decode(eng, ctx, repeats=3)
            del eng
            out[key] = (tps * b, best * b, kv / 1e9)
            trace(f"{key}: mean {tps*b:.1f} agg tok/s (best {best*b:.1f}), "
                  f"KV {kv/1e9:.2f} GB")
        except Exception as e:  # OOM etc.
            out[key] = ("FAIL", repr(e)[:200])
            trace(f"{key} FAILED: {e!r}")
    print(out)

main()
