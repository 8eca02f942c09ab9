"""One gate-train step at the REAL 8B geometry on the chip (VERDICT r3 #2).

Demonstrates the 7-8B trainer memory story on hardware: the full
32-layer Llama-3-8B geometry (4096 hidden, 32 q / 8 kv heads, 128256
vocab) as W8A8 weights (8 GB — bf16's 16 GB cannot share a 16 GB chip
with ANY activations), two-way teacher/student forward + backward with
per-layer activation checkpointing (remat, the reference's
duo_attn/train.py:302 counterpart) and the W8A8 straight-through
estimator, at the longest context that fits next to the weights.
Measures step time (compile + steady) and peak device memory.

The dp/sp/FSDP composition of the same step is validated on the
8-virtual-device mesh by tests/test_fsdp.py and
tests/test_train.py::test_fsdp_remat_step_matches_no_remat; one chip
cannot shard, so the hardware demo here is the per-device memory story.

Run: python scripts/train_8b_step_tpu.py --ctx 8192 \
        --out artifacts/train_8b_geometry
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ctx", type=int, default=8192)
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--block-k", type=int, default=1024)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--out", default="artifacts/train_8b_geometry")
    args = p.parse_args()

    from duo_attention_tpu.config import PRESETS
    from duo_attention_tpu.ops.quant import init_params_w8a8_random
    from duo_attention_tpu.train.data import IGNORE_INDEX
    from duo_attention_tpu.train.trainer import GateTrainConfig, GateTrainer
    from duo_attention_tpu.utils import (
        device_memory_stats,
        enable_compilation_cache,
        fence,
    )

    enable_compilation_cache()
    t0 = time.monotonic()
    cfg = dataclasses.replace(
        PRESETS["Llama-3-8B-Instruct-Gradient-1048k"],
        num_layers=args.layers,
    )
    params = init_params_w8a8_random(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print(f"[8b-step] W8A8 params ready (+{time.monotonic()-t0:.0f}s)",
          flush=True)

    tcfg = GateTrainConfig(
        lr=0.02, reg_weight=0.05, num_steps=args.steps,
        sink_size=64, recent_size=256, batch_size=1,
        block_k=args.block_k, remat=True,
        output_dir=os.path.join(args.out, "pattern"),
    )
    trainer = GateTrainer(params, cfg, tcfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(10, cfg.vocab_size - 10, (1, args.ctx),
                       dtype=np.int32)
    labels = np.where(rng.uniform(size=ids.shape) < 0.1, ids,
                      IGNORE_INDEX).astype(np.int64)

    log = {
        "geometry": {
            "layers": cfg.num_layers, "hidden": cfg.hidden_size,
            "q_heads": cfg.num_heads, "kv_heads": cfg.num_kv_heads,
            "vocab": cfg.vocab_size, "weights": "w8a8 int8 (8 GB)",
        },
        "ctx": args.ctx, "batch": 1, "remat": True,
        "block_k": args.block_k, "steps": [],
    }

    def xla_memory_analysis():
        """Peak-memory evidence from the compiled step program itself
        (the axon runtime does not expose device.memory_stats(); XLA's
        buffer-assignment totals are exact for a static program). Lower
        +compile hits the persistent cache after the first real step."""
        ids_j = jnp.asarray(ids)
        lb = np.concatenate(
            [labels[:, 1:],
             np.full((labels.shape[0], 1), IGNORE_INDEX, labels.dtype)],
            axis=1)
        compiled = trainer._step_fn.lower(
            trainer.gates, trainer.opt_state, trainer.params, ids_j,
            jnp.asarray(lb)).compile()
        ma = compiled.memory_analysis()
        fields = {}
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "alias_size_in_bytes",
                  "generated_code_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                fields[k] = int(v)
        if fields:
            live = (fields.get("argument_size_in_bytes", 0)
                    + fields.get("output_size_in_bytes", 0)
                    + fields.get("temp_size_in_bytes", 0)
                    - fields.get("alias_size_in_bytes", 0))
            fields["peak_estimate_bytes"] = live
            print(f"[8b-step] XLA buffers: args "
                  f"{fields.get('argument_size_in_bytes', 0)/2**30:.2f} GiB "
                  f"(weights+opt) + temp "
                  f"{fields.get('temp_size_in_bytes', 0)/2**30:.2f} GiB "
                  f"(activations) -> peak ~{live/2**30:.2f} GiB "
                  f"of the 16 GiB chip", flush=True)
        return fields
    for i in range(args.steps):
        ts = time.monotonic()
        loss, distill, reg = trainer.train_step(ids, labels)
        fence(trainer.gates)
        dur = time.monotonic() - ts
        mem = device_memory_stats()
        peak = (mem or {}).get("peak_bytes_in_use", 0)
        log["steps"].append({
            "step": i, "loss": float(loss), "distill": float(distill),
            "reg": float(reg), "wall_s": round(dur, 2),
            "peak_device_bytes": int(peak),
        })
        print(f"[8b-step] step {i}: loss={float(loss):.4f} "
              f"distill={float(distill):.5f} wall={dur:.1f}s "
              f"peak={peak/1e9:.2f} GB", flush=True)
        assert np.isfinite(float(loss)), "non-finite training loss"
    try:
        log["xla_memory_analysis"] = xla_memory_analysis()
    except Exception as e:  # keep the timing evidence even if AOT fails
        log["xla_memory_analysis"] = {"error": repr(e)}
        print(f"[8b-step] memory analysis unavailable: {e!r}", flush=True)
    g = np.asarray(trainer.gates)
    log["gates_moved"] = bool((np.abs(g - 1.0) > 1e-6).any())
    log["gates_minmax"] = [float(g.min()), float(g.max())]
    os.makedirs(args.out, exist_ok=True)
    out_json = os.path.join(args.out, f"log_ctx{args.ctx}.json")
    with open(out_json, "w") as f:
        json.dump(log, f, indent=2)
    print(f"[8b-step] gates moved: {log['gates_moved']} "
          f"range {log['gates_minmax']}; log -> {out_json}",
          flush=True)


if __name__ == "__main__":
    main()
