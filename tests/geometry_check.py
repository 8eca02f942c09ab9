"""Shared real-8B-geometry converter check (not collected by pytest).

Drives the full deploy path at the REAL Llama-3-8B geometry — 4096
hidden, 32 q / 8 kv heads, 128256 vocab, exact per-layer shapes — with a
depth override to keep runtime sane: synthetic HF checkpoint
(models/synth.py) -> convert -> reorder with a REAL reference-trained
pattern -> W8A8+INT4 quantize -> engine decode, plus the
permutation-symmetry assert at real widths. Used by
tests/test_convert.py (slow, CPU) and tests/test_tpu_smoke.py (on-chip).
Counterpart: duo_attn/patch/utils.py:6-45, demo/w8a8kv4_llama.py:496-627.
"""

import dataclasses
import glob

import jax.numpy as jnp
import numpy as np


def run_real_geometry_check(tmp_dir: str, num_layers: int = 2,
                            symmetry: bool = True):
    from duo_attention_tpu.config import PRESETS
    from duo_attention_tpu.engine import DuoEngine
    from duo_attention_tpu.models import convert, llama
    from duo_attention_tpu.models.synth import write_synth_checkpoint
    from duo_attention_tpu.ops.quant import (
        quantize_embeddings_int8,
        quantize_params_w8a8,
    )
    from duo_attention_tpu.patterns import (
        load_attn_pattern,
        sparsify_attention_heads,
    )

    cfg8 = dataclasses.replace(
        PRESETS["Llama-3-8B-Instruct-Gradient-1048k"], num_layers=num_layers
    )
    ckpt = write_synth_checkpoint(tmp_dir, cfg8, seed=3)

    # real trained pattern shipped with the reference (protocol artifact)
    runs = sorted(glob.glob(
        "/root/reference/attn_patterns/Llama-3-8B-Instruct-Gradient-1048k/*"
    ))
    if runs:
        heads, _, _ = load_attn_pattern(runs[0])
        binary, _ = sparsify_attention_heads(heads, sparsity=0.5)
        binary = binary[:num_layers]
    else:  # pattern artifacts absent: synthesize a mixed split
        binary = np.tile([1.0, 0, 1, 0, 0, 1, 0, 1], (num_layers, 1))

    params, cfg_loaded, duo = convert.load_hf_model(
        ckpt, binary, sink_size=64, recent_size=256,
        max_cache_size=2048, prefill_chunk_size=512, dtype=jnp.bfloat16,
    )
    assert cfg_loaded.hidden_size == 4096
    assert cfg_loaded.num_heads == 32 and cfg_loaded.num_kv_heads == 8
    assert cfg_loaded.vocab_size == 128256
    assert params["layers"][0]["wq"].shape == (4096, 4096)
    assert params["layers"][0]["wk"].shape == (4096, 1024)
    assert duo.num_full_kv_heads == tuple(int(r.sum()) for r in binary)

    ids = np.arange(24, dtype=np.int32)[None] * 977 % cfg8.vocab_size
    if symmetry:
        # permutation symmetry at real widths: full attention on the
        # permuted weights == full attention on identity-loaded weights
        params_id, _, _ = convert.load_hf_model(
            ckpt, np.ones_like(binary), sink_size=64, recent_size=256,
            dtype=jnp.bfloat16,
        )
        h_perm = llama.forward_full_attention(params, cfg8, jnp.asarray(ids))
        h_id = llama.forward_full_attention(params_id, cfg8, jnp.asarray(ids))
        np.testing.assert_allclose(
            np.asarray(h_perm, np.float32), np.asarray(h_id, np.float32),
            atol=3e-2, rtol=3e-2,
        )
        del params_id

    # quantize-after-reorder (the deploy order); decode through the engine
    qparams = quantize_embeddings_int8(quantize_params_w8a8(params))
    eng = DuoEngine(qparams, cfg8, duo, batch_size=1, dtype=jnp.bfloat16,
                    kv_quant="int4")
    toks, cache = eng.generate(ids[:, :16], max_new_tokens=2)
    assert toks.shape == (1, 2) and int(cache.length) == 18
    assert (toks >= 0).all()
    return cfg8
