"""Quantization tests: INT4 KV round-trip + fused-dequant kernels, W8A8."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from duo_attention_tpu.cache import full_mask, init_cache_q4
from duo_attention_tpu.config import DuoConfig, TINY_GQA
from duo_attention_tpu.models import llama
from duo_attention_tpu.ops.attention_ref import masked_attention
from duo_attention_tpu.ops.flash import full_cache_attention_q4
from duo_attention_tpu.ops.quant import (
    dequantize_int4,
    int8_matmul,
    quantize_act_per_token,
    quantize_int4,
    quantize_params_w8a8,
    quantize_weight_int8,
    w8a8_linear,
)


def test_int4_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 64, 32), jnp.float32)
    packed, scales = quantize_int4(x)
    assert packed.shape == (2, 3, 64, 16) and packed.dtype == jnp.uint8
    assert scales.shape == (2, 3, 2, 64)
    x2 = dequantize_int4(packed, scales)
    # max error bounded by half a quantization step per (token, head) group
    step = (x.max(-1) - x.min(-1)) / 15.0
    err = jnp.max(jnp.abs(x - x2), axis=-1)
    assert bool(jnp.all(err <= step * 0.51 + 2e-2))


def test_int4_extremes_and_constants():
    x = jnp.ones((1, 1, 4, 8), jnp.float32) * 3.5  # constant group
    packed, scales = quantize_int4(x)
    x2 = dequantize_int4(packed, scales)
    np.testing.assert_allclose(np.asarray(x2), 3.5, atol=2e-2)


def test_int4_paired_roundtrip():
    from duo_attention_tpu.ops.quant import (
        dequantize_int4_paired,
        quantize_int4_paired,
    )

    x = jax.random.normal(jax.random.PRNGKey(7), (2, 3, 64, 32), jnp.float32)
    packed2, scales4 = quantize_int4_paired(x)
    assert packed2.shape == (2, 3, 32, 32) and packed2.dtype == jnp.uint8
    assert scales4.shape == (2, 3, 4, 32)
    x2 = dequantize_int4_paired(packed2, scales4)
    step = (x.max(-1) - x.min(-1)) / 15.0
    err = jnp.max(jnp.abs(x - x2), axis=-1)
    assert bool(jnp.all(err <= step * 0.51 + 2e-2))
    # paired and flat layouts decode to the same values
    packed, scales = quantize_int4(x)
    np.testing.assert_allclose(
        np.asarray(x2), np.asarray(dequantize_int4(packed, scales)), atol=2e-2
    )


@pytest.mark.parametrize(
    "S,cs_val",
    [(64, 100), (256, 100), (1, 300), (1, 301), (1, 0)],
    # S=256 exercises the bf16 prefill mode (rows >= 128), S=64/1 the int8
    # decode mode of update_q4
)
def test_q4_attention_matches_dequant_oracle(S, cs_val):
    from duo_attention_tpu.ops.quant import (
        dequantize_int4_paired,
        quantize_int4_paired,
    )

    B, Hq, Hkv, D, T = 1, 4, 2, 32, 512
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(keys[0], (B, S, Hq, D), jnp.float32)
    k = jax.random.normal(keys[1], (B, Hkv, T, D), jnp.float32)
    v = jax.random.normal(keys[2], (B, Hkv, T, D), jnp.float32)
    kq, ks4 = quantize_int4_paired(k)  # [B,H,T/2,D], [B,H,4,T/2]
    vq, vs4 = quantize_int4_paired(v)
    from duo_attention_tpu.ops.quant import paired_scales_to_cache_layout

    ks = paired_scales_to_cache_layout(ks4)  # [B, 8*Hkv, T//2]
    vs = paired_scales_to_cache_layout(vs4)
    cs = jnp.asarray(cs_val, jnp.int32)
    got = full_cache_attention_q4(q, kq, ks, vq, vs, cs)

    kd = dequantize_int4_paired(kq, ks4)
    vd = dequantize_int4_paired(vq, vs4)
    positions = cs + jnp.arange(S, dtype=jnp.int32)
    mask = full_mask(positions, T)[None, None]
    want = masked_attention(
        q, kd.transpose(0, 2, 1, 3), vd.transpose(0, 2, 1, 3), mask
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2)


def test_w8a8_matmul_accuracy():
    x = jax.random.normal(jax.random.PRNGKey(2), (16, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(3), (64, 32), jnp.float32) * 0.1
    wq, ws = quantize_weight_int8(w)
    y = w8a8_linear(x, wq, ws, out_dtype=jnp.float32)
    want = x @ w
    rel = jnp.linalg.norm(y - want) / jnp.linalg.norm(want)
    assert float(rel) < 0.03


def test_w8a8_model_forward_close():
    cfg = TINY_GQA
    duo = DuoConfig(
        sink_size=8, recent_size=16, num_full_kv_heads=(2,) * cfg.num_layers,
        max_cache_size=256, prefill_chunk_size=32,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(4), jnp.float32)
    qparams = quantize_params_w8a8(params)
    from duo_attention_tpu.cache import init_cache

    ids = jax.random.randint(jax.random.PRNGKey(5), (1, 32), 0, cfg.vocab_size)
    h1, _ = llama.forward_chunk(params, cfg, duo, init_cache(cfg, duo, 1, jnp.float32), ids)
    h2, _ = llama.forward_chunk(qparams, cfg, duo, init_cache(cfg, duo, 1, jnp.float32), ids)
    rel = jnp.linalg.norm(h1 - h2) / jnp.linalg.norm(h1)
    assert float(rel) < 0.12, float(rel)


def test_engine_int4_kv_generates_and_matches_loosely():
    from duo_attention_tpu.engine import DuoEngine

    cfg = TINY_GQA
    duo = DuoConfig(
        sink_size=8, recent_size=16, num_full_kv_heads=(2,) * cfg.num_layers,
        max_cache_size=512, prefill_chunk_size=64,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(6), jnp.float32)
    ids = np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 100))

    eng_fp = DuoEngine(params, cfg, duo, dtype=jnp.float32)
    eng_q4 = DuoEngine(params, cfg, duo, dtype=jnp.float32, kv_quant="int4")
    cache_fp, logits_fp = eng_fp.prefill(ids)
    cache_q4, logits_q4 = eng_q4.prefill(ids)
    assert int(cache_q4.length) == 100
    # same top-5 candidate set is too strict for random weights; compare
    # logit vectors loosely
    rel = np.linalg.norm(np.asarray(logits_fp) - np.asarray(logits_q4)) / (
        np.linalg.norm(np.asarray(logits_fp)) + 1e-9
    )
    assert rel < 0.15, rel
    toks, cache = eng_q4.generate(ids, max_new_tokens=6)
    assert toks.shape == (1, 6) and int(cache.length) == 106


def test_kv_memory_int4_is_4x_smaller():
    from duo_attention_tpu.cache import init_cache, kv_memory_bytes

    cfg = TINY_GQA
    duo = DuoConfig(
        sink_size=8, recent_size=16, num_full_kv_heads=(4,) * cfg.num_layers,
        max_cache_size=4096, prefill_chunk_size=64,
    )
    fp = kv_memory_bytes(init_cache(cfg, duo, 1, jnp.bfloat16))
    q4 = kv_memory_bytes(init_cache_q4(cfg, duo, 1, jnp.bfloat16))
    # full cache dominates at max_cache >> sink+recent+chunk: expect ~3-4x
    assert fp / q4 > 2.5, (fp, q4)


def test_init_params_w8a8_streaming():
    """Layer-streaming init produces the same structure as init-then-quantize."""
    import jax

    from duo_attention_tpu.config import TINY_GQA
    from duo_attention_tpu.models import llama
    from duo_attention_tpu.ops.quant import init_params_w8a8

    cfg = TINY_GQA
    p = init_params_w8a8(cfg, jax.random.PRNGKey(0), jnp.float32)
    assert len(p["layers"]) == cfg.num_layers
    for layer in p["layers"]:
        assert "wq_q8" in layer and "wq" not in layer
        assert layer["wq_q8"].dtype == jnp.int8
    ids = jnp.zeros((1, 16), jnp.int32)
    out = llama.forward_full_attention(p, cfg, ids)
    assert np.isfinite(np.asarray(out)).all()


def test_w8a8_pallas_gemm_matches_dot_general():
    import jax

    from duo_attention_tpu.ops.gemm import w8a8_matmul
    from duo_attention_tpu.ops.quant import int8_matmul

    rng = np.random.default_rng(0)
    M, K, N = 512, 256, 384
    xq = rng.integers(-127, 128, (M, K)).astype(np.int8)
    wq = rng.integers(-127, 128, (K, N)).astype(np.int8)
    xs = rng.uniform(0.001, 0.02, (M, 1)).astype(np.float32)
    ws = rng.uniform(0.001, 0.02, (N,)).astype(np.float32)
    got = w8a8_matmul(jnp.asarray(xq), jnp.asarray(xs), jnp.asarray(wq),
                      jnp.asarray(ws), out_dtype=jnp.float32)
    want = int8_matmul(jnp.asarray(xq), jnp.asarray(xs), jnp.asarray(wq),
                       jnp.asarray(ws), out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_w8a8_linear_pallas_path_matches_small_path():
    from duo_attention_tpu.ops.quant import quantize_weight_int8, w8a8_linear

    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((256, 384)).astype(np.float32))
    wq, ws = quantize_weight_int8(w)
    x = jnp.asarray(rng.standard_normal((1, 512, 256)).astype(np.float32))
    big = w8a8_linear(x, wq, ws, out_dtype=jnp.float32)  # pallas path
    rows = [
        w8a8_linear(x[:, i : i + 1], wq, ws, out_dtype=jnp.float32)
        for i in range(0, 512, 97)
    ]
    for idx, r in zip(range(0, 512, 97), rows):
        np.testing.assert_allclose(
            np.asarray(big[:, idx]), np.asarray(r[:, 0]), rtol=1e-5, atol=1e-5
        )


def test_int8_embeddings_forward():
    import jax

    from duo_attention_tpu.config import TINY_GQA
    from duo_attention_tpu.models import llama
    from duo_attention_tpu.ops.quant import quantize_embeddings_int8

    cfg = TINY_GQA
    params = llama.init_params(cfg, jax.random.PRNGKey(2), jnp.float32)
    qp = quantize_embeddings_int8(dict(params))
    assert "embed_q8" in qp and "embed" not in qp
    assert "lm_head_q8" in qp and "lm_head" not in qp

    ids = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 24)))
    h_ref = llama.forward_full_attention(params, cfg, ids)
    h_q = llama.forward_full_attention(qp, cfg, ids)
    # int8 embeds perturb activations mildly; outputs must stay close
    ref = np.asarray(h_ref)
    err = np.abs(np.asarray(h_q) - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert err < 0.05, err
    logits = llama.logits_at(qp, h_q, 5)
    assert logits.shape == (1, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_q4_decode_small_bucket_caps_block():
    """A short-context decode over a big buffer must pick a bucket-capped
    KV block (not a whole 32768-token block) and stay correct."""
    from duo_attention_tpu.ops.quant import (
        dequantize_int4_paired,
        paired_scales_to_cache_layout,
        quantize_int4_paired,
    )

    B, Hq, Hkv, D, T = 1, 4, 2, 32, 32768
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(keys[0], (B, 1, Hq, D), jnp.float32)
    k = jax.random.normal(keys[1], (B, Hkv, T, D), jnp.float32)
    v = jax.random.normal(keys[2], (B, Hkv, T, D), jnp.float32)
    kq, ks4 = quantize_int4_paired(k)
    vq, vs4 = quantize_int4_paired(v)
    ks = paired_scales_to_cache_layout(ks4)
    vs = paired_scales_to_cache_layout(vs4)
    cs = jnp.asarray(700, jnp.int32)
    got = full_cache_attention_q4(q, kq, ks, vq, vs, cs, bucket=1024)

    kd = dequantize_int4_paired(kq, ks4)
    vd = dequantize_int4_paired(vq, vs4)
    mask = full_mask(cs + jnp.arange(1, dtype=jnp.int32), T)[None, None]
    want = masked_attention(
        q, kd.transpose(0, 2, 1, 3), vd.transpose(0, 2, 1, 3), mask
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2)
