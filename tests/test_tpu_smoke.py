"""On-TPU kernel smoke suite (real Mosaic, not interpret mode).

The rest of the test suite runs the Pallas kernels in interpret mode on
CPU (conftest forces CPU) — Mosaic-specific breakage (layouts, sublane
alignment) would only surface in manually-run drivers. This module runs
the same oracle-equivalence checks on the real chip with lane-native
shapes (head_dim=128). Run with:

    DUO_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -q

(~1 min warm with the persistent compile cache; conftest skips the CPU
override when DUO_TPU_TESTS is set). Reference analogue: flash-attn vs
sdpa cross-checks run on the GPU itself (SURVEY.md §4).
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("DUO_TPU_TESTS") != "1",
    reason="on-TPU smoke suite (set DUO_TPU_TESTS=1 on a TPU host)",
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _require_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend")


def rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize("S,cs_val", [(1, 3000), (256, 3000), (1, 0)])
def test_full_cache_attention_tpu(S, cs_val):
    from duo_attention_tpu.cache import full_mask
    from duo_attention_tpu.ops.attention_ref import masked_attention
    from duo_attention_tpu.ops.flash import full_cache_attention

    B, Hq, Hkv, D, T = 1, 4, 2, 128, 4096
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = rand(keys[0], (B, S, Hq, D))
    k = rand(keys[1], (B, Hkv, T, D))
    v = rand(keys[2], (B, Hkv, T, D))
    cs = jnp.asarray(cs_val, jnp.int32)
    positions = cs + jnp.arange(S, dtype=jnp.int32)

    got = full_cache_attention(q, k, v, cs)
    mask = full_mask(positions, T)[None, None]
    want = masked_attention(
        q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), mask
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2)


@pytest.mark.parametrize("S,cs_val", [(1, 500), (256, 256)])
def test_streaming_cache_attention_tpu(S, cs_val):
    from duo_attention_tpu.cache import ring_mask, sink_mask
    from duo_attention_tpu.ops.attention_ref import masked_attention
    from duo_attention_tpu.ops.flash import streaming_cache_attention

    B, Hsq, Hs, D = 1, 4, 2, 128
    sink, recent = 64, 128
    R, C = 512, 256
    keys = jax.random.split(jax.random.PRNGKey(2), 5)
    q = rand(keys[0], (B, S, Hsq, D))
    k_sink = rand(keys[1], (B, Hs, sink + C, D))
    v_sink = rand(keys[2], (B, Hs, sink + C, D))
    k_ring = rand(keys[3], (B, Hs, R, D))
    v_ring = rand(keys[4], (B, Hs, R, D))
    cs = jnp.asarray(cs_val, jnp.int32)
    total_after = jnp.asarray(cs_val + S, jnp.int32)
    positions = cs + jnp.arange(S, dtype=jnp.int32)

    got = streaming_cache_attention(
        q, k_sink, v_sink, k_ring, v_ring, cs, total_after, sink, recent
    )
    k_cat = jnp.concatenate([k_sink[:, :, :sink], k_ring], axis=2)
    v_cat = jnp.concatenate([v_sink[:, :, :sink], v_ring], axis=2)
    m = jnp.concatenate(
        [
            sink_mask(positions, sink, sink),
            ring_mask(positions, R, total_after, cs, sink, recent),
        ],
        axis=1,
    )[None, None]
    want = masked_attention(
        q, k_cat.transpose(0, 2, 1, 3), v_cat.transpose(0, 2, 1, 3), m
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2)


@pytest.mark.parametrize("S,cs_val", [(1, 3000), (256, 1024)])
def test_q4_attention_tpu(S, cs_val):
    """INT4 full-cache attention (in-kernel nibble dequant, int8-MXU decode
    mode / bf16-plane prefill mode) vs the dequantized dense oracle."""
    from duo_attention_tpu.cache import full_mask
    from duo_attention_tpu.ops.attention_ref import masked_attention
    from duo_attention_tpu.ops.flash import full_cache_attention_q4
    from duo_attention_tpu.ops.quant import (
        dequantize_int4_paired,
        paired_scales_to_cache_layout,
        quantize_int4_paired,
    )

    B, Hq, Hkv, D, T = 1, 4, 2, 128, 8192
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q = rand(keys[0], (B, S, Hq, D))
    k = rand(keys[1], (B, Hkv, T, D))
    v = rand(keys[2], (B, Hkv, T, D))
    kq, ks4 = quantize_int4_paired(k)
    vq, vs4 = quantize_int4_paired(v)
    ks = paired_scales_to_cache_layout(ks4)
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
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-2)


def test_w8a8_gemm_tpu():
    from duo_attention_tpu.ops.gemm import w8a8_matmul
    from duo_attention_tpu.ops.quant import (
        int8_matmul,
        quantize_act_per_token,
        quantize_weight_int8,
    )

    M, K, N = 512, 512, 640
    keys = jax.random.split(jax.random.PRNGKey(4), 2)
    x = rand(keys[0], (M, K))
    w = rand(keys[1], (K, N))
    wq, ws = quantize_weight_int8(w)
    xq, xs = quantize_act_per_token(x)
    got = w8a8_matmul(xq, xs, wq, ws, jnp.float32)
    want = int8_matmul(xq, xs, wq, ws, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-4)


def _smoke_cfg():
    from duo_attention_tpu.config import DuoConfig, ModelConfig

    cfg = ModelConfig(
        vocab_size=1024, hidden_size=512, intermediate_size=1024,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=128,
        rope_theta=10000.0, max_position_embeddings=8192,
    )
    duo = DuoConfig(
        sink_size=64, recent_size=128, num_full_kv_heads=(1, 1),
        max_cache_size=2048, prefill_chunk_size=256,
    )
    return cfg, duo


def test_forward_chunk_pallas_matches_ref_tpu():
    """End-to-end bf16 duo forward on the chip: real Pallas kernels +
    in-place cache writes vs the jnp reference path, chunk + decode."""
    from duo_attention_tpu.cache import init_cache
    from duo_attention_tpu.models import llama

    cfg, duo = _smoke_cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(3), jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(4), (1, 256), 0, cfg.vocab_size)

    outs = {}
    for impl in ["ref", "pallas"]:
        cache = init_cache(cfg, duo, 1, jnp.float32)
        hs = []
        h, cache = llama.forward_chunk(
            params, cfg, duo, cache, ids, attn_impl=impl, full_bucket=1024
        )
        hs.append(h)
        for t in range(3):
            h, cache = llama.forward_chunk(
                params, cfg, duo, cache, ids[:, t : t + 1], attn_impl=impl,
                full_bucket=1024,
            )
            hs.append(h)
        outs[impl] = [np.asarray(h) for h in hs]
    for a, b in zip(outs["pallas"], outs["ref"]):
        np.testing.assert_allclose(a, b, atol=5e-2)


def test_forward_chunk_int4_close_to_bf16_tpu():
    """INT4 KV serving path (nibble token writes + in-kernel dequant) stays
    within quantization noise of the bf16-cache reference forward."""
    from duo_attention_tpu.cache import init_cache, init_cache_q4
    from duo_attention_tpu.models import llama

    cfg, duo = _smoke_cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(5), jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(6), (1, 256), 0, cfg.vocab_size)

    cache_q = init_cache_q4(cfg, duo, 1, jnp.float32)
    cache_b = init_cache(cfg, duo, 1, jnp.float32)
    hq, cache_q = llama.forward_chunk(
        params, cfg, duo, cache_q, ids, attn_impl="pallas", full_bucket=1024
    )
    hb, cache_b = llama.forward_chunk(
        params, cfg, duo, cache_b, ids, attn_impl="ref", full_bucket=1024
    )
    for t in range(2):
        hq, cache_q = llama.forward_chunk(
            params, cfg, duo, cache_q, ids[:, t : t + 1], attn_impl="pallas",
            full_bucket=1024,
        )
        hb, cache_b = llama.forward_chunk(
            params, cfg, duo, cache_b, ids[:, t : t + 1], attn_impl="ref",
            full_bucket=1024,
        )
    hq, hb = np.asarray(hq), np.asarray(hb)
    # Exact-int4 baseline for THIS comparison, measured in (verified)
    # interpret mode on CPU: rel err 0.1295 — random-init K has ~6 sigma
    # dynamic range per D-group, so 4-bit steps carry ~13% noise into the
    # mixed hidden states (real checkpoints sit far lower). The TPU run
    # reproduces 0.1299; the bound guards against kernel breakage
    # (order-1 divergence), not quantization noise.
    rel = np.abs(hq - hb).mean() / np.abs(hb).mean()
    assert rel < 0.2, f"int4 path diverged from bf16: rel err {rel}"


def test_convert_real_8b_geometry_on_chip(tmp_path):
    """Deploy path at the REAL Llama-3-8B geometry ON THE CHIP: synthetic
    HF checkpoint -> convert -> reorder with the reference-trained 8B
    pattern -> W8A8+INT4 -> engine decode + permutation symmetry at real
    widths (host-side conversion adds ~2-3 min to the smoke suite)."""
    from geometry_check import run_real_geometry_check

    run_real_geometry_check(str(tmp_path / "synth8b"), num_layers=2)
