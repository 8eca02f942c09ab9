"""End-to-end model equivalence tests (SURVEY.md §4 property tests):

* duo forward ≡ full attention when all gates = 1 (reference sparsity=0 path)
* chunked prefill ≡ monolithic prefill
* chunked prefill ≡ dense-mask oracle for mixed full/streaming heads
* decode-after-prefill ≡ teacher forcing
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from duo_attention_tpu.cache import init_cache
from duo_attention_tpu.config import DuoConfig, TINY_GQA, TINY_LLAMA
from duo_attention_tpu.engine import DuoEngine
from duo_attention_tpu.models import llama
from duo_attention_tpu.ops.attention_ref import masked_attention
from duo_attention_tpu.ops.norm import rms_norm
from duo_attention_tpu.ops.rope import apply_rope, rope_cos_sin, rope_inv_freq


def make_duo(cfg, num_full_per_layer, sink=4, recent=8, chunk=16, max_size=256):
    if isinstance(num_full_per_layer, int):
        num_full_per_layer = (num_full_per_layer,) * cfg.num_layers
    return DuoConfig(
        sink_size=sink,
        recent_size=recent,
        num_full_kv_heads=tuple(num_full_per_layer),
        max_cache_size=max_size,
        prefill_chunk_size=chunk,
    )


def dense_duo_oracle(params, cfg, duo, input_ids, chunk_size):
    """Uncached forward with explicit dense masks that independently encode
    the chunk-granular duo semantics: full heads causal; streaming heads see
    sink ∪ [chunk_start(i) - recent, i]. The engine's cached/ring computation
    must match this exactly."""
    B, S = input_ids.shape
    i = np.arange(S)[:, None]
    j = np.arange(S)[None, :]
    causal = j <= i
    cs = (np.arange(S) // chunk_size) * chunk_size
    stream_np = causal & ((j < duo.sink_size) | (j >= cs[:, None] - duo.recent_size))
    stream_mask = jnp.asarray(stream_np)[None, None]
    causal_mask = jnp.asarray(causal)[None, None]

    positions = jnp.arange(S, dtype=jnp.int32)
    cos, sin = rope_cos_sin(rope_inv_freq(cfg), positions)
    x = params["embed"][input_ids]
    G = cfg.num_kv_groups
    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["input_norm"], cfg.rms_norm_eps)
        q, k, v = llama._qkv(layer, h, cfg)
        q = apply_rope(q, cos[None], sin[None])
        k = apply_rope(k, cos[None], sin[None])
        hf = duo.num_full_kv_heads[li]
        outs = []
        if hf > 0:
            outs.append(
                masked_attention(
                    q[:, :, : hf * G], k[:, :, :hf], v[:, :, :hf], causal_mask
                )
            )
        if hf < cfg.num_kv_heads:
            outs.append(
                masked_attention(
                    q[:, :, hf * G :], k[:, :, hf:], v[:, :, hf:], stream_mask
                )
            )
        attn = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=2)
        x = x + attn.reshape(B, S, -1) @ layer["wo"]
        h = rms_norm(x, layer["post_norm"], cfg.rms_norm_eps)
        x = x + llama._mlp(layer, h)
    return rms_norm(x, params["final_norm"], cfg.rms_norm_eps)


def chunked_hidden(params, cfg, duo, ids, collect_all=True):
    """Run chunked prefill, returning hidden states at every position."""
    B, S = ids.shape
    cache = init_cache(cfg, duo, B, jnp.float32)
    C = duo.prefill_chunk_size
    hs = []
    for start in range(0, S, C):
        chunk = ids[:, start : start + C]
        n_valid = chunk.shape[1]
        if n_valid < C:
            chunk = jnp.pad(chunk, ((0, 0), (0, C - n_valid)))
        hidden, cache = llama.forward_chunk(
            params, cfg, duo, cache, chunk, jnp.asarray(n_valid, jnp.int32)
        )
        hs.append(hidden[:, :n_valid])
    return jnp.concatenate(hs, axis=1), cache


@pytest.fixture(scope="module")
def tiny():
    cfg = TINY_LLAMA
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    return cfg, params


@pytest.fixture(scope="module")
def tiny_gqa():
    cfg = TINY_GQA
    params = llama.init_params(cfg, jax.random.PRNGKey(1), jnp.float32)
    return cfg, params


def rand_ids(cfg, B, S, seed=0):
    return jax.random.randint(jax.random.PRNGKey(seed), (B, S), 0, cfg.vocab_size)


def test_all_full_heads_equals_full_attention(tiny):
    cfg, params = tiny
    duo = make_duo(cfg, cfg.num_kv_heads)  # gates = 1 everywhere
    ids = rand_ids(cfg, 2, 40)
    want = llama.forward_full_attention(params, cfg, ids)
    got, _ = chunked_hidden(params, cfg, duo, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_chunked_equals_monolithic(tiny_gqa):
    cfg, params = tiny_gqa
    ids = rand_ids(cfg, 1, 48, seed=3)
    duo_mono = make_duo(cfg, 2, chunk=48)
    duo_chunk = make_duo(cfg, 2, chunk=16)
    # same chunk boundaries only matter for streaming heads; with chunk=48
    # the mono pass has one chunk. Compare full-head outputs only via
    # gates=1 config (streaming path is chunk-size dependent by design).
    duo_mono_full = make_duo(cfg, cfg.num_kv_heads, chunk=48)
    duo_chunk_full = make_duo(cfg, cfg.num_kv_heads, chunk=16)
    h_mono, _ = chunked_hidden(params, cfg, duo_mono_full, ids)
    h_chunk, _ = chunked_hidden(params, cfg, duo_chunk_full, ids)
    np.testing.assert_allclose(np.asarray(h_chunk), np.asarray(h_mono), atol=2e-4)


@pytest.mark.parametrize("num_full", [0, 1, 2])
@pytest.mark.parametrize("seq_len", [48, 41])  # even and partial tail chunk
def test_mixed_heads_match_dense_oracle(tiny_gqa, num_full, seq_len):
    cfg, params = tiny_gqa
    duo = make_duo(cfg, num_full, sink=4, recent=8, chunk=16)
    ids = rand_ids(cfg, 1, seq_len, seed=7)
    want = dense_duo_oracle(params, cfg, duo, ids, chunk_size=16)
    got, _ = chunked_hidden(params, cfg, duo, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4)


def test_heterogeneous_layer_splits(tiny_gqa):
    cfg, params = tiny_gqa
    duo = make_duo(cfg, (0, 2, 4), sink=4, recent=8, chunk=16)
    ids = rand_ids(cfg, 1, 40, seed=11)
    want = dense_duo_oracle(params, cfg, duo, ids, chunk_size=16)
    got, _ = chunked_hidden(params, cfg, duo, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4)


def test_decode_matches_dense_oracle(tiny_gqa):
    """Teacher-force a sequence: prefill a prefix then decode the rest one
    token at a time; every decoded position must match the dense oracle with
    per-token chunk starts."""
    cfg, params = tiny_gqa
    duo = make_duo(cfg, 2, sink=4, recent=8, chunk=16)
    S_prefix, S_total = 32, 44
    ids = rand_ids(cfg, 1, S_total, seed=13)

    # dense oracle: chunk starts = chunked for prefix, per-token for decode
    B = 1
    i = np.arange(S_total)[:, None]
    j = np.arange(S_total)[None, :]
    causal = j <= i
    cs = np.where(
        np.arange(S_total) < S_prefix,
        (np.arange(S_total) // 16) * 16,
        np.arange(S_total),
    )
    stream_np = causal & ((j < duo.sink_size) | (j >= cs[:, None] - duo.recent_size))

    def oracle_with_masks(stream_mask_np):
        # reuse dense_duo_oracle's body via masks closure
        positions = jnp.arange(S_total, dtype=jnp.int32)
        cos, sin = rope_cos_sin(rope_inv_freq(cfg), positions)
        x = params["embed"][ids]
        G = cfg.num_kv_groups
        stream_mask = jnp.asarray(stream_mask_np)[None, None]
        causal_mask = jnp.asarray(causal)[None, None]
        for li, layer in enumerate(params["layers"]):
            h = rms_norm(x, layer["input_norm"], cfg.rms_norm_eps)
            q, k, v = llama._qkv(layer, h, cfg)
            q = apply_rope(q, cos[None], sin[None])
            k = apply_rope(k, cos[None], sin[None])
            hf = duo.num_full_kv_heads[li]
            outs = [
                masked_attention(
                    q[:, :, : hf * G], k[:, :, :hf], v[:, :, :hf], causal_mask
                ),
                masked_attention(
                    q[:, :, hf * G :], k[:, :, hf:], v[:, :, hf:], stream_mask
                ),
            ]
            x = x + jnp.concatenate(outs, axis=2).reshape(B, S_total, -1) @ layer["wo"]
            h = rms_norm(x, layer["post_norm"], cfg.rms_norm_eps)
            x = x + llama._mlp(layer, h)
        return rms_norm(x, params["final_norm"], cfg.rms_norm_eps)

    want = oracle_with_masks(stream_np)

    cache = init_cache(cfg, duo, 1, jnp.float32)
    h_prefix, cache = llama.forward_chunk(
        params, cfg, duo, cache, ids[:, :16], jnp.asarray(16, jnp.int32)
    )
    h2, cache = llama.forward_chunk(
        params, cfg, duo, cache, ids[:, 16:32], jnp.asarray(16, jnp.int32)
    )
    decode_h = []
    for t in range(S_prefix, S_total):
        h, cache = llama.forward_chunk(
            params, cfg, duo, cache, ids[:, t : t + 1], jnp.asarray(1, jnp.int32)
        )
        decode_h.append(h[:, 0])
    got_decode = jnp.stack(decode_h, axis=1)
    np.testing.assert_allclose(
        np.asarray(got_decode),
        np.asarray(want[:, S_prefix:]),
        atol=3e-4,
    )


def test_engine_generate_runs(tiny):
    cfg, params = tiny
    duo = make_duo(cfg, 1, chunk=16, max_size=128)
    eng = DuoEngine(params, cfg, duo, batch_size=1, dtype=jnp.float32)
    ids = np.asarray(rand_ids(cfg, 1, 20, seed=5))
    tokens, cache = eng.generate(ids, max_new_tokens=8)
    assert tokens.shape == (1, 8)
    assert int(cache.length) == 20 + 8


def test_engine_greedy_matches_teacher_forcing(tiny):
    """Greedy decode must agree with re-running prefill on the extended
    sequence (for gates=1, where chunk-approximation plays no role)."""
    cfg, params = tiny
    duo = make_duo(cfg, cfg.num_kv_heads, chunk=16, max_size=128)
    eng = DuoEngine(params, cfg, duo, batch_size=1, dtype=jnp.float32)
    ids = np.asarray(rand_ids(cfg, 1, 24, seed=9))
    tokens, _ = eng.generate(ids, max_new_tokens=4)
    # teacher-force: feed ids + generated tokens, compare next-token argmax
    seq = np.concatenate([ids, tokens], axis=1)
    hidden = llama.forward_full_attention(params, cfg, jnp.asarray(seq))
    logits = llama.all_logits(params, hidden)
    preds = np.asarray(jnp.argmax(logits, axis=-1))
    for t in range(4):
        # prediction at position 24+t-1 produced tokens[t]
        assert preds[0, 23 + t] == tokens[0, t]


def test_engine_burst_decode_matches_exact(tiny):
    """Burst decomposition (fixed bursts + power-of-two tail) must produce
    the same greedy tokens and cache length as the exact-length scan
    (decode_burst=0), for a step count hitting the multi-program plan
    path: burst=4, 11 steps -> plan [4, 4, 2, 1]."""
    cfg, params = tiny
    duo = make_duo(cfg, 1, chunk=16, max_size=128)
    ids = np.asarray(rand_ids(cfg, 1, 20, seed=11))
    eng_exact = DuoEngine(params, cfg, duo, batch_size=1,
                          dtype=jnp.float32, decode_burst=0)
    want, cache_exact = eng_exact.generate(ids, max_new_tokens=11)
    eng_burst = DuoEngine(params, cfg, duo, batch_size=1,
                          dtype=jnp.float32, decode_burst=4)
    got, cache_burst = eng_burst.generate(ids, max_new_tokens=11)
    np.testing.assert_array_equal(got, want)
    assert int(cache_burst.length) == int(cache_exact.length) == 20 + 11
    # compile surface: one program per DISTINCT plan entry (both 4-step
    # bursts share one executable)
    burst_keys = sorted(k[1] for k in eng_burst._decode_fns)
    assert burst_keys == [1, 2, 4]


def test_engine_burst_early_stop(tiny):
    """With stop_token_ids, decode ends at the first burst where every
    row has emitted a stop token; output is still [B, max_new_tokens],
    padded with the stop id."""
    cfg, params = tiny
    duo = make_duo(cfg, 1, chunk=16, max_size=256)
    eng = DuoEngine(params, cfg, duo, batch_size=1, dtype=jnp.float32,
                    decode_burst=4)
    ids = np.asarray(rand_ids(cfg, 1, 20, seed=13))
    free_run, _ = eng.generate(ids, max_new_tokens=48)
    stop = int(free_run[0, 1])  # appears in the first burst
    tokens, cache = eng.generate(ids, max_new_tokens=48,
                                 stop_token_ids=[stop])
    assert tokens.shape == (1, 48)
    first = int(np.argmax(tokens[0] == stop))
    assert (tokens[0, first + 1:] == stop).all()
    # decode stopped after the burst containing the stop token, not 48
    assert int(cache.length) < 20 + 48


def test_burst_plan_properties():
    """_burst_plan invariants for arbitrary (burst, n): exact total,
    entries bounded by burst, distinct-length count ≤ 1 + log2(burst)
    (the compile-surface bound)."""
    from hypothesis import given, settings, strategies as st

    from duo_attention_tpu.engine import _burst_plan

    @settings(max_examples=300, deadline=None)
    @given(st.integers(1, 1024), st.integers(0, 5000))
    def check(burst, n):
        plan = _burst_plan(burst, n)
        assert sum(plan) == max(n, 0)
        if n > 0:
            assert all(0 < p <= burst for p in plan)
            assert len(set(plan)) <= 1 + burst.bit_length()

    check()
