"""Pallas kernel equivalence vs the jnp oracle (interpret mode on CPU).

Plays the role flash-attn↔sdpa cross-checks play in the reference stack
(SURVEY.md §4): every kernel output must match ops/attention_ref.py within
fp tolerance on the same cache buffers and positions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from duo_attention_tpu.cache import full_mask, ring_mask, sink_mask
from duo_attention_tpu.config import DuoConfig, TINY_GQA
from duo_attention_tpu.models import llama
from duo_attention_tpu.ops.attention_ref import masked_attention
from duo_attention_tpu.ops.flash import (
    full_cache_attention,
    streaming_cache_attention,
)


def rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize("cs_val", [0, 64, 200])
@pytest.mark.parametrize("S", [64, 1])
def test_full_cache_attention_matches_ref(cs_val, S):
    B, Hq, Hkv, D, T = 2, 4, 2, 32, 512
    if cs_val + S > T:
        pytest.skip("doesn't fit")
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
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_full_cache_attention_bucket_invariance():
    B, Hq, Hkv, D, T = 1, 2, 1, 32, 1024
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    S, cs_val = 128, 100
    q = rand(keys[0], (B, S, Hq, D))
    k = rand(keys[1], (B, Hkv, T, D))
    v = rand(keys[2], (B, Hkv, T, D))
    cs = jnp.asarray(cs_val, jnp.int32)
    full = full_cache_attention(q, k, v, cs, bucket=0)
    small = full_cache_attention(q, k, v, cs, bucket=256)
    np.testing.assert_allclose(np.asarray(full), np.asarray(small), atol=1e-5)
    # decode too
    q1 = rand(keys[0], (B, 1, Hq, D))
    full = full_cache_attention(q1, k, v, cs, bucket=0)
    small = full_cache_attention(q1, k, v, cs, bucket=256)
    np.testing.assert_allclose(np.asarray(full), np.asarray(small), atol=1e-5)


@pytest.mark.parametrize(
    "S,cs_val,total_seen",
    [
        (64, 0, 0),      # first chunk
        (64, 64, 64),    # second chunk
        (64, 448, 448),  # deep into the ring (wrapped)
        (1, 37, 37),     # early decode
        (1, 500, 500),   # steady-state decode
    ],
)
def test_streaming_cache_attention_matches_ref(S, cs_val, total_seen):
    B, Hsq, Hs, D = 1, 4, 2, 32
    sink, recent = 16, 64
    R, C = 256, 128  # ring cap, sink-buffer pad
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
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_forward_chunk_pallas_matches_ref_end_to_end():
    cfg = TINY_GQA
    duo = DuoConfig(
        sink_size=16,
        recent_size=64,
        num_full_kv_heads=(1, 2, 4),
        max_cache_size=1024,
        prefill_chunk_size=128,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(3), jnp.float32)
    from duo_attention_tpu.cache import init_cache

    ids = jax.random.randint(jax.random.PRNGKey(4), (1, 128), 0, cfg.vocab_size)

    for impl in ["ref", "pallas"]:
        cache = init_cache(cfg, duo, 1, jnp.float32)
        hs = []
        # two prefill chunks then three decode steps
        h, cache = llama.forward_chunk(params, cfg, duo, cache, ids, attn_impl=impl)
        hs.append(h)
        h, cache = llama.forward_chunk(params, cfg, duo, cache, ids, attn_impl=impl)
        hs.append(h)
        for t in range(3):
            h, cache = llama.forward_chunk(
                params, cfg, duo, cache, ids[:, t : t + 1], attn_impl=impl
            )
            hs.append(h)
        if impl == "ref":
            want = [np.asarray(h) for h in hs]
        else:
            for a, b in zip(hs, want):
                np.testing.assert_allclose(np.asarray(a), b, atol=5e-3)


def test_full_cache_attention_per_batch_lengths():
    """Continuous batching: each sequence has its own cache length; kernel
    output must equal per-sequence single calls."""
    B, Hq, Hkv, D, T = 3, 4, 2, 32, 512
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    q = rand(keys[0], (B, 1, Hq, D))
    k = rand(keys[1], (B, Hkv, T, D))
    v = rand(keys[2], (B, Hkv, T, D))
    cs = jnp.asarray([5, 200, 444], jnp.int32)

    got = full_cache_attention(q, k, v, cs)
    for b in range(B):
        want = full_cache_attention(
            q[b : b + 1], k[b : b + 1], v[b : b + 1], cs[b]
        )
        np.testing.assert_allclose(
            np.asarray(got[b]), np.asarray(want[0]), atol=2e-3
        )


def test_streaming_cache_attention_per_batch_lengths():
    B, Hsq, Hs, D = 2, 4, 2, 32
    sink, recent = 16, 64
    R, C = 256, 128
    keys = jax.random.split(jax.random.PRNGKey(8), 5)
    q = rand(keys[0], (B, 1, Hsq, D))
    ks = rand(keys[1], (B, Hs, sink + C, D))
    vs = rand(keys[2], (B, Hs, sink + C, D))
    kr = rand(keys[3], (B, Hs, R, D))
    vr = rand(keys[4], (B, Hs, R, D))
    cs = jnp.asarray([37, 500], jnp.int32)
    total = cs + 1

    got = streaming_cache_attention(q, ks, vs, kr, vr, cs, total, sink, recent)
    for b in range(B):
        want = streaming_cache_attention(
            q[b : b + 1], ks[b : b + 1], vs[b : b + 1],
            kr[b : b + 1], vr[b : b + 1], cs[b], total[b], sink, recent,
        )
        np.testing.assert_allclose(
            np.asarray(got[b]), np.asarray(want[0]), atol=2e-3
        )


def test_full_cache_attention_ragged_prefill():
    """S>1 chunks appended at different per-sequence offsets."""
    B, Hq, Hkv, D, T, S = 2, 4, 2, 32, 512, 64
    keys = jax.random.split(jax.random.PRNGKey(9), 3)
    q = rand(keys[0], (B, S, Hq, D))
    k = rand(keys[1], (B, Hkv, T, D))
    v = rand(keys[2], (B, Hkv, T, D))
    cs = jnp.asarray([0, 300], jnp.int32)

    got = full_cache_attention(q, k, v, cs)
    for b in range(B):
        want = full_cache_attention(
            q[b : b + 1], k[b : b + 1], v[b : b + 1], cs[b]
        )
        np.testing.assert_allclose(
            np.asarray(got[b]), np.asarray(want[0]), atol=2e-3
        )
