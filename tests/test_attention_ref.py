"""Reference-attention oracle tests: mask semantics + masked GQA attention."""

import jax
import jax.numpy as jnp
import numpy as np

from duo_attention_tpu.ops.attention_ref import (
    causal_attention_ref,
    masked_attention,
    streaming_attention_ref,
    streaming_mask,
)


def brute_force_streaming_mask(n, sink, recent):
    """Independent re-derivation of the Λ-mask semantics
    (reference: duo_attn/patch/streaming_attn.py:14-24)."""
    m = np.zeros((n, n), dtype=bool)
    for i in range(n):
        for j in range(n):
            m[i, j] = j <= i and (j < sink or j >= i - recent + 1)
    return m


def test_streaming_mask_matches_bruteforce():
    for n, sink, recent in [(16, 4, 4), (32, 0, 8), (20, 3, 1), (8, 8, 8)]:
        got = np.asarray(streaming_mask(n, sink, recent))
        np.testing.assert_array_equal(got, brute_force_streaming_mask(n, sink, recent))


def naive_attention(q, k, v, mask):
    """fp64 numpy attention as numerical ground truth."""
    q, k, v = (np.asarray(x, np.float64) for x in (q, k, v))
    B, S, Hq, D = q.shape
    Hkv = k.shape[2]
    groups = Hq // Hkv
    out = np.zeros_like(q)
    for b in range(B):
        for h in range(Hq):
            kh = h // groups
            scores = q[b, :, h] @ k[b, :, kh].T / np.sqrt(D)
            scores = np.where(mask, scores, -np.inf)
            w = np.exp(scores - scores.max(axis=-1, keepdims=True))
            w = w / w.sum(axis=-1, keepdims=True)
            out[b, :, h] = w @ v[b, :, kh]
    return out


def test_masked_attention_vs_naive_gqa():
    key = jax.random.PRNGKey(0)
    B, S, Hq, Hkv, D = 2, 24, 4, 2, 16
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, S, Hq, D), jnp.float32)
    k = jax.random.normal(kk, (B, S, Hkv, D), jnp.float32)
    v = jax.random.normal(kv, (B, S, Hkv, D), jnp.float32)
    mask = streaming_mask(S, 4, 8)
    got = masked_attention(q, k, v, mask[None, None])
    want = naive_attention(q, k, v, np.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_streaming_equals_causal_when_window_covers_all():
    key = jax.random.PRNGKey(1)
    B, S, H, D = 1, 16, 2, 8
    q, k, v = (
        jax.random.normal(k_, (B, S, H, D), jnp.float32)
        for k_ in jax.random.split(key, 3)
    )
    full = causal_attention_ref(q, k, v)
    stream = streaming_attention_ref(q, k, v, sink_size=0, recent_size=S)
    np.testing.assert_allclose(np.asarray(full), np.asarray(stream), atol=1e-6)
