"""Pure-jnp reference attention: masks + masked GQA attention.

This plays the role the reference's ``streaming_attn_sdpa`` plays as the
"slow but obvious" oracle (duo_attn/patch/streaming_attn.py:14-43): the
Pallas kernels in ops/flash.py and ops/decode.py are unit-tested against
these functions. Also the fallback compute path on non-TPU backends.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def streaming_mask(q_len: int, sink_size: int, recent_size: int) -> jnp.ndarray:
    """Dense boolean Λ-mask for square (training-style) attention.

    Query i may attend key j iff  j <= i  AND  (j < sink  OR  j >= i - recent + 1).
    Matches generate_streaming_mask semantics
    (duo_attn/patch/streaming_attn.py:14-24) without the reference's
    round-to-8 padding (shapes are static under jit anyway).
    Returns [q_len, q_len] bool.
    """
    i = jnp.arange(q_len)[:, None]
    j = jnp.arange(q_len)[None, :]
    causal = j <= i
    recent = j >= i - recent_size + 1
    sink = j < sink_size
    return causal & (recent | sink)


def cached_chunk_mask(q_len: int, buf_len: int, base_len) -> jnp.ndarray:
    """Mask for attention over a cache buffer holding ``base_len`` old tokens
    followed by ``q_len`` incoming tokens (written at [base_len, base_len+q_len)).

    Query i attends slot j iff j <= base_len + i: all old cache tokens plus
    causal over the incoming chunk. This single formula covers both the full
    path and the streaming path of the reference's chunked prefill
    (duo_attn/patch/llama.py:225-267: flash_attn with causal bottom-right
    alignment over [cache, incoming]).

    base_len may be a traced scalar. Returns [q_len, buf_len] bool.
    """
    i = jnp.arange(q_len)[:, None]
    j = jnp.arange(buf_len)[None, :]
    return j <= base_len + i


def masked_attention(q, k, v, mask, scale=None):
    """GQA attention with an explicit boolean mask, fp32 softmax.

    q: [B, S, Hq, D]; k/v: [B, T, Hkv, D]; mask: broadcastable to [B, Hq, S, T]
    (True = attend). Returns [B, S, Hq, D] in q.dtype.
    """
    B, S, Hq, D = q.shape
    T, Hkv = k.shape[1], k.shape[2]
    groups = Hq // Hkv
    if scale is None:
        scale = 1.0 / (D**0.5)

    qf = q.astype(jnp.float32).transpose(0, 2, 1, 3)  # [B, Hq, S, D]
    kf = k.astype(jnp.float32).transpose(0, 2, 1, 3)  # [B, Hkv, T, D]
    vf = v.astype(jnp.float32).transpose(0, 2, 1, 3)
    if groups > 1:
        kf = jnp.repeat(kf, groups, axis=1)
        vf = jnp.repeat(vf, groups, axis=1)

    scores = jnp.einsum("bhsd,bhtd->bhst", qf, kf) * scale
    scores = jnp.where(mask, scores, NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    # Fully-masked rows (can't happen with causal masks, but keep safe):
    weights = jnp.where(jnp.any(mask, axis=-1, keepdims=True), weights, 0.0)
    out = jnp.einsum("bhst,bhtd->bhsd", weights, vf)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def cache_attention_ref(q, k_buf, v_buf, base_len, scale=None):
    """Attention of an incoming chunk against [old cache | incoming] buffer.

    q: [B, S, Hq, D]; k_buf/v_buf: [B, T, Hkv, D] static-size buffers whose
    first base_len + S slots are valid. See cached_chunk_mask for semantics.
    """
    S, T = q.shape[1], k_buf.shape[1]
    mask = cached_chunk_mask(S, T, base_len)[None, None]
    return masked_attention(q, k_buf, v_buf, mask, scale)


def streaming_attention_ref(q, k, v, sink_size: int, recent_size: int, scale=None):
    """Square Λ-masked attention (training-time streaming branch oracle)."""
    S = q.shape[1]
    mask = streaming_mask(S, sink_size, recent_size)[None, None]
    return masked_attention(q, k, v, mask, scale)


def causal_attention_ref(q, k, v, scale=None):
    """Plain causal attention (training-time full branch oracle)."""
    S = q.shape[1]
    i = jnp.arange(S)[:, None]
    j = jnp.arange(S)[None, :]
    mask = (j <= i)[None, None]
    return masked_attention(q, k, v, mask, scale)
