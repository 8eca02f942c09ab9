"""Blockwise differentiable attention (training compute path).

Training needs gradients through both full-causal and Λ-masked attention at
32k-token context (reference uses flash-attn + the external
Block-Sparse-Attention CUDA kernel, duo_attn/patch/llama.py:97-118). Here:
a lax.scan over KV blocks with online softmax — O(S·block) memory via
jax.checkpoint on the block body, differentiable end-to-end, and XLA maps
the inner matmuls onto the MXU. The same function serves full attention
(mask_fn=causal) and streaming attention (mask_fn=Λ), so gate training has
no bespoke kernels to maintain.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def causal_mask_fn(q_pos: jnp.ndarray, k_pos: jnp.ndarray) -> jnp.ndarray:
    return k_pos[None, :] <= q_pos[:, None]


def lambda_mask_fn(sink_size: int, recent_size: int) -> Callable:
    """Λ-mask: causal ∧ (sink ∨ recent) — generate_streaming_mask semantics
    (duo_attn/patch/streaming_attn.py:14-24)."""

    def fn(q_pos, k_pos):
        causal = k_pos[None, :] <= q_pos[:, None]
        sink = k_pos[None, :] < sink_size
        recent = k_pos[None, :] >= q_pos[:, None] - recent_size + 1
        return causal & (sink | recent)

    return fn


def blockwise_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask_fn: Callable,
    q_offset=0,
    k_offset=0,
    block_k: int = 512,
    remat: bool = True,
) -> jnp.ndarray:
    """Masked GQA attention, scanned over KV blocks.

    q: [B, Sq, Hq, D]; k/v: [B, Skv, Hkv, D]. mask_fn(q_pos, k_pos) -> bool
    [Sq, bk] with global positions (offsets support sequence-parallel
    shards). Returns [B, Sq, Hq, D] in q.dtype; softmax stats in fp32.
    """
    B, Sq, Hq, D = q.shape
    _, Skv, Hkv, _ = k.shape
    G = Hq // Hkv
    scale = 1.0 / (D**0.5)
    bk = min(block_k, Skv)
    n_blocks = -(-Skv // bk)
    pad = n_blocks * bk - Skv
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))

    # [B, Hkv, G, Sq, D] query layout; stats fp32
    qf = q.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(B, Hkv, G, Sq, D)
    kb = k.transpose(0, 2, 1, 3).reshape(B, Hkv, n_blocks, -1, D)[
        :, :, :, :, :
    ]  # later indexed per block via scan xs
    vb = v.transpose(0, 2, 1, 3).reshape(B, Hkv, n_blocks, -1, D)
    kb = jnp.moveaxis(kb, 2, 0)  # [n_blocks, B, Hkv, bk, D]
    vb = jnp.moveaxis(vb, 2, 0)

    q_pos = q_offset + jnp.arange(Sq, dtype=jnp.int32)

    def block_body(carry, xs):
        m_prev, l_prev, acc = carry
        k_blk, v_blk, blk_idx = xs
        k_pos = k_offset + blk_idx * bk + jnp.arange(bk, dtype=jnp.int32)
        valid = (blk_idx * bk + jnp.arange(bk)) < Skv
        mask = mask_fn(q_pos, k_pos) & valid[None, :]  # [Sq, bk]

        s = jnp.einsum(
            "bhgsd,bhtd->bhgst",
            qf,
            k_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(mask[None, None, None], s, NEG_INF)
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        p = jnp.exp(s - m_next)
        p = jnp.where(mask[None, None, None], p, 0.0)
        alpha = jnp.exp(m_prev - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhgst,bhtd->bhgsd",
            p,
            v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return (m_next, l_next, acc), None

    if remat:
        block_body = jax.checkpoint(block_body)

    m0 = jnp.full((B, Hkv, G, Sq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, Hkv, G, Sq, 1), jnp.float32)
    acc0 = jnp.zeros((B, Hkv, G, Sq, D), jnp.float32)
    blk_ids = jnp.arange(n_blocks, dtype=jnp.int32)
    (m, l, acc), _ = jax.lax.scan(block_body, (m0, l0, acc0), (kb, vb, blk_ids))

    l = jnp.where(l == 0.0, 1.0, l)
    out = (acc / l).reshape(B, Hq, Sq, D).transpose(0, 2, 1, 3)
    return out.astype(q.dtype)
