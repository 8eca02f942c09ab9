"""Rotary position embeddings, XLA-fused.

TPU-native replacement for the reference's FlashInfer fused RoPE bridge
(duo_attn/patch/flashinfer_utils.py:29-59): positions are passed as explicit
offsets (not cos/sin tables), rope_theta and scaling are config-driven, and
XLA fuses the elementwise math into surrounding ops — no separate kernel
needed. Non-interleaved (rotate-half) layout matching HF Llama.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..config import ModelConfig, RopeScaling


def rope_inv_freq(cfg: ModelConfig) -> jnp.ndarray:
    """Per-channel inverse frequencies [head_dim // 2], float32."""
    dim = cfg.head_dim
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    )
    rs: RopeScaling = cfg.rope_scaling
    if rs.rope_type == "linear":
        inv_freq = inv_freq / rs.factor
    elif rs.rope_type == "llama3":
        # Llama-3.1 frequency-dependent scaling.
        low_freq_wavelen = rs.original_max_position_embeddings / rs.low_freq_factor
        high_freq_wavelen = rs.original_max_position_embeddings / rs.high_freq_factor
        wavelen = 2 * math.pi / inv_freq
        # wavelen > low_freq_wavelen: fully scaled; < high_freq_wavelen: unscaled
        smooth = (rs.original_max_position_embeddings / wavelen - rs.low_freq_factor) / (
            rs.high_freq_factor - rs.low_freq_factor
        )
        smoothed = (1 - smooth) * inv_freq / rs.factor + smooth * inv_freq
        inv_freq = jnp.where(
            wavelen > low_freq_wavelen,
            inv_freq / rs.factor,
            jnp.where(wavelen < high_freq_wavelen, inv_freq, smoothed),
        )
    return inv_freq


def rope_cos_sin(inv_freq: jnp.ndarray, positions: jnp.ndarray):
    """cos/sin tables for integer positions.

    positions: [...] int32 -> (cos, sin) each [..., head_dim] float32,
    with the half-duplicated layout HF uses (cat([freqs, freqs])).
    """
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [..., dim/2]
    angles = jnp.concatenate([angles, angles], axis=-1)  # [..., dim]
    return jnp.cos(angles), jnp.sin(angles)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embedding.

    x: [B, S, H, D]; cos/sin: [B, S, D] or [S, D] broadcastable over heads.
    """
    if cos.ndim == x.ndim - 1:
        cos = cos[..., None, :]
        sin = sin[..., None, :]
    out = x.astype(jnp.float32) * cos + _rotate_half(x.astype(jnp.float32)) * sin
    return out.astype(x.dtype)


@partial(jax.jit, static_argnames=("cfg",))
def apply_rope_at_offset(q, k, cfg: ModelConfig, offset):
    """RoPE for a chunk starting at global position ``offset``.

    q: [B, S, Hq, D], k: [B, S, Hkv, D], offset: scalar int32 (traced OK).
    Equivalent role to FlashInfer's apply_rope_inplace with per-batch
    position offsets (duo_attn/patch/flashinfer_utils.py:29-59).
    """
    inv_freq = rope_inv_freq(cfg)
    seq = q.shape[1]
    positions = offset + jnp.arange(seq, dtype=jnp.int32)  # [S]
    cos, sin = rope_cos_sin(inv_freq, positions)  # [S, D]
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin)
