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


# Split radix for the precise phase path: positions factor as
# pos = 2^12 q + r with q, r exact in f32 for any pos < 2^36.
_SPLIT = 4096


def _inv_freq64(cfg: ModelConfig):
    """Host-side float64 inverse frequencies (+ scaling), for the precise
    phase tables. cfg is static under jit, so this folds to constants."""
    import numpy as np

    dim = cfg.head_dim
    inv_freq = 1.0 / (
        cfg.rope_theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
    )
    rs: RopeScaling = cfg.rope_scaling
    if rs.rope_type == "linear":
        inv_freq = inv_freq / rs.factor
    elif rs.rope_type == "llama3":
        low_freq_wavelen = rs.original_max_position_embeddings / rs.low_freq_factor
        high_freq_wavelen = rs.original_max_position_embeddings / rs.high_freq_factor
        wavelen = 2 * np.pi / inv_freq
        smooth = (rs.original_max_position_embeddings / wavelen - rs.low_freq_factor) / (
            rs.high_freq_factor - rs.low_freq_factor
        )
        smoothed = (1 - smooth) * inv_freq / rs.factor + smooth * inv_freq
        inv_freq = np.where(
            wavelen > low_freq_wavelen,
            inv_freq / rs.factor,
            np.where(wavelen < high_freq_wavelen, inv_freq, smoothed),
        )
    return inv_freq


def rope_cos_sin_precise(cfg: ModelConfig, positions: jnp.ndarray):
    """High-precision cos/sin tables for long contexts (f32-only hardware).

    The plain path computes angle = f32(w) * f32(pos); both the rounding
    of w and of the product carry relative error ~2^-24, i.e. ABSOLUTE
    phase error growing linearly in the angle — ~0.5 rad at 4M tokens for
    a pair with w=1, which randomizes high-frequency channels long before
    the 1M+ contexts this framework serves (the reference's CUDA fp32
    rope has the same failure mode; TPUs additionally lack fast f64).

    Range-reduce instead with a split product, in f64 ON HOST (cfg is
    static, so the tables constant-fold):
        pos = 4096 q + r,  w_hi = (4096 w) mod 2pi  (f64 -> f32)
        angle = (q * w_hi) mod 2pi + r * w
    Every intermediate stays < ~4100 rad, so f32 rounding contributes
    ~5e-4 rad at any position < 2^36 — three orders of magnitude better
    where it matters, identical layout/semantics otherwise.
    """
    import numpy as np

    w64 = _inv_freq64(cfg)
    w_hi = jnp.asarray(np.mod(_SPLIT * w64, 2 * np.pi), jnp.float32)
    w_lo = jnp.asarray(w64, jnp.float32)
    two_pi = jnp.float32(2 * np.pi)
    q = (positions // _SPLIT).astype(jnp.float32)[..., None]
    r = (positions % _SPLIT).astype(jnp.float32)[..., None]
    angles = jnp.mod(q * w_hi, two_pi) + r * w_lo  # [..., dim/2]
    angles = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(angles), jnp.sin(angles)


def rope_tables(cfg: ModelConfig, positions: jnp.ndarray):
    """cos/sin tables for a config: precise path iff cfg.rope_precise."""
    if cfg.rope_precise:
        return rope_cos_sin_precise(cfg, positions)
    return rope_cos_sin(rope_inv_freq(cfg), positions)


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
    seq = q.shape[1]
    positions = offset + jnp.arange(seq, dtype=jnp.int32)  # [S]
    cos, sin = rope_tables(cfg, positions)  # [S, D]
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin)
