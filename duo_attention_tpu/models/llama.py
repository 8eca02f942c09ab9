"""Functional Llama/Mistral/Mixtral-dense model — the single engine.

The reference maintains three incarnations of the same model (HF patched
tuple-cache, HF patched static-cache, QServe from-scratch demo — see
SURVEY.md §1 note); here one functional implementation serves training,
chunked prefill and decode, parameterized by ModelConfig/DuoConfig and a
pluggable attention backend ("ref" jnp oracle now, Pallas kernels as the
fast path).

Weight layout: all projections stored [in_features, out_features] so the
forward is ``x @ W`` (dot rides the MXU with bf16 inputs). KV-head
reordering (retrieval heads first) is applied once at load time in
models/convert.py, mirroring duo_attn/patch/utils.py:6-45.

Parity citations: attention math duo_attn/patch/llama.py:146-306 (one-way
reordered eval path), chunk semantics duo_attn/patch/llama.py:225-267,
static-cache threading duo_attn/patch/static_kv_cache.py:318-567.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..cache import (
    DuoCache,
    DuoCacheQ4,
    full_mask,
    ring_mask,
    sink_mask,
    write_full,
    write_full_q4,
    write_streaming,
)
from ..config import DuoConfig, ModelConfig
from ..ops.attention_ref import masked_attention
from ..ops.norm import rms_norm
from ..ops.rope import apply_rope, rope_tables

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Parameter initialization (random; HF conversion lives in convert.py)
# ---------------------------------------------------------------------------


def init_params(cfg: ModelConfig, key, dtype=jnp.bfloat16) -> Params:
    """Random-init params with the right shapes (for tests and benchmarks)."""
    E = cfg.hidden_size
    D = cfg.head_dim
    Hq, Hkv = cfg.num_heads, cfg.num_kv_heads
    I = cfg.intermediate_size

    def dense(key, shape, scale=None):
        if scale is None:
            scale = 1.0 / (shape[0] ** 0.5)
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    keys = jax.random.split(key, cfg.num_layers + 3)
    layers = []
    for li in range(cfg.num_layers):
        lk = jax.random.split(keys[li], 8)
        layer = {
            "input_norm": jnp.ones((E,), dtype),
            "post_norm": jnp.ones((E,), dtype),
            "wq": dense(lk[0], (E, Hq * D)),
            "wk": dense(lk[1], (E, Hkv * D)),
            "wv": dense(lk[2], (E, Hkv * D)),
            "wo": dense(lk[3], (Hq * D, E)),
        }
        if cfg.num_local_experts > 0:
            X = cfg.num_local_experts
            layer["moe_gate"] = dense(lk[7], (E, X)).astype(jnp.float32)
            layer["experts_w_gate"] = dense(lk[4], (X, E, I), scale=E ** -0.5)
            layer["experts_w_up"] = dense(lk[5], (X, E, I), scale=E ** -0.5)
            layer["experts_w_down"] = dense(lk[6], (X, I, E), scale=I ** -0.5)
        else:
            layer["w_gate"] = dense(lk[4], (E, I))
            layer["w_up"] = dense(lk[5], (E, I))
            layer["w_down"] = dense(lk[6], (I, E))
        if cfg.attention_bias:
            layer["bq"] = jnp.zeros((Hq * D,), dtype)
            layer["bk"] = jnp.zeros((Hkv * D,), dtype)
            layer["bv"] = jnp.zeros((Hkv * D,), dtype)
        layers.append(layer)

    params = {
        "embed": dense(keys[-3], (cfg.vocab_size, E), scale=0.02),
        "layers": tuple(layers),
        "final_norm": jnp.ones((E,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(keys[-2], (E, cfg.vocab_size))
    return params


def lm_head_weight(params: Params) -> jnp.ndarray:
    if "lm_head" in params:
        return params["lm_head"]
    return params["embed"].T  # tied embeddings


def embed_lookup(params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
    """Embedding gather; int8 rows dequantized per-row when the table is
    quantized (ops.quant.quantize_embeddings_int8)."""
    if "embed_q8" in params:
        rows = params["embed_q8"][input_ids].astype(jnp.float32)
        scale = params["embed_scale"][input_ids][..., None]
        # dtype source must exist on a first pipeline stage too, which
        # holds layers but no final_norm (parallel/pipeline.py)
        dt = params["layers"][0]["input_norm"].dtype
        return (rows * scale).astype(dt)
    return params["embed"][input_ids]


def head_logits(params: Params, h: jnp.ndarray) -> jnp.ndarray:
    """Public lm-head: hidden [..., E] -> logits [..., vocab] f32 (full
    sequence; used by pretraining and eval oracles)."""
    return _head_logits(params, h)


def _head_logits(params: Params, h: jnp.ndarray) -> jnp.ndarray:
    """h [..., E] -> logits [..., vocab] in f32 (W8A8 head when present)."""
    if "lm_head_q8" in params:
        from ..ops.quant import w8a8_linear

        return w8a8_linear(
            h, params["lm_head_q8"], params["lm_head_scale"],
            out_dtype=jnp.float32,
        )
    if "embed_q8" in params and "lm_head" not in params:
        # tied embeddings with a quantized table: logits = h @ embed.T with
        # embed[v] ~= embed_q8[v] * embed_scale[v], so the per-row embed
        # scale acts as the head's per-out-channel scale (no bf16 table
        # exists to fall back to — quantize_embeddings_int8 pops it)
        from ..ops.quant import quantize_act_per_token

        hq, hs = quantize_act_per_token(h)
        acc = jax.lax.dot_general(
            hq, params["embed_q8"], (((hq.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT,
        )
        return acc.astype(jnp.float32) * hs * params["embed_scale"]
    return (h @ lm_head_weight(params)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def _proj(layer: Params, x: jnp.ndarray, name: str) -> jnp.ndarray:
    """bf16 or W8A8 projection, chosen by which params are present.

    W8A8: per-token dynamic activation int8 + per-channel weight int8 on
    the MXU (QServe linear semantics, demo/w8a8kv4_llama.py:39-96)."""
    if name + "_q8" in layer:
        from ..ops.quant import w8a8_linear

        return w8a8_linear(
            x, layer[name + "_q8"], layer[name + "_scale"], out_dtype=x.dtype
        )
    return x @ layer[name]


def _qkv(layer: Params, x: jnp.ndarray, cfg: ModelConfig):
    B, S, _ = x.shape
    D = cfg.head_dim
    q = _proj(layer, x, "wq")
    k = _proj(layer, x, "wk")
    v = _proj(layer, x, "wv")
    if "bq" in layer:
        q = q + layer["bq"]
        k = k + layer["bk"]
        v = v + layer["bv"]
    q = q.reshape(B, S, cfg.num_heads, D)
    k = k.reshape(B, S, cfg.num_kv_heads, D)
    v = v.reshape(B, S, cfg.num_kv_heads, D)
    return q, k, v


def _mlp(layer: Params, x: jnp.ndarray, cfg: Optional[ModelConfig] = None) -> jnp.ndarray:
    if "moe_gate" in layer:
        k = cfg.num_experts_per_tok if cfg is not None else 2
        return _moe_mlp(layer, x, k)
    return _proj(
        layer,
        jax.nn.silu(_proj(layer, x, "w_gate")) * _proj(layer, x, "w_up"),
        "w_down",
    )


def _moe_mlp(layer: Params, x: jnp.ndarray, top_k: int) -> jnp.ndarray:
    """Mixtral sparse-MoE MLP with dense dispatch.

    Semantics match HF MixtralSparseMoeBlock: softmax router over the
    top-k expert logits per token, SwiGLU experts, weighted sum. Dispatch
    is DENSE (every expert computes every token, masked by the combine
    weights): at the tiny-to-8-expert scale this framework runs MoE at,
    one batched [E]-stacked einsum keeps the MXU busy with static shapes,
    where a gather/scatter dispatch would serialize into dynamic-shape
    ops XLA can't tile. Capacity-factor ragged dispatch is the upgrade
    path if MoE ever becomes a serving target (the reference never runs
    MoE beyond 'the patch does not break it': duo_attn/patch/__init__.py:44).
    """
    dt = x.dtype
    logits = (x.astype(jnp.float32) @ layer["moe_gate"].astype(jnp.float32))
    topv, topi = jax.lax.top_k(logits, top_k)  # [B, S, k]
    w = jax.nn.softmax(topv, axis=-1)
    E = layer["moe_gate"].shape[-1]
    combine = jnp.sum(
        w[..., None] * jax.nn.one_hot(topi, E, dtype=w.dtype), axis=-2
    )  # [B, S, E]
    # stacked experts: w_gate/w_up [E, H, F], w_down [E, F, H]
    g = jnp.einsum("bsh,ehf->bsef", x, layer["experts_w_gate"].astype(dt))
    u = jnp.einsum("bsh,ehf->bsef", x, layer["experts_w_up"].astype(dt))
    act = jax.nn.silu(g) * u
    out = jnp.einsum("bsef,efh->bseh", act, layer["experts_w_down"].astype(dt))
    return jnp.sum(out * combine[..., :, None].astype(dt), axis=2)


def _expand_mask(m: jnp.ndarray) -> jnp.ndarray:
    """[S, T] -> [1, 1, S, T]; [B, S, T] -> [B, 1, S, T] (head broadcast)."""
    return m[None, None] if m.ndim == 2 else m[:, None]


def _duo_layer_attention(
    layer_idx: int,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    cache: DuoCache,
    cfg: ModelConfig,
    duo: DuoConfig,
    positions: jnp.ndarray,
    attn_impl: str,
    full_bucket: int = 0,
    mesh=None,
):
    """Split-head attention for one layer; returns (out, updated layer bufs).

    q: [B, S, Hq, D]; k/v: [B, S, Hkv, D], all post-RoPE. positions: [S]
    (or [B, S] when cache.length is per-sequence) global query positions;
    cache.length is the chunk start. full_bucket: static upper bound on
    valid full-cache length for this call (0 = whole buffer) — lets the
    Pallas kernel grid cover only live blocks. mesh: when given and a
    group's head count divides the ``tensor`` axis, its Pallas kernel runs
    inside shard_map on head-sharded cache buffers (parallel/spmd.py);
    other groups fall back to the unsharded call.
    """
    hf = duo.num_full_kv_heads[layer_idx]
    hs = cfg.num_kv_heads - hf
    G = cfg.num_kv_groups
    S = q.shape[1]
    cs = cache.length
    total_after = cs + S  # includes any tail padding; masks handle it

    outs = []
    new_bufs = {}

    quantized = isinstance(cache, DuoCacheQ4)
    if hf > 0:
        # incoming in cache layout [B, H, S, D]
        k_in = k[:, :, :hf].transpose(0, 2, 1, 3)
        v_in = v[:, :, :hf].transpose(0, 2, 1, 3)
        q_f = q[:, :, : hf * G]
        if quantized:
            kq, ks_ = write_full_q4(
                cache.k_full_q[layer_idx], cache.k_full_s[layer_idx], k_in, cs
            )
            vq, vs_ = write_full_q4(
                cache.v_full_q[layer_idx], cache.v_full_s[layer_idx], v_in, cs
            )
            new_bufs["k_full_q"], new_bufs["k_full_s"] = kq, ks_
            new_bufs["v_full_q"], new_bufs["v_full_s"] = vq, vs_
            if attn_impl == "ref":
                from ..ops.quant import dequantize_int4_paired

                B_, T2 = kq.shape[0], kq.shape[2]
                kf = dequantize_int4_paired(
                    kq, ks_.reshape(B_, hf, 8, T2)[:, :, :4]
                ).astype(q.dtype)
                vf = dequantize_int4_paired(
                    vq, vs_.reshape(B_, hf, 8, T2)[:, :, :4]
                ).astype(q.dtype)
                mask = _expand_mask(full_mask(positions, kf.shape[2]))
                outs.append(
                    masked_attention(
                        q_f, kf.transpose(0, 2, 1, 3), vf.transpose(0, 2, 1, 3),
                        mask,
                    )
                )
            elif attn_impl == "pallas":
                from ..parallel.spmd import can_shard_heads

                if can_shard_heads(mesh, hf):
                    from ..parallel.spmd import sharded_full_attention_q4

                    outs.append(
                        sharded_full_attention_q4(
                            mesh, q_f, kq, ks_, vq, vs_, cs, bucket=full_bucket
                        )
                    )
                else:
                    from ..ops.flash import full_cache_attention_q4

                    outs.append(
                        full_cache_attention_q4(
                            q_f, kq, ks_, vq, vs_, cs, bucket=full_bucket
                        )
                    )
            else:
                raise ValueError(f"unknown attn_impl {attn_impl}")
        else:
            kf = write_full(cache.k_full[layer_idx], k_in, cs)
            vf = write_full(cache.v_full[layer_idx], v_in, cs)
            new_bufs["k_full"], new_bufs["v_full"] = kf, vf
            if attn_impl == "ref":
                mask = _expand_mask(full_mask(positions, kf.shape[2]))
                outs.append(
                    masked_attention(
                        q_f,
                        kf.transpose(0, 2, 1, 3),
                        vf.transpose(0, 2, 1, 3),
                        mask,
                    )
                )
            elif attn_impl == "pallas":
                from ..parallel.spmd import can_shard_heads

                # bucket bounds the kernel grid; the buffer is passed whole
                # so no live-prefix copy is materialized.
                if can_shard_heads(mesh, hf):
                    from ..parallel.spmd import sharded_full_attention

                    outs.append(
                        sharded_full_attention(
                            mesh, q_f, kf, vf, cs, bucket=full_bucket
                        )
                    )
                else:
                    from ..ops.flash import full_cache_attention

                    outs.append(
                        full_cache_attention(q_f, kf, vf, cs, bucket=full_bucket)
                    )
            else:
                raise ValueError(f"unknown attn_impl {attn_impl}")

    if hs > 0:
        ks, vs, kr, vr = write_streaming(
            cache.k_sink[layer_idx],
            cache.v_sink[layer_idx],
            cache.k_ring[layer_idx],
            cache.v_ring[layer_idx],
            k[:, :, hf:].transpose(0, 2, 1, 3),
            v[:, :, hf:].transpose(0, 2, 1, 3),
            cs,
            duo.sink_size,
        )
        new_bufs["k_sink"], new_bufs["v_sink"] = ks, vs
        new_bufs["k_ring"], new_bufs["v_ring"] = kr, vr
        R = kr.shape[2]
        q_s = q[:, :, hf * G :]
        if attn_impl == "ref":
            k_cat = jnp.concatenate([ks[:, :, : duo.sink_size], kr], axis=2)
            v_cat = jnp.concatenate([vs[:, :, : duo.sink_size], vr], axis=2)
            m_sink = sink_mask(positions, duo.sink_size, duo.sink_size)
            m_ring = ring_mask(
                positions, R, total_after, cs, duo.sink_size, duo.recent_size
            )
            mask = _expand_mask(jnp.concatenate([m_sink, m_ring], axis=-1))
            outs.append(
                masked_attention(
                    q_s,
                    k_cat.transpose(0, 2, 1, 3),
                    v_cat.transpose(0, 2, 1, 3),
                    mask,
                )
            )
        elif attn_impl == "pallas":
            from ..parallel.spmd import can_shard_heads

            if can_shard_heads(mesh, hs):
                from ..parallel.spmd import sharded_streaming_attention

                outs.append(
                    sharded_streaming_attention(
                        mesh, q_s, ks, vs, kr, vr, cs, total_after,
                        duo.sink_size, duo.recent_size,
                    )
                )
            else:
                from ..ops.flash import streaming_cache_attention

                outs.append(
                    streaming_cache_attention(
                        q_s, ks, vs, kr, vr, cs, total_after,
                        duo.sink_size, duo.recent_size,
                    )
                )
        else:
            raise ValueError(f"unknown attn_impl {attn_impl}")
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=2)
    return out, new_bufs


def _replace_layer(cache, layer_idx: int, new_bufs: dict):
    """Swap one layer's buffers (works for DuoCache and DuoCacheQ4)."""
    updates = {}
    for field, buf in new_bufs.items():
        bufs = list(getattr(cache, field))
        bufs[layer_idx] = buf
        updates[field] = tuple(bufs)
    return cache._replace(**updates)


# ---------------------------------------------------------------------------
# Cached forward (chunked prefill + decode)
# ---------------------------------------------------------------------------


def forward_chunk(
    params: Params,
    cfg: ModelConfig,
    duo: DuoConfig,
    cache: DuoCache,
    input_ids: jnp.ndarray,
    n_valid=None,
    attn_impl: str = "ref",
    full_bucket: int = 0,
    mesh=None,
) -> Tuple[jnp.ndarray, DuoCache]:
    """One forward step over a chunk of tokens with cache update.

    input_ids: [B, S] (S static; tail beyond n_valid is padding), or
    pre-embedded hidden states [B, S, E] for a non-first pipeline stage
    (parallel/pipeline.py) — the embed lookup is skipped.
    n_valid: traced scalar count of real tokens in this chunk (default S).
    full_bucket: static bound on full-cache length after this chunk (see
    _duo_layer_attention); the engine buckets it so only live cache blocks
    are touched.
    Returns (hidden_states [B, S, E] post-final-norm, new cache with
    length advanced by n_valid). The final RMSNorm is applied only when
    ``params`` carries ``final_norm`` — a pipeline stage that is not the
    last holds no ``final_norm`` and emits raw residual-stream states.
    """
    B, S = input_ids.shape[:2]
    if n_valid is None:
        n_valid = jnp.asarray(S, jnp.int32)

    if cache.length.ndim == 1:  # per-sequence lengths (continuous batching)
        positions = cache.length[:, None] + jnp.arange(S, dtype=jnp.int32)
    else:
        positions = cache.length + jnp.arange(S, dtype=jnp.int32)
    cos, sin = rope_tables(cfg, positions)  # [S, D] or [B, S, D]
    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]

    if input_ids.ndim == 2:
        x = embed_lookup(params, input_ids)  # [B, S, E]
    else:
        x = input_ids  # already-embedded stage input [B, S, E]

    if mesh is not None:
        # GSPMD cannot partition the Pallas GEMM custom call; dot_general
        # it CAN (inserting TP psums). Trace-time switch — see
        # ops.quant.xla_matmul_only.
        from ..ops.quant import xla_matmul_only

        ctx = xla_matmul_only()
    else:
        import contextlib

        ctx = contextlib.nullcontext()
    with ctx:
        x, cache = _layer_stack(
            params, cfg, duo, cache, x, positions, cos, sin, attn_impl,
            full_bucket, mesh,
        )

    if "final_norm" in params:
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    cache = cache._replace(length=cache.length + n_valid.astype(jnp.int32))
    return x, cache


def _layer_stack(params, cfg, duo, cache, x, positions, cos, sin, attn_impl,
                 full_bucket, mesh):
    B, S = x.shape[:2]
    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["input_norm"], cfg.rms_norm_eps)
        q, k, v = _qkv(layer, h, cfg)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn_out, new_bufs = _duo_layer_attention(
            li, q, k, v, cache, cfg, duo, positions, attn_impl, full_bucket,
            mesh,
        )
        attn_out = attn_out.reshape(B, S, cfg.num_heads * cfg.head_dim)
        x = x + _proj(layer, attn_out, "wo")
        h = rms_norm(x, layer["post_norm"], cfg.rms_norm_eps)
        x = x + _mlp(layer, h, cfg)
        cache = _replace_layer(cache, li, new_bufs)
    return x, cache


def logits_at(params: Params, hidden: jnp.ndarray, index) -> jnp.ndarray:
    """lm_head on a single position (last-token-only, like the reference
    demo's last-token lm_head, demo/w8a8kv4_llama.py:478-483).

    hidden: [B, S, E]; index: traced scalar. Returns [B, vocab]."""
    h = jax.lax.dynamic_slice_in_dim(hidden, index, 1, axis=1)[:, 0]
    return _head_logits(params, h)


def all_logits(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    return _head_logits(params, hidden)


# ---------------------------------------------------------------------------
# Two-way forward (gate training)
# ---------------------------------------------------------------------------


def forward_two_way(
    params: Params,
    gates: jnp.ndarray,
    cfg: ModelConfig,
    sink_size: int,
    recent_size: int,
    input_ids: jnp.ndarray,
    seq_axis: Optional[str] = None,
    block_k: int = 512,
    layer_hook=None,
    remat: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Teacher/student two-stream forward for gate identification.

    Semantics follow llama_duo_attention_forward_two_way
    (duo_attn/patch/llama.py:41-143): the teacher stream uses full causal
    attention with no gradient; the student stream computes Λ-masked
    streaming attention on its own hidden states and mixes per query head
    with the *teacher's* attention output: (1-α)·stream + α·stop_grad(full).
    Only ``gates`` [num_layers, num_kv_heads] receives gradients.

    With ``seq_axis`` set (inside shard_map), input_ids are a sequence
    shard and attention runs under Ulysses all-to-all resharding
    (parallel/ulysses.py), mirroring the reference's UlyssesAttention wrap
    (duo_attn/patch/llama.py:492-501).

    ``layer_hook(layer, (ht, hs)) -> (layer, (ht, hs))`` is called at the
    top of each block; FSDP-sharded training (parallel/fsdp.py, the
    FSDP2 counterpart of duo_attn/train.py:60-69) uses it to all-gather
    one layer's sharded weights at its use site.

    ``remat=True`` wraps each layer's teacher+student block in
    ``jax.checkpoint`` (the reference applies per-decoder-layer activation
    checkpointing, duo_attn/train.py:302): the backward pass recomputes a
    layer's internals instead of keeping them live, so peak activation
    memory is O(num_layers x residual) + O(1 layer's internals). The hook
    runs INSIDE the remat'd block, so FSDP's per-layer all-gather is also
    recomputed in backward instead of holding every layer's gathered
    weights — exactly FSDP2's reshard-after-forward + checkpoint
    composition.

    Returns (teacher_hidden, student_hidden), both post-final-norm
    [B, S_local, E].
    """
    from ..ops.blockwise import blockwise_attention, causal_mask_fn, lambda_mask_fn

    B, S = input_ids.shape
    if seq_axis is not None:
        shard_idx = jax.lax.axis_index(seq_axis)
        offset = shard_idx * S
    else:
        offset = 0
    positions = offset + jnp.arange(S, dtype=jnp.int32)
    cos, sin = rope_tables(cfg, positions)
    lam = lambda_mask_fn(sink_size, recent_size)

    def full_attn(q, k, v):
        return blockwise_attention(q, k, v, causal_mask_fn, block_k=block_k)

    def stream_attn(q, k, v):
        return blockwise_attention(q, k, v, lam, block_k=block_k)

    if seq_axis is not None:
        from ..parallel.ulysses import ulysses_attention

        full_fn = lambda q, k, v: ulysses_attention(full_attn, q, k, v, seq_axis)
        stream_fn = lambda q, k, v: ulysses_attention(stream_attn, q, k, v, seq_axis)
    else:
        full_fn, stream_fn = full_attn, stream_attn

    G = cfg.num_kv_groups
    x = embed_lookup(params, input_ids)
    ht = x  # teacher
    hs = x  # student

    def block(layer, alpha_raw, ht, hs):
        if layer_hook is not None:
            layer, (ht, hs) = layer_hook(layer, (ht, hs))
        alpha = jnp.clip(alpha_raw, 0.0, 1.0).astype(jnp.float32)
        # per-query-head mix weights [1, 1, Hq, 1]
        alpha_q = jnp.repeat(alpha, G).reshape(1, 1, cfg.num_heads, 1)

        # --- teacher (no grad; does not depend on gates) ---
        nt = rms_norm(ht, layer["input_norm"], cfg.rms_norm_eps)
        qt, kt, vt = _qkv(layer, nt, cfg)
        qt = apply_rope(qt, cos[None], sin[None])
        kt = apply_rope(kt, cos[None], sin[None])
        full_out = full_fn(qt, kt, vt)  # [B, S, Hq, D]
        full_out = jax.lax.stop_gradient(full_out)
        ht = ht + _proj(layer, full_out.reshape(B, S, -1), "wo")
        ht = ht + _mlp(layer, rms_norm(ht, layer["post_norm"], cfg.rms_norm_eps), cfg)
        ht = jax.lax.stop_gradient(ht)

        # --- student ---
        ns = rms_norm(hs, layer["input_norm"], cfg.rms_norm_eps)
        qs, ks, vs = _qkv(layer, ns, cfg)
        qs = apply_rope(qs, cos[None], sin[None])
        ks = apply_rope(ks, cos[None], sin[None])
        stream_out = stream_fn(qs, ks, vs)
        mixed = (1.0 - alpha_q) * stream_out.astype(jnp.float32) + (
            alpha_q * full_out.astype(jnp.float32)
        )
        mixed = mixed.astype(stream_out.dtype)
        hs = hs + _proj(layer, mixed.reshape(B, S, -1), "wo")
        hs = hs + _mlp(layer, rms_norm(hs, layer["post_norm"], cfg.rms_norm_eps), cfg)
        return ht, hs

    if remat:
        block = jax.checkpoint(block)
    for li, layer in enumerate(params["layers"]):
        ht, hs = block(layer, gates[li], ht, hs)

    ht = rms_norm(ht, params["final_norm"], cfg.rms_norm_eps)
    hs = rms_norm(hs, params["final_norm"], cfg.rms_norm_eps)
    return jax.lax.stop_gradient(ht), hs


# ---------------------------------------------------------------------------
# Uncached forward (training / teacher-forcing oracle)
# ---------------------------------------------------------------------------


def forward_full_attention(
    params: Params, cfg: ModelConfig, input_ids: jnp.ndarray
) -> jnp.ndarray:
    """Plain causal forward with no cache — the gates=1 oracle.

    Used by tests to verify duo forward ≡ full attention when every head is
    a retrieval head (the reference exercises this as sparsity=0,
    scripts/run_efficiency.sh:4).
    """
    from ..ops.attention_ref import causal_attention_ref

    B, S = input_ids.shape
    positions = jnp.arange(S, dtype=jnp.int32)
    cos, sin = rope_tables(cfg, positions)
    x = embed_lookup(params, input_ids)
    for layer in params["layers"]:
        h = rms_norm(x, layer["input_norm"], cfg.rms_norm_eps)
        q, k, v = _qkv(layer, h, cfg)
        q = apply_rope(q, cos[None], sin[None])
        k = apply_rope(k, cos[None], sin[None])
        attn = causal_attention_ref(q, k, v)
        x = x + _proj(layer, attn.reshape(B, S, -1), "wo")
        h = rms_norm(x, layer["post_norm"], cfg.rms_norm_eps)
        x = x + _mlp(layer, h, cfg)
    return rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
