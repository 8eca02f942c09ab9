"""Quantization ops: asymmetric per-token-group INT4 KV + W8A8 linears.

TPU-native counterpart of the reference's native quantization stack
(SURVEY.md §2.5 items 1 and 5):

* INT4 KV (demo/quantize_int4.cu semantics): asymmetric min/max per group
  of 128 channels (head_dim=128 → one group per (token, head), i.e. the
  per-channel case in BASELINE.json), scale=(max-min)/15, zero_point=min,
  two nibbles packed per uint8. Packing here is plane-wise — byte d holds
  channel d (low nibble) and channel d+D/2 (high nibble) — so the Pallas
  decode kernel unpacks with two vector ops and a lane-concat instead of
  an interleave shuffle. Dequantization is FUSED into the attention
  kernels via score/output rescaling (ops/flash.py), never materialized
  to an fp16 buffer (the reference dequantizes into preallocated fp16
  buffers first, demo/int4_kv.py:373-436 — we skip that round trip).

* W8A8 (QServe W8A8OF16LinearDynamicInputScale semantics,
  demo/w8a8kv4_llama.py:39-96): INT8 weights with per-out-channel scales,
  INT8 activations with per-token dynamic scales, int8xint8->int32 via
  lax.dot_general (MXU-native), fp scale epilogue. RMSNormGeneral /
  SiluAndMulQuant fusions are expressed as jnp chains and left to XLA.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# INT4 KV
# ---------------------------------------------------------------------------


def quantize_int4_nibbles(x: jnp.ndarray):
    """[..., T, D] -> (nibbles [..., T, D] uint8 in 0..15,
    scales [..., 2, T]: row 0 scale, row 1 zero-point)."""
    xf = x.astype(jnp.float32)
    mn = jnp.min(xf, axis=-1, keepdims=True)
    mx = jnp.max(xf, axis=-1, keepdims=True)
    scale = (mx - mn) / 15.0 + 1e-8
    q = jnp.clip(jnp.round((xf - mn) / scale), 0, 15).astype(jnp.uint8)
    scales = jnp.stack([scale[..., 0], mn[..., 0]], axis=-2)  # [..., 2, T]
    return q, scales.astype(jnp.bfloat16)


def quantize_int4(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize [..., T, D] to packed nibbles + per-(...,T) scale/zp.

    Returns (packed [..., T, D//2] uint8, scales [..., 2, T] float32-ish
    stored in x.dtype-compatible bf16): scales[..., 0, t]=scale,
    scales[..., 1, t]=zero_point. Channel-plane packing (byte d = chan d
    low nibble | chan d+D/2 high) — the flat layout used by tests/oracles;
    the cache uses the token-paired layout below.
    """
    D = x.shape[-1]
    assert D % 2 == 0
    q, scales = quantize_int4_nibbles(x)
    lo = q[..., : D // 2]
    hi = q[..., D // 2 :]
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    return packed, scales


def dequantize_int4(packed: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """Inverse of quantize_int4 (reference oracle / tests). Returns f32."""
    lo = (packed & 0xF).astype(jnp.float32)
    hi = (packed >> 4).astype(jnp.float32)
    q = jnp.concatenate([lo, hi], axis=-1)  # [..., T, D]
    scale = scales[..., 0, :, None].astype(jnp.float32)
    zp = scales[..., 1, :, None].astype(jnp.float32)
    return q * scale + zp


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Unpack nibbles WITHOUT scaling: [..., D//2] u8 -> [..., D] (uint8)."""
    lo = packed & 0xF
    hi = packed >> 4
    return jnp.concatenate([lo, hi], axis=-1)


# --- token-paired storage layout (TPU tile-native) -------------------------
#
# A packed token row is D//2 = 64 bytes; stored as [..., T, 64] the TPU pads
# the 64-lane dim to 128 (2x HBM, and XLA then compresses/uncompresses the
# buffer with extra copies). The cache therefore stores TOKEN PAIRS with
# NIBBLE-INTERLEAVED packing:
#   packed2 [..., T//2, D]: byte (r, d) = q4(token 2r, chan d)
#                                       | q4(token 2r+1, chan d) << 4
#   scales4 [..., 4, T//2]: rows = (scale_even, scale_odd, zp_even, zp_odd)
# Both shapes are exactly tile-aligned (128 lanes; scale rows are grouped
# per head into 8-row groups by the cache). Interleaving tokens at the
# NIBBLE level makes the kernel unpack trivial: ``p & 0xF`` is the even
# token's full channel row and ``p >> 4`` the odd token's — no lane
# slicing, channel concat, or sublane concat (ops/flash.py processes the
# two halves as separate matmuls; online softmax is permutation-invariant
# over KV positions, so only the position iota changes).


def quantize_int4_paired(x: jnp.ndarray):
    """[..., S, D] (S even) -> (packed2 [..., S//2, D], scales4 [..., 4, S//2])."""
    S = x.shape[-2]
    assert S % 2 == 0, f"token-paired int4 needs even S, got {S}"
    q, scales = quantize_int4_nibbles(x)  # [..., S, D], [..., 2, S]
    even, odd = q[..., 0::2, :], q[..., 1::2, :]  # [..., S//2, D]
    packed2 = (even | (odd << 4)).astype(jnp.uint8)
    scale, zp = scales[..., 0, :], scales[..., 1, :]  # [..., S]
    scales4 = jnp.stack(
        [scale[..., 0::2], scale[..., 1::2], zp[..., 0::2], zp[..., 1::2]],
        axis=-2,
    )  # [..., 4, S//2]
    return packed2, scales4


def paired_scales_to_cache_layout(scales4: jnp.ndarray) -> jnp.ndarray:
    """[..., H, 4, S/2] -> [..., 8*H, S/2] cache storage: each head owns an
    8-row group (Mosaic requires 8-aligned sublane blocks); rows 0-3 =
    (scale_even, scale_odd, zp_even, zp_odd), rows 4-7 unused."""
    *lead, H, four, S2 = scales4.shape
    assert four == 4
    pad = jnp.zeros((*lead, H, 4, S2), scales4.dtype)
    return jnp.concatenate([scales4, pad], axis=-2).reshape(*lead, 8 * H, S2)


def dequantize_int4_paired(packed2: jnp.ndarray, scales4: jnp.ndarray):
    """Inverse of quantize_int4_paired: -> [..., S, D] float32."""
    *lead, half_s, D = packed2.shape
    even = (packed2 & 0xF).astype(jnp.float32)  # [..., S//2, D]
    odd = (packed2 >> 4).astype(jnp.float32)
    q = jnp.stack([even, odd], axis=-2).reshape(*lead, half_s * 2, D)
    scale = jnp.stack(
        [scales4[..., 0, :], scales4[..., 1, :]], axis=-1
    ).reshape(*lead, half_s * 2)
    zp = jnp.stack(
        [scales4[..., 2, :], scales4[..., 3, :]], axis=-1
    ).reshape(*lead, half_s * 2)
    return q * scale[..., None].astype(jnp.float32) + zp[..., None].astype(
        jnp.float32
    )


# ---------------------------------------------------------------------------
# W8A8
# ---------------------------------------------------------------------------


def quantize_weight_int8(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-out-channel symmetric int8. w: [in, out] -> (w_q8, scale [out])."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    scale = absmax / 127.0 + 1e-12
    wq = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return wq, scale[0].astype(jnp.float32)


def quantize_act_per_token(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic per-token symmetric int8. x: [..., E] -> (x_q8, scale [..., 1])."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = absmax / 127.0 + 1e-12
    xq = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def int8_matmul(xq: jnp.ndarray, x_scale, wq: jnp.ndarray, w_scale,
                out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """(xq [..., in] int8) @ (wq [in, out] int8) with fp scale epilogue.

    Accumulates in int32 on the MXU (v5e+ native int8 matmul path)."""
    acc = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,  # "highest" is invalid for int8
    )
    return (acc.astype(jnp.float32) * x_scale * w_scale).astype(out_dtype)


_XLA_MATMUL_ONLY = False


class xla_matmul_only:
    """Trace-time switch: route W8A8 linears through plain dot_general
    instead of the Pallas GEMM. Required under GSPMD sharding — XLA can
    partition dot_general (inserting the psums TP needs) but cannot
    partition a Pallas custom call; llama.forward_chunk enters this
    context when a mesh is passed."""

    def __init__(self, enable: bool = True):
        self.enable = enable

    def __enter__(self):
        global _XLA_MATMUL_ONLY
        self.prev = _XLA_MATMUL_ONLY
        _XLA_MATMUL_ONLY = self.enable

    def __exit__(self, *exc):
        global _XLA_MATMUL_ONLY
        _XLA_MATMUL_ONLY = self.prev


def _w8a8_linear_impl(x, wq, w_scale, out_dtype):
    xq, xs = quantize_act_per_token(x)
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    K, N = wq.shape
    if (not _XLA_MATMUL_ONLY and M >= 256 and M % 32 == 0
            and K % 128 == 0 and N % 128 == 0):
        from .gemm import w8a8_matmul

        out = w8a8_matmul(
            xq.reshape(M, K), xs.reshape(M, 1), wq, w_scale, out_dtype
        )
        return out.reshape(*lead, N)
    return int8_matmul(xq, xs, wq, w_scale, out_dtype)


@jax.custom_vjp
def _w8a8_linear_ste(x, wq, w_scale, out_dtype_token):
    # out_dtype rides as a shaped zero-size "token" so custom_vjp sees only
    # array args (nondiff_argnums cannot hold an unhashable dtype object in
    # every caller's form); its dtype IS the requested out_dtype.
    return _w8a8_linear_impl(x, wq, w_scale, out_dtype_token.dtype)


def _w8a8_linear_ste_fwd(x, wq, w_scale, out_dtype_token):
    out = _w8a8_linear_impl(x, wq, w_scale, out_dtype_token.dtype)
    # x's dtype rides as a zero-size token too: a raw np.dtype residual is
    # not a valid pytree leaf once jax.checkpoint threads the residuals
    # (per-layer remat over W8A8 layers hits exactly that).
    return out, (wq, w_scale, jnp.zeros((0,), x.dtype))


def _w8a8_linear_ste_bwd(res, g):
    """Straight-through estimator: gradients flow as if the linear were
    ``x @ (wq * w_scale)`` — activation quantization treated as identity.
    Needed by gate training on W8A8 weights (forward_two_way -> _proj):
    ``jnp.round``'s true derivative is zero, which would silently kill the
    distill gradient through every quantized projection. Weights are
    frozen in gate training, so their cotangents are symbolic zeros."""
    import numpy as np

    from jax import dtypes

    wq, w_scale, x_token = res
    gf = g.astype(jnp.float32) * w_scale  # fold per-out-channel scale
    dx = jax.lax.dot_general(
        gf.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
        (((gf.ndim - 1,), (1,)), ((), ())),
    )
    return (
        dx.astype(x_token.dtype),
        np.zeros(wq.shape, dtype=dtypes.float0),  # int8: float0 cotangent
        jnp.zeros_like(w_scale),
        jnp.zeros((0,), g.dtype),  # the dtype token
    )


_w8a8_linear_ste.defvjp(_w8a8_linear_ste_fwd, _w8a8_linear_ste_bwd)


def w8a8_linear(x: jnp.ndarray, wq: jnp.ndarray, w_scale: jnp.ndarray,
                out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Full dynamic-activation W8A8 linear (differentiable: STE backward).

    Large matmuls go through the Pallas GEMM with the scale epilogue fused
    in-kernel (ops/gemm.py — XLA otherwise materializes the int32/f32
    intermediates as HBM temps, see that module's docstring); small/decode
    shapes use the plain dot_general path."""
    return _w8a8_linear_ste(x, wq, w_scale, jnp.zeros((0,), out_dtype))


def quantize_layer_weights(layer: Dict, keys=("wq", "wk", "wv", "wo",
                                              "w_gate", "w_up", "w_down")) -> Dict:
    """Replace selected bf16 weights with (int8, scale) pairs."""
    out = dict(layer)
    for k in keys:
        if k in layer:
            wq, ws = quantize_weight_int8(layer[k])
            out[k + "_q8"] = wq
            out[k + "_scale"] = ws
            del out[k]
    return out


def quantize_params_w8a8(params: Dict) -> Dict:
    """Quantize all decoder-layer projections to W8A8; embed/norms/lm_head
    stay high precision (reference keeps the fp16 head,
    demo/w8a8kv4_llama.py:478-483)."""
    out = dict(params)
    out["layers"] = tuple(quantize_layer_weights(l) for l in params["layers"])
    return out


def quantize_embeddings_int8(params: Dict) -> Dict:
    """Quantize embed (per-row) and lm_head (per-out-channel) to int8.

    The reference keeps these fp16 (demo/w8a8kv4_llama.py:478-483); on a
    16 GB chip they are ~2.1 GB for Llama-3 — quantizing them buys ~1 GB
    of extra KV budget. Embed rows are dequantized at lookup (a gather of
    int8 rows + per-row scale); lm_head runs through the W8A8 linear.
    """
    import jax

    def embed_q(emb):
        emb = emb.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(emb), axis=-1, keepdims=True)
        scale = absmax / 127.0 + 1e-12
        q = jnp.clip(jnp.round(emb / scale), -127, 127).astype(jnp.int8)
        return q, scale[:, 0].astype(jnp.float32)

    out = dict(params)
    if "embed" in out:
        # jit + donate: unjitted, each elementwise op materializes a full
        # f32 copy of the table (~2 GB each for Llama-3) — enough to OOM a
        # 16 GB chip with the int8 model already resident
        out["embed_q8"], out["embed_scale"] = jax.jit(
            embed_q, donate_argnums=(0,)
        )(out.pop("embed"))
    if "lm_head" in out:
        out["lm_head_q8"], out["lm_head_scale"] = jax.jit(
            quantize_weight_int8, donate_argnums=(0,)
        )(out.pop("lm_head"))
    return out


def init_params_w8a8(cfg, key, dtype=None, quantize_embeds: bool = False):
    """Random-init a model directly in W8A8 form, one layer at a time.

    Initializing the full bf16 model then quantizing needs bf16+int8
    resident simultaneously (an 8B model would not fit a 16 GB chip);
    here each layer is quantized as it is created and its bf16 source is
    dropped, so peak HBM ≈ int8 model + one bf16 layer.
    quantize_embeds also converts embed/lm_head to int8
    (quantize_embeddings_int8).
    """
    import dataclasses

    import jax

    from ..models import llama

    if dtype is None:
        dtype = jnp.bfloat16
    # vocab shrunk for the per-layer inits: their embed/lm_head are discarded
    one_layer = dataclasses.replace(cfg, num_layers=1, vocab_size=8)
    keys = jax.random.split(key, cfg.num_layers + 1)
    layers = []
    for li in range(cfg.num_layers):
        p = llama.init_params(one_layer, keys[li], dtype)
        layer = jax.jit(quantize_layer_weights, donate_argnums=(0,))(
            p["layers"][0]
        )
        del p
        layers.append(jax.block_until_ready(layer))
    top = llama.init_params(
        dataclasses.replace(cfg, num_layers=0), keys[-1], dtype
    )
    top["layers"] = tuple(layers)
    if quantize_embeds:
        top = quantize_embeddings_int8(top)
    return top


def init_params_w8a8_random(cfg, key, quantize_embeds: bool = True):
    """Random W8A8 params sampled DIRECTLY as int8, in one device dispatch.

    Benchmark/test fast path: init_params_w8a8 streams bf16 layer inits
    through a per-layer quantize (needed when quantizing real weights
    without 2x peak HBM), which costs ~2 dispatches per layer — ~70
    tunnel round trips for a 32-layer model. Decode/prefill speed is
    value-independent, so benchmarks only need the right shapes/dtypes:
    here every int8 tensor is sampled uniform in [-127, 127] and scales
    are set to fan_in**-0.5 / 127 (keeping activations O(1) so no
    inf/nan paths are hit), all inside ONE jit — a single round trip.
    """
    import dataclasses  # noqa: F401  (parity with init_params_w8a8 imports)

    E, D = cfg.hidden_size, cfg.head_dim
    Hq, Hkv, I = cfg.num_heads, cfg.num_kv_heads, cfg.intermediate_size
    V = cfg.vocab_size

    def rand_q8(key, shape):
        w = jax.random.randint(key, shape, -127, 128, jnp.int8)
        return w, jnp.full((shape[-1],), shape[0] ** -0.5 / 127.0,
                           jnp.float32)

    def build(key):
        keys = jax.random.split(key, cfg.num_layers + 2)
        layers = []
        for li in range(cfg.num_layers):
            lk = jax.random.split(keys[li], 7)
            layer = {"input_norm": jnp.ones((E,), jnp.bfloat16),
                     "post_norm": jnp.ones((E,), jnp.bfloat16)}
            for k, sub, shape in (
                ("wq", lk[0], (E, Hq * D)), ("wk", lk[1], (E, Hkv * D)),
                ("wv", lk[2], (E, Hkv * D)), ("wo", lk[3], (Hq * D, E)),
                ("w_gate", lk[4], (E, I)), ("w_up", lk[5], (E, I)),
                ("w_down", lk[6], (I, E)),
            ):
                layer[k + "_q8"], layer[k + "_scale"] = rand_q8(sub, shape)
            layers.append(layer)
        top = {"layers": tuple(layers),
               "final_norm": jnp.ones((E,), jnp.bfloat16)}
        if quantize_embeds:
            top["embed_q8"] = jax.random.randint(
                keys[-2], (V, E), -127, 128, jnp.int8)
            top["embed_scale"] = jnp.full((V,), 0.02 / 127.0, jnp.float32)
            top["lm_head_q8"], top["lm_head_scale"] = rand_q8(keys[-1],
                                                              (E, V))
        else:
            top["embed"] = (
                jax.random.normal(keys[-2], (V, E), jnp.float32) * 0.02
            ).astype(jnp.bfloat16)
            top["lm_head"] = (
                jax.random.normal(keys[-1], (E, V), jnp.float32) * E ** -0.5
            ).astype(jnp.bfloat16)
        return top

    return jax.jit(build)(key)
