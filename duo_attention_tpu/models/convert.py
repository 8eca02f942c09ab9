"""HF checkpoint conversion + load-time KV-head reordering.

The reference deploys DuoAttention by physically permuting the q/k/v/o
projection weights of a loaded HF model so retrieval heads occupy a leading
contiguous slice (duo_attn/patch/utils.py:6-45, applied in
duo_attn/patch/llama.py:504-554). Here the same permutation is applied once
while converting an HF checkpoint (safetensors or torch .bin shards) into
our functional param pytree — per-layer ``num_full_kv_head`` then becomes a
static int baked into each layer's kernel call (SURVEY.md §7.1 delta 3).

Weight layout note: HF stores projections as [out_features, in_features];
our pytree stores [in_features, out_features] so the forward is ``x @ W``
on the MXU (models/llama.py docstring). Conversion transposes.

For W8A8 serving, quantization happens *after* reordering
(ops.quant.quantize_params_w8a8), so no quant-aware scale reorder is needed
— unlike the reference, which loads pre-quantized QServe checkpoints and
must permute per-channel dequant scales too (demo/w8a8kv4_llama.py:630-729).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

from ..config import DuoConfig, ModelConfig, load_hf_config
from ..patterns import (
    expand_kv_perm,
    head_permutation,
    num_full_kv_heads_per_layer,
)


# ---------------------------------------------------------------------------
# Raw state-dict loading (safetensors preferred, torch .bin fallback)
# ---------------------------------------------------------------------------


_ST_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "I64": np.int64,
    "I32": np.int32,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


def _st_dtype(name: str):
    if name == "BF16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(_ST_DTYPES[name])


def mmap_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Zero-copy safetensors reader: tensors are views into an mmap.

    Format: u64le header length, JSON header {name: {dtype, shape,
    data_offsets}}, then the data blob. Views stay valid for the life of
    the returned dict (the mmap is kept alive by the arrays' base). The
    native layout engine (native/checkpoint_ops.cc) reads straight from
    these views, so conversion does one pass: page cache -> transposed
    destination buffer.
    """
    blob = np.memmap(path, dtype=np.uint8, mode="r")
    n = int(np.frombuffer(blob[:8].tobytes(), dtype="<u8")[0])
    header = json.loads(blob[8 : 8 + n].tobytes())
    base = 8 + n
    out = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        b, e = meta["data_offsets"]
        dt = _st_dtype(meta["dtype"])
        arr = blob[base + b : base + e].view(dt)
        out[name] = arr.reshape(meta["shape"])
    return out


def _load_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Load every tensor of a sharded HF checkpoint as numpy arrays
    (mmap-backed views for safetensors shards)."""
    st_files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    state = {}
    if st_files:
        for path in st_files:
            state.update(mmap_safetensors(path))
        return state
    bin_files = sorted(glob.glob(os.path.join(model_dir, "pytorch_model*.bin")))
    if not bin_files:
        raise FileNotFoundError(f"no checkpoint shards found in {model_dir}")
    import torch

    for path in bin_files:
        sd = torch.load(path, map_location="cpu", weights_only=True)
        for name, t in sd.items():
            state[name] = t.to(torch.float32).numpy()
    return state


def _to_dtype(x: np.ndarray, dtype):
    import jax.numpy as jnp

    return jnp.asarray(x).astype(dtype)


def _T(x: np.ndarray, perm=None, col_perm=None) -> np.ndarray:
    """Transpose via the native multithreaded layout engine when possible
    (numpy fallback inside), materializing mmap-backed views exactly once
    — with the DuoAttention head permutation fused into the same pass
    (row gather for q/k/v out-channels, column gather for o in-channels)."""
    if isinstance(x, np.ndarray) and x.ndim == 2:
        from .. import native

        return native.transpose_gather(x, perm=perm, col_perm=col_perm)
    x = np.asarray(x)
    if perm is not None:
        x = x[np.asarray(perm)]
    if col_perm is not None:
        x = x[:, np.asarray(col_perm)]
    return np.ascontiguousarray(x.T)


def params_from_state_dict(
    state: Dict[str, np.ndarray], cfg: ModelConfig, dtype=None,
    layer_perms=None,
) -> Dict:
    """Map HF llama/mistral tensor names onto our param pytree.

    Name map (HF -> ours): model.embed_tokens.weight -> embed;
    model.layers.{i}.self_attn.{q,k,v,o}_proj.weight -> wq/wk/wv/wo (T);
    model.layers.{i}.mlp.{gate,up,down}_proj.weight -> w_gate/w_up/w_down (T);
    model.layers.{i}.{input,post_attention}_layernorm.weight -> norms;
    model.norm.weight -> final_norm; lm_head.weight -> lm_head (T, absent
    when tie_word_embeddings).

    layer_perms: optional per-layer KV-head permutations (from
    patterns.head_permutation). When given, the retrieval-heads-first
    reorder is fused into the native transpose pass (one read of the
    mmap'd checkpoint, no separate gather) instead of a later
    reorder_params call.
    """
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.bfloat16

    def get(name):
        if name not in state:
            raise KeyError(f"missing tensor {name!r} in checkpoint")
        return state[name]

    layers = []
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}."
        if layer_perms is not None:
            kv_chan = expand_kv_perm(layer_perms[i], cfg.head_dim)
            q_chan = expand_kv_perm(
                layer_perms[i], cfg.num_kv_groups * cfg.head_dim
            )
        else:
            kv_chan = q_chan = None
        layer = {
            "input_norm": _to_dtype(get(pre + "input_layernorm.weight"), dtype),
            "post_norm": _to_dtype(
                get(pre + "post_attention_layernorm.weight"), dtype
            ),
            "wq": _to_dtype(
                _T(get(pre + "self_attn.q_proj.weight"), perm=q_chan), dtype
            ),
            "wk": _to_dtype(
                _T(get(pre + "self_attn.k_proj.weight"), perm=kv_chan), dtype
            ),
            "wv": _to_dtype(
                _T(get(pre + "self_attn.v_proj.weight"), perm=kv_chan), dtype
            ),
            "wo": _to_dtype(
                _T(get(pre + "self_attn.o_proj.weight"), col_perm=q_chan), dtype
            ),
        }
        if cfg.num_local_experts > 0:
            # Mixtral MoE block (HF names: block_sparse_moe.gate + per-
            # expert w1=gate/w3=up [ffn, hidden], w2=down [hidden, ffn]);
            # experts are stacked on a leading E axis for the batched
            # einsum in models/llama._moe_mlp. The reference's
            # attention-only patch leaves this block untouched
            # (duo_attn/patch/__init__.py:44).
            moe = pre + "block_sparse_moe."
            layer["moe_gate"] = _to_dtype(
                _T(get(moe + "gate.weight")), jnp.float32
            )
            stacks = {"experts_w_gate": "w1", "experts_w_up": "w3",
                      "experts_w_down": "w2"}
            for ours, hf in stacks.items():
                mats = [
                    _T(get(f"{moe}experts.{e}.{hf}.weight"))
                    for e in range(cfg.num_local_experts)
                ]
                layer[ours] = _to_dtype(np.stack(mats), dtype)
        else:
            layer["w_gate"] = _to_dtype(
                _T(get(pre + "mlp.gate_proj.weight")), dtype
            )
            layer["w_up"] = _to_dtype(_T(get(pre + "mlp.up_proj.weight")), dtype)
            layer["w_down"] = _to_dtype(
                _T(get(pre + "mlp.down_proj.weight")), dtype
            )
        if cfg.attention_bias:
            bq = np.asarray(get(pre + "self_attn.q_proj.bias"))
            bk = np.asarray(get(pre + "self_attn.k_proj.bias"))
            bv = np.asarray(get(pre + "self_attn.v_proj.bias"))
            if q_chan is not None:
                bq, bk, bv = bq[q_chan], bk[kv_chan], bv[kv_chan]
            layer["bq"] = _to_dtype(bq, dtype)
            layer["bk"] = _to_dtype(bk, dtype)
            layer["bv"] = _to_dtype(bv, dtype)
        layers.append(layer)

    params = {
        "embed": _to_dtype(get("model.embed_tokens.weight"), dtype),
        "layers": tuple(layers),
        "final_norm": _to_dtype(get("model.norm.weight"), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _to_dtype(_T(get("lm_head.weight")), dtype)
    return params


# ---------------------------------------------------------------------------
# Load-time head reordering (retrieval heads first)
# ---------------------------------------------------------------------------


def reorder_layer(layer: Dict, perm: np.ndarray, cfg: ModelConfig) -> Dict:
    """Permute one layer's projections by a KV-head permutation.

    Out-channel permutation on q (group-expanded) and k/v, in-channel on o
    — the exact reorder_linear_weights semantics
    (duo_attn/patch/utils.py:6-34) transposed to our [in, out] layout.
    """
    D = cfg.head_dim
    G = cfg.num_kv_groups
    kv_chan = expand_kv_perm(perm, D)
    q_chan = expand_kv_perm(perm, G * D)
    out = dict(layer)
    if "wq_q8" in layer:
        # already-quantized layer (W8A8 serving form): out-channel perm
        # applies to both the int8 matrix and its per-out-channel scale;
        # wo permutes on IN rows, so its scale is untouched (the
        # quant-aware reorder of the reference demo,
        # demo/w8a8kv4_llama.py:630-729, in our [in, out] layout)
        out["wq_q8"] = layer["wq_q8"][:, q_chan]
        out["wq_scale"] = layer["wq_scale"][q_chan]
        out["wk_q8"] = layer["wk_q8"][:, kv_chan]
        out["wk_scale"] = layer["wk_scale"][kv_chan]
        out["wv_q8"] = layer["wv_q8"][:, kv_chan]
        out["wv_scale"] = layer["wv_scale"][kv_chan]
        out["wo_q8"] = layer["wo_q8"][q_chan, :]
    else:
        out["wq"] = layer["wq"][:, q_chan]
        out["wk"] = layer["wk"][:, kv_chan]
        out["wv"] = layer["wv"][:, kv_chan]
        out["wo"] = layer["wo"][q_chan, :]
    if "bq" in layer:
        out["bq"] = layer["bq"][q_chan]
        out["bk"] = layer["bk"][kv_chan]
        out["bv"] = layer["bv"][kv_chan]
    return out


def reorder_params(
    params: Dict, cfg: ModelConfig, binary_heads: np.ndarray
) -> Tuple[Dict, Tuple[int, ...]]:
    """Apply per-layer retrieval-heads-first permutations to a param pytree.

    binary_heads: [num_layers, num_kv_heads] gates already binarized by
    patterns.sparsify_attention_heads. Returns (reordered params,
    per-layer num_full_kv_heads tuple) — feed the latter to DuoConfig.
    """
    binary_heads = np.atleast_2d(np.asarray(binary_heads))
    assert binary_heads.shape == (cfg.num_layers, cfg.num_kv_heads), (
        binary_heads.shape,
        (cfg.num_layers, cfg.num_kv_heads),
    )
    layers = []
    num_full = []
    for li, layer in enumerate(params["layers"]):
        perm, nf = head_permutation(binary_heads[li])
        layers.append(reorder_layer(layer, perm, cfg))
        num_full.append(nf)
    out = dict(params)
    out["layers"] = tuple(layers)
    return out, tuple(num_full)


# ---------------------------------------------------------------------------
# One-call loader (the quick-start surface, reference README.md:119-153)
# ---------------------------------------------------------------------------


def load_hf_model(
    model_dir: str,
    binary_heads: np.ndarray,
    sink_size: int,
    recent_size: int,
    max_cache_size: int = 32768,
    prefill_chunk_size: int = 8192,
    dtype=None,
    cfg: Optional[ModelConfig] = None,
) -> Tuple[Dict, ModelConfig, DuoConfig]:
    """HF checkpoint dir + binarized gate matrix -> (params, cfg, duo).

    The TPU-native equivalent of the reference's
    ``AutoModelForCausalLM.from_pretrained`` + ``enable_duo_attention_eval``
    pair: the enable step's weight reorder happens here at load time.
    """
    if cfg is None:
        cfg = load_hf_config(os.path.join(model_dir, "config.json"))
    state = _load_state_dict(model_dir)
    # Compute the per-layer retrieval-heads-first permutations up front so
    # the reorder fuses into the native transpose pass (one checkpoint
    # read; reorder_params stays available for already-loaded pytrees).
    binary = np.atleast_2d(np.asarray(binary_heads))
    assert binary.shape == (cfg.num_layers, cfg.num_kv_heads), (
        binary.shape, (cfg.num_layers, cfg.num_kv_heads))
    perms, num_full = [], []
    for li in range(cfg.num_layers):
        perm, nf = head_permutation(binary[li])
        perms.append(perm)
        num_full.append(nf)
    params = params_from_state_dict(state, cfg, dtype, layer_perms=perms)
    num_full = tuple(num_full)
    duo = DuoConfig(
        sink_size=sink_size,
        recent_size=recent_size,
        num_full_kv_heads=num_full,
        max_cache_size=max_cache_size,
        prefill_chunk_size=prefill_chunk_size,
    )
    return params, cfg, duo


def save_params_npz(params: Dict, path: str) -> None:
    """Flat .npz export of a param pytree (offline-friendly interchange)."""
    import jax

    flat = {}
    for i, layer in enumerate(params["layers"]):
        for k, v in layer.items():
            flat[f"layers.{i}.{k}"] = np.asarray(jax.device_get(v))
    for k in ("embed", "final_norm", "lm_head"):
        if k in params:
            flat[k] = np.asarray(jax.device_get(params[k]))
    np.savez(path, **flat)


def load_params_npz(path: str, cfg: ModelConfig, dtype=None) -> Dict:
    data = np.load(path)
    layers = []
    for i in range(cfg.num_layers):
        pre = f"layers.{i}."
        layer = {
            k[len(pre):]: _to_dtype(data[k], dtype or data[k].dtype)
            for k in data.files
            if k.startswith(pre)
        }
        layers.append(layer)
    params = {
        "embed": _to_dtype(data["embed"], dtype or data["embed"].dtype),
        "layers": tuple(layers),
        "final_norm": _to_dtype(
            data["final_norm"], dtype or data["final_norm"].dtype
        ),
    }
    if "lm_head" in data.files:
        params["lm_head"] = _to_dtype(data["lm_head"], dtype or data["lm_head"].dtype)
    return params
