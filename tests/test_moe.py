"""Mixtral MoE MLP: routing semantics, HF conversion, engine integration.

Reference parity anchor: the attention-only patch runs on HF Mixtral with
its MoE MLP intact (duo_attn/patch/__init__.py:44); here the MoE block is
part of the functional model (models/llama._moe_mlp, dense dispatch) and
Mixtral checkpoints convert via models/convert.py.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from duo_attention_tpu.config import DuoConfig, ModelConfig
from duo_attention_tpu.models import convert, llama

TINY_MIXTRAL = ModelConfig(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=96,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    model_type="mixtral",
    num_local_experts=4,
    num_experts_per_tok=2,
)


def test_moe_router_semantics_vs_numpy():
    """Dense-dispatch MoE must equal the obvious per-token top-k loop."""
    cfg = TINY_MIXTRAL
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    layer = params["layers"][0]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, cfg.hidden_size), jnp.float32)
    got = np.asarray(llama._moe_mlp(layer, x, cfg.num_experts_per_tok))

    xg = np.asarray(x, np.float64)
    gate = np.asarray(layer["moe_gate"], np.float64)
    Wg = np.asarray(layer["experts_w_gate"], np.float64)
    Wu = np.asarray(layer["experts_w_up"], np.float64)
    Wd = np.asarray(layer["experts_w_down"], np.float64)
    want = np.zeros_like(xg)
    for b in range(xg.shape[0]):
        for s in range(xg.shape[1]):
            t = xg[b, s]
            logits = t @ gate
            top = np.argsort(-logits)[: cfg.num_experts_per_tok]
            w = np.exp(logits[top] - logits[top].max())
            w = w / w.sum()
            for wi, e in zip(w, top):
                h = (t @ Wg[e])
                act = h / (1 + np.exp(-h)) * (t @ Wu[e])
                want[b, s] += wi * (act @ Wd[e])
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_moe_single_expert_equals_dense():
    """E=1, k=1 MoE with the dense layer's weights == the dense MLP
    (router softmax over one expert is exactly 1)."""
    dense_cfg = dataclasses.replace(TINY_MIXTRAL, num_local_experts=0)
    params = llama.init_params(dense_cfg, jax.random.PRNGKey(2), jnp.float32)
    layer = dict(params["layers"][0])
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 7, dense_cfg.hidden_size), jnp.float32)
    want = np.asarray(llama._mlp(layer, x, dense_cfg))

    moe_layer = {
        k: v for k, v in layer.items() if not k.startswith("w_")
    }
    moe_layer["moe_gate"] = jnp.zeros((dense_cfg.hidden_size, 1), jnp.float32)
    moe_layer["experts_w_gate"] = layer["w_gate"][None]
    moe_layer["experts_w_up"] = layer["w_up"][None]
    moe_layer["experts_w_down"] = layer["w_down"][None]
    got = np.asarray(llama._moe_mlp(moe_layer, x, 1))
    np.testing.assert_allclose(got, want, atol=1e-5)


def _mixtral_state_dict(params, cfg):
    """HF-layout export of a tiny mixtral param pytree."""
    from tests.test_convert import hf_state_dict_from_params

    state = {}
    for name, arr in hf_state_dict_from_params(
        {**params, "layers": tuple(
            {k: v for k, v in l.items() if not k.startswith(("moe", "experts"))}
            | {"w_gate": l["experts_w_gate"][0],
               "w_up": l["experts_w_up"][0],
               "w_down": l["experts_w_down"][0]}
            for l in params["layers"]
        )}, cfg
    ).items():
        if "mlp." not in name:
            state[name] = arr
    for i, layer in enumerate(params["layers"]):
        moe = f"model.layers.{i}.block_sparse_moe."
        state[moe + "gate.weight"] = np.ascontiguousarray(
            np.asarray(layer["moe_gate"], np.float32).T
        )
        for e in range(cfg.num_local_experts):
            for hf, ours in [("w1", "experts_w_gate"), ("w3", "experts_w_up"),
                             ("w2", "experts_w_down")]:
                state[f"{moe}experts.{e}.{hf}.weight"] = np.ascontiguousarray(
                    np.asarray(layer[ours][e], np.float32).T
                )
    return state


def test_mixtral_convert_and_forward(tmp_path):
    """A Mixtral checkpoint (HF tensor names incl. block_sparse_moe)
    converts and reproduces the source model's forward; head reordering
    stays an exact symmetry with the MoE MLP in place."""
    from safetensors.numpy import save_file

    cfg = TINY_MIXTRAL
    params = llama.init_params(cfg, jax.random.PRNGKey(4), jnp.float32)
    state = _mixtral_state_dict(params, cfg)
    save_file(state, os.path.join(tmp_path, "model.safetensors"))

    loaded = convert.params_from_state_dict(
        convert._load_state_dict(str(tmp_path)), cfg, jnp.float32
    )
    ids = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 24)))
    ref = llama.forward_full_attention(params, cfg, ids)
    got = llama.forward_full_attention(loaded, cfg, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    # reorder symmetry with MoE weights riding along untouched
    rng = np.random.default_rng(5)
    gates = (rng.uniform(size=(cfg.num_layers, cfg.num_kv_heads)) > 0.5).astype(float)
    reordered, _ = convert.reorder_params(loaded, cfg, gates)
    got2 = llama.forward_full_attention(reordered, cfg, ids)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref), atol=1e-4)


def test_mixtral_engine_generate():
    """Duo engine (chunked prefill + decode scan) runs a Mixtral config."""
    from duo_attention_tpu.engine import DuoEngine

    cfg = TINY_MIXTRAL
    duo = DuoConfig(
        sink_size=8, recent_size=16, num_full_kv_heads=(1,) * cfg.num_layers,
        max_cache_size=256, prefill_chunk_size=32,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(6), jnp.float32)
    eng = DuoEngine(params, cfg, duo, batch_size=1, dtype=jnp.float32)
    prompt = np.random.default_rng(1).integers(0, cfg.vocab_size, (1, 50))
    toks, cache = eng.generate(prompt, max_new_tokens=5)
    assert toks.shape == (1, 5)
    assert int(np.asarray(cache.length)) == 55
