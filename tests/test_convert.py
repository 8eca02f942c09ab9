"""HF checkpoint conversion + load-time head reordering tests.

Covers the capability of the reference's weight reorder
(duo_attn/patch/utils.py:6-45) and checkpoint loading: conversion
round-trips exactly, and reordering KV heads is a no-op on full-attention
model outputs (permuting heads together with the o-projection rows is an
exact symmetry of multi-head attention).
"""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from duo_attention_tpu.config import TINY_GQA, TINY_LLAMA
from duo_attention_tpu.models import convert, llama
from duo_attention_tpu.patterns import head_permutation


def hf_state_dict_from_params(params, cfg):
    """Inverse of params_from_state_dict (HF layout: [out, in], names per
    transformers Llama)."""
    state = {}
    state["model.embed_tokens.weight"] = np.asarray(params["embed"], np.float32)
    state["model.norm.weight"] = np.asarray(params["final_norm"], np.float32)
    if "lm_head" in params:
        # ascontiguousarray: safetensors' numpy writer serializes the raw
        # buffer, so a transposed view must be materialized first
        state["lm_head.weight"] = np.ascontiguousarray(
            np.asarray(params["lm_head"], np.float32).T
        )
    for i, layer in enumerate(params["layers"]):
        pre = f"model.layers.{i}."
        state[pre + "input_layernorm.weight"] = np.asarray(
            layer["input_norm"], np.float32
        )
        state[pre + "post_attention_layernorm.weight"] = np.asarray(
            layer["post_norm"], np.float32
        )
        for hf_name, ours in [
            ("self_attn.q_proj.weight", "wq"),
            ("self_attn.k_proj.weight", "wk"),
            ("self_attn.v_proj.weight", "wv"),
            ("self_attn.o_proj.weight", "wo"),
            ("mlp.gate_proj.weight", "w_gate"),
            ("mlp.up_proj.weight", "w_up"),
            ("mlp.down_proj.weight", "w_down"),
        ]:
            state[pre + hf_name] = np.ascontiguousarray(
                np.asarray(layer[ours], np.float32).T
            )
    return state


@pytest.fixture(scope="module")
def tiny():
    cfg = TINY_GQA
    params = llama.init_params(cfg, jax.random.PRNGKey(7), jnp.float32)
    return cfg, params


def test_safetensors_roundtrip(tmp_path, tiny):
    from safetensors.numpy import save_file

    cfg, params = tiny
    state = hf_state_dict_from_params(params, cfg)
    save_file(state, os.path.join(tmp_path, "model.safetensors"))

    loaded = convert.params_from_state_dict(
        convert._load_state_dict(str(tmp_path)), cfg, jnp.float32
    )
    ids = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 24)))
    ref = llama.forward_full_attention(params, cfg, ids)
    got = llama.forward_full_attention(loaded, cfg, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_reorder_is_model_symmetry(tiny):
    """Permuting KV heads (with matching o-proj rows) must not change the
    full-attention forward — this is what makes the reference's deploy-time
    reorder sound."""
    cfg, params = tiny
    rng = np.random.default_rng(1)
    gates = (rng.uniform(size=(cfg.num_layers, cfg.num_kv_heads)) > 0.5).astype(float)
    reordered, num_full = convert.reorder_params(params, cfg, gates)
    assert num_full == tuple(int(r.sum()) for r in gates)

    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 32)))
    ref = llama.forward_full_attention(params, cfg, ids)
    got = llama.forward_full_attention(reordered, cfg, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_convert_reorder_matches_two_pass(tmp_path, tiny):
    """load_hf_model's fused native transpose+gather must be byte-identical
    to converting without a perm and then calling reorder_params."""
    from safetensors.numpy import save_file

    cfg, params = tiny
    state = hf_state_dict_from_params(params, cfg)
    save_file(state, os.path.join(tmp_path, "model.safetensors"))
    raw = convert._load_state_dict(str(tmp_path))

    rng = np.random.default_rng(9)
    gates = (rng.uniform(size=(cfg.num_layers, cfg.num_kv_heads)) > 0.5).astype(float)
    perms = [head_permutation(g)[0] for g in gates]

    fused = convert.params_from_state_dict(raw, cfg, jnp.float32, layer_perms=perms)
    two_pass, _ = convert.reorder_params(
        convert.params_from_state_dict(raw, cfg, jnp.float32), cfg, gates
    )
    for fl, tl in zip(fused["layers"], two_pass["layers"]):
        for k in tl:
            np.testing.assert_array_equal(
                np.asarray(fl[k]), np.asarray(tl[k]), err_msg=k
            )


def test_reorder_permutation_structure():
    gates = np.array([0.0, 1.0, 0.0, 1.0])
    perm, nf = head_permutation(gates)
    assert nf == 2
    # stable: full heads 1,3 then streaming heads 0,2
    np.testing.assert_array_equal(perm, [1, 3, 0, 2])


def test_load_hf_model_end_to_end(tmp_path, tiny):
    from safetensors.numpy import save_file

    cfg, params = tiny
    state = hf_state_dict_from_params(params, cfg)
    save_file(state, os.path.join(tmp_path, "model.safetensors"))
    hf_cfg = {
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_norm_eps,
        "max_position_embeddings": cfg.max_position_embeddings,
        "model_type": cfg.model_type,
    }
    with open(os.path.join(tmp_path, "config.json"), "w") as f:
        json.dump(hf_cfg, f)

    gates = np.ones((cfg.num_layers, cfg.num_kv_heads))
    gates[:, 0] = 0.0  # one streaming head per layer
    p2, cfg2, duo = convert.load_hf_model(
        str(tmp_path), gates, sink_size=16, recent_size=32,
        max_cache_size=256, prefill_chunk_size=64, dtype=jnp.float32,
    )
    assert cfg2.num_kv_heads == cfg.num_kv_heads
    assert duo.num_full_kv_heads == (cfg.num_kv_heads - 1,) * cfg.num_layers

    from duo_attention_tpu.engine import DuoEngine

    eng = DuoEngine(p2, cfg2, duo, dtype=jnp.float32, attn_impl="ref")
    ids = np.random.default_rng(3).integers(0, cfg.vocab_size, (1, 48))
    toks, cache = eng.generate(ids, max_new_tokens=4)
    assert toks.shape == (1, 4)
    assert int(cache.length) == 48 + 4


def test_npz_roundtrip(tmp_path, tiny):
    cfg, params = tiny
    path = os.path.join(tmp_path, "params.npz")
    convert.save_params_npz(params, path)
    loaded = convert.load_params_npz(path, cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_convert_real_8b_geometry(tmp_path):
    """Converter at the REAL Llama-3-8B geometry (see geometry_check.py;
    ~5 min on the 1-core CPU host, also run on-chip by test_tpu_smoke)."""
    from geometry_check import run_real_geometry_check

    run_real_geometry_check(str(tmp_path / "synth8b"), num_layers=2)
