"""shard_map'd Pallas attention: head-sharded cache == unsharded oracle.

Runs on the 8-virtual-device CPU mesh (conftest) with interpret-mode
kernels — the distributed testing capability the reference lacks entirely
(SURVEY.md §4: no single-process multi-device simulation below 8 GPUs).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from duo_attention_tpu.cache import init_cache
from duo_attention_tpu.config import DuoConfig, TINY_GQA
from duo_attention_tpu.engine import DuoEngine
from duo_attention_tpu.models import llama
from duo_attention_tpu.parallel.mesh import build_mesh, shard_inference_state


@pytest.fixture(scope="module")
def setup():
    cfg = TINY_GQA  # 8 q heads, 4 kv heads
    duo = DuoConfig(
        sink_size=8,
        recent_size=16,
        num_full_kv_heads=(2, 2, 2),  # hf=hs=2: divisible by tensor=2
        max_cache_size=256,
        prefill_chunk_size=32,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(5), jnp.float32)
    return cfg, duo, params


def test_sharded_pallas_generate_matches_ref(setup):
    cfg, duo, params = setup
    mesh = build_mesh(4, data=2)  # (data=2, tensor=2)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, (2, 50)).astype(np.int32)

    # oracle: unsharded jnp reference path
    ref_eng = DuoEngine(params, cfg, duo, batch_size=2,
                        dtype=jnp.float32, attn_impl="ref")
    want, _ = ref_eng.generate(prompt, max_new_tokens=5)

    # sharded: params/cache sharded over the mesh, shard_map'd kernels
    cache = init_cache(cfg, duo, batch_size=2, dtype=jnp.float32)
    sh_params, sh_cache, _, _ = shard_inference_state(
        mesh, cfg, duo, params, cache
    )
    eng = DuoEngine(sh_params, cfg, duo, batch_size=2,
                    dtype=jnp.float32, attn_impl="pallas", mesh=mesh)
    got, final_cache = eng.generate(
        jax.device_put(prompt, NamedSharding(mesh, P("data", None))),
        max_new_tokens=5,
        cache=sh_cache,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert int(final_cache.length) == 50 + 5


def test_sharded_pallas_mixed_divisibility(setup):
    """Layers whose head split does not divide the tensor axis fall back to
    the unsharded kernel — outputs must still match the oracle."""
    cfg, _, params = setup
    duo = DuoConfig(
        sink_size=8,
        recent_size=16,
        num_full_kv_heads=(2, 1, 3),  # layers 1, 2 not divisible by 2
        max_cache_size=256,
        prefill_chunk_size=32,
    )
    mesh = build_mesh(2, data=1)  # tensor=2
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, cfg.vocab_size, (1, 40)).astype(np.int32)

    ref_eng = DuoEngine(params, cfg, duo, dtype=jnp.float32, attn_impl="ref")
    want, _ = ref_eng.generate(prompt, max_new_tokens=4)

    cache = init_cache(cfg, duo, batch_size=1, dtype=jnp.float32)
    sh_params, sh_cache, _, _ = shard_inference_state(
        mesh, cfg, duo, params, cache
    )
    eng = DuoEngine(sh_params, cfg, duo, dtype=jnp.float32,
                    attn_impl="pallas", mesh=mesh)
    got, _ = eng.generate(prompt, max_new_tokens=4, cache=sh_cache)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _sharded_q4_decode_at(max_cache: int):
    """North-star geometry (BASELINE.json): a max_cache-token INT4 KV
    cache tensor-sharded over the mesh decodes end-to-end. 8 virtual CPU
    devices as (data=2, tensor=4): one full KV head per device, exactly
    the 1M-ctx-per-host layout for v5e (8 x 16 GB chips hold the 8B
    weights replicated + ~0.7 GB of INT4 KV shard each at 1M tokens).
    """
    from duo_attention_tpu.cache import init_cache_q4
    from duo_attention_tpu.config import ModelConfig

    cfg = ModelConfig(
        vocab_size=256, hidden_size=1024, intermediate_size=1536,
        num_layers=2, num_heads=8, num_kv_heads=8, head_dim=128,
        model_type="llama",
    )
    duo = DuoConfig(
        sink_size=64, recent_size=256, num_full_kv_heads=(4, 4),
        max_cache_size=max_cache, prefill_chunk_size=512,
    )
    mesh = build_mesh(8, data=2)  # tensor=4
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    cache = init_cache_q4(cfg, duo, batch_size=2, dtype=jnp.float32)
    params, cache, _, _ = shard_inference_state(mesh, cfg, duo, params, cache)
    cache = cache._replace(length=jnp.asarray(max_cache - 576, jnp.int32))

    tok = jnp.zeros((2, 1), jnp.int32)
    hidden, cache = llama.forward_chunk(
        params, cfg, duo, cache, tok, attn_impl="pallas", mesh=mesh
    )
    logits = llama.logits_at(params, hidden, 0)
    assert logits.shape == (2, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    assert int(cache.length) == max_cache - 575


def test_long_context_sharded_q4_decode():
    _sharded_q4_decode_at(131072)


@pytest.mark.slow
def test_1m_context_sharded_q4_decode():
    # ~10 min in interpret mode; passes (verified 2026-08-17). Run with
    # `pytest -m slow tests/test_spmd.py`.
    _sharded_q4_decode_at(1048576)


def test_expert_parallel_moe_matches_unsharded(setup):
    """EP: Mixtral MoE layers with the stacked expert axis sharded over
    ``tensor`` (param_shardings) produce the same logits as the
    unsharded model — the dense-dispatch sum over experts becomes a psum
    under GSPMD, with no model-code changes."""
    cfg, duo, _ = setup
    moe_cfg = dataclasses.replace(
        cfg, model_type="mixtral", num_local_experts=4,
        num_experts_per_tok=2,
    )
    params = llama.init_params(moe_cfg, jax.random.PRNGKey(7), jnp.float32)
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, moe_cfg.vocab_size, (2, 40)).astype(np.int32)

    ref_eng = DuoEngine(params, moe_cfg, duo, batch_size=2,
                        dtype=jnp.float32, attn_impl="ref")
    want, _ = ref_eng.generate(prompt, max_new_tokens=4)

    mesh = build_mesh(8, data=2)  # tensor=4 divides the 4 experts
    cache = init_cache(moe_cfg, duo, batch_size=2, dtype=jnp.float32)
    sh_params, sh_cache, p_sh, _ = shard_inference_state(
        mesh, moe_cfg, duo, params, cache
    )
    # the expert axis really is sharded
    spec = p_sh["layers"][0]["experts_w_gate"].spec
    assert spec[0] == "tensor", spec
    eng = DuoEngine(sh_params, moe_cfg, duo, batch_size=2,
                    dtype=jnp.float32, attn_impl="ref", mesh=mesh)
    got, _ = eng.generate(
        jax.device_put(prompt, NamedSharding(mesh, P("data", None))),
        max_new_tokens=4,
        cache=sh_cache,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=0
    )


def test_w8a8_tp_matches_unsharded(setup):
    """TP of the QUANTIZED serving format: *_q8 weights column/row-split
    with their per-channel scales (mesh.shardings_like), int4 KV, int8
    embeds/lm_head. Under a mesh the W8A8 linears route through
    dot_general (quant.xla_matmul_only) so GSPMD can partition them;
    results must be identical to the unsharded engine."""
    from duo_attention_tpu.ops.quant import init_params_w8a8
    from duo_attention_tpu.parallel.mesh import shard_params

    cfg, duo, _ = setup
    qp = init_params_w8a8(cfg, jax.random.PRNGKey(5), quantize_embeds=True)
    rng = np.random.default_rng(3)
    ids = rng.integers(1, cfg.vocab_size, (1, 40)).astype(np.int32)

    ref = DuoEngine(qp, cfg, duo, batch_size=1, dtype=jnp.bfloat16,
                    kv_quant="int4")
    want, _ = ref.generate(ids, max_new_tokens=5)

    mesh = build_mesh(4, data=2)  # batch 1: cache stays batch-replicated
    sp = shard_params(mesh, cfg, qp)
    eng = DuoEngine(sp, cfg, duo, batch_size=1, dtype=jnp.bfloat16,
                    kv_quant="int4", mesh=mesh, attn_impl="ref")
    got, _ = eng.generate(ids, max_new_tokens=5)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
