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
