"""Sampling: temperature / top-k / top-p, engine and serving integration.

Reference anchor: the QServe ``Sampler`` carried by the demo
(demo/w8a8kv4_llama.py:30,280-287) and HF generate's sampling knobs used
by the eval paths. Contract tested here: temperature -> 0 / top_p -> 0 /
top_k = 1 all reproduce greedy argmax; at temperature 1 the empirical
distribution matches softmax; per-request PRNG streams make serving
results reproducible and independent of batch composition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from duo_attention_tpu.ops.sampling import (
    SamplingParams,
    sample_tokens,
    sample_tokens_rowkeys,
)


def test_temperature_zero_rows_are_argmax():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    temp = jnp.asarray([0.0, 1.0, 0.0, 2.0])
    out = sample_tokens(
        logits, jax.random.PRNGKey(0), temp,
        jnp.ones(4), jnp.zeros(4, jnp.int32),
    )
    am = jnp.argmax(logits, axis=-1)
    assert out[0] == am[0] and out[2] == am[2]


@pytest.mark.parametrize("knob", ["top_p", "top_k"])
def test_tight_filters_reproduce_greedy(knob):
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((3, 128)), jnp.float32)
    temp = jnp.full((3,), 5.0)  # hot — without the filter this is diffuse
    top_p = jnp.full((3,), 1e-9 if knob == "top_p" else 1.0)
    top_k = jnp.full((3,), 1 if knob == "top_k" else 0, jnp.int32)
    am = np.asarray(jnp.argmax(logits, axis=-1))
    for seed in range(5):
        out = sample_tokens(logits, jax.random.PRNGKey(seed), temp, top_p, top_k)
        np.testing.assert_array_equal(np.asarray(out), am)


def test_top_p_excludes_tail():
    # probs ~ [0.71, 0.14, 0.14, ~0]: top_p=0.5 keeps only the head
    logits = jnp.asarray([[2.0, 0.4, 0.4, -20.0]], jnp.float32)
    for seed in range(8):
        out = sample_tokens(
            logits, jax.random.PRNGKey(seed), jnp.ones(1),
            jnp.asarray([0.5]), jnp.zeros(1, jnp.int32),
        )
        assert int(out[0]) == 0
    # top_p=0.9 keeps the first three but never the -20 tail
    for seed in range(8):
        out = sample_tokens(
            logits, jax.random.PRNGKey(seed), jnp.ones(1),
            jnp.asarray([0.9]), jnp.zeros(1, jnp.int32),
        )
        assert int(out[0]) in (0, 1, 2)


def test_distribution_matches_softmax():
    logits = jnp.asarray([[1.0, 0.0, -1.0, 0.5]], jnp.float32)
    want = np.asarray(jax.nn.softmax(logits[0]))
    n = 4000
    keys = jax.random.split(jax.random.PRNGKey(42), n)
    draws = jax.vmap(
        lambda k: sample_tokens(
            logits, k, jnp.ones(1), jnp.ones(1), jnp.zeros(1, jnp.int32)
        )[0]
    )(keys)
    freqs = np.bincount(np.asarray(draws), minlength=4) / n
    np.testing.assert_allclose(freqs, want, atol=0.03)


def test_rowkeys_independent_streams():
    """A row's draw depends only on its own key: changing another row's
    key/logits must not change it (continuous-batching reproducibility)."""
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((2, 32)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(7), 2)
    temp, top_p = jnp.ones(2), jnp.ones(2)
    top_k = jnp.zeros(2, jnp.int32)
    t1, k1 = sample_tokens_rowkeys(logits, keys, temp, top_p, top_k)
    logits2 = logits.at[1].set(jnp.asarray(rng.standard_normal(32)))
    keys2 = keys.at[1].set(jax.random.PRNGKey(99))
    t2, k2 = sample_tokens_rowkeys(logits2, keys2, temp, top_p, top_k)
    assert int(t1[0]) == int(t2[0])
    np.testing.assert_array_equal(np.asarray(k1[0]), np.asarray(k2[0]))


@pytest.fixture(scope="module")
def tiny_engine():
    from duo_attention_tpu.config import DuoConfig, TINY_GQA
    from duo_attention_tpu.engine import DuoEngine
    from duo_attention_tpu.models import llama

    cfg = TINY_GQA
    duo = DuoConfig(
        sink_size=16, recent_size=32, num_full_kv_heads=(2,) * cfg.num_layers,
        max_cache_size=512, prefill_chunk_size=64,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    return DuoEngine(params, cfg, duo, batch_size=1, dtype=jnp.float32)


def test_engine_near_greedy_sampling_matches_greedy(tiny_engine):
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, 512, (1, 48))
    greedy, _ = tiny_engine.generate(prompt, max_new_tokens=8)
    cold, _ = tiny_engine.generate(
        prompt, max_new_tokens=8,
        sampling=SamplingParams(temperature=1e-4, top_p=1.0, seed=3),
    )
    np.testing.assert_array_equal(greedy, cold)


def test_engine_sampling_reproducible_and_varies(tiny_engine):
    rng = np.random.default_rng(6)
    prompt = rng.integers(0, 512, (1, 32))
    sp = SamplingParams(temperature=1.5, top_p=0.95, seed=11)
    a, _ = tiny_engine.generate(prompt, max_new_tokens=12, sampling=sp)
    b, _ = tiny_engine.generate(prompt, max_new_tokens=12, sampling=sp)
    np.testing.assert_array_equal(a, b)  # same seed -> same trajectory
    c, _ = tiny_engine.generate(
        prompt, max_new_tokens=12,
        sampling=SamplingParams(temperature=1.5, top_p=0.95, seed=12),
    )
    assert not np.array_equal(a, c)  # different seed -> different draw


def test_serving_mixed_greedy_and_sampled():
    from duo_attention_tpu.config import DuoConfig, TINY_GQA
    from duo_attention_tpu.serving import Request, ServingEngine
    from duo_attention_tpu.models import llama

    cfg = TINY_GQA
    duo = DuoConfig(
        sink_size=16, recent_size=32, num_full_kv_heads=(2,) * cfg.num_layers,
        max_cache_size=512, prefill_chunk_size=64,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.default_rng(8)
    prompts = [rng.integers(0, 512, (40 + 7 * i,)) for i in range(3)]
    sp = SamplingParams(temperature=1.2, top_p=0.9, seed=21)

    def run():
        eng = ServingEngine(
            params, cfg, duo, max_batch_size=2, dtype=jnp.float32
        )
        eng.submit(Request(0, prompts[0], 6))  # greedy
        eng.submit(Request(1, prompts[1], 6, sampling=sp))
        eng.submit(Request(2, prompts[2], 6, sampling=SamplingParams(
            temperature=0.0)))  # explicit greedy via temp 0
        done = eng.run()
        return {r.rid: list(r.generated) for r in done}

    out1, out2 = run(), run()
    assert out1 == out2  # per-request streams -> fully reproducible
    # greedy rows must match the single-request engine exactly
    from duo_attention_tpu.engine import DuoEngine

    single = DuoEngine(params, cfg, duo, batch_size=1, dtype=jnp.float32)
    g, _ = single.generate(prompts[0][None], max_new_tokens=6)
    assert out1[0] == list(np.asarray(g[0]))
