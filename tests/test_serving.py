"""Continuous-batching serving engine tests.

Property: serving N requests through the shared batched cache (staggered
admissions, per-sequence lengths, slot reuse) produces exactly the tokens
that isolated single-request generation produces (greedy decoding is
deterministic, so any cross-request contamination shows up immediately).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from duo_attention_tpu.config import DuoConfig, TINY_GQA
from duo_attention_tpu.engine import DuoEngine
from duo_attention_tpu.models import llama
from duo_attention_tpu.serving import Request, ServingEngine

import jax


@pytest.fixture(scope="module")
def setup():
    cfg = TINY_GQA
    duo = DuoConfig(
        sink_size=8,
        recent_size=16,
        num_full_kv_heads=(2, 1, 3),
        max_cache_size=256,
        prefill_chunk_size=32,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(3), jnp.float32)
    return params, cfg, duo


def isolated_tokens(params, cfg, duo, prompt, n):
    eng = DuoEngine(params, cfg, duo, dtype=jnp.float32, attn_impl="ref")
    toks, _ = eng.generate(prompt[None, :], max_new_tokens=n)
    return list(map(int, toks[0]))


def test_serving_matches_isolated(setup):
    params, cfg, duo = setup
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(0, cfg.vocab_size, (int(n),)).astype(np.int32)
        for n in (17, 50, 33, 70)  # mixed: some cross chunk boundaries
    ]
    serve = ServingEngine(
        params, cfg, duo, max_batch_size=2, dtype=jnp.float32, attn_impl="ref"
    )
    for i, p in enumerate(prompts):
        serve.submit(Request(rid=i, prompt_ids=p, max_new_tokens=6))
    finished = serve.run()
    assert len(finished) == len(prompts)
    by_rid = {r.rid: r for r in finished}
    for i, p in enumerate(prompts):
        expect = isolated_tokens(params, cfg, duo, p, 6)
        assert by_rid[i].generated == expect, f"request {i} diverged"


def test_serving_stop_tokens_and_slot_reuse(setup):
    params, cfg, duo = setup
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, cfg.vocab_size, (20,)).astype(np.int32)
               for _ in range(3)]
    # find each prompt's 3rd greedy token and use it as that request's stop
    stops = [isolated_tokens(params, cfg, duo, p, 3)[2] for p in prompts]
    serve = ServingEngine(
        params, cfg, duo, max_batch_size=1, dtype=jnp.float32, attn_impl="ref"
    )
    for i, (p, s) in enumerate(zip(prompts, stops)):
        serve.submit(
            Request(rid=i, prompt_ids=p, max_new_tokens=10,
                    stop_token_ids=(int(s),))
        )
    finished = serve.run()
    assert len(finished) == 3
    for r, p, s in zip(sorted(finished, key=lambda r: r.rid), prompts, stops):
        expect = isolated_tokens(params, cfg, duo, p, 3)[:2]
        assert r.generated == expect  # stop token trimmed


def test_batched_cache_lengths_advance_only_active(setup):
    params, cfg, duo = setup
    rng = np.random.default_rng(2)
    serve = ServingEngine(
        params, cfg, duo, max_batch_size=3, dtype=jnp.float32, attn_impl="ref"
    )
    p = rng.integers(0, cfg.vocab_size, (12,)).astype(np.int32)
    serve.submit(Request(rid=0, prompt_ids=p, max_new_tokens=4))
    serve.run()
    lengths = np.asarray(serve.cache.length)
    # slot 0 advanced by prompt + decoded tokens - 1 (last token not fed
    # back), slots 1-2 untouched
    assert lengths[0] == 12 + 3
    assert lengths[1] == 0 and lengths[2] == 0


def test_burst_decode_matches_single_step(setup):
    """decode_burst=N is a pure scheduling change: same tokens out."""
    params, cfg, duo = setup
    rng = np.random.default_rng(7)
    prompts = [
        rng.integers(0, cfg.vocab_size, (int(n),)).astype(np.int32)
        for n in (21, 45, 60)
    ]
    results = {}
    for burst in (1, 4):
        serve = ServingEngine(
            params, cfg, duo, max_batch_size=2, dtype=jnp.float32,
            attn_impl="ref", decode_burst=burst,
        )
        for i, p in enumerate(prompts):
            # stop token forces a mid-burst finish for at least one request
            serve.submit(Request(rid=i, prompt_ids=p, max_new_tokens=9,
                                 stop_token_ids=(3,)))
        finished = serve.run()
        assert len(finished) == len(prompts)
        results[burst] = {r.rid: r.generated for r in finished}
    assert results[1] == results[4]


def test_admission_interleaves_with_decode(setup):
    """Sarathi-style scheduling: while a long prompt is being admitted
    chunk by chunk, live slots keep decoding between chunks."""
    params, cfg, duo = setup
    rng = np.random.default_rng(11)
    short = rng.integers(0, cfg.vocab_size, (20,)).astype(np.int32)
    long = rng.integers(0, cfg.vocab_size, (5 * duo.prefill_chunk_size,)).astype(np.int32)
    serve = ServingEngine(
        params, cfg, duo, max_batch_size=2, dtype=jnp.float32, attn_impl="ref"
    )
    serve.submit(Request(rid=0, prompt_ids=short, max_new_tokens=12))
    serve.submit(Request(rid=1, prompt_ids=long, max_new_tokens=2))
    finished = serve.run()
    assert len(finished) == 2
    # request 1 takes 5 admission chunks; decode events must appear
    # between its first and last chunk (request 0 kept decoding)
    admits1 = [i for i, e in enumerate(serve.trace) if e == ("admit", 1)]
    assert len(admits1) == 5
    decodes_between = [
        i for i, e in enumerate(serve.trace)
        if e[0] == "decode" and admits1[0] < i < admits1[-1]
    ]
    assert decodes_between, f"no interleaved decode: {serve.trace}"
    # and the outputs still match isolated generation
    for r in finished:
        p = short if r.rid == 0 else long
        assert r.generated == isolated_tokens(
            params, cfg, duo, p, r.max_new_tokens
        )


def test_serving_int4_matches_isolated(setup):
    """INT4 serving pool: admission splice + compact-ring remap over the
    quantized cache produce the same tokens as isolated int4 generation."""
    params, cfg, duo = setup
    rng = np.random.default_rng(21)
    prompts = [
        rng.integers(0, cfg.vocab_size, (int(n),)).astype(np.int32)
        for n in (40, 70, 25)
    ]
    serve = ServingEngine(
        params, cfg, duo, max_batch_size=2, dtype=jnp.float32,
        attn_impl="ref", kv_quant="int4", decode_burst=3,
    )
    for i, p in enumerate(prompts):
        serve.submit(Request(rid=i, prompt_ids=p, max_new_tokens=5))
    finished = serve.run()
    assert len(finished) == len(prompts)
    by_rid = {r.rid: r for r in finished}
    for i, p in enumerate(prompts):
        eng = DuoEngine(params, cfg, duo, dtype=jnp.float32,
                        attn_impl="ref", kv_quant="int4")
        toks, _ = eng.generate(p[None, :], max_new_tokens=5)
        assert by_rid[i].generated == list(map(int, toks[0])), f"req {i}"


def test_serving_tp_matches_isolated(setup):
    """Multi-chip continuous batching: pool cache head-sharded over the
    tensor axis (divisible layers; hf=1,3 fall back to replication),
    shard_map-free ref path under GSPMD — tokens must match isolated
    single-device generation exactly."""
    from duo_attention_tpu.parallel.mesh import build_mesh, shard_params

    params, cfg, duo = setup
    mesh = build_mesh(2, data=1)
    sharded = shard_params(mesh, cfg, params)
    rng = np.random.default_rng(7)
    prompts = [
        rng.integers(0, cfg.vocab_size, (int(n),)).astype(np.int32)
        for n in (17, 50, 33)
    ]
    serve = ServingEngine(
        sharded, cfg, duo, max_batch_size=2, dtype=jnp.float32,
        attn_impl="ref", mesh=mesh,
    )
    for i, p in enumerate(prompts):
        serve.submit(Request(rid=i, prompt_ids=p, max_new_tokens=6))
    finished = serve.run()
    assert len(finished) == len(prompts)
    by_rid = {r.rid: r for r in finished}
    for i, p in enumerate(prompts):
        expect = isolated_tokens(params, cfg, duo, p, 6)
        assert by_rid[i].generated == expect, f"request {i} diverged"


def test_engine_timing_trace(setup):
    """timing=True: step() emits admit/decode events with honest token
    counts, and TTFT is recorded per request (VERDICT r4 #3 — benches
    consume these instead of re-implementing the scheduler loop)."""
    params, cfg, duo = setup
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (40, 70)]
    serve = ServingEngine(
        params, cfg, duo, max_batch_size=2, dtype=jnp.float32,
        attn_impl="ref", timing=True,
    )
    for i, p in enumerate(prompts):
        serve.submit(Request(rid=i, prompt_ids=p, max_new_tokens=5))
    finished = serve.run()
    assert len(finished) == 2
    events = list(serve.timings)
    admits = [e for e in events if e["event"] == "admit"]
    decodes = [e for e in events if e["event"] == "decode"]
    # chunked admission: 40 -> 32+8, 70 -> 32+32+6 (chunk size 32)
    assert sum(e["tokens"] for e in admits if e["rid"] == 0) == 40
    assert sum(e["tokens"] for e in admits if e["rid"] == 1) == 70
    assert sum(e["done"] for e in admits) == 2
    # every generated token beyond the admission-produced first ones is
    # attributed to exactly one decode burst
    total = sum(len(r.generated) for r in finished)
    assert sum(e["produced"] for e in decodes) == total - 2
    assert all(e["dur_s"] >= 0 for e in events)
    assert set(serve.ttft) == {0, 1}
    assert all(v > 0 for v in serve.ttft.values())
