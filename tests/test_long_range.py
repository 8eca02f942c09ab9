"""Long-range circuit + precise-RoPE tests.

Validates the two pieces behind the >=131k retrieval evidence
(counterpart of the reference's 1M NIAH, scripts/run_niah.sh:2-8, and
3.3M demo, demo/run_duo_w8a8kv4.py:83-206):

1. ops.rope precise phase mode: matches plain f32 where f32 is exact,
   and tracks the f64 ground truth ~100x closer at multi-million-token
   positions (f32-only TPU hardware cannot do this naively).
2. models.constructed LONG_SPEC: the positional kernel's LP-optimized
   margin holds over EVERY integer separation in [0, 4.2M], match-pair
   drift stays inside the sink budget, and the circuit retrieves
   end-to-end through the flagship quantized engine.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from duo_attention_tpu.models.constructed import (
    BASE_SPEC,
    LONG_SPEC,
    build_params,
)
from duo_attention_tpu.ops.rope import (
    rope_cos_sin,
    rope_cos_sin_precise,
    rope_inv_freq,
    rope_tables,
)

CFG_LONG = LONG_SPEC.model_config()


def _f64_tables(cfg, pos):
    w = 1.0 / (
        cfg.rope_theta ** (np.arange(0, cfg.head_dim, 2, np.float64)
                           / cfg.head_dim)
    )
    ang = np.asarray(pos, np.float64)[..., None] * w
    ang = np.concatenate([ang, ang], -1)
    return np.cos(ang), np.sin(ang)


def test_precise_rope_matches_plain_at_small_positions():
    pos = jnp.asarray([0, 1, 513, 4096, 32768], jnp.int32)
    c0, s0 = rope_cos_sin(rope_inv_freq(CFG_LONG), pos)
    c1, s1 = rope_cos_sin_precise(CFG_LONG, pos)
    # at 32768 the PLAIN path already carries ~5e-4 of its own f32
    # rounding; the bound here is plain-error + precise-error
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=1e-3)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=1e-3)


def test_precise_rope_accuracy_at_4m():
    pos = np.asarray([524288, 1048576, 3300000, 4194303])
    ct, st = _f64_tables(CFG_LONG, pos)
    cp, sp_ = rope_cos_sin_precise(CFG_LONG, jnp.asarray(pos, jnp.int32))
    c0, s0 = rope_cos_sin(rope_inv_freq(CFG_LONG), jnp.asarray(pos, jnp.int32))
    err_precise = max(np.abs(np.asarray(cp) - ct).max(),
                      np.abs(np.asarray(sp_) - st).max())
    err_plain = max(np.abs(np.asarray(c0) - ct).max(),
                    np.abs(np.asarray(s0) - st).max())
    assert err_precise < 2e-3, err_precise
    assert err_precise < err_plain / 10, (err_precise, err_plain)


def test_rope_tables_dispatch():
    pos = jnp.asarray([7, 100], jnp.int32)
    cfg_plain = dataclasses.replace(CFG_LONG, rope_precise=False)
    c0, _ = rope_tables(cfg_plain, pos)
    c1, _ = rope_tables(CFG_LONG, pos)
    # same values in the exact regime, different code paths
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=2e-4)


def test_precise_rope_with_llama3_scaling():
    """The precise path must apply the same frequency scaling as the
    plain path (rope_inv_freq) — checked via a llama3-scaled config."""
    from duo_attention_tpu.config import ModelConfig, RopeScaling

    cfg = ModelConfig(
        head_dim=64,
        rope_theta=5e5,
        rope_scaling=RopeScaling(rope_type="llama3", factor=8.0,
                                 low_freq_factor=1.0, high_freq_factor=4.0,
                                 original_max_position_embeddings=8192),
        rope_precise=True,
    )
    pos = jnp.asarray([3, 999], jnp.int32)
    c0, s0 = rope_cos_sin(rope_inv_freq(cfg), pos)
    c1, s1 = rope_cos_sin_precise(cfg, pos)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=2e-4)


def test_long_positional_margin_full_range():
    """The hard guarantee behind 4.2M-range retrieval: the LP-optimized
    kernel margin holds at EVERY integer separation (scanned exactly)."""
    w = 1.0 / (LONG_SPEC.rope_theta
               ** (np.arange(0, 64, 2, np.float64) / 64))
    amps = np.asarray(LONG_SPEC.pos_amps)
    wp = w[: len(amps)]
    L = LONG_SPEC.max_position_embeddings
    for offset in (1, 2):
        worst = np.inf
        for lo in range(0, L + 1, 1 << 22):
            dd = np.arange(lo, min(lo + (1 << 22), L + 1), dtype=np.float64)
            dd = dd[dd != offset]
            m = (amps * (1 - np.cos(np.outer(dd - offset, wp)))).sum(1)
            worst = min(worst, m.min())
        assert worst > 0.16, (offset, worst)


def test_long_match_drift_inside_sink_budget():
    """Matched score after worst-case drift must clear the BOS sink."""
    w = 1.0 / (LONG_SPEC.rope_theta
               ** (np.arange(0, 64, 2, np.float64) / 64))
    drift = w[list(LONG_SPEC.match_pairs)] * LONG_SPEC.max_position_embeddings
    worst_single = np.cos(drift.max())      # code all in the worst pair
    avg = np.mean(np.cos(drift))            # typical random code
    assert LONG_SPEC.lambda_match * worst_single > LONG_SPEC.lambda_sink + 5
    assert avg > 0.985, avg


@pytest.fixture(scope="module")
def long_engine_bits():
    from duo_attention_tpu.tokenizer import get_tokenizer
    from duo_attention_tpu.train.data import (
        MultiPasskeyDataset,
        PasskeyDataConfig,
    )

    tok = get_tokenizer("word")
    params = build_params(tok, spec=LONG_SPEC)
    dcfg = PasskeyDataConfig(context_length_min=768, context_length_max=1024,
                             num_passkeys=2, passkey_length=3)
    ds = MultiPasskeyDataset(tok, dcfg, num_samples=100_000)
    return tok, params, ds


@pytest.mark.parametrize("quant", [False, True])
def test_long_circuit_retrieves_through_engine(long_engine_bits, quant):
    """End-to-end: LONG_SPEC solves passkey retrieval through the real
    engine with the ground-truth duo pattern — f32 and W8A8+INT4-KV."""
    from duo_attention_tpu.evals.accuracy_loop import (
        build_engine,
        eval_retrieval,
    )

    tok, params, ds = long_engine_bits
    gt = np.zeros((2, 4))
    gt[1, :2] = 1.0  # layer-1 heads 0/1 are the known retrieval heads
    kw = {"w8a8": True, "kv_quant": "int4"} if quant else {}
    eng = build_engine(params, CFG_LONG, gt, sink=16, recent=64,
                       max_cache=4096, chunk=512, **kw)
    r = eval_retrieval(eng, tok, ds, n_samples=4)
    assert r["word_overlap"] == 1.0, r
    # inverted pattern (same budget, wrong heads) must collapse
    eng = build_engine(params, CFG_LONG, 1.0 - gt, sink=16, recent=64,
                       max_cache=4096, chunk=512, **kw)
    r = eval_retrieval(eng, tok, ds, n_samples=4)
    assert r["word_overlap"] < 0.25, r


def test_base_spec_params_unchanged():
    """The refactor keeps the BASE circuit bit-identical (existing
    trained artifacts — artifacts/constructed_32k — load against it)."""
    from duo_attention_tpu.tokenizer import get_tokenizer

    tok = get_tokenizer("word")
    p = build_params(tok)  # default spec=BASE_SPEC
    l0 = np.asarray(p["layers"][0]["bq"][:4])
    # legacy linspace(2.0, 0.5, 8)/10 amps * lambda_pos(100) * sqrt(64)
    np.testing.assert_allclose(
        l0, [160.0, 142.85715, 125.71429, 108.57143], rtol=1e-6
    )
    assert BASE_SPEC.model_config().rope_theta == 1e8
    assert not BASE_SPEC.model_config().rope_precise
