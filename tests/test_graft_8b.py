"""Host-geometry graft tests (models/constructed.py LONG_8B_SPEC path).

The 8B-geometry NIAH/LongBench evidence (niah_results/8b_geometry,
artifacts/longbench_tpu) rides on grafting the LONG_SPEC circuit into a
WIDE GQA host: norm-trick calibration (sqrt(256/E) RMSNorm weights),
head_dim-128 rotation-pair layout, query-slot mapping under GQA,
pass-through host layers, the pre-quantized W8A8 build, and the digit
vocabulary. SMALL_D128_SPEC is the CPU-sized twin exercising every one
of those mechanisms (the only difference from LONG_8B_SPEC is size).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from duo_attention_tpu.config import DuoConfig
from duo_attention_tpu.engine import DuoEngine
from duo_attention_tpu.evals.accuracy_loop import build_engine, eval_retrieval
from duo_attention_tpu.models.constructed import (
    LONG_8B_SPEC,
    SMALL_D128_SPEC,
    build_params,
    build_params_w8a8,
    ground_truth_heads,
)
from duo_attention_tpu.models.convert import reorder_params
from duo_attention_tpu.tokenizer import decode_ids, encode_ids, get_tokenizer
from duo_attention_tpu.train.data import (
    MultiPasskeyDataset,
    PasskeyDataConfig,
)

SPEC = SMALL_D128_SPEC
CFG = SPEC.model_config()


@pytest.fixture(scope="module")
def bits():
    tok = get_tokenizer("word")
    dcfg = PasskeyDataConfig(context_length_min=768, context_length_max=1024,
                             num_passkeys=2, passkey_length=3)
    ds = MultiPasskeyDataset(tok, dcfg, num_samples=100_000)
    return tok, ds


def test_graft_spec_geometry():
    """LONG_8B_SPEC is exactly the flagship Llama-3-8B geometry."""
    from duo_attention_tpu.config import LLAMA3_8B_1048K as REF

    cfg = LONG_8B_SPEC.model_config()
    assert (cfg.num_layers, cfg.hidden_size, cfg.intermediate_size,
            cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.vocab_size
            ) == (REF.num_layers, REF.hidden_size, REF.intermediate_size,
                  REF.num_heads, REF.num_kv_heads, REF.head_dim,
                  REF.vocab_size)
    # positional frequencies match LONG_SPEC's LP-validated ones exactly
    from duo_attention_tpu.models.constructed import LONG_SPEC, _inv_freq

    w64 = _inv_freq(LONG_SPEC)[: len(LONG_SPEC.pos_amps)]
    w128 = _inv_freq(LONG_8B_SPEC)[list(LONG_8B_SPEC.pos_pairs)]
    np.testing.assert_allclose(w128, w64, rtol=1e-12)
    assert LONG_8B_SPEC.pos_amps == LONG_SPEC.pos_amps


def test_graft_retrieves_f32(bits):
    tok, ds = bits
    params = build_params(tok, spec=SPEC)
    gt = ground_truth_heads(SPEC)
    eng = build_engine(params, CFG, gt, sink=16, recent=64,
                       max_cache=4096, chunk=512)
    r = eval_retrieval(eng, tok, ds, n_samples=4)
    assert r["word_overlap"] == 1.0, r
    # inverted pattern (same budget, wrong heads) must collapse
    eng = build_engine(params, CFG, 1.0 - gt, sink=16, recent=64,
                       max_cache=4096, chunk=512)
    r = eval_retrieval(eng, tok, ds, n_samples=4)
    assert r["word_overlap"] < 0.25, r


def test_graft_w8a8kv4_bf16_prequantized(bits):
    """The flagship stack exactly as the 8B NIAH runs use it: host-side
    pre-quantized W8A8 build -> q8-aware reorder -> bf16 engine + INT4
    KV. Trained retrieves, inverted collapses."""
    tok, ds = bits
    gt = ground_truth_heads(SPEC)
    for inv, lo, hi in ((False, 1.0, 1.0), (True, 0.0, 0.25)):
        params = build_params_w8a8(tok, spec=SPEC, quantize_embeds=True)
        heads = (1.0 - gt) if inv else gt
        re, nf = reorder_params(params, CFG, heads)
        duo = DuoConfig(sink_size=16, recent_size=64, num_full_kv_heads=nf,
                        max_cache_size=4096, prefill_chunk_size=512)
        eng = DuoEngine(re, CFG, duo, batch_size=1, dtype=jnp.bfloat16,
                        kv_quant="int4")
        r = eval_retrieval(eng, tok, ds, n_samples=4)
        assert lo <= r["word_overlap"] <= hi, (inv, r)


def test_q8_reorder_matches_prequant_of_reordered(bits):
    """reorder_params on a W8A8 layer == quantizing the reordered bf16
    weights (permutation and per-out-channel quantization commute)."""
    from duo_attention_tpu.ops.quant import quantize_layer_weights

    tok, _ = bits
    p32 = build_params(tok, spec=SPEC)
    pq8 = build_params_w8a8(tok, spec=SPEC, quantize_embeds=False)
    gt = ground_truth_heads(SPEC)
    re32, nf32 = reorder_params(p32, CFG, gt)
    req8, nfq8 = reorder_params(pq8, CFG, gt)
    assert nf32 == nfq8
    li = SPEC.circuit_layers[1]
    ref = quantize_layer_weights(
        {k: jnp.asarray(v) for k, v in re32["layers"][li].items()}
    )
    got = req8["layers"][li]
    for k in ("wq_q8", "wk_q8", "wv_q8", "wo_q8"):
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(ref[k]), err_msg=k)
    for k in ("wq_scale", "wk_scale", "wv_scale"):
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(ref[k]), rtol=1e-6)


def test_digit_vocabulary_retrieval(bits):
    """Digits are retrievable/emittable like code words (the LongBench
    retrieval_score family rides on this)."""
    tok, _ = bits
    params = build_params(tok, spec=SPEC)
    eng = build_engine(params, CFG, ground_truth_heads(SPEC), sink=16,
                       recent=64, max_cache=4096, chunk=512)
    text = ("river meadow lantern . " * 40 +
            " Remember this: the secret code of hazel is 7 . " +
            "compass timber orchard . " * 40 +
            "\nQuestion: the secret code of hazel is")
    ids = np.asarray(encode_ids(tok, text), np.int32)
    toks, _ = eng.generate(ids[None], max_new_tokens=2)
    out = decode_ids(tok, toks[0]).split()
    assert out[0] == "7", out
    assert out[1] == ".", out


def test_gate_training_discovers_graft_heads(bits):
    """Gate training on the quantized graft finds EXACTLY the two
    circuit retrieval heads (the W8A8-STE + wide-host + GQA composition
    the on-chip 8B gate-train relies on)."""
    from duo_attention_tpu.train.data import data_iterator
    from duo_attention_tpu.train.trainer import GateTrainConfig, GateTrainer

    tok, _ = bits
    params = build_params_w8a8(tok, spec=SPEC)
    tcfg = GateTrainConfig(lr=0.05, reg_weight=0.05, num_steps=40,
                           warmup_steps=4, sink_size=16, recent_size=64,
                           batch_size=2, save_steps=1000, block_k=256,
                           output_dir="/tmp/graft_train_test")
    trainer = GateTrainer(params, CFG, tcfg)
    dcfg = PasskeyDataConfig(context_length_min=512, context_length_max=768,
                             num_passkeys=2, passkey_length=3,
                             pad_to_multiple=64)
    ds = MultiPasskeyDataset(tok, dcfg)
    trainer.train(data_iterator(ds, 2, pad_to=768), log_every=50)
    g = np.asarray(trainer.gates)
    gt = ground_truth_heads(SPEC)
    assert ((g > 0.5) == (gt > 0.5)).all(), g


def test_single_bucket_engine_matches_bucketed():
    """single_bucket=True (one program per scan length, used by the
    8B-geometry grid) generates exactly the same tokens as the
    geometric-bucket engine."""
    import jax

    from duo_attention_tpu.config import TINY_GQA

    params = __import__(
        "duo_attention_tpu.models.llama", fromlist=["llama"]
    ).init_params(TINY_GQA, jax.random.PRNGKey(0), jnp.float32)
    duo = DuoConfig(sink_size=8, recent_size=16, num_full_kv_heads=(2, 1, 3),
                    max_cache_size=512, prefill_chunk_size=32)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 512, (1, 150)).astype(np.int32)
    e1 = DuoEngine(params, TINY_GQA, duo, dtype=jnp.float32, attn_impl="ref")
    e2 = DuoEngine(params, TINY_GQA, duo, dtype=jnp.float32, attn_impl="ref",
                   single_bucket=True)
    t1, c1 = e1.generate(prompt, 8)
    t2, c2 = e2.generate(prompt, 8)
    assert np.array_equal(np.asarray(t1), np.asarray(t2))
    assert int(c1.length) == int(c2.length) == 158
