"""Training subsystem tests: blockwise attention, two-way forward, Ulysses
sequence parallelism, trainer step/checkpoint/resume, passkey data."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from duo_attention_tpu.config import TINY_GQA, ModelConfig
from duo_attention_tpu.models import llama
from duo_attention_tpu.ops.attention_ref import (
    causal_attention_ref,
    masked_attention,
    streaming_attention_ref,
)
from duo_attention_tpu.ops.blockwise import (
    blockwise_attention,
    causal_mask_fn,
    lambda_mask_fn,
)
from duo_attention_tpu.train.data import (
    IGNORE_INDEX,
    MultiPasskeyDataset,
    PasskeyDataConfig,
    collate,
    data_iterator,
)
from duo_attention_tpu.train.trainer import (
    GateTrainConfig,
    GateTrainer,
    build_mesh_for,
    dryrun_train_step,
)
from duo_attention_tpu.tokenizer import ByteTokenizer


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def test_blockwise_matches_oracle_causal():
    B, S, Hq, Hkv, D = 2, 100, 4, 2, 16
    q, k, v = rand(0, (B, S, Hq, D)), rand(1, (B, S, Hkv, D)), rand(2, (B, S, Hkv, D))
    got = blockwise_attention(q, k, v, causal_mask_fn, block_k=32)
    want = causal_attention_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_blockwise_matches_oracle_lambda():
    B, S, Hq, Hkv, D = 1, 96, 4, 4, 16
    q, k, v = rand(3, (B, S, Hq, D)), rand(4, (B, S, Hkv, D)), rand(5, (B, S, Hkv, D))
    got = blockwise_attention(q, k, v, lambda_mask_fn(8, 16), block_k=40)
    want = streaming_attention_ref(q, k, v, 8, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_blockwise_differentiable():
    B, S, H, D = 1, 64, 2, 8
    q, k, v = rand(6, (B, S, H, D)), rand(7, (B, S, H, D)), rand(8, (B, S, H, D))

    def f(q):
        return jnp.sum(blockwise_attention(q, k, v, causal_mask_fn, block_k=16))

    g = jax.grad(f)(q)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


@pytest.fixture(scope="module")
def tiny():
    cfg = TINY_GQA
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    return cfg, params


def test_two_way_gates_one_teacher_equals_student(tiny):
    cfg, params = tiny
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 64), 0, cfg.vocab_size)
    gates = jnp.ones((cfg.num_layers, cfg.num_kv_heads), jnp.float32)
    t, s = llama.forward_two_way(params, gates, cfg, 8, 16, ids, block_k=32)
    np.testing.assert_allclose(np.asarray(t), np.asarray(s), atol=2e-4)


def test_two_way_gates_zero_is_pure_streaming(tiny):
    cfg, params = tiny
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 64), 0, cfg.vocab_size)
    gates = jnp.zeros((cfg.num_layers, cfg.num_kv_heads), jnp.float32)
    _, s = llama.forward_two_way(params, gates, cfg, 8, 16, ids, block_k=32)
    # oracle: uncached forward with Λ attention everywhere
    from duo_attention_tpu.ops.rope import apply_rope, rope_cos_sin, rope_inv_freq
    from duo_attention_tpu.ops.norm import rms_norm

    B, S = ids.shape
    positions = jnp.arange(S, dtype=jnp.int32)
    cos, sin = rope_cos_sin(rope_inv_freq(cfg), positions)
    x = params["embed"][ids]
    for layer in params["layers"]:
        h = rms_norm(x, layer["input_norm"], cfg.rms_norm_eps)
        q, k, v = llama._qkv(layer, h, cfg)
        q = apply_rope(q, cos[None], sin[None])
        k = apply_rope(k, cos[None], sin[None])
        attn = streaming_attention_ref(q, k, v, 8, 16)
        x = x + attn.reshape(B, S, -1) @ layer["wo"]
        x = x + llama._mlp(layer, rms_norm(x, layer["post_norm"], cfg.rms_norm_eps))
    want = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    np.testing.assert_allclose(np.asarray(s), np.asarray(want), atol=2e-4)


def test_gate_gradients_flow(tiny):
    cfg, params = tiny
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 64), 0, cfg.vocab_size)
    gates = jnp.full((cfg.num_layers, cfg.num_kv_heads), 0.5, jnp.float32)

    def loss(g):
        t, s = llama.forward_two_way(params, g, cfg, 8, 16, ids, block_k=32)
        return jnp.mean((t - s) ** 2)

    g = jax.grad(loss)(gates)
    assert g.shape == gates.shape
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_two_way_remat_matches_values_and_grads(tiny):
    """Per-layer activation checkpointing (reference duo_attn/train.py:302)
    must change memory, not math: forward values AND gate gradients are
    identical with remat on/off."""
    cfg, params = tiny
    ids = jax.random.randint(jax.random.PRNGKey(5), (1, 64), 0, cfg.vocab_size)
    gates = jnp.full((cfg.num_layers, cfg.num_kv_heads), 0.4, jnp.float32)

    def loss(g, remat):
        t, s = llama.forward_two_way(
            params, g, cfg, 8, 16, ids, block_k=32, remat=remat
        )
        return jnp.mean((t - s) ** 2), (t, s)

    (l0, (t0, s0)), g0 = jax.value_and_grad(loss, has_aux=True)(gates, False)
    (l1, (t1, s1)), g1 = jax.value_and_grad(loss, has_aux=True)(gates, True)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=1e-6)
    assert np.isclose(float(l1), float(l0), atol=1e-7)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-6)
    assert float(jnp.abs(g1).sum()) > 0


def test_fsdp_remat_step_matches_no_remat(tmp_path):
    """remat composes with the FSDP gather hook (the all-gather re-runs in
    backward instead of being saved) without changing the trained step."""
    from duo_attention_tpu.train.data import IGNORE_INDEX as IGN

    cfg = TINY_GQA
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, (2, 128), dtype=np.int32)
    labels = np.where(rng.uniform(size=ids.shape) < 0.2, ids, IGN)
    results = {}
    for remat in (False, True):
        tcfg = GateTrainConfig(
            lr=0.05, num_steps=2, warmup_steps=1, sink_size=8,
            recent_size=16, dp=2, sp=4, fsdp=True, remat=remat, block_k=32,
            output_dir=str(tmp_path / f"remat{remat}"),
        )
        trainer = GateTrainer(params, cfg, tcfg, build_mesh_for(tcfg))
        loss, d, reg = trainer.train_step(ids, labels)
        results[remat] = (loss, np.asarray(trainer.gates))
    assert np.isclose(results[True][0], results[False][0], atol=1e-5)
    np.testing.assert_allclose(results[True][1], results[False][1], atol=2e-5)


def test_remat_composes_with_w8a8_ste(tiny):
    """Per-layer jax.checkpoint over W8A8 layers: the STE's residuals must
    be valid pytree leaves (regression: a raw np.dtype residual broke
    remat with 'not a valid JAX type'), and gate gradients still flow
    at gates < 1 (at the init 1.0 the student IS the teacher, so the
    distill gradient is legitimately zero there)."""
    from duo_attention_tpu.ops.quant import quantize_layer_weights

    cfg, params = tiny
    qparams = dict(params)
    qparams["layers"] = tuple(
        quantize_layer_weights(dict(l)) for l in params["layers"]
    )
    ids = jax.random.randint(jax.random.PRNGKey(9), (1, 64), 0,
                             cfg.vocab_size)
    gates = jnp.full((cfg.num_layers, cfg.num_kv_heads), 0.5, jnp.float32)

    def loss(g):
        t, s = llama.forward_two_way(
            qparams, g, cfg, 8, 16, ids, block_k=32, remat=True
        )
        return jnp.mean((t - s) ** 2)

    val, grad = jax.value_and_grad(loss)(gates)
    assert np.isfinite(float(val))
    assert float(jnp.abs(grad).sum()) > 0


def test_ulysses_roundtrip():
    from duo_attention_tpu.parallel.ulysses import head_to_seq, seq_to_head
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, axis_names=("seq",))
    x = rand(9, (2, 32, 8, 4))  # [B, S, H, D]

    def f(x_shard):
        y = seq_to_head(x_shard, "seq")
        return head_to_seq(y, "seq")

    out = shard_map(
        f, mesh=mesh, in_specs=P(None, "seq"), out_specs=P(None, "seq")
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=0)


def test_two_way_ulysses_matches_single_device(tiny):
    cfg, params = tiny
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    ids = jax.random.randint(jax.random.PRNGKey(4), (1, 64), 0, cfg.vocab_size)
    gates = jnp.full((cfg.num_layers, cfg.num_kv_heads), 0.3, jnp.float32)
    t0, s0 = llama.forward_two_way(params, gates, cfg, 8, 16, ids, block_k=32)

    devs = np.array(jax.devices()[:2])
    mesh = Mesh(devs, axis_names=("seq",))

    def f(ids_shard):
        return llama.forward_two_way(
            params, gates, cfg, 8, 16, ids_shard, seq_axis="seq", block_k=32
        )

    t1, s1 = shard_map(
        f, mesh=mesh, in_specs=P(None, "seq"), out_specs=P(None, "seq"),
        check_vma=False,
    )(ids)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0), atol=3e-4)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=3e-4)


def test_passkey_dataset():
    tok = ByteTokenizer()
    cfg = PasskeyDataConfig(
        context_length_min=256,
        context_length_max=512,
        context_lengths_num_intervals=2,
        num_passkeys=2,
        pad_to_multiple=64,
    )
    ds = MultiPasskeyDataset(tok, cfg, num_samples=4)
    s = ds[0]
    assert len(s["input_ids"]) % 64 == 0
    assert len(s["input_ids"]) == len(s["labels"])
    sup = s["labels"] != IGNORE_INDEX
    assert 0 < sup.sum() < len(s["labels"])
    # supervised labels equal the input ids there (answers are in-context)
    np.testing.assert_array_equal(
        s["labels"][sup], s["input_ids"][sup].astype(np.int64)
    )
    # decode a supervised span: must consist of code words
    text = tok.decode(s["input_ids"][sup])
    assert len(text.split()) >= 2
    # determinism
    s2 = ds[0]
    np.testing.assert_array_equal(s["input_ids"], s2["input_ids"])
    batch = collate([ds[0], ds[1]])
    assert batch["input_ids"].shape[0] == 2


def test_trainer_steps_and_resume(tmp_path, tiny):
    cfg, params = tiny
    tcfg = GateTrainConfig(
        lr=0.05, num_steps=4, warmup_steps=1, sink_size=8, recent_size=16,
        save_steps=2, output_dir=str(tmp_path), block_k=32,
    )
    trainer = GateTrainer(params, cfg, tcfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (1, 64), dtype=np.int32)
    labels = np.where(rng.uniform(size=ids.shape) < 0.2, ids, IGNORE_INDEX)
    g0 = np.asarray(trainer.gates).copy()
    loss1, d1, r1 = trainer.train_step(ids, labels)
    loss2, _, _ = trainer.train_step(ids, labels)
    assert np.isfinite(loss1) and np.isfinite(loss2)
    assert not np.allclose(np.asarray(trainer.gates), g0)  # gates moved
    assert (np.asarray(trainer.gates) >= 0).all() and (
        np.asarray(trainer.gates) <= 1
    ).all()
    trainer.save()
    trainer.finalize()
    # artifact is loadable by the deployment path
    from duo_attention_tpu.patterns import load_attn_pattern

    heads, sink, recent = load_attn_pattern(str(tmp_path))
    assert heads.shape == (cfg.num_layers, cfg.num_kv_heads)
    assert sink == 8 and recent == 16

    # resume restores step + gates + optimizer state
    t2 = GateTrainer(params, cfg, tcfg)
    assert t2.resume()
    assert t2.step_idx == trainer.step_idx
    np.testing.assert_allclose(np.asarray(t2.gates), np.asarray(trainer.gates))


def test_dryrun_train_step_8dev():
    dryrun_train_step(8)


def test_ulysses_all_to_all_roundtrip():
    """seq_to_head then head_to_seq is the identity (reference tests this
    implicitly via SeqAllToAll4D fwd/bwd, duo_attn/ulysses/utils.py:95-119)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    from duo_attention_tpu.parallel.ulysses import head_to_seq, seq_to_head

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("seq",))
    B, S, H, D = 2, 32, 8, 16
    x = np.arange(B * S * H * D, dtype=np.float32).reshape(B, S, H, D)

    def fn(x_shard):
        y = seq_to_head(x_shard, "seq")  # [B, S, H/P, D]
        return head_to_seq(y, "seq")

    out = jax.jit(
        jax.shard_map(
            fn, mesh=mesh, in_specs=P(None, "seq"), out_specs=P(None, "seq")
        )
    )(x)
    np.testing.assert_array_equal(np.asarray(out), x)
