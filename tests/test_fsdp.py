"""FSDP frozen-param sharding (parallel/fsdp.py): sharded training must
reproduce the replicated gate gradients exactly — the counterpart of the
reference's FSDP2 wrap (duo_attn/train.py:60-69), which changes memory
layout but not math."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from duo_attention_tpu.config import TINY_GQA
from duo_attention_tpu.models import llama
from duo_attention_tpu.train.data import IGNORE_INDEX
from duo_attention_tpu.train.trainer import (
    GateTrainConfig,
    GateTrainer,
    build_mesh_for,
)


def _tcfg(tmp_path, fsdp):
    return GateTrainConfig(
        lr=0.05, num_steps=2, warmup_steps=1, sink_size=8, recent_size=16,
        dp=2, sp=4, fsdp=fsdp, block_k=32,
        output_dir=str(tmp_path / ("fsdp" if fsdp else "repl")),
    )


def test_param_specs_shard_layers_only():
    from duo_attention_tpu.parallel.fsdp import param_specs

    params = llama.init_params(TINY_GQA, jax.random.PRNGKey(0), jnp.float32)
    specs = param_specs(params, ("data", "seq"), 8)
    assert specs["embed"] == P()
    assert specs["final_norm"] == P()
    layer0 = specs["layers"][0]
    # every 2D weight has a divisible dim at tiny-GQA shapes -> sharded
    for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        assert any(s is not None for s in layer0[name]), name
    # 1D norms are divisible too (256 % 8 == 0): sharding them is fine
    flat = jax.tree.leaves(
        specs["layers"], is_leaf=lambda x: isinstance(x, P)
    )
    assert any(s != P() for s in flat)


def test_fsdp_step_matches_replicated(tmp_path):
    cfg = TINY_GQA
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (2, 128), dtype=np.int32)
    labels = np.where(rng.uniform(size=ids.shape) < 0.2, ids, IGNORE_INDEX)

    results = {}
    for fsdp in (False, True):
        tcfg = _tcfg(tmp_path, fsdp)
        mesh = build_mesh_for(tcfg)
        trainer = GateTrainer(params, cfg, tcfg, mesh)
        if fsdp:
            # params actually live sharded: at least one leaf is not
            # fully replicated across the 8 devices
            leaf = trainer.params["layers"][0]["wq"]
            assert not leaf.sharding.is_fully_replicated
        loss, d, reg = trainer.train_step(ids, labels)
        results[fsdp] = (loss, d, np.asarray(trainer.gates))

    loss_r, d_r, gates_r = results[False]
    loss_f, d_f, gates_f = results[True]
    assert np.isclose(loss_f, loss_r, atol=1e-5), (loss_f, loss_r)
    assert np.isclose(d_f, d_r, atol=1e-5)
    np.testing.assert_allclose(gates_f, gates_r, atol=2e-5)
