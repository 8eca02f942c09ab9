"""Gate-identification trainer.

Counterpart of duo_attn/train.py (SURVEY.md §3.1 call stack): AdamW on the
per-(layer, KV-head) gates only, distillation MSE + L1 regularizer,
clamp-to-[0,1] each step, warmup/decay schedule, TSV + optimizer-state
checkpoints with resume, and the reference artifact layout
(full_attention_heads.tsv + config.json).

Parallelism: one jitted step, optionally shard_mapped over a
``(data, seq)`` mesh — batch over ``data``, sequence over ``seq`` with
Ulysses all-to-all inside the model (replacing torchrun + NCCL,
train.py:51-69,297-312). With ``fsdp=True`` the frozen teacher/student
params are additionally sharded over the flattened mesh (parallel/fsdp.py,
the FSDP2 counterpart of duo_attn/train.py:60-69) and each layer is
all-gathered at its use site — a replicated bf16 7-8B model (~16 GB)
cannot fit one 16 GB chip even though only the gates train.
"""

from __future__ import annotations

import dataclasses
import functools
import glob
import json
import os
import re
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import ModelConfig
from ..models import llama
from ..patterns import save_attn_pattern, save_full_attention_heads
from .data import IGNORE_INDEX
from .loss import distill_loss, l1_loss


@dataclass
class GateTrainConfig:
    lr: float = 0.02
    num_steps: int = 2000
    warmup_steps: int = 20
    reg_weight: float = 0.05
    sink_size: int = 128
    recent_size: int = 256
    batch_size: int = 1
    save_steps: int = 50
    output_dir: str = "attn_patterns/run"
    seed: int = 42
    block_k: int = 512
    # mesh: (data, seq); (1, 1) = single device
    dp: int = 1
    sp: int = 1
    # shard the frozen params over the flattened mesh (parallel/fsdp.py)
    fsdp: bool = False
    # per-layer activation checkpointing of the two-way forward (the
    # reference wraps every decoder layer, duo_attn/train.py:302); on by
    # default like the reference — at 7-8B x 32k the per-layer teacher+
    # student activations otherwise OOM the backward.
    remat: bool = True


def lr_schedule(cfg: GateTrainConfig):
    """Linear warmup then linear decay to zero (reference LambdaLR,
    train.py:346-353)."""

    def fn(step):
        warm = jnp.minimum(step / jnp.maximum(cfg.warmup_steps, 1), 1.0)
        decay = jnp.maximum(
            1.0 - (step - cfg.warmup_steps)
            / jnp.maximum(cfg.num_steps - cfg.warmup_steps, 1),
            0.0,
        )
        return cfg.lr * jnp.where(step < cfg.warmup_steps, warm, decay)

    return fn


def make_loss_fn(mcfg: ModelConfig, tcfg: GateTrainConfig, seq_axis=None, axes=()):
    def loss_fn(gates, params, input_ids, labels):
        teacher, student = llama.forward_two_way(
            params,
            gates,
            mcfg,
            tcfg.sink_size,
            tcfg.recent_size,
            input_ids,
            seq_axis=seq_axis,
            block_k=tcfg.block_k,
            remat=tcfg.remat,
        )
        mask = labels != IGNORE_INDEX
        d = distill_loss(teacher, student, mask, axis_names=axes)
        reg = l1_loss(gates)
        return d + tcfg.reg_weight * reg, (d, reg)

    return loss_fn


def make_train_step(mcfg: ModelConfig, tcfg: GateTrainConfig, optimizer,
                    mesh: Optional[Mesh] = None, params=None):
    """Returns jitted (gates, opt_state, params, ids, labels) -> updated.

    ``params`` is only needed for ``tcfg.fsdp`` (to derive per-leaf
    PartitionSpecs from the shapes); pass the SAME tree that will be fed
    to the returned step (already sharded via fsdp.shard_params)."""
    use_mesh = mesh is not None and (tcfg.dp > 1 or tcfg.sp > 1)

    if use_mesh:
        axes = ("data", "seq")
        if tcfg.fsdp:
            from ..parallel.fsdp import make_gather_hook, param_specs

            assert params is not None, "fsdp=True needs params for specs"
            pspecs = param_specs(params, axes, tcfg.dp * tcfg.sp)
            layer_hook = make_gather_hook(pspecs["layers"][0], axes)
        else:
            pspecs = P()
            layer_hook = None

        def grads_fn(gates, params, ids, labels):
            # distill term only — it needs the cross-shard psum; the L1
            # regularizer is computed on replicated gates outside.
            def local_distill(g):
                teacher, student = llama.forward_two_way(
                    params, g, mcfg, tcfg.sink_size, tcfg.recent_size, ids,
                    seq_axis="seq", block_k=tcfg.block_k,
                    layer_hook=layer_hook, remat=tcfg.remat,
                )
                mask = labels != IGNORE_INDEX
                return distill_loss(teacher, student, mask, axis_names=axes)

            d, gd = jax.value_and_grad(local_distill)(gates)
            gd = jax.lax.psum(gd, axes)
            return d, gd

        sharded = shard_map(
            grads_fn,
            mesh=mesh,
            in_specs=(P(), pspecs, P("data", "seq"), P("data", "seq")),
            out_specs=(P(), P()),
            check_vma=False,
        )

        def step(gates, opt_state, params, ids, labels):
            d, gd = sharded(gates, params, ids, labels)
            reg, gr = jax.value_and_grad(l1_loss)(gates)
            loss = d + tcfg.reg_weight * reg
            grads = gd + tcfg.reg_weight * gr
            updates, opt_state = optimizer.update(grads, opt_state, gates)
            gates = optax.apply_updates(gates, updates)
            gates = jnp.clip(gates, 0.0, 1.0)  # reference train.py:98-102
            return gates, opt_state, loss, (d, reg)

        return jax.jit(step)

    loss_fn = make_loss_fn(mcfg, tcfg)

    def step(gates, opt_state, params, ids, labels):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            gates, params, ids, labels
        )
        updates, opt_state = optimizer.update(grads, opt_state, gates)
        gates = optax.apply_updates(gates, updates)
        gates = jnp.clip(gates, 0.0, 1.0)
        return gates, opt_state, loss, aux

    return jax.jit(step)


class GateTrainer:
    def __init__(
        self,
        params,
        mcfg: ModelConfig,
        tcfg: GateTrainConfig,
        mesh: Optional[Mesh] = None,
    ):
        if mesh is not None and tcfg.fsdp and (tcfg.dp > 1 or tcfg.sp > 1):
            from ..parallel.fsdp import shard_params

            params = shard_params(params, mesh)
        self.params = params
        self.mcfg = mcfg
        self.tcfg = tcfg
        self.mesh = mesh
        self.gates = jnp.ones(
            (mcfg.num_layers, mcfg.num_kv_heads), jnp.float32
        )  # init 1.0 (reference patch/llama.py:471-476)
        self.optimizer = optax.adamw(learning_rate=lr_schedule(tcfg))
        self.opt_state = self.optimizer.init(self.gates)
        self.step_idx = 0
        self._step_fn = make_train_step(mcfg, tcfg, self.optimizer, mesh,
                                        params=params)
        os.makedirs(tcfg.output_dir, exist_ok=True)

    # -- checkpointing (reference train.py:202-236, 366-386) ---------------

    def save(self, tag: Optional[str] = None):
        tag = tag if tag is not None else f"step={self.step_idx}"
        gates = np.asarray(self.gates)
        save_full_attention_heads(
            gates,
            os.path.join(self.tcfg.output_dir, f"full_attention_heads_{tag}.tsv"),
        )
        try:  # gate heatmap next to the TSV (reference logs one per save)
            from ..patterns import visualize_head_map

            visualize_head_map(
                gates,
                os.path.join(self.tcfg.output_dir, "head_map_latest.png"),
                title=f"step {self.step_idx}",
            )
        except Exception:
            pass
        state = jax.device_get(self.opt_state)
        flat, treedef = jax.tree_util.tree_flatten(state)
        np.savez(
            os.path.join(self.tcfg.output_dir, f"opt_state_{tag}.npz"),
            step=self.step_idx,
            gates=gates,
            *flat,
        )
        # maintain *_latest copies
        for src, dst in [
            (f"full_attention_heads_{tag}.tsv", "full_attention_heads_latest.tsv"),
            (f"opt_state_{tag}.npz", "opt_state_latest.npz"),
        ]:
            import shutil

            shutil.copyfile(
                os.path.join(self.tcfg.output_dir, src),
                os.path.join(self.tcfg.output_dir, dst),
            )

    def resume(self) -> bool:
        path = os.path.join(self.tcfg.output_dir, "opt_state_latest.npz")
        if not os.path.exists(path):
            return False
        data = np.load(path)
        self.step_idx = int(data["step"])
        self.gates = jnp.asarray(data["gates"])
        flat, treedef = jax.tree_util.tree_flatten(self.opt_state)
        loaded = [jnp.asarray(data[f"arr_{i}"]) for i in range(len(flat))]
        self.opt_state = jax.tree_util.tree_unflatten(treedef, loaded)
        return True

    def finalize(self, extra_config: Optional[dict] = None):
        """Write the reference-compatible artifact: TSV + config.json."""
        save_attn_pattern(
            self.tcfg.output_dir,
            np.asarray(self.gates),
            self.tcfg.sink_size,
            self.tcfg.recent_size,
            extra_config={**dataclasses.asdict(self.tcfg), **(extra_config or {})},
        )

    # -- training loop ------------------------------------------------------

    def train_step(self, ids: np.ndarray, labels: np.ndarray):
        ids = jnp.asarray(ids)
        # Shift supervision to PREDICTION positions: hidden state t
        # predicts token t+1, so the position feeding the first answer
        # token (the question's final prompt token) must be inside the
        # distill mask — otherwise a head that only serves first-token
        # retrieval is invisible to the loss (observed: the constructed
        # model's bigram head got gate 0 while its continuation head got
        # 0.95). The reference masks at answer positions directly
        # (train.py:126-146); its 32-token spans hide the off-by-one.
        labels = np.asarray(labels)
        labels = np.concatenate(
            [labels[:, 1:], np.full((labels.shape[0], 1), IGNORE_INDEX,
                                    labels.dtype)], axis=1,
        )
        labels = jnp.asarray(labels)
        if self.mesh is not None and (self.tcfg.dp > 1 or self.tcfg.sp > 1):
            sh = NamedSharding(self.mesh, P("data", "seq"))
            ids = jax.device_put(ids, sh)
            labels = jax.device_put(labels, sh)
        self.gates, self.opt_state, loss, (d, reg) = self._step_fn(
            self.gates, self.opt_state, self.params, ids, labels
        )
        self.step_idx += 1
        return float(loss), float(d), float(reg)

    def train(self, data_iter, log_every: int = 10, wandb_run=None):
        sched = lr_schedule(self.tcfg)
        for _ in range(self.step_idx, self.tcfg.num_steps):
            batch = next(data_iter)
            loss, d, reg = self.train_step(batch["input_ids"], batch["labels"])
            lr = float(sched(self.step_idx))
            if self.step_idx % log_every == 0:
                print(
                    f"[train] step {self.step_idx} loss={loss:.5f} "
                    f"distill={d:.5f} reg={reg:.5f} lr={lr:.5f} "
                    f"len={batch['input_ids'].shape[1]}"
                )
            if wandb_run is not None:
                # reference logs lr + sample_len + a live gate heatmap per
                # step (train.py:179-195); the heatmap PNG is refreshed at
                # every save (save() below) rather than every step
                wandb_run.log(
                    {"loss": loss, "distill_loss": d, "reg_loss": reg,
                     "lr": lr, "sample_len": batch["input_ids"].shape[1],
                     "step": self.step_idx}
                )
            if self.step_idx % self.tcfg.save_steps == 0:
                self.save()
        self.finalize()


def build_mesh_for(tcfg: GateTrainConfig) -> Optional[Mesh]:
    if tcfg.dp * tcfg.sp <= 1:
        return None
    devs = np.array(jax.devices()[: tcfg.dp * tcfg.sp]).reshape(tcfg.dp, tcfg.sp)
    return Mesh(devs, axis_names=("data", "seq"))


def dryrun_train_step(n_devices: int) -> None:
    """One dp x sp sharded gate-training step on tiny shapes."""
    from ..config import ModelConfig

    mcfg = ModelConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_layers=2,
        num_heads=8,
        num_kv_heads=4,
        head_dim=8,
    )
    dp = 2 if n_devices % 2 == 0 else 1
    sp = n_devices // dp
    tcfg = GateTrainConfig(
        num_steps=2, sink_size=8, recent_size=16, dp=dp, sp=sp, block_k=64,
        output_dir="/tmp/duo_dryrun_pattern",
    )
    mesh = build_mesh_for(tcfg)
    params = llama.init_params(mcfg, jax.random.PRNGKey(0))
    trainer = GateTrainer(params, mcfg, tcfg, mesh)
    S = 128 * sp
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, (max(dp, 1), S), dtype=np.int32)
    labels = np.where(rng.uniform(size=ids.shape) < 0.1, ids, IGNORE_INDEX)
    loss, d, reg = trainer.train_step(ids, labels)
    assert np.isfinite(loss), loss


def main():
    import argparse

    from ..config import PRESETS
    from ..tokenizer import get_tokenizer
    from .data import MultiPasskeyDataset, PasskeyDataConfig, data_iterator

    p = argparse.ArgumentParser(description="duo-attention gate training")
    p.add_argument("--model", default="tiny-gqa",
                   help="preset name, or 'constructed' (the hand-built "
                   "retrieval circuit with KNOWN retrieval heads — the "
                   "offline stand-in for a real checkpoint)")
    p.add_argument("--lr", type=float, default=0.02)
    p.add_argument("--reg-weight", type=float, default=0.05)
    p.add_argument("--num-steps", type=int, default=2000)
    p.add_argument("--sink", type=int, default=128)
    p.add_argument("--recent", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--context-min", type=int, default=1000)
    p.add_argument("--context-max", type=int, default=32000)
    p.add_argument("--num-passkeys", type=int, default=10)
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--sp", type=int, default=1)
    p.add_argument("--fsdp", action="store_true",
                   help="shard the frozen params over the dpxsp mesh")
    p.add_argument("--no-remat", action="store_true",
                   help="disable per-layer activation checkpointing "
                   "(reference applies it always, duo_attn/train.py:302)")
    p.add_argument("--save-steps", type=int, default=50)
    p.add_argument("--output-dir", default="attn_patterns/run")
    p.add_argument("--tokenizer", default="byte")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--haystack", default=None)
    p.add_argument("--pad-to", type=int, default=None,
                   help="fixed batch length (one compile instead of one "
                        "per distinct sample length)")
    p.add_argument("--block-k", type=int, default=512)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--wandb", action="store_true",
                   help="log per-step metrics to wandb (the reference logs "
                   "wandb by default, duo_attn/train.py:354-359; opt-in "
                   "here because this environment has no egress)")
    p.add_argument("--wandb-project", default="duo-attention-tpu")
    args = p.parse_args()

    from ..models.constructed import SPECS as _SPECS
    if args.model in _SPECS:
        from ..models.constructed import (
            build_params, build_params_w8a8, spec_for,
        )

        spec = spec_for(args.model)
        mcfg = spec.model_config()
        args.tokenizer = "word"
        if args.model == "constructed-8b":
            # full 8B geometry: W8A8 int8 weights (the bf16 circuit would
            # not fit a 16 GB chip next to two-way activations) — gate
            # grads flow through the W8A8 STE (ops/quant.py)
            params = build_params_w8a8(get_tokenizer("word"), spec=spec)
        else:
            params = build_params(get_tokenizer("word"), spec=spec)
    else:
        mcfg = PRESETS[args.model]
        params = llama.init_params(mcfg, jax.random.PRNGKey(0))
    tcfg = GateTrainConfig(
        lr=args.lr,
        num_steps=args.num_steps,
        reg_weight=args.reg_weight,
        sink_size=args.sink,
        recent_size=args.recent,
        batch_size=args.batch_size,
        save_steps=args.save_steps,
        output_dir=args.output_dir,
        dp=args.dp,
        sp=args.sp,
        fsdp=args.fsdp,
        remat=not args.no_remat,
        block_k=args.block_k,
    )
    mesh = build_mesh_for(tcfg)
    trainer = GateTrainer(params, mcfg, tcfg, mesh)
    if args.resume:
        trainer.resume()
    tokenizer = get_tokenizer(args.tokenizer)
    dcfg = PasskeyDataConfig(
        context_length_min=args.context_min,
        context_length_max=args.context_max,
        num_passkeys=args.num_passkeys,
        pad_to_multiple=max(64, 128 * tcfg.sp),
        haystack_path=args.haystack,
    )
    dataset = MultiPasskeyDataset(tokenizer, dcfg)
    it = data_iterator(dataset, tcfg.batch_size * max(tcfg.dp, 1),
                       pad_to=args.pad_to)
    wandb_run = None
    if args.wandb:
        import os as _os

        import wandb

        wandb_run = wandb.init(
            project=args.wandb_project,
            name=_os.path.basename(args.output_dir.rstrip("/")),
            config=vars(args),
        )
    try:
        trainer.train(it, log_every=args.log_every, wandb_run=wandb_run)
    finally:
        if wandb_run is not None:
            wandb_run.finish()


if __name__ == "__main__":
    main()
