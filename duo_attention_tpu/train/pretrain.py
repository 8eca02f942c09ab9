"""Tiny-LM pretraining on the multi-passkey task.

The reference validates gate patterns on pretrained HF checkpoints
(eval/needle/needle_in_haystack.py:183-221); no checkpoints exist in this
offline environment, so this module creates the missing ingredient: a
small Llama (this repo's own model code) trained from scratch with full
attention until it SOLVES the procedural passkey-retrieval task
(train/data.py). That model then anchors the end-to-end accuracy loop
(evals/accuracy_loop.py): full attention retrieves -> a GateTrainer
pattern at sparsity 0.5 still retrieves -> an inverted pattern fails.

Plain next-token cross-entropy over the same synthetic distribution used
for gate training; the answer spans force the model to learn byte-level
induction (copy the code named for a given name from arbitrarily far
back), which is exactly the capability retrieval heads carry.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ModelConfig
from ..models import llama
from .data import (
    IGNORE_INDEX,
    MultiPasskeyDataset,
    PasskeyDataConfig,
    data_iterator,
)

# Gate-trainable tiny model: 4 layers x 4 KV heads (GQA 2x).
TINY_LM = ModelConfig(
    vocab_size=512,  # covers ByteTokenizer (<259) and WordTokenizer (512)
    hidden_size=256,
    intermediate_size=512,
    num_layers=4,
    num_heads=8,
    num_kv_heads=4,
    head_dim=32,
    rope_theta=10000.0,
    max_position_embeddings=8192,
)


@dataclass
class PretrainConfig:
    num_steps: int = 3000
    batch_size: int = 8
    lr: float = 3e-3
    warmup_steps: int = 100
    weight_decay: float = 0.01
    grad_clip: float = 1.0
    seed: int = 0
    log_every: int = 100
    # Loss weight on the supervised answer tokens relative to the rest of
    # the sequence. Plain LM loss plateaus with ~87% answer-token accuracy
    # (filler entropy dominates); upweighting the retrieval targets pushes
    # the copy circuit to convergence.
    answer_weight: float = 10.0


def lm_loss(params, cfg: ModelConfig, ids, labels=None, pad_id: int = 0,
            answer_weight: float = 1.0):
    """Next-token CE over all real positions (padding excluded); positions
    whose labels mark an answer span get ``answer_weight``."""
    hidden = llama.forward_full_attention(params, cfg, ids)
    logits = llama.head_logits(params, hidden)  # [B, S, V] f32
    targets = ids[:, 1:]
    logits = logits[:, :-1]
    w = (targets != pad_id).astype(jnp.float32)
    if labels is not None and answer_weight != 1.0:
        ans = (labels[:, 1:] != IGNORE_INDEX).astype(jnp.float32)
        w = w * (1.0 + (answer_weight - 1.0) * ans)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
    return (ce * w).sum() / jnp.maximum(w.sum(), 1.0)


def make_step(cfg: ModelConfig, pcfg: PretrainConfig):
    warmup = min(pcfg.warmup_steps, max(pcfg.num_steps // 10, 1))
    # Constant lr after warmup: the induction-head circuit the passkey
    # task needs emerges via a late phase transition (measured here:
    # pure-copy loss 6.2 -> 1e-4 between steps 300-500 at constant 3e-3);
    # a decaying schedule can starve that transition.
    sched = optax.linear_schedule(0.0, pcfg.lr, warmup)
    opt = optax.chain(
        optax.clip_by_global_norm(pcfg.grad_clip),
        optax.adamw(sched, weight_decay=pcfg.weight_decay),
    )

    @jax.jit
    def step(params, opt_state, ids, labels):
        loss, grads = jax.value_and_grad(lm_loss)(
            params, cfg, ids, labels, answer_weight=pcfg.answer_weight
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return opt, step


def pretrain(
    cfg: ModelConfig = TINY_LM,
    pcfg: PretrainConfig = PretrainConfig(),
    dcfg: Optional[PasskeyDataConfig] = None,
    tokenizer=None,
    params=None,
):
    """Train (or continue training) the tiny LM; returns (params, losses)."""
    from ..tokenizer import get_tokenizer
    from ..utils import enable_compilation_cache

    enable_compilation_cache()

    tokenizer = tokenizer or get_tokenizer("byte")
    dcfg = dcfg or PasskeyDataConfig(
        context_length_min=256,
        context_length_max=1024,
        num_passkeys=2,
        passkey_length=3,
    )
    dataset = MultiPasskeyDataset(tokenizer, dcfg, num_samples=100_000)
    it = data_iterator(dataset, pcfg.batch_size, pad_to=dcfg.context_length_max + 256)
    if params is None:
        params = llama.init_params(cfg, jax.random.PRNGKey(pcfg.seed), jnp.float32)
    opt, step = make_step(cfg, pcfg)
    opt_state = opt.init(params)
    losses = []
    S_pad = dcfg.context_length_max + 256
    copy_rng = np.random.default_rng(pcfg.seed + 1)
    for i in range(pcfg.num_steps):
        if i % 4 == 3:
            # Copy-curriculum batch: a random-length random segment tiled
            # to fill the sequence, supervised after the first period.
            # Dense prefix-match supervision forces the induction circuit
            # (the passkey answers alone are <1% of tokens and never
            # leave the marginal-distribution optimum). The period MUST
            # vary per row: with a fixed period the model learns a
            # positional offset copier instead of content-based prefix
            # matching, which does not transfer to retrieval (measured:
            # fixed-offset copy loss 0.1 with passkey accuracy stuck at
            # chance).
            ids = np.empty((pcfg.batch_size, S_pad), np.int32)
            labels = np.full((pcfg.batch_size, S_pad), IGNORE_INDEX, np.int64)
            for b in range(pcfg.batch_size):
                seg_len = int(copy_rng.integers(48, S_pad // 2))
                seg = copy_rng.integers(3, cfg.vocab_size, seg_len)
                reps = S_pad // seg_len + 1
                row = np.tile(seg, reps)[:S_pad]
                ids[b] = row
                labels[b, seg_len:] = row[seg_len:]
            batch = {"input_ids": ids, "labels": labels}
        else:
            batch = next(it)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["labels"]),
        )
        if i % pcfg.log_every == 0 or i == pcfg.num_steps - 1:
            losses.append((i, float(loss)))
            print(f"[pretrain] step {i} loss {float(loss):.4f}", flush=True)
    return params, losses


def answer_token_accuracy(
    params, cfg: ModelConfig, dataset, n_samples: int = 16, offset: int = 0
) -> float:
    """Teacher-forced argmax accuracy on supervised (answer) tokens only —
    the retrieval metric: these tokens are exactly the passkey codes the
    model must copy from deep in the context."""
    correct = total = 0
    fwd = jax.jit(
        lambda p, ids: llama.head_logits(p, llama.forward_full_attention(p, cfg, ids))
    )
    for i in range(n_samples):
        s = dataset[offset + i]
        ids = jnp.asarray(s["input_ids"])[None]
        labels = s["labels"]
        logits = np.asarray(fwd(params, ids))[0]
        pred_next = logits[:-1].argmax(-1)  # prediction for position t+1
        sup = labels[1:] != IGNORE_INDEX
        correct += int((pred_next[sup] == labels[1:][sup]).sum())
        total += int(sup.sum())
    return correct / max(total, 1)


def save_lm(params, path: str):
    from ..models.convert import save_params_npz

    save_params_npz(params, path)


def load_lm(path: str, cfg: ModelConfig = TINY_LM):
    from ..models.convert import load_params_npz

    return load_params_npz(path, cfg, jnp.float32)
