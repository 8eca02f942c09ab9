"""Ulysses-style sequence parallelism via jax.lax.all_to_all.

Counterpart of the reference's DeepSpeed-Ulysses port
(duo_attn/ulysses/attn_layer.py:15-77, ulysses/utils.py:14-230): inputs are
sequence-sharded per device; around each attention the tensors are
re-sharded seq⇄head with an all-to-all so every device computes full-
sequence attention for a head subset. The reference hand-writes an
autograd.Function with the inverse all-to-all in backward
(ulysses/utils.py:95-119); in JAX ``lax.all_to_all`` is differentiable, so
the backward collective comes for free. Must run inside shard_map over the
``seq`` mesh axis.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def seq_to_head(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """[B, S/P, H, D] (seq-sharded) -> [B, S, H/P, D] (head-sharded).

    Mirrors all_to_all_4D's scatter-heads/gather-seq direction
    (ulysses/utils.py:14-56)."""
    return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1, tiled=True)


def head_to_seq(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """[B, S, H/P, D] -> [B, S/P, H, D] (inverse reshard,
    ulysses/utils.py:57-92)."""
    return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2, tiled=True)


def ulysses_attention(
    attn_fn: Callable,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
):
    """Run ``attn_fn(q, k, v)`` with seq⇄head resharding around it.

    q: [B, S/P, Hq, D]; k/v: [B, S/P, Hkv, D]. Requires Hq and Hkv both
    divisible by the axis size (same constraint as the reference,
    ulysses/attn_layer.py). attn_fn sees full-sequence, head-sharded
    tensors and must return [B, S, Hq/P, D].
    """
    qh = seq_to_head(q, axis_name)
    kh = seq_to_head(k, axis_name)
    vh = seq_to_head(v, axis_name)
    out = attn_fn(qh, kh, vh)
    return head_to_seq(out, axis_name)
