"""Training losses: output-distillation MSE + L1 gate sparsity.

Reference: distill term inline in duo_attn/train.py:126-146, l1 in
duo_attn/loss.py:1-4. The distillation MSE is computed per supervised
position (mean over hidden dim), summed, and normalized by the GLOBAL
supervised-token count — under data/sequence parallelism the count is
psum'd over the mesh axes (reference uses dist.all_reduce,
train.py:131-146).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def l1_loss(gates: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(gates))


def distill_loss(
    teacher_hidden: jnp.ndarray,
    student_hidden: jnp.ndarray,
    label_mask: jnp.ndarray,
    axis_names: Optional[Sequence[str]] = None,
) -> jnp.ndarray:
    """MSE over hidden dim at supervised positions / global count.

    teacher/student: [B, S, E]; label_mask: [B, S] bool (True=supervised).
    """
    diff = (
        teacher_hidden.astype(jnp.float32) - student_hidden.astype(jnp.float32)
    )
    per_pos = jnp.mean(diff * diff, axis=-1)  # [B, S]
    local_sum = jnp.sum(per_pos * label_mask)
    local_count = jnp.sum(label_mask).astype(jnp.float32)
    if axis_names:
        for ax in axis_names:
            local_sum = jax.lax.psum(local_sum, ax)
            local_count = jax.lax.psum(local_count, ax)
    return local_sum / jnp.maximum(local_count, 1.0)
