"""RMSNorm — XLA-fused.

Replaces the reference's FlashInfer rmsnorm bridge
(duo_attn/patch/flashinfer_utils.py:9-26): on TPU, XLA fuses the reduction
and elementwise chain into neighbors, so a plain jnp implementation is the
fast path. Statistics in float32, output cast back to input dtype.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)
