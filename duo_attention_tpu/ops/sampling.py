"""On-device token sampling: temperature / top-k / top-p (nucleus).

The reference's serving demo carries a QServe ``Sampler`` and its eval
paths rely on HF ``generate`` (demo/w8a8kv4_llama.py:30,280-287); this is
the TPU-native equivalent, built to run INSIDE the jitted decode scan:

* per-sequence traced parameters ([B] vectors of temperature/top_p/top_k)
  so one compiled step serves heterogeneous requests (continuous
  batching) with no retrace;
* temperature == 0 rows degrade exactly to greedy argmax (the sampled
  branch is computed but discarded by a ``where`` — under jit both sides
  run anyway);
* the PRNG key is carried through the scan (no host round-trips).

Top-p follows the standard nucleus definition: keep the smallest prefix
of the descending-probability ordering whose mass reaches ``top_p``
(a token is kept iff the cumulative mass BEFORE it is < top_p, so the
head token always survives). top_k == 0 means "off".
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling configuration (host-side).

    temperature == 0.0 -> greedy argmax (top_p/top_k ignored).
    """

    temperature: float = 0.0
    top_p: float = 1.0
    top_k: int = 0  # 0 = disabled
    seed: int = 0

    @property
    def is_greedy(self) -> bool:
        return self.temperature == 0.0


def _filtered(logits, temperature, top_p, top_k):
    """Shared filter: one descending sort serves all three knobs.

    Returns (order [B, V], masked scaled logits [B, V])."""
    V = logits.shape[-1]
    order = jnp.argsort(-logits, axis=-1)  # [B, V] descending
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)

    temp = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = sorted_logits / temp
    probs = jax.nn.softmax(scaled, axis=-1)
    cum_before = jnp.cumsum(probs, axis=-1) - probs  # mass strictly before
    rank = jnp.arange(V, dtype=jnp.int32)[None, :]
    keep = cum_before < top_p[:, None]
    keep &= (top_k[:, None] == 0) | (rank < top_k[:, None])
    keep = keep.at[:, 0].set(True)  # head token always survives
    return order, jnp.where(keep, scaled, -jnp.inf)


def sample_tokens(
    logits: jnp.ndarray,
    key: jax.Array,
    temperature: jnp.ndarray,
    top_p: jnp.ndarray,
    top_k: jnp.ndarray,
) -> jnp.ndarray:
    """Sample one token per row. logits [B, V] f32; temperature/top_p [B]
    f32; top_k [B] int32 (0 = off). Returns [B] int32.

    Rows with temperature == 0 return the argmax exactly (no PRNG
    involvement in their result).
    """
    order, masked = _filtered(logits, temperature, top_p, top_k)
    sampled_rank = jax.random.categorical(key, masked, axis=-1)  # [B]
    sampled = jnp.take_along_axis(
        order, sampled_rank[:, None], axis=-1
    )[:, 0]
    greedy = order[:, 0]
    return jnp.where(temperature == 0.0, greedy, sampled).astype(jnp.int32)


def sample_tokens_rowkeys(
    logits: jnp.ndarray,
    keys: jax.Array,
    temperature: jnp.ndarray,
    top_p: jnp.ndarray,
    top_k: jnp.ndarray,
):
    """Per-row-keyed sampling for continuous batching: each sequence owns
    its PRNG stream, so its sampled tokens are reproducible regardless of
    which other requests share the batch. keys: [B] of jax PRNG keys
    (jax.random.split-compatible). Returns (tokens [B] int32,
    advanced keys [B])."""
    V = logits.shape[-1]
    order, masked = _filtered(logits, temperature, top_p, top_k)
    split = jax.vmap(lambda k: jax.random.split(k, 2))(keys)  # [B, 2, ...]
    keys_next, subkeys = split[:, 0], split[:, 1]
    gumbel = jax.vmap(
        lambda k: jax.random.gumbel(k, (V,), jnp.float32)
    )(subkeys)
    sampled_rank = jnp.argmax(masked + gumbel, axis=-1)
    sampled = jnp.take_along_axis(
        order, sampled_rank[:, None], axis=-1
    )[:, 0]
    greedy = order[:, 0]
    tokens = jnp.where(temperature == 0.0, greedy, sampled).astype(jnp.int32)
    return tokens, keys_next


def params_to_vectors(params_list, batch_size: int):
    """Host helper: list of Optional[SamplingParams] (len <= batch_size,
    None = greedy) -> ([B] temperature, [B] top_p, [B] top_k) numpy."""
    import numpy as np

    temp = np.zeros(batch_size, np.float32)
    top_p = np.ones(batch_size, np.float32)
    top_k = np.zeros(batch_size, np.int32)
    for i, p in enumerate(params_list):
        if p is not None:
            temp[i] = p.temperature
            top_p[i] = p.top_p
            top_k[i] = p.top_k
    return temp, top_p, top_k
