"""shard_map wrappers running the Pallas attention kernels on head shards.

Under plain ``jit`` + GSPMD, a ``pallas_call`` has no partitioning rule, so
XLA replicates its operands — an all-gather of the full KV cache per layer,
which defeats tensor-sharding the retrieval-head KV over ICI (the north-star
deployment, BASELINE.json; reference counterpart: the ``tensor_parallel``
package's KV-head-chunked splits, duo_attn/utils.py:132-227). These wrappers
run each kernel inside ``shard_map`` over the ``(data, tensor)`` mesh: every
device keeps only its KV-head slice of the cache and computes attention for
the query heads of that slice — no cross-device traffic at all (attention
is embarrassingly parallel over KV heads; the psum for the o-projection is
GSPMD's job outside).

Used by models/llama._duo_layer_attention when a mesh is supplied and the
layer's head counts divide the ``tensor`` axis; other layers fall back to
the unsharded call (same constraint as the reference, which gathers KV for
uneven splits, duo_attn/utils.py:144-146).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _b(mesh: Mesh):
    """Batch-dim spec component: 'data' when the mesh has one."""
    return "data" if "data" in mesh.shape else None


def _scalar_spec(mesh: Mesh, cs) -> P:
    # cs is a scalar (static engine) or a per-sequence [B] vector (serving)
    return P(_b(mesh)) if jnp.asarray(cs).ndim == 1 else P()


def can_shard_heads(mesh, n_heads: int) -> bool:
    return (
        mesh is not None
        and "tensor" in mesh.shape
        and mesh.shape["tensor"] > 1
        and n_heads > 0
        and n_heads % mesh.shape["tensor"] == 0
    )


def sharded_full_attention(mesh: Mesh, q, k, v, cs, *, bucket: int = 0):
    from ..ops.flash import full_cache_attention

    b = _b(mesh)
    fn = partial(full_cache_attention, bucket=bucket)
    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            P(b, None, "tensor", None),   # q [B, S, Hq, D]
            P(b, "tensor", None, None),   # k cache [B, Hkv, T, D]
            P(b, "tensor", None, None),   # v cache
            _scalar_spec(mesh, cs),
        ),
        out_specs=P(b, None, "tensor", None),
        check_vma=False,
    )(q, k, v, cs)


def sharded_full_attention_q4(
    mesh: Mesh, q, k_packed, k_scales, v_packed, v_scales, cs, *, bucket: int = 0
):
    from ..ops.flash import full_cache_attention_q4

    b = _b(mesh)
    fn = partial(full_cache_attention_q4, bucket=bucket)
    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            P(b, None, "tensor", None),   # q
            P(b, "tensor", None, None),   # packed K [B, Hkv, T//2, D]
            P(b, "tensor", None),         # K scales [B, 8*Hkv, T//2]
            P(b, "tensor", None, None),   # packed V
            P(b, "tensor", None),         # V scales
            _scalar_spec(mesh, cs),
        ),
        out_specs=P(b, None, "tensor", None),
        check_vma=False,
    )(q, k_packed, k_scales, v_packed, v_scales, cs)


def sharded_streaming_attention(
    mesh: Mesh, q, k_sink, v_sink, k_ring, v_ring, cs, total_after,
    sink_size: int, recent_size: int,
):
    from ..ops.flash import streaming_cache_attention

    b = _b(mesh)
    fn = partial(
        streaming_cache_attention, sink_size=sink_size, recent_size=recent_size
    )

    def wrapped(q, ks, vs, kr, vr, cs, total):
        return fn(q, ks, vs, kr, vr, cs, total)

    return shard_map(
        wrapped,
        mesh=mesh,
        in_specs=(
            P(b, None, "tensor", None),
            P(b, "tensor", None, None),
            P(b, "tensor", None, None),
            P(b, "tensor", None, None),
            P(b, "tensor", None, None),
            _scalar_spec(mesh, cs),
            _scalar_spec(mesh, total_after),
        ),
        out_specs=P(b, None, "tensor", None),
        check_vma=False,
    )(q, k_sink, v_sink, k_ring, v_ring, cs, total_after)
