"""FSDP-style sharding of the frozen teacher/student parameters.

Counterpart of the reference's FSDP2 wrap (duo_attn/train.py:60-69): only
the gates train, but a replicated bf16 7-8B model (~16 GB of params) does
not fit one 16 GB v5e before activations, so the frozen params must be
sharded too. TPU-native shape: each layer's weights live sharded over the
flattened ``(data, seq)`` mesh axes; inside the shard_mapped train step a
per-layer hook all-gathers exactly one transformer block's weights right
before it is used and lets XLA free them after — peak live weights are
``params/N + O(1 layer)`` instead of the full model. A
``lax.optimization_barrier`` chains each gather to the previous layer's
activations so the scheduler cannot hoist all gathers to the start (which
would silently re-materialize the whole model).

Only ``params["layers"]`` is sharded — it is ~90% of the bytes at Llama
scale; the embedding table and norms stay replicated (the embed lookup is
a gather that wants the whole table anyway).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _shard_dim(shape: Tuple[int, ...], n: int) -> Optional[int]:
    """Largest dim divisible by ``n`` (None if nothing divides)."""
    best = None
    for d, s in enumerate(shape):
        if s % n == 0 and (best is None or s > shape[best]):
            best = d
    return best


def _spec_for(leaf, n: int, axes) -> P:
    d = _shard_dim(leaf.shape, n)
    if d is None:
        return P()
    return P(*([None] * d), axes)


def param_specs(params, mesh_axes=("data", "seq"), n_shards: int = 1):
    """PartitionSpec pytree for FSDP: layer weights sharded over the
    flattened mesh axes, everything else replicated."""
    axes = tuple(mesh_axes)

    def spec(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if "layers" in keys and hasattr(leaf, "shape") and leaf.ndim >= 1:
            return _spec_for(leaf, n_shards, axes)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params, mesh: Mesh, mesh_axes=("data", "seq")):
    """device_put the param tree with FSDP shardings over ``mesh``."""
    n = 1
    for a in mesh_axes:
        n *= mesh.shape[a]
    specs = param_specs(params, mesh_axes, n)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(params, shardings)


def make_gather_hook(layer_specs, mesh_axes=("data", "seq")):
    """Per-layer hook for ``llama.forward_two_way(layer_hook=...)``.

    Called inside shard_map as ``layer, deps = hook(layer, deps)``: first an
    optimization barrier ties this layer's (sharded) weights to the previous
    layer's activations, then each sharded leaf is ``all_gather``-ed (tiled)
    back to full shape for use. XLA frees the gathered copy once the layer's
    matmuls consume it."""
    axes = tuple(mesh_axes)

    def hook(layer, deps):
        layer, deps = lax.optimization_barrier((layer, deps))

        def gather(leaf, spec):
            for d, s in enumerate(spec):
                if s is not None:
                    return lax.all_gather(leaf, axes, axis=d, tiled=True)
            return leaf

        layer = jax.tree.map(gather, layer, layer_specs)
        return layer, deps

    return hook
