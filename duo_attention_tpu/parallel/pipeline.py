"""Pipeline-parallel (stage-sharded) evaluation engine.

TPU counterpart of the reference's ``--enable_pp`` option
(duo_attn/utils.py:228-283): accelerate's balanced device map places
contiguous layer groups on successive GPUs — embeddings on the first
device, final norm + lm_head on the last — and runs them sequentially,
one device active at a time. It is a *memory capacity* feature (fit a
model whose weights+KV exceed one device), not a throughput feature, and
the reference ships it off by default.

Here each stage is a jitted chunk step whose parameters and KV cache are
committed to one device of the stage list; activations ([B, S, E]
residual-stream states) hop devices explicitly between stages. The duo
split is preserved per layer: every stage holds the slice of
``num_full_kv_heads`` for its own layers, so heterogeneous head splits
across stage boundaries need no padding (compare SURVEY.md §7.3 "per-layer
heterogeneous head splits").

Chunked PREFILL actually pipelines across chunks without any extra
machinery: dispatch is asynchronous and stage s's step for chunk i
depends only on (stage s cache after chunk i-1, stage s-1 hidden for
chunk i), so when the host loop dispatches chunk i+1's stage-0 step
right after chunk i's stage-1 step, the runtime overlaps them on their
different devices — classic 1F pipelining with the bubble only at the
fill/drain edges, better than accelerate's strictly sequential execution.
DECODE is inherently sequential per token (the next token needs the last
stage's logits). For *throughput*-motivated scale-out, use the GSPMD
tensor axis (parallel/mesh.py, parallel/spmd.py) — the recommended path
on TPU, where ICI makes TP collectives cheap; this module exists for
capability parity with the reference's eval-time PP.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cache import init_cache, init_cache_q4
from ..config import DuoConfig, ModelConfig
from ..models import llama


def balanced_stage_bounds(num_layers: int, num_stages: int) -> List[int]:
    """Contiguous layer-group boundaries, larger groups first (accelerate's
    balanced split: ceil for the first ``num_layers % num_stages`` stages).

    Returns num_stages+1 offsets: stage s owns layers [b[s], b[s+1])."""
    assert 1 <= num_stages <= num_layers, (num_stages, num_layers)
    base, extra = divmod(num_layers, num_stages)
    bounds = [0]
    for s in range(num_stages):
        bounds.append(bounds[-1] + base + (1 if s < extra else 0))
    return bounds


_EMBED_KEYS = ("embed", "embed_q8", "embed_scale")
_HEAD_KEYS = ("final_norm", "lm_head", "lm_head_q8", "lm_head_scale")


def split_stage_params(params, num_stages: int):
    """Slice a model param pytree into per-stage pytrees.

    Stage 0 carries the embedding table; the last stage carries
    final_norm + lm_head (reference placement: utils.py:254-266). Tied
    embeddings (no lm_head key) are duplicated onto the last stage so
    ``_head_logits`` can read them there."""
    L = len(params["layers"])
    bounds = balanced_stage_bounds(L, num_stages)
    stages = []
    for s in range(num_stages):
        sp = {"layers": tuple(params["layers"][bounds[s] : bounds[s + 1]])}
        if s == 0:
            for k in _EMBED_KEYS:
                if k in params:
                    sp[k] = params[k]
        if s == num_stages - 1:
            for k in _HEAD_KEYS:
                if k in params:
                    sp[k] = params[k]
            if "lm_head" not in params and "lm_head_q8" not in params:
                for k in _EMBED_KEYS:  # tied embeddings head
                    if k in params:
                        sp[k] = params[k]
    # NOTE: a tied last stage holding "embed" must NOT re-run the embed
    # lookup — forward_chunk skips it because stage inputs are [B, S, E].
        stages.append(sp)
    return stages, bounds


class PipelinedEngine:
    """Sequential stage-parallel inference over explicit device placement.

    Same surface as ``DuoEngine`` (prefill / generate / decode_tokens) but
    the model is split layer-wise across ``devices``. Decode cannot be a
    single on-device scan (the next token depends on the last stage's
    logits), so it runs as a host loop of per-stage single-token steps —
    the same regime as the reference's PP decode, which syncs every token
    anyway (needle_in_haystack.py:302-314).
    """

    def __init__(
        self,
        params,
        cfg: ModelConfig,
        duo: DuoConfig,
        devices: Optional[Sequence] = None,
        batch_size: int = 1,
        dtype=jnp.bfloat16,
        attn_impl: str = "auto",
        kv_quant: str = "none",
    ):
        self.devices = list(devices if devices is not None else jax.devices())
        S = len(self.devices)
        stage_params, bounds = split_stage_params(params, S)
        self.stage_params = [
            jax.device_put(sp, d) for sp, d in zip(stage_params, self.devices)
        ]
        self.bounds = bounds
        self.cfg = cfg
        self.duo = duo
        self.batch_size = batch_size
        self.dtype = dtype
        if attn_impl == "auto":
            attn_impl = "pallas" if jax.default_backend() == "tpu" else "ref"
        self.attn_impl = attn_impl
        assert kv_quant in ("none", "int4")
        self.kv_quant = kv_quant
        # per-stage configs: layer count + the stage's duo head-split slice
        self.stage_cfgs = [
            dataclasses.replace(cfg, num_layers=bounds[s + 1] - bounds[s])
            for s in range(S)
        ]
        self.stage_duos = [
            dataclasses.replace(
                duo,
                num_full_kv_heads=duo.num_full_kv_heads[
                    bounds[s] : bounds[s + 1]
                ],
            )
            for s in range(S)
        ]
        self._chunk_fns = {}
        # last-stage lm_head on one position (traced index -> 1 program)
        self._logits_fn = jax.jit(llama.logits_at)

    # -- compile surface ---------------------------------------------------

    def _stage_fn(self, s: int, bucket: int):
        key = (s, bucket)
        if key not in self._chunk_fns:
            self._chunk_fns[key] = jax.jit(
                functools.partial(
                    _stage_chunk,
                    cfg=self.stage_cfgs[s],
                    duo=self.stage_duos[s],
                    attn_impl=self.attn_impl,
                    full_bucket=bucket,
                ),
                donate_argnums=(1,),
            )
        return self._chunk_fns[key]

    def bucket_for(self, length: int) -> int:
        b = 512
        while b < length:
            b *= 2
        return min(b, self.duo.max_cache_size)

    # -- state -------------------------------------------------------------

    def new_caches(self):
        """One cache per stage, committed to the stage's device."""
        caches = []
        for s, d in enumerate(self.devices):
            init = init_cache_q4 if self.kv_quant == "int4" else init_cache
            caches.append(
                jax.device_put(
                    init(self.stage_cfgs[s], self.stage_duos[s],
                         self.batch_size, self.dtype),
                    d,
                )
            )
        return caches

    # -- inference ---------------------------------------------------------

    def _run_chunk(self, caches, x, n_valid, bucket):
        """Thread one chunk through all stages; x: ids [B,S] or hidden."""
        for s in range(len(self.devices)):
            x = jax.device_put(x, self.devices[s])
            x, caches[s] = self._stage_fn(s, bucket)(
                self.stage_params[s], caches[s], x, n_valid
            )
        return x, caches

    def prefill(self, input_ids: np.ndarray, caches=None, ret_logits=True):
        """Chunked prefill through the pipeline.

        Returns (caches, last-token logits [B, vocab])."""
        if caches is None:
            caches = self.new_caches()
        input_ids = np.asarray(input_ids)
        B, S = input_ids.shape
        C = self.duo.prefill_chunk_size
        pos = 0
        hidden = None
        for off in range(0, S, C):
            chunk = input_ids[:, off : off + C]
            n_valid = chunk.shape[1]
            if n_valid < C:
                chunk = np.pad(chunk, ((0, 0), (0, C - n_valid)))
            hidden, caches = self._run_chunk(
                caches,
                jnp.asarray(chunk),
                jnp.asarray(n_valid, jnp.int32),
                self.bucket_for(pos + C),
            )
            pos += n_valid
        logits = self._logits_fn(
            self.stage_params[-1], hidden, jnp.asarray((S - 1) % C, jnp.int32)
        ) if ret_logits else None
        return caches, logits

    def generate(
        self,
        input_ids: np.ndarray,
        max_new_tokens: int,
        stop_token_ids: Optional[list] = None,
    ) -> Tuple[np.ndarray, list]:
        """Greedy generation (prefill + per-token pipelined decode)."""
        input_ids = np.asarray(input_ids)
        total = input_ids.shape[1] + max_new_tokens
        assert total <= self.duo.max_cache_size, (
            f"prompt+generation = {total} exceeds max_cache_size"
        )
        caches, logits = self.prefill(input_ids)
        bucket = self.bucket_for(total)
        token = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B]
        out = []
        one = jnp.asarray(1, jnp.int32)
        for _ in range(max_new_tokens):
            out.append(np.asarray(token))
            hidden, caches = self._run_chunk(
                caches, token[:, None], one, bucket
            )
            logits = self._logits_fn(
                self.stage_params[-1], hidden, jnp.asarray(0, jnp.int32)
            )
            token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            if stop_token_ids:
                acc = np.stack(out, axis=1)  # [B, n so far]
                if all(np.isin(row, stop_token_ids).any() for row in acc):
                    break
        tokens = np.stack(out, axis=1)  # [B, n]
        if tokens.shape[1] < max_new_tokens:
            pad = np.full(
                (tokens.shape[0], max_new_tokens - tokens.shape[1]),
                stop_token_ids[0], tokens.dtype,
            )
            tokens = np.concatenate([tokens, pad], axis=1)
        if stop_token_ids:
            from ..engine import _truncate_at_stop

            tokens = _truncate_at_stop(tokens, stop_token_ids)
        return tokens[:, :max_new_tokens], caches

    def kv_memory_bytes(self, caches) -> int:
        leaves = jax.tree_util.tree_leaves(caches)
        return sum(x.size * x.dtype.itemsize for x in leaves)


def _stage_chunk(params, cache, x, n_valid, *, cfg, duo, attn_impl,
                 full_bucket):
    return llama.forward_chunk(
        params, cfg, duo, cache, x, n_valid,
        attn_impl=attn_impl, full_bucket=full_bucket,
    )
