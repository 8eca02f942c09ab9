"""Inference engine: chunked prefill + on-device greedy decode.

Replaces the reference's three separate drivers (tuple-cache HF generate,
static-cache benchmark loop, QServe demo loop — SURVEY.md §1) with one
engine. Chunked prefill is a host loop of one jitted chunk step with a
donated cache (reference protocol: 32k chunks,
eval/needle/needle_in_haystack.py:275-287, demo/run_duo_w8a8kv4.py:172-199).
Decode runs as a ``lax.scan`` entirely on device — the reference's per-token
``.item()`` host syncs (needle_in_haystack.py:302-314) are a latency hazard
we deliberately avoid (SURVEY.md §3 boundary notes).

Length bucketing: the engine tracks the host-known token count and passes a
static power-of-2 ``full_bucket`` into each jitted step, so the Pallas
kernels' grids cover only the live prefix of the preallocated cache. Each
new bucket costs one retrace (log2 many total).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .cache import DuoCache, init_cache, init_cache_q4
from .config import DuoConfig, ModelConfig
from .models import llama


def _next_bucket(n: int, lo: int = 512) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class DuoEngine:
    """Stateless-compile, stateful-cache inference engine."""

    def __init__(
        self,
        params,
        cfg: ModelConfig,
        duo: DuoConfig,
        batch_size: int = 1,
        dtype=jnp.bfloat16,
        attn_impl: str = "auto",
        kv_quant: str = "none",
        mesh=None,
        decode_burst: int = 64,
        single_bucket: bool = False,
    ):
        self.params = params
        self.cfg = cfg
        self.duo = duo
        self.batch_size = batch_size
        self.dtype = dtype
        assert len(duo.num_full_kv_heads) == cfg.num_layers, (
            f"pattern has {len(duo.num_full_kv_heads)} layers, model has "
            f"{cfg.num_layers} — wrong attn_patterns dir for this model?"
        )
        assert all(0 <= n <= cfg.num_kv_heads for n in duo.num_full_kv_heads), (
            f"num_full_kv_heads {duo.num_full_kv_heads} outside "
            f"[0, {cfg.num_kv_heads}] — pattern trained for a model with a "
            "different KV-head count?"
        )
        if attn_impl == "auto":
            attn_impl = "pallas" if jax.default_backend() == "tpu" else "ref"
        self.attn_impl = attn_impl
        # mesh: head-shards the Pallas kernels via shard_map on divisible
        # layers (parallel/spmd.py); shard params/cache with
        # parallel.mesh.shard_inference_state before constructing.
        self.mesh = mesh
        assert kv_quant in ("none", "int4")
        self.kv_quant = kv_quant
        # Compile-surface control: ``generate`` decodes in fixed-size
        # scanned bursts and trims on the host, so the executable set is
        # one program per (bucket) instead of one per (bucket,
        # max_new_tokens) — each distinct step count is otherwise a fresh
        # multi-minute scanned-program compile through the remote runtime.
        # 0 disables bursting (exact-length scan, the pre-burst behavior).
        self.decode_burst = max(int(decode_burst), 0)
        # single_bucket=True pins EVERY program to bucket=max_cache_size:
        # the Pallas kernels skip dead KV blocks past the live length
        # (ops/flash.py @pl.when grid masking), so runtime still scales
        # with the true context while the compile surface collapses to
        # ONE prefill + one decode program per scan length — geometric
        # buckets otherwise compile log2(max_cache/chunk) prefill
        # programs, each a multi-minute remote compile for a 32-layer
        # model (the 8B NIAH grid would pay ~100 of them).
        self.single_bucket = single_bucket
        self._chunk_fns = {}
        self._decode_fns = {}

    def _chunk_step_fn(self, bucket: int):
        if bucket not in self._chunk_fns:
            self._chunk_fns[bucket] = jax.jit(
                functools.partial(
                    _chunk_step,
                    cfg=self.cfg,
                    duo=self.duo,
                    attn_impl=self.attn_impl,
                    full_bucket=bucket,
                    mesh=self.mesh,
                ),
                donate_argnums=(1,),
            )
        return self._chunk_fns[bucket]

    def _decode_fn(self, bucket: int, num_steps: int, sample: bool = False,
                   return_next: bool = False):
        key = (bucket, num_steps, sample, return_next)
        if key not in self._decode_fns:
            self._decode_fns[key] = jax.jit(
                functools.partial(
                    _decode_scan,
                    cfg=self.cfg,
                    duo=self.duo,
                    attn_impl=self.attn_impl,
                    full_bucket=bucket,
                    num_steps=num_steps,
                    mesh=self.mesh,
                    sample=sample,
                    return_next=return_next,
                ),
                donate_argnums=(1,),
            )
        return self._decode_fns[key]

    def new_cache(self):
        if self.kv_quant == "int4":
            cache = init_cache_q4(
                self.cfg, self.duo, self.batch_size, self.dtype
            )
        else:
            cache = init_cache(self.cfg, self.duo, self.batch_size, self.dtype)
        if self.mesh is not None:
            # head-shard the KV buffers over the tensor axis so callers
            # that let the engine allocate (generate(cache=None), evals)
            # get the same placement shard_inference_state would give —
            # an unsharded (replicated) cache would silently cost full
            # buffers per device.
            from .parallel.mesh import cache_shardings

            cache = jax.device_put(
                cache,
                cache_shardings(
                    self.mesh, self.cfg, self.duo,
                    quantized=self.kv_quant == "int4",
                    batch_size=self.batch_size,
                ),
            )
        return cache

    def bucket_for(self, length: int) -> int:
        if self.single_bucket:
            return self.duo.max_cache_size
        return min(_next_bucket(length), self.duo.max_cache_size)

    def prefill(
        self,
        input_ids: np.ndarray,
        cache: Optional[DuoCache] = None,
        start: int = 0,
    ) -> Tuple[DuoCache, jnp.ndarray]:
        """Chunked prefill. input_ids: [B, S] host array.

        Returns (cache, last_token_logits [B, vocab])."""
        if cache is None:
            cache = self.new_cache()
        input_ids = np.asarray(input_ids)
        B, S = input_ids.shape
        C = self.duo.prefill_chunk_size
        logits = None
        pos = start
        for off in range(0, S, C):
            chunk = input_ids[:, off : off + C]
            n_valid = chunk.shape[1]
            if n_valid < C:  # pad the tail chunk; masks hide the padding
                chunk = np.pad(chunk, ((0, 0), (0, C - n_valid)))
            step = self._chunk_step_fn(self.bucket_for(pos + C))
            cache, logits = step(
                self.params,
                cache,
                jnp.asarray(chunk),
                jnp.asarray(n_valid, jnp.int32),
            )
            pos += n_valid
        return cache, logits

    def generate(
        self,
        input_ids: np.ndarray,
        max_new_tokens: int,
        cache: Optional[DuoCache] = None,
        stop_token_ids: Optional[list] = None,
        sampling=None,
    ) -> Tuple[np.ndarray, DuoCache]:
        """Generation: chunked prefill then on-device decode scan.

        sampling: Optional[ops.sampling.SamplingParams]; None or
        temperature=0 -> greedy argmax (the reference eval default),
        otherwise temperature/top-p/top-k sampling with the PRNG key
        carried inside the scan (QServe Sampler counterpart,
        demo/w8a8kv4_llama.py:280-287).
        Returns (generated token ids [B, max_new_tokens], cache)."""
        input_ids = np.asarray(input_ids)
        if cache is None:  # host-known length: fail before touching the chip
            total = input_ids.shape[1] + max_new_tokens
            assert total <= self.duo.max_cache_size, (
                f"prompt+generation = {total} tokens exceeds max_cache_size "
                f"= {self.duo.max_cache_size}"
            )
        cache, logits = self.prefill(input_ids, cache)
        B = input_ids.shape[0]
        do_sample = sampling is not None and not sampling.is_greedy
        if do_sample:
            from .ops.sampling import sample_tokens

            vec = lambda v, dt: jnp.full((B,), v, dt)  # noqa: E731
            temp = vec(sampling.temperature, jnp.float32)
            top_p = vec(sampling.top_p, jnp.float32)
            top_k = vec(sampling.top_k, jnp.int32)
            key = jax.random.PRNGKey(sampling.seed)
            key, sub = jax.random.split(key)
            first_token = jax.jit(sample_tokens)(
                logits.astype(jnp.float32), sub, temp, top_p, top_k
            )
            sample_args = (key, temp, top_p, top_k)
        else:
            first_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B]
            sample_args = None
        tokens, cache = self.decode_tokens(
            cache, first_token, max_new_tokens,
            length=input_ids.shape[1],
            sample_args=sample_args, stop_token_ids=stop_token_ids,
        )
        if stop_token_ids:
            tokens = _truncate_at_stop(tokens, stop_token_ids)
        return tokens, cache

    def decode_tokens(
        self,
        cache: DuoCache,
        first_token: jnp.ndarray,
        max_new_tokens: int,
        length: int,
        sample_args=None,
        stop_token_ids: Optional[list] = None,
    ) -> Tuple[np.ndarray, DuoCache]:
        """Decode ``max_new_tokens`` in fixed-size scanned bursts.

        ``length`` is the host-known token count already in the cache
        (``first_token`` is fed at that position). The step count is
        decomposed into ``decode_burst``-sized bursts plus a power-of-two
        decomposition of the remainder, so the executable set per bucket
        is bounded by ``1 + log2(decode_burst)`` scanned programs shared
        by EVERY ``max_new_tokens`` a caller asks for — each distinct
        scan length is otherwise a fresh multi-minute compile through the
        remote runtime (serving.py solves the same problem with
        host-trimmed fixed bursts; here the exact total keeps
        ``cache.length`` truthful for callers that continue from the
        returned cache). With ``stop_token_ids``, decoding stops at the
        first burst where every row has emitted a stop token, making
        short answers cheaper than the requested budget (the reference
        pays full ``max_new_tokens`` everywhere,
        eval/needle/needle_in_haystack.py:302-314).
        Returns (tokens [B, max_new_tokens] host array, cache)."""
        plan = _burst_plan(self.decode_burst, max_new_tokens)
        bucket = self.bucket_for(length + sum(plan))
        sample = sample_args is not None
        if sample:
            key, temp, top_p, top_k = sample_args
        out = []
        token = first_token
        for steps in plan:
            fn = self._decode_fn(bucket, steps, sample=sample,
                                 return_next=True)
            if sample:
                key, sub = jax.random.split(key)
                tokens, cache, token = fn(
                    self.params, cache, token, (sub, temp, top_p, top_k)
                )
            else:
                tokens, cache, token = fn(self.params, cache, token)
            out.append(np.asarray(tokens))
            if stop_token_ids:
                acc = np.concatenate(out, axis=1)
                if all(np.isin(row, stop_token_ids).any() for row in acc):
                    break
        tokens = np.concatenate(out, axis=1)
        if tokens.shape[1] < max_new_tokens:  # early stop: pad with stop id
            pad = np.full(
                (tokens.shape[0], max_new_tokens - tokens.shape[1]),
                stop_token_ids[0], tokens.dtype,
            )
            tokens = np.concatenate([tokens, pad], axis=1)
        return tokens[:, :max_new_tokens], cache

    def decode_step(self, cache: DuoCache, token: jnp.ndarray, length: int):
        """Single decode step (used by eval 'simulation' mode,
        reference: eval/LongBench/pred.py:125-142). length = host-known
        token count before this step. Returns (next_token [B], cache) —
        the PREDICTION, not the fed token (the scan's emitted stream
        starts with its input; return_next carries the argmax after it)."""
        fn = self._decode_fn(self.bucket_for(length + 1), 1,
                             return_next=True)
        _, cache, nxt = fn(self.params, cache, token)
        return nxt, cache


def _burst_plan(burst: int, n: int) -> list:
    """Decompose ``n`` decode steps into scan lengths: full bursts plus a
    power-of-two remainder decomposition. Exact total (cache.length stays
    truthful); distinct lengths ≤ 1 + log2(burst) so the compiled-program
    set per bucket is bounded regardless of what callers request."""
    if burst <= 0 or n <= 0:
        return [max(n, 0)]
    plan = [burst] * (n // burst)
    rem = n % burst
    while rem:
        p = 1 << (rem.bit_length() - 1)
        plan.append(p)
        rem -= p
    return plan


def _chunk_step(params, cache, chunk, n_valid, *, cfg, duo, attn_impl,
                full_bucket, mesh=None):
    hidden, cache = llama.forward_chunk(
        params, cfg, duo, cache, chunk, n_valid,
        attn_impl=attn_impl, full_bucket=full_bucket, mesh=mesh,
    )
    logits = llama.logits_at(params, hidden, n_valid - 1)
    return cache, logits


def _decode_scan(
    params, cache, first_token, sample_state=None, *, cfg, duo, attn_impl,
    full_bucket, num_steps, mesh=None, sample=False, return_next=False,
):
    """Decode ``num_steps`` tokens as a device-side scan.

    Carry = (cache, next_token[, prng key]). Emits the token fed at each
    step, so the output sequence starts with ``first_token`` and contains
    num_steps ids. With ``sample=True``, ``sample_state`` is
    (key, temperature [B], top_p [B], top_k [B]) and each step draws from
    the filtered distribution (ops/sampling.py) instead of argmax.
    """
    if sample:
        key0, temp, top_p, top_k = sample_state
        from .ops.sampling import sample_tokens

    def step(carry, _):
        if sample:
            cache, token, key = carry
        else:
            cache, token = carry
        hidden, cache = llama.forward_chunk(
            params, cfg, duo, cache, token[:, None],
            attn_impl=attn_impl, full_bucket=full_bucket, mesh=mesh,
        )
        logits = llama.logits_at(params, hidden, 0)
        if sample:
            key, sub = jax.random.split(key)
            next_token = sample_tokens(
                logits.astype(jnp.float32), sub, temp, top_p, top_k
            )
            return (cache, next_token, key), token
        next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (cache, next_token), token

    init = (cache, first_token, key0) if sample else (cache, first_token)
    carry, tokens = jax.lax.scan(step, init, None, length=num_steps)
    cache = carry[0]
    # Overrun guard: decoding past max_cache_size clamps the in-place
    # writes (ops/inplace.py) so the chip never faults, but the results
    # are garbage — poison the whole output with -1 so callers fail
    # loudly instead of silently reading stale-cache tokens (round-1
    # BENCH_r01 lesson).
    overrun = jnp.any(cache.length > duo.max_cache_size)
    tokens = jnp.where(overrun, jnp.full_like(tokens, -1), tokens)
    if return_next:  # carry[1] = the token AFTER the last emitted one,
        return tokens.T, cache, carry[1]  # so bursts can chain
    return tokens.T, cache  # [B, num_steps]


def _truncate_at_stop(tokens: np.ndarray, stop_ids) -> np.ndarray:
    out = tokens.copy()
    for b in range(out.shape[0]):
        for t in range(out.shape[1]):
            if out[b, t] in stop_ids:
                out[b, t + 1 :] = stop_ids[0]
                break
    return out
