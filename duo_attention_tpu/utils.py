"""Small runtime utilities: timing fences, profiling, memory accounting.

Counterpart of the reference's CUDA-event timer + peak-memory helpers
(eval/efficiency/utils.py:7-30, torch.cuda.max_memory_allocated usage).
On this TPU stack ``block_until_ready`` can return before device work
completes (remote-tunnel runtimes ack dispatch, not completion), so the
only reliable fence is fetching a value derived from the output.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def fence(tree) -> float:
    """Hard completion fence: reduces every array to a scalar and fetches
    it to host. Returns the (meaningless) checksum so callers can keep a
    data dependency alive."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    acc = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        acc = acc + jnp.sum(leaf.astype(jnp.float32) * 0 + 1) * 0 + jnp.sum(
            leaf.ravel()[:1].astype(jnp.float32)
        )
    return float(acc)


def device_time(fn: Callable, *args, iters: int = 1, warmup: int = 1) -> float:
    """Median-free simple timer: wall seconds per call, fenced by a value
    fetch. fn should return a jax array/pytree."""
    for _ in range(warmup):
        fence(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


class profile_trace:
    """Context manager for on-device profiling (reference tracing was
    ad-hoc CUDA events + allocator history, SURVEY.md §5.1; here one
    jax.profiler trace captures the XLA/Pallas timeline viewable in
    TensorBoard / Perfetto).

    Usage: ``with profile_trace("/tmp/trace"): run_step()``
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def __enter__(self):
        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        jax.profiler.stop_trace()
        return False


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = d.memory_stats()
        except Exception:
            stats[str(d)] = None
    return stats


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache (verified to work through
    remote PJRT runtimes): long-context engines compile one executable per
    (bucket, chunk/steps) pair, each costing seconds to minutes — cached,
    a rerun's prefill wall time drops by hundreds of seconds. Drivers
    (bench.py, demo, efficiency) call this at startup; set
    DUO_JAX_CACHE_DIR to relocate, or DUO_JAX_CACHE_DIR=off to disable.
    """
    import os

    env = os.environ.get("DUO_JAX_CACHE_DIR")
    if env == "off":
        return ""
    cache_dir = env or cache_dir or os.path.expanduser(
        "~/.cache/duo_attention_tpu/jax"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
