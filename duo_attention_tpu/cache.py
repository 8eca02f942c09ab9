"""DuoAttention KV cache — functional, statically-shaped, jit-native.

Re-design of the reference's ``DuoAttentionStaticKVCache``
(duo_attn/patch/static_kv_cache.py:18-315). Same capability:

* full (retrieval) KV heads get an unbounded-until-max preallocated cache,
* streaming KV heads get a constant-size sink+recent cache,
* per-layer heterogeneous head splits (num_full_kv_head differs per layer),
* chunked prefill and decode feed the same structure.

TPU-native deltas (deliberate, see SURVEY.md §7.1/7.3):

1. **No compress copies.** The reference's ``compress_and_replace_streaming_kv``
   / ``compress`` (static_kv_cache.py:127-167,265-283) move sink+recent data
   after every chunk and every decode step. Here the streaming recent window
   is a **ring buffer** over global token positions: slot ``g % R`` holds
   token ``g``. Attention is permutation-invariant over KV slots, so ring
   order is exactly equivalent to the reference's compacted order — the mask
   is computed from position arithmetic instead of data movement. Decode
   writes one token (dynamic_update_slice) and never copies the window.

2. **Functional updates.** All mutation is dynamic_update_slice / scatter on
   donated buffers; the clone-before-overlap-copy hazards of the reference
   (static_kv_cache.py:271,277) are structurally absent.

Semantics of the visible KV set (verified equal to the reference's):
for a query at global position ``qpos`` inside a chunk starting at ``cs``,
a streaming head sees  ``{g < sink}  ∪  {g : cs - recent <= g <= qpos}``,
i.e. the sink tokens plus the reference's "cached recent as of chunk start
plus causal incoming" (duo_attn/patch/llama.py:225-267). A full head sees
``{g <= qpos}``.

Ring sizing: R = recent + chunk so that tokens inside the window are never
overwritten while still needed: a chunk write [cs, cs+C) only overwrites
tokens g' <= cs - recent - 1 < cs - recent. Padding tokens in a final
partial chunk land in slots whose masked position (the pre-overwrite token's
``g``) is out-of-window, so they are invisible until genuinely overwritten
by real tokens — no trash zone or cleanup pass is needed.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .config import DuoConfig, ModelConfig


class DuoCache(NamedTuple):
    """Per-layer tuples (layers have heterogeneous head splits).

    Layout is [batch, kv_head, slot, head_dim] — head-major so Pallas kernel
    blocks over the slot axis tile as (block_k, head_dim), the native TPU
    (sublane, lane) shape.

    k_full/v_full: [B, Hf_l, max_size, D]
    k_sink/v_sink: [B, Hs_l, sink + chunk, D]  (trailing chunk = overflow
        pad, never visible; lets a straddling chunk be written with one
        dynamic_update_slice)
    k_ring/v_ring: [B, Hs_l, R, D] with R = round_up(recent + chunk, 512)
    length: scalar int32 — total real tokens absorbed so far.
    """

    k_full: Tuple[jnp.ndarray, ...]
    v_full: Tuple[jnp.ndarray, ...]
    k_sink: Tuple[jnp.ndarray, ...]
    v_sink: Tuple[jnp.ndarray, ...]
    k_ring: Tuple[jnp.ndarray, ...]
    v_ring: Tuple[jnp.ndarray, ...]
    length: jnp.ndarray


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def ring_capacity(duo: DuoConfig, decode_only: bool = False) -> int:
    # Rounded up so Pallas kv blocks (<=512) divide the ring evenly; a
    # bigger ring only widens the window margin, never changes semantics.
    # A chunk-prefill cache needs recent + chunk live at once (queries at
    # a chunk's end see "recent as of chunk start"); a decode-only cache
    # (ServingEngine's batch pool — admission prefills on a separate B=1
    # engine) needs only recent + 1, which is 16-60x smaller when the
    # prefill chunk is large.
    if decode_only:
        return _round_up(duo.recent_size + 8, 128)
    return _round_up(duo.recent_size + duo.prefill_chunk_size, 512)


def sink_rows(duo: DuoConfig, decode_only: bool = False) -> int:
    # Chunk prefill stages whole chunks through the sink buffer's overflow
    # pad; decode writes at most one row past the sink region.
    if decode_only:
        return _round_up(duo.sink_size + 8, 8)
    return duo.sink_size + duo.prefill_chunk_size


def init_cache(
    cfg: ModelConfig, duo: DuoConfig, batch_size: int, dtype=jnp.bfloat16,
    decode_only: bool = False,
) -> DuoCache:
    """Preallocate all per-layer buffers (reference: static_kv_cache.py:52-99)."""
    assert len(duo.num_full_kv_heads) == cfg.num_layers
    assert duo.max_cache_size % 128 == 0, (
        f"max_cache_size must be a multiple of 128 (got {duo.max_cache_size}) "
        "so Pallas kv blocks tile the buffer; round it up"
    )
    D = cfg.head_dim
    k_full, v_full = [], []
    for hf in duo.num_full_kv_heads:
        k_full.append(jnp.zeros((batch_size, hf, duo.max_cache_size, D), dtype))
        v_full.append(jnp.zeros((batch_size, hf, duo.max_cache_size, D), dtype))
    k_sink, v_sink, k_ring, v_ring = _init_streaming_bufs(
        cfg, duo, batch_size, dtype, decode_only
    )
    return DuoCache(
        k_full=tuple(k_full),
        v_full=tuple(v_full),
        k_sink=k_sink,
        v_sink=v_sink,
        k_ring=k_ring,
        v_ring=v_ring,
        length=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Per-layer updates (pure; called inside the jitted model forward)
# ---------------------------------------------------------------------------


def write_full(buf: jnp.ndarray, incoming: jnp.ndarray, start) -> jnp.ndarray:
    """Append incoming [B, Hf, S, D] at slot ``start``.

    start: traced scalar (all rows aligned) or [B] vector (continuous
    batching — every sequence appends at its own live length)."""
    start = jnp.asarray(start)
    if incoming.shape[2] == 1:
        # Decode: a Pallas in-place row write. XLA's dus/scatter inside
        # the decode loop forces whole-buffer layout-conversion copies
        # every step (see ops/inplace.py) — the kernel touches one slab.
        from .ops.inplace import write_row

        return write_row(buf, incoming, start)
    assert start.ndim == 0, "ragged prefill writes unsupported"
    return jax.lax.dynamic_update_slice(buf, incoming, (0, 0, start, 0))


def write_streaming(
    k_sink, v_sink, k_ring, v_ring, k_new, v_new, start, sink_size: int
):
    """Write a chunk into sink (positional) and ring (mod-R) regions.

    k_new/v_new: [B, Hs, S, D]; start: traced scalar or per-sequence [B]
    vector (chunk's first global position). Tokens with g < sink land in
    the sink region; every token also lands in the ring at slot g % R
    (harmless duplication — masks de-duplicate by position, see ring/sink
    mask builders below).
    """
    S = k_new.shape[2]
    R = k_ring.shape[2]
    start = jnp.asarray(start)
    if S == 1:
        # Decode: fused Pallas in-place writes (sink slot min(start, sink),
        # ring slot start % R). An XLA dus here forces whole-buffer layout
        # copies every step — see ops/inplace.py.
        from .ops.inplace import write_streaming_rows

        return write_streaming_rows(
            k_sink, v_sink, k_ring, v_ring, k_new, v_new, start, sink_size
        )
    assert start.ndim == 0, "ragged streaming prefill writes unsupported"
    # Sink region: single dynamic_update_slice at min(start, sink). If the
    # chunk is entirely past the sink, it lands in the overflow pad (slots
    # >= sink are never visible).
    sink_off = jnp.minimum(start, sink_size)
    k_sink = jax.lax.dynamic_update_slice(k_sink, k_new, (0, 0, sink_off, 0))
    v_sink = jax.lax.dynamic_update_slice(v_sink, v_new, (0, 0, sink_off, 0))

    idx = (start + jnp.arange(S, dtype=jnp.int32)) % R  # [S]
    k_ring = k_ring.at[:, :, idx].set(k_new)
    v_ring = v_ring.at[:, :, idx].set(v_new)
    return k_sink, v_sink, k_ring, v_ring


# ---------------------------------------------------------------------------
# Mask builders (position arithmetic; shared by jnp path and Pallas kernels)
# ---------------------------------------------------------------------------


def ring_slot_positions(R: int, total_after) -> jnp.ndarray:
    """Global position of the latest token written at each ring slot.

    slot s holds token g = largest g ≡ s (mod R) with g < total_after.
    Slots never written get negative g (masked out downstream).
    total_after: scalar or [B]. Returns [R] (or [B, R]) int32.
    """
    s = jnp.arange(R, dtype=jnp.int32)
    t = jnp.asarray(total_after, jnp.int32)[..., None]  # [.., 1]
    return t - 1 - ((t - 1 - s) % R)


def full_mask(q_positions: jnp.ndarray, buf_len: int) -> jnp.ndarray:
    """Full-head mask: query attends slot j iff j <= qpos.

    q_positions: [S] or [B, S] -> [S, buf_len] or [B, S, buf_len] bool."""
    j = jnp.arange(buf_len, dtype=jnp.int32)
    return j <= q_positions[..., None]


def sink_mask(q_positions: jnp.ndarray, buf_len: int, sink_size: int) -> jnp.ndarray:
    """Mask over the sink buffer (slot s holds token s); shapes as full_mask."""
    s = jnp.arange(buf_len, dtype=jnp.int32)
    return (s < sink_size) & (s <= q_positions[..., None])


def ring_mask(
    q_positions: jnp.ndarray,
    R: int,
    total_after,
    chunk_start,
    sink_size: int,
    recent_size: int,
) -> jnp.ndarray:
    """Mask over the ring buffer; [S, R] or [B, S, R] for batched inputs.

    Visible iff the slot's token position g satisfies:
      g >= sink (sink tokens live in the sink region — dedupe),
      g >= chunk_start - recent (the window as of chunk start),
      g <= qpos (causal), and g >= 0 (slot written).
    """
    g = ring_slot_positions(R, total_after)  # [.., R]
    g = g[..., None, :]  # [.., 1, R]
    qp = q_positions[..., :, None]  # [.., S, 1]
    window_lo = jnp.maximum(jnp.asarray(chunk_start) - recent_size, 0)
    window_lo = window_lo[..., None, None] if window_lo.ndim else window_lo
    return (g >= sink_size) & (g >= window_lo) & (g <= qp) & (g >= 0)


def kv_memory_bytes(cache) -> int:
    """KV-cache byte accountant (reference: static_kv_cache.py:299-315)."""
    total = 0
    for field in cache._fields:
        bufs = getattr(cache, field)
        if not isinstance(bufs, tuple):
            continue
        for arr in bufs:
            total += arr.size * arr.dtype.itemsize
    return total


# ---------------------------------------------------------------------------
# INT4-quantized variant (W8A8KV4 serving path)
# ---------------------------------------------------------------------------


class DuoCacheQ4(NamedTuple):
    """Like DuoCache but the full-head cache is INT4-packed.

    Counterpart of DuoAttentionStaticINT4KVCache (demo/int4_kv.py:115-492).
    The streaming (sink+ring) caches stay bf16: they are O(sink+recent)
    per layer, so quantizing them saves ~nothing while the full cache —
    the component that scales with context — drops 4x.

    Storage is TOKEN-PAIRED so every buffer is TPU tile-aligned with zero
    padding (ops/quant.py layout note; [T, 64]-shaped u8 would physically
    double in HBM):
    k/v_full_q: [B, Hf_l, max_size//2, D] uint8 — row r holds the packed
        nibbles of tokens 2r and 2r+1 (64 bytes each)
    k/v_full_s: [B, 8*Hf_l, max_size//2] bf16 — per head h, rows
        8h..8h+3 are (scale_even, scale_odd, zp_even, zp_odd); rows
        8h+4..8h+7 are padding (Mosaic requires 8-aligned sublane blocks)
    """

    k_full_q: Tuple[jnp.ndarray, ...]
    v_full_q: Tuple[jnp.ndarray, ...]
    k_full_s: Tuple[jnp.ndarray, ...]
    v_full_s: Tuple[jnp.ndarray, ...]
    k_sink: Tuple[jnp.ndarray, ...]
    v_sink: Tuple[jnp.ndarray, ...]
    k_ring: Tuple[jnp.ndarray, ...]
    v_ring: Tuple[jnp.ndarray, ...]
    length: jnp.ndarray


def _init_streaming_bufs(cfg, duo, batch_size, dtype, decode_only=False):
    R = ring_capacity(duo, decode_only)
    Ts = sink_rows(duo, decode_only)
    D = cfg.head_dim
    k_sink, v_sink, k_ring, v_ring = [], [], [], []
    for hf in duo.num_full_kv_heads:
        hs = cfg.num_kv_heads - hf
        k_sink.append(jnp.zeros((batch_size, hs, Ts, D), dtype))
        v_sink.append(jnp.zeros((batch_size, hs, Ts, D), dtype))
        k_ring.append(jnp.zeros((batch_size, hs, R, D), dtype))
        v_ring.append(jnp.zeros((batch_size, hs, R, D), dtype))
    return tuple(k_sink), tuple(v_sink), tuple(k_ring), tuple(v_ring)


def init_cache_q4(
    cfg: ModelConfig, duo: DuoConfig, batch_size: int, dtype=jnp.bfloat16,
    decode_only: bool = False,
) -> DuoCacheQ4:
    """Allocates only the INT4 buffers for full heads — never the bf16
    full cache (a 128k x 32-layer bf16 cache would not even fit a 16 GB
    chip, which is the point of this variant)."""
    assert cfg.head_dim % 2 == 0
    assert duo.max_cache_size % 128 == 0, "round max_cache_size up to x128"
    T = duo.max_cache_size
    D = cfg.head_dim
    kq, vq, ks, vs = [], [], [], []
    for hf in duo.num_full_kv_heads:
        kq.append(jnp.zeros((batch_size, hf, T // 2, D), jnp.uint8))
        vq.append(jnp.zeros((batch_size, hf, T // 2, D), jnp.uint8))
        ks.append(jnp.zeros((batch_size, 8 * hf, T // 2), jnp.bfloat16))
        vs.append(jnp.zeros((batch_size, 8 * hf, T // 2), jnp.bfloat16))
    k_sink, v_sink, k_ring, v_ring = _init_streaming_bufs(
        cfg, duo, batch_size, dtype, decode_only
    )
    return DuoCacheQ4(
        k_full_q=tuple(kq),
        v_full_q=tuple(vq),
        k_full_s=tuple(ks),
        v_full_s=tuple(vs),
        k_sink=k_sink,
        v_sink=v_sink,
        k_ring=k_ring,
        v_ring=v_ring,
        length=jnp.zeros((), jnp.int32),
    )


def write_full_q4(buf_q, buf_s, incoming, start):
    """Quantize incoming [B, Hf, S, D] and append at ``start``.

    Token-paired layout (ops/quant.py): S > 1 writes require an even
    ``start`` (true for chunked prefill — chunk sizes are even and a
    fresh prefill starts at 0); decode (S == 1) writes one token into its
    half-row at any parity. start: scalar or per-sequence [B] vector
    (vector only for S == 1, the serving decode path).
    """
    from .ops.quant import quantize_int4_nibbles, quantize_int4_paired

    B, H, S, D = incoming.shape
    T2 = buf_q.shape[2]
    start = jnp.asarray(start)

    if S == 1:
        # Nibble-interleaved pairs: the token shares each byte of its row
        # with its pair partner — an in-place Pallas RMW of the row's
        # nibble and scale columns. An XLA dus/scatter here forces
        # whole-buffer layout-conversion copies every decode step
        # (profiled: 33 ms/step = 62% of 131k decode; see ops/inplace.py).
        from .ops.inplace import write_q4_token

        nib, scales = quantize_int4_nibbles(incoming)  # [B,H,1,D], [B,H,2,1]
        bq, bs8 = write_q4_token(
            buf_q, buf_s.reshape(B, H, 8, T2),
            nib, scales.astype(buf_s.dtype), start,
        )
        return bq, bs8.reshape(B, 8 * H, T2)

    assert start.ndim == 0, "batched ragged q4 prefill writes unsupported"
    packed2, scales4 = quantize_int4_paired(incoming)
    # [B,H,S/2,D], [B,H,4,S/2]
    buf_q = jax.lax.dynamic_update_slice(
        buf_q, packed2, (0, 0, start // 2, 0)
    )
    bs8 = buf_s.reshape(B, H, 8, T2)
    bs8 = jax.lax.dynamic_update_slice(
        bs8, scales4.astype(bs8.dtype), (0, 0, 0, start // 2)
    )
    return buf_q, bs8.reshape(B, 8 * H, T2)
