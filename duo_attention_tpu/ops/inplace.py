"""In-place single-row cache writes as Pallas kernels.

Why kernels for a one-row write: the XLA alternative
(``dynamic_update_slice`` on the cache buffer inside the decode loop)
makes the buffer a joint consumer of two ops with *different* preferred
layouts — the Pallas attention kernels require the default descending
layout, while XLA's layout assignment gives the in-loop dus/slice a
transposed ``{3,1,2,0:T(4,128)}`` layout. XLA reconciles with
"data formatting" copies of the ENTIRE buffer, twice per step per layer
(profiled: 33 ms/step of copies at 131k ctx = 62% of decode latency,
u8[1,4,65536,128] reformatted every step). Writing the row inside a
Pallas kernel with ``input_output_aliases`` keeps every consumer of the
buffer a Mosaic custom call with one layout — zero copies, and the write
itself touches only one 8/32-row slab.

The reference hits the same problem class with HF's cat-based caches and
solves it with preallocated static buffers + in-place CUDA indexing
(static_kv_cache.py:127-167); this is the TPU/XLA equivalent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _as_vec(pos, B, limit=None):
    """Broadcast pos to [B]; clamp into [0, limit-1] when given.

    The clamp is a chip-fault guard: an out-of-range position would make
    the prefetch-computed block index address past the buffer and fault
    the TPU (FAILED_PRECONDITION on everything until reset). Overrun is
    still surfaced loudly — engine._decode_scan poisons its output when
    cache.length exceeds max_cache_size — but the write itself must
    never leave the buffer."""
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    if limit is not None:
        pos = jnp.clip(pos, 0, limit - 1)
    return pos


# ---------------------------------------------------------------------------
# bf16 (or any >=8-sublane-tile dtype) row write: buf[b, :, pos[b], :] = row
# ---------------------------------------------------------------------------


def _row_kernel(pos_ref, buf_ref, row_ref, o_ref):
    b = pl.program_id(0)
    sub = pos_ref[b] % 8
    old = buf_ref[0, 0]  # [8, D] slab around the target row
    new = row_ref[0, 0]
    sel = jax.lax.broadcasted_iota(jnp.int32, old.shape, 0) == sub
    o_ref[0, 0] = jnp.where(sel, new, old)


def write_row(buf: jnp.ndarray, row: jnp.ndarray, pos) -> jnp.ndarray:
    """buf [B, H, T, D] (T % 8 == 0); row [B, H, 1, D]; pos scalar or [B].

    Returns buf with row written at (b, :, pos[b], :), done in-place
    (the input buffer is donated to the output via aliasing).
    """
    B, H, T, D = buf.shape
    pos = _as_vec(pos, B, limit=T)
    row8 = jnp.broadcast_to(row, (B, H, 8, D))
    return pl.pallas_call(
        _row_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H),
            in_specs=[
                pl.BlockSpec((1, 1, 8, D), lambda b, h, p: (b, h, p[b] // 8, 0)),
                pl.BlockSpec((1, 1, 8, D), lambda b, h, p: (b, h, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, 8, D), lambda b, h, p: (b, h, p[b] // 8, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(buf.shape, buf.dtype),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )(pos, buf, row8)


# ---------------------------------------------------------------------------
# Streaming-head decode write: sink (at min(pos, sink)) + ring (at pos % R)
# ---------------------------------------------------------------------------


def _stream_kernel(pos_ref, ks_ref, vs_ref, kr_ref, vr_ref, krow_ref, vrow_ref,
                   os_k, os_v, or_k, or_v):
    b = pl.program_id(0)
    sink_sub = pos_ref[0, b] % 8
    ring_sub = pos_ref[1, b] % 8
    kn, vn = krow_ref[0, 0], vrow_ref[0, 0]
    rid = jax.lax.broadcasted_iota(jnp.int32, kn.shape, 0)
    os_k[0, 0] = jnp.where(rid == sink_sub, kn, ks_ref[0, 0])
    os_v[0, 0] = jnp.where(rid == sink_sub, vn, vs_ref[0, 0])
    or_k[0, 0] = jnp.where(rid == ring_sub, kn, kr_ref[0, 0])
    or_v[0, 0] = jnp.where(rid == ring_sub, vn, vr_ref[0, 0])


def write_streaming_rows(k_sink, v_sink, k_ring, v_ring, k_row, v_row,
                         start, sink_size: int):
    """Decode-step streaming write. k/v_row [B, Hs, 1, D]; start scalar/[B].

    Equivalent to two write_row calls per buffer pair but fused into one
    kernel launch: sink slot = min(start, sink) (past-sink tokens land in
    the invisible overflow pad), ring slot = start % R.
    """
    B, Hs, Ts, D = k_sink.shape
    R = k_ring.shape[2]
    start = _as_vec(start, B)
    sink_pos = jnp.minimum(start, sink_size)
    ring_pos = start % R
    pos = jnp.stack([sink_pos, ring_pos])  # [2, B]
    k8 = jnp.broadcast_to(k_row, (B, Hs, 8, D))
    v8 = jnp.broadcast_to(v_row, (B, Hs, 8, D))

    sink_spec = pl.BlockSpec((1, 1, 8, D), lambda b, h, p: (b, h, p[0, b] // 8, 0))
    ring_spec = pl.BlockSpec((1, 1, 8, D), lambda b, h, p: (b, h, p[1, b] // 8, 0))
    row_spec = pl.BlockSpec((1, 1, 8, D), lambda b, h, p: (b, h, 0, 0))
    shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype)
              for x in (k_sink, v_sink, k_ring, v_ring)]
    return pl.pallas_call(
        _stream_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Hs),
            in_specs=[sink_spec, sink_spec, ring_spec, ring_spec,
                      row_spec, row_spec],
            out_specs=[sink_spec, sink_spec, ring_spec, ring_spec],
        ),
        out_shape=shapes,
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )(pos, k_sink, v_sink, k_ring, v_ring, k8, v8)


# ---------------------------------------------------------------------------
# INT4 token write: nibble RMW into the packed pair-row + scale columns
# ---------------------------------------------------------------------------


def _q4_kernel(t_ref, bq_ref, bs_ref, nib_ref, col_ref, o_q, o_s):
    b = pl.program_id(0)
    t = t_ref[b]
    par = t % 2
    t2 = t // 2
    # scalar select must stay i32 (Mosaic has no scalar i8 select); widen
    # to a full u8 vector afterwards
    keep32 = jnp.where(par == 0, 0xF0, 0x0F)
    keep = jnp.full(bq_ref[0, 0].shape, keep32, jnp.int32).astype(jnp.uint8)
    rid = jax.lax.broadcasted_iota(jnp.int32, bq_ref[0, 0].shape, 0)
    sel = rid == t2 % 32
    old = bq_ref[0, 0]
    # nib already shifted into the right half-byte outside the kernel
    o_q[0, 0] = jnp.where(sel, (old & keep) | nib_ref[0, 0], old)

    # scale columns: [8, 128] block; write rows {par, 2+par} at lane t2%128
    lane = jax.lax.broadcasted_iota(jnp.int32, bs_ref[0, 0].shape, 1)
    srow = jax.lax.broadcasted_iota(jnp.int32, bs_ref[0, 0].shape, 0)
    smask = ((srow == par) | (srow == 2 + par)) & (lane == t2 % 128)
    o_s[0, 0] = jnp.where(smask, col_ref[0, 0], bs_ref[0, 0])


def write_q4_token(bq, bs8, nib, sc, start):
    """Write one token into a nibble-interleaved INT4 pair buffer.

    bq [B, H, T2, D] uint8; bs8 [B, H, 8, T2] (rows 0-3 = scale_even,
    scale_odd, zp_even, zp_odd); nib [B, H, 1, D] uint8 nibbles in 0..15;
    sc [B, H, 2, 1] (scale, zero-point); start scalar or [B]. In-place
    RMW: even tokens own each byte's low nibble, odd the high
    (ops/quant.py layout note).
    """
    B, H, T2, D = bq.shape
    start = _as_vec(start, B, limit=2 * T2)
    par = (start % 2).reshape(B, 1, 1, 1)

    # place the nibble in its half-byte while still in XLA (Mosaic has no
    # u8 shifts); broadcast to the 32-sublane u8 slab
    nib = jnp.where(par == 0, nib, nib << 4).astype(jnp.uint8)
    nib = jnp.broadcast_to(nib, (B, H, 32, D))

    # desired scale-column values by row: row par = scale, row 2+par = zp
    r = jnp.arange(8).reshape(1, 1, 8, 1)
    scale, zp = sc[:, :, 0:1], sc[:, :, 1:2]  # [B,H,1,1]
    cols = jnp.where(r == par, scale, jnp.where(r == 2 + par, zp, 0.0))
    cols = jnp.broadcast_to(cols.astype(bs8.dtype), (B, H, 8, 128))

    qspec = pl.BlockSpec(
        (1, 1, 32, D), lambda b, h, t: (b, h, (t[b] // 2) // 32, 0)
    )
    nspec = pl.BlockSpec((1, 1, 32, D), lambda b, h, t: (b, h, 0, 0))
    sspec = pl.BlockSpec(
        (1, 1, 8, 128), lambda b, h, t: (b, h, 0, (t[b] // 2) // 128)
    )
    cspec = pl.BlockSpec((1, 1, 8, 128), lambda b, h, t: (b, h, 0, 0))
    return pl.pallas_call(
        _q4_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H),
            in_specs=[qspec, sspec, nspec, cspec],
            out_specs=[qspec, sspec],
        ),
        out_shape=[jax.ShapeDtypeStruct(bq.shape, bq.dtype),
                   jax.ShapeDtypeStruct(bs8.shape, bs8.dtype)],
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )(start, bq, bs8, nib, cols)
