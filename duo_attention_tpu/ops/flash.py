"""Fused Pallas attention kernels for the duo split KV cache.

TPU-native replacement for the reference's external CUDA attention stack
(flash-attn, Block-Sparse-Attention, FlashInfer — SURVEY.md §2.5 items 2-4).
Four entry points, all flash-style online-softmax kernels over the
statically-shaped cache buffers of cache.DuoCache:

* full-head chunk attention   (prefill; causal over [cache | incoming])
* full-head decode attention  (one token vs. the live cache prefix)
* streaming chunk attention   (sink buffer + position-ring buffer)
* streaming decode attention  (visits only sink + window blocks)

Design points:
- Scalar-prefetched ``cache length`` drives both the in-kernel masks and
  the BlockSpec index maps: blocks beyond the live prefix are clamped to
  the last needed block, so their DMA is elided (same-index fetch reuse),
  and their compute is skipped with @pl.when. The grid is additionally
  bounded by a static ``bucket`` chosen by the engine (power-of-2 of the
  live length), so even the grid overhead scales with the true context.
- The streaming kernels read the ring buffer directly; visibility is pure
  position arithmetic (see cache.py docstring), so there is no compress
  copy anywhere — the reference moves sink+recent data after every chunk
  (duo_attn/patch/static_kv_cache.py:127-167).
- GQA: the kernel grid walks query heads; K/V index maps point grouped
  query heads at their shared KV head, and consecutive grid steps with the
  same KV block reuse the fetched buffer. Decode packs the G query heads
  of one KV head as matmul rows instead.

Masks follow ops/attention_ref.py exactly; equivalence is unit-tested
against it (tests/test_flash.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_block(n: int, prefer=(512, 256, 128)) -> int:
    for b in prefer:
        if n % b == 0:
            return b
    return n


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _bcast_rows(col: jnp.ndarray, n: int) -> jnp.ndarray:
    """Broadcast a [rows, 1] column across n lanes."""
    return jax.lax.broadcast_in_dim(col, (col.shape[0], n), (0, 1))


class _OnlineSoftmax:
    """Shared online-softmax accumulation over one (rows, bk) score tile."""

    def __init__(self, m_scr, l_scr, acc_scr, scale):
        self.m, self.l, self.acc = m_scr, l_scr, acc_scr
        self.scale = scale

    def init(self):
        self.m[...] = jnp.full_like(self.m, NEG_INF)
        self.l[...] = jnp.zeros_like(self.l)
        self.acc[...] = jnp.zeros_like(self.acc)

    def update(self, q, k, v, mask=None):
        """q: [rows, D]; k/v: [bk, D]; mask: [rows, bk] bool or None for a
        fully-visible block (skips the mask selects — the dominant interior
        case during long-context prefill)."""
        rows, D = q.shape
        # bf16 operands pin Precision.DEFAULT (lossless: inputs already
        # bf16, f32 accumulator) — ambient "highest" would stamp fp32
        # contract precision onto a bf16 lhs, which Mosaic rejects; f32
        # operands keep the ambient choice (see update_q4).
        prec = (jax.lax.Precision.DEFAULT
                if q.dtype == jnp.bfloat16 else None)
        # fold the softmax scale into q ([rows, D]) instead of scaling the
        # [rows, bk] score tile — one fewer full-tile VPU pass per block
        s = jax.lax.dot_general(
            (q * jnp.asarray(self.scale, q.dtype)), k,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=prec,
        )
        if mask is not None:
            s = jnp.where(mask, s, NEG_INF)

        m_prev = self.m[...]  # [rows, LANES]
        l_prev = self.l[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)  # [rows, 1]
        m_next = jnp.maximum(m_prev, _bcast_rows(m_curr, LANES))
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - _bcast_rows(m_next[:, :1], s.shape[1]))
        if mask is not None:
            # rows whose every column is masked contribute nothing
            p = jnp.where(mask, p, 0.0)
        l_next = alpha * l_prev + _bcast_rows(
            jnp.sum(p, axis=1, keepdims=True), LANES
        )
        self.m[...] = m_next
        self.l[...] = l_next
        self.acc[...] = self.acc[...] * alpha[:, :D] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.DEFAULT
                       if v.dtype == jnp.bfloat16 else None),
        )

    def update_q4(self, q, kp, ks, vp, vs, mask=None):
        """INT4 variant: all heavy math on the MXU in int8, dequantization
        folded into score/output rescaling.

        Token-paired storage (ops/quant.py layout note): kp/vp [bk//2, D]
        uint8 — byte (r, d) holds channel d of token 2r in its low nibble
        and of token 2r+1 in its high nibble; ks/vs [4, bk//2] =
        (scale_even, scale_odd, zp_even, zp_odd). The block is processed
        as [even tokens | odd tokens] column order — softmax is
        permutation-invariant, the caller's mask must use the matching eo
        column positions.

        Why int8: a VPU unpack (u8 -> i32 widen -> mask/shift -> bf16)
        touches every 4-bit value with 32-bit ops and leaves decode
        attention VPU-bound at ~15% of the HBM roofline (measured 19-26
        tok/s where bandwidth alone allows ~77). Instead the raw nibble
        planes go STRAIGHT to the MXU as int8 and the query/probability
        rows are quantized to int8 per row (the reference's own W8A8
        numeric contract, demo/w8a8kv4_llama.py):
          even plane: kp & 0x0F               (= even nibble, 0..15)
          odd  plane: (kp & 0xF0) ^ 0x80      (= 16*odd - 128 as int8)
        so  q8 . odd = ((q8 . odd_plane) + 128*rowsum(q8)) >> 4
        — two 1-byte VPU ops per plane, no shift-by-4 anywhere (Mosaic
        has no u8/i16 shifts), and the MXU runs at its 2x int8 rate.
        Dequant math: with K = Kq*s_t + z_t and q ~= q_sc * q8,
          scores[i,t] = q_sc*s_t*(q8_i . Kq_t) + z_t * sum_d(q_i,d)
          out = p_sc * (p8 @ Vq) + (p . z_t) * 1_D
        (cf. demo/int4_kv.py:373-436 — the reference dequantizes to fp16
        buffers first; here no dequantized block is ever materialized).
        """
        rows, D = q.shape
        half = kp.shape[0]

        def nibble_planes(packed):
            # [bk//2, D] u8 -> (even, odd_biased) int8 planes, bit-exact:
            # even = nibble, odd_biased = 16*nibble - 128.
            return (
                jax.lax.bitcast_convert_type(packed & 0x0F, jnp.int8),
                jax.lax.bitcast_convert_type((packed & 0xF0) ^ 0x80, jnp.int8),
            )

        def quant_rows(x):
            # [rows, n] f32 -> per-row symmetric int8 (+ scale column).
            amax = jnp.maximum(
                jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-30
            )
            x8 = jnp.round(x * (127.0 / amax)).astype(jnp.int8)
            return x8, amax * (1.0 / 127.0)

        def scale_row(s4, i):
            # Extract scale row i of [4, bk//2] as [1, bk//2] via a masked
            # reduction: a plain s4[i:i+1] slice carries a sublane offset
            # Mosaic cannot operate on directly.
            rid = jax.lax.broadcasted_iota(jnp.int32, s4.shape, 0)
            return jnp.sum(
                jnp.where(rid == i, s4.astype(jnp.float32), 0.0),
                axis=0,
                keepdims=True,
            )

        # Everything stays in even/odd HALVES ([rows, bk//2]) end to end —
        # no [rows, bk] concat copy, no lane slicing, and scale rows feed
        # their half directly. Online softmax is permutation-invariant
        # over KV positions; the caller's mask comes as (mask_e, mask_o).
        #
        # Mode split (static on the tile shape): with few query rows
        # (decode) the per-pair epilogue is negligible and the win is
        # feeding raw bytes to the MXU as int8; with many rows (prefill)
        # the kernel is VPU-bound on the per-pair elementwise chain
        # (profiled ~12 f32 ops/pair = 98% of chunked prefill), so the
        # planes are unpacked to bf16 ONCE per block (amortized over bq
        # rows) and p stays exact bf16 — no q/p quantization passes.
        prefill_mode = rows >= 128
        dims = (((1,), (1,)), ((), ()))
        # softmax scale folded into q ([rows, D]) — not the score tiles;
        # the k_zp term keeps working because rowsum is over the scaled q
        q = q * jnp.asarray(self.scale, q.dtype)
        qf = q.astype(jnp.float32)
        q_rowsum = jnp.sum(qf, axis=-1, keepdims=True)

        def unpack_bf16(packed):
            # u8 -> i32 widen -> two bf16 nibble planes (Mosaic has no u8
            # shifts/casts); ~4 VPU ops per byte, amortized over bq rows.
            p32 = packed.astype(jnp.int32)
            return (
                (p32 & 0xF).astype(q.dtype),
                ((p32 >> 4) & 0xF).astype(q.dtype),
            )

        # bf16 operands take Precision.DEFAULT explicitly: the inputs are
        # already bf16 (and the nibble planes are exact 4-bit values), so
        # DEFAULT loses nothing over the f32 accumulator — while an
        # ambient jax_default_matmul_precision of "highest" (set e.g. by
        # tests/conftest.py for CPU numerics) would stamp fp32 contract
        # precision onto a bf16 lhs, which Mosaic rejects ("Bad lhs
        # type"). f32 operands keep the ambient choice.
        bf16_prec = (jax.lax.Precision.DEFAULT
                     if q.dtype == jnp.bfloat16 else None)
        if prefill_mode:
            ke, ko = unpack_bf16(kp)
            s_e = jax.lax.dot_general(
                q, ke, dims, preferred_element_type=jnp.float32,
                precision=bf16_prec,
            ) * scale_row(ks, 0) + q_rowsum * scale_row(ks, 2)
            s_o = jax.lax.dot_general(
                q, ko, dims, preferred_element_type=jnp.float32,
                precision=bf16_prec,
            ) * scale_row(ks, 1) + q_rowsum * scale_row(ks, 3)
        else:
            ke8, ko8 = nibble_planes(kp)  # each [bk//2, D] int8
            q8, q_sc = quant_rows(qf)
            q8_rowsum = jnp.sum(q8.astype(jnp.int32), axis=-1, keepdims=True)
            # precision pinned: an ambient jax_default_matmul_precision of
            # "highest" would stamp fp32 contract precision onto these
            # int8 MXU matmuls, which Mosaic rejects ("Bad lhs type")
            me = jax.lax.dot_general(
                q8, ke8, dims, preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT,
            )
            mo = jax.lax.dot_general(
                q8, ko8, dims, preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT,
            )
            s_e = me.astype(jnp.float32) * (q_sc * scale_row(ks, 0)) \
                + q_rowsum * scale_row(ks, 2)
            s_o = ((mo + 128 * q8_rowsum) >> 4).astype(jnp.float32) \
                * (q_sc * scale_row(ks, 1)) + q_rowsum * scale_row(ks, 3)
        if mask is not None:
            mask_e, mask_o = mask
            s_e = jnp.where(mask_e, s_e, NEG_INF)
            s_o = jnp.where(mask_o, s_o, NEG_INF)

        m_prev = self.m[...]
        l_prev = self.l[...]
        m_curr = jnp.maximum(
            jnp.max(s_e, axis=1, keepdims=True),
            jnp.max(s_o, axis=1, keepdims=True),
        )
        m_next = jnp.maximum(m_prev, _bcast_rows(m_curr, LANES))
        alpha = jnp.exp(m_prev - m_next)
        mcol = _bcast_rows(m_next[:, :1], half)
        p_e = jnp.exp(s_e - mcol)
        p_o = jnp.exp(s_o - mcol)
        if mask is not None:
            # rows whose every column is masked contribute nothing
            p_e = jnp.where(mask_e, p_e, 0.0)
            p_o = jnp.where(mask_o, p_o, 0.0)
        l_next = alpha * l_prev + _bcast_rows(
            jnp.sum(p_e, axis=1, keepdims=True)
            + jnp.sum(p_o, axis=1, keepdims=True),
            LANES,
        )
        self.m[...] = m_next
        self.l[...] = l_next

        ps_e = p_e * scale_row(vs, 0)
        ps_o = p_o * scale_row(vs, 1)
        if prefill_mode:
            ve, vo = unpack_bf16(vp)
            contrib = jax.lax.dot(
                ps_e.astype(q.dtype), ve, preferred_element_type=jnp.float32,
                precision=bf16_prec,
            ) + jax.lax.dot(
                ps_o.astype(q.dtype), vo, preferred_element_type=jnp.float32,
                precision=bf16_prec,
            )
        else:
            ve8, vo8 = nibble_planes(vp)

            def half_pv(ps, v8, odd):
                # Two-digit int8 quantization of the probability rows: a
                # single int8 digit rounds every p at the block-max
                # granularity and the error accumulates ~sqrt(T) over
                # tokens — the residual digit drops it ~250x for one more
                # (HBM-free) MXU matmul per half.
                def one(x8, x_sc):
                    c = jax.lax.dot(
                        x8, v8, preferred_element_type=jnp.int32,
                        precision=jax.lax.Precision.DEFAULT,
                    )
                    if odd:
                        rs = jnp.sum(
                            x8.astype(jnp.int32), axis=-1, keepdims=True
                        )
                        c = (c + 128 * rs) >> 4
                    return c.astype(jnp.float32) * x_sc

                x8, x_sc = quant_rows(ps)
                r8, r_sc = quant_rows(ps - x8.astype(jnp.float32) * x_sc)
                return one(x8, x_sc) + one(r8, r_sc)

            contrib = half_pv(ps_e, ve8, False) + half_pv(ps_o, vo8, True)
        zp_term = jnp.sum(
            p_e * scale_row(vs, 2), axis=1, keepdims=True
        ) + jnp.sum(p_o * scale_row(vs, 3), axis=1, keepdims=True)
        self.acc[...] = self.acc[...] * alpha[:, :D] + contrib + zp_term

    def finalize(self, o_ref):
        D = self.acc.shape[-1]
        l = self.l[...][:, :D]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[...] = (self.acc[...] / l).astype(o_ref.dtype).reshape(o_ref.shape)


# ---------------------------------------------------------------------------
# Full-head attention (causal over [cache | incoming])
# ---------------------------------------------------------------------------


def _full_prefill_kernel(
    cs_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, bq, bk, n_kv, scale
):
    i, j = pl.program_id(2), pl.program_id(3)
    cs = cs_ref[pl.program_id(0)]  # per-sequence cache length
    osm = _OnlineSoftmax(m_scr, l_scr, acc_scr, scale)

    @pl.when(j == 0)
    def _():
        osm.init()

    qpos_hi = cs + (i + 1) * bq - 1  # highest query position in this tile
    qpos_lo = cs + i * bq  # lowest
    col_hi = (j + 1) * bk - 1

    # Fully-visible interior block: no mask needed (dominant case).
    @pl.when(col_hi <= qpos_lo)
    def _():
        osm.update(q_ref[0, 0], k_ref[0, 0], v_ref[0, 0])

    # Diagonal/partial block: causal mask.
    @pl.when(jnp.logical_and(col_hi > qpos_lo, j * bk <= qpos_hi))
    def _():
        rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + j * bk
        mask = cols <= qpos_lo + rows
        osm.update(q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], mask)

    @pl.when(j == n_kv - 1)
    def _():
        osm.finalize(o_ref)


def _full_decode_kernel(
    cs_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, g, bk, n_kv, scale
):
    j = pl.program_id(2)
    cs = cs_ref[pl.program_id(0)]  # per-sequence cache length
    osm = _OnlineSoftmax(m_scr, l_scr, acc_scr, scale)

    @pl.when(j == 0)
    def _():
        osm.init()

    @pl.when(j * bk <= cs)
    def _():
        q = q_ref[0, 0]  # [G, D]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        cols = jax.lax.broadcasted_iota(jnp.int32, (g, bk), 1) + j * bk
        mask = cols <= cs
        osm.update(q, k, v, mask)

    @pl.when(j == n_kv - 1)
    def _():
        osm.finalize(o_ref)


def full_cache_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    cs,
    *,
    bucket: int = 0,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
) -> jnp.ndarray:
    """Attention of incoming chunk queries over the full-head cache.

    q: [B, S, Hq, D] (post-RoPE); k/v: [B, Hkv, T, D] cache buffers that
    already contain the incoming chunk at [cs, cs+S). cs: traced scalar or
    per-sequence [B] vector (continuous batching: every sequence has its
    own live length). bucket: static bound (>= max(cs)+S at runtime)
    limiting the kernel grid; 0 means the whole buffer. Semantics ==
    ops.attention_ref mask ``col <= qpos`` (cached tokens + causal
    incoming). Returns [B, S, Hq, D].
    """
    B, S, Hq, D = q.shape
    _, Hkv, T, _ = k.shape
    G = Hq // Hkv
    scale = 1.0 / (D**0.5)
    cs = jnp.broadcast_to(jnp.asarray(cs, jnp.int32).reshape(-1), (B,))

    if S == 1:
        # Decode is HBM-bound: large KV blocks amortize per-step pipeline
        # overhead (measured on v5e: 2048 reaches ~peak marginal bandwidth
        # vs ~60% at 512; compute per block is trivial at rows=G).
        bk = block_k or _pick_block(T, (2048, 1024, 512, 256, 128))
        span = T if bucket == 0 else min(_round_up(bucket, bk), T)
        n_kv = max(span // bk, 1)
        qg = q.reshape(B, Hkv, G, D)
        grid = (B, Hkv, n_kv)

        def k_idx(b, h, j, cs_ref):
            return (b, h, jnp.minimum(j, cs_ref[b] // bk), 0)

        out = pl.pallas_call(
            functools.partial(
                _full_decode_kernel, g=G, bk=bk, n_kv=n_kv, scale=scale
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, 1, G, D), lambda b, h, j, c: (b, h, 0, 0)),
                    pl.BlockSpec((1, 1, bk, D), k_idx),
                    pl.BlockSpec((1, 1, bk, D), k_idx),
                ],
                out_specs=pl.BlockSpec((1, 1, G, D), lambda b, h, j, c: (b, h, 0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((G, LANES), jnp.float32),
                    pltpu.VMEM((G, LANES), jnp.float32),
                    pltpu.VMEM((G, D), jnp.float32),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=_interpret(),
        )(cs, qg, k, v)
        return out.reshape(B, 1, Hq, D)

    # Large tiles amortize per-grid-step overhead (measured: 1024/2048
    # is 1.48x over 512/512 at 196k ctx; 2048/2048 exceeds scoped VMEM).
    bq = block_q or _pick_block(S, (1024, 512, 256, 128))
    bk = block_k or _pick_block(T, (2048, 1024, 512, 256, 128))
    span = T if bucket == 0 else min(_round_up(bucket, bk), T)
    n_kv = max(span // bk, 1)
    n_q = S // bq
    qt = q.transpose(0, 2, 1, 3)  # [B, Hq, S, D]
    grid = (B, Hq, n_q, n_kv)

    def kv_idx(b, h, i, j, cs_ref):
        last = jnp.maximum(cs_ref[b] + (i + 1) * bq - 1, 0) // bk
        return (b, h // G, jnp.minimum(j, jnp.minimum(last, n_kv - 1)), 0)

    out = pl.pallas_call(
        functools.partial(
            _full_prefill_kernel, bq=bq, bk=bk, n_kv=n_kv, scale=scale
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j, c: (b, h, i, 0)),
                pl.BlockSpec((1, 1, bk, D), kv_idx),
                pl.BlockSpec((1, 1, bk, D), kv_idx),
            ],
            out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j, c: (b, h, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((bq, LANES), jnp.float32),
                pltpu.VMEM((bq, LANES), jnp.float32),
                pltpu.VMEM((bq, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, S, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(cs, qt, k, v)
    return out.transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Full-head attention over an INT4-quantized cache
# ---------------------------------------------------------------------------


def _eo_cols(rows: int, bk: int, base):
    """Column positions for a token-paired block as (even, odd) halves,
    each [rows, bk//2] — the layout update_q4 consumes (ops/quant.py)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (rows, bk // 2), 1)
    cols_e = base + 2 * ii
    return cols_e, cols_e + 1


def _full_prefill_q4_kernel(
    cs_ref, q_ref, kp_ref, ks_ref, vp_ref, vs_ref, o_ref,
    m_scr, l_scr, acc_scr, *, bq, bk, n_kv, scale, g
):
    # Each head owns an 8-row scale group (Mosaic sublane alignment);
    # rows 0-3 are (scale_even, scale_odd, zp_even, zp_odd).
    del g
    i, j = pl.program_id(2), pl.program_id(3)
    cs = cs_ref[pl.program_id(0)]
    ks = ks_ref[0, 0:4]
    vs = vs_ref[0, 0:4]
    osm = _OnlineSoftmax(m_scr, l_scr, acc_scr, scale)

    @pl.when(j == 0)
    def _():
        osm.init()

    qpos_hi = cs + (i + 1) * bq - 1
    qpos_lo = cs + i * bq
    col_hi = (j + 1) * bk - 1

    @pl.when(col_hi <= qpos_lo)
    def _():
        osm.update_q4(q_ref[0, 0], kp_ref[0, 0], ks, vp_ref[0, 0], vs)

    @pl.when(jnp.logical_and(col_hi > qpos_lo, j * bk <= qpos_hi))
    def _():
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (bq, bk // 2), 0)
        cols_e, cols_o = _eo_cols(bq, bk, j * bk)
        mask = (cols_e <= qpos_lo + rows_i, cols_o <= qpos_lo + rows_i)
        osm.update_q4(q_ref[0, 0], kp_ref[0, 0], ks, vp_ref[0, 0], vs, mask)

    @pl.when(j == n_kv - 1)
    def _():
        osm.finalize(o_ref)


def _full_decode_q4_kernel(
    cs_ref, q_ref, kp_ref, ks_ref, vp_ref, vs_ref, o_ref,
    m_scr, l_scr, acc_scr, *, g, bk, n_kv, scale
):
    j = pl.program_id(2)
    cs = cs_ref[pl.program_id(0)]
    ks = ks_ref[0, 0:4]
    vs = vs_ref[0, 0:4]
    osm = _OnlineSoftmax(m_scr, l_scr, acc_scr, scale)

    @pl.when(j == 0)
    def _():
        osm.init()

    @pl.when(j * bk <= cs)
    def _():
        cols_e, cols_o = _eo_cols(g, bk, j * bk)
        mask = (cols_e <= cs, cols_o <= cs)
        osm.update_q4(q_ref[0, 0], kp_ref[0, 0], ks, vp_ref[0, 0], vs, mask)

    @pl.when(j == n_kv - 1)
    def _():
        osm.finalize(o_ref)


def full_cache_attention_q4(
    q: jnp.ndarray,
    k_packed: jnp.ndarray,
    k_scales: jnp.ndarray,
    v_packed: jnp.ndarray,
    v_scales: jnp.ndarray,
    cs,
    *,
    bucket: int = 0,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
) -> jnp.ndarray:
    """INT4-KV version of full_cache_attention; dequant fused in-kernel.

    Token-paired tile-native storage (ops/quant.py layout note):
    q: [B, S, Hq, D]; k/v_packed: [B, Hkv, T//2, D] uint8;
    k/v_scales: [B, 8*Hkv, T//2] (per head an 8-row group: rows 0-3 =
    scale_even, scale_odd, zp_even, zp_odd; rows 4-7 pad).
    """
    B, S, Hq, D = q.shape
    _, Hkv, T2, _ = k_packed.shape
    T = T2 * 2
    G = Hq // Hkv
    scale = 1.0 / (D**0.5)
    cs = jnp.broadcast_to(jnp.asarray(cs, jnp.int32).reshape(-1), (B,))

    if S == 1:
        # Decode reads want the biggest blocks that divide the buffer:
        # marginal bandwidth keeps climbing with DMA size (measured 233
        # GB/s @2048-token blocks, 367 @8192, 450 @32768 — packed pairs
        # are bk/2 bytes per token-row). Capped by the live bucket so a
        # short-context decode doesn't fetch a huge mostly-masked block.
        cap = max(_round_up(bucket, 2048), 2048) if bucket else T
        prefer = [
            b
            for b in (32768, 16384, 8192, 4096, 2048, 1024, 512, 256, 128)
            if b <= cap
        ]
        bk = block_k or _pick_block(T, tuple(prefer) or (2048,))
        span = T if bucket == 0 else min(_round_up(bucket, bk), T)
        n_kv = max(span // bk, 1)
        qg = q.reshape(B, Hkv, G, D)
        grid = (B, Hkv, n_kv)

        def kv_idx(b, h, j, c):
            return (b, h, jnp.minimum(j, c[b] // bk), 0)

        def sc_idx(b, h, j, c):
            return (b, h, jnp.minimum(j, c[b] // bk))

        out = pl.pallas_call(
            functools.partial(
                _full_decode_q4_kernel, g=G, bk=bk, n_kv=n_kv, scale=scale
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, 1, G, D), lambda b, h, j, c: (b, h, 0, 0)),
                    pl.BlockSpec((1, 1, bk // 2, D), kv_idx),
                    pl.BlockSpec((1, 8, bk // 2), sc_idx),
                    pl.BlockSpec((1, 1, bk // 2, D), kv_idx),
                    pl.BlockSpec((1, 8, bk // 2), sc_idx),
                ],
                out_specs=pl.BlockSpec((1, 1, G, D), lambda b, h, j, c: (b, h, 0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((G, LANES), jnp.float32),
                    pltpu.VMEM((G, LANES), jnp.float32),
                    pltpu.VMEM((G, D), jnp.float32),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=_interpret(),
        )(cs, qg, k_packed, k_scales, v_packed, v_scales)
        return out.reshape(B, 1, Hq, D)

    # Large tiles amortize per-grid-step overhead (measured: 1024/2048
    # is 1.48x over 512/512 at 196k ctx; 2048/2048 exceeds scoped VMEM).
    bq = block_q or _pick_block(S, (1024, 512, 256, 128))
    bk = block_k or _pick_block(T, (2048, 1024, 512, 256, 128))
    span = T if bucket == 0 else min(_round_up(bucket, bk), T)
    n_kv = max(span // bk, 1)
    n_q = S // bq
    qt = q.transpose(0, 2, 1, 3)
    grid = (B, Hq, n_q, n_kv)

    def kv_idx(b, h, i, j, c):
        last = jnp.maximum(c[b] + (i + 1) * bq - 1, 0) // bk
        return (b, h // G, jnp.minimum(j, jnp.minimum(last, n_kv - 1)), 0)

    def sc_idx(b, h, i, j, c):
        last = jnp.maximum(c[b] + (i + 1) * bq - 1, 0) // bk
        return (b, h // G, jnp.minimum(j, jnp.minimum(last, n_kv - 1)))

    out = pl.pallas_call(
        functools.partial(
            _full_prefill_q4_kernel, bq=bq, bk=bk, n_kv=n_kv, scale=scale, g=G
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j, c: (b, h, i, 0)),
                pl.BlockSpec((1, 1, bk // 2, D), kv_idx),
                pl.BlockSpec((1, 8, bk // 2), sc_idx),
                pl.BlockSpec((1, 1, bk // 2, D), kv_idx),
                pl.BlockSpec((1, 8, bk // 2), sc_idx),
            ],
            out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j, c: (b, h, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((bq, LANES), jnp.float32),
                pltpu.VMEM((bq, LANES), jnp.float32),
                pltpu.VMEM((bq, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, S, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(cs, qt, k_packed, k_scales, v_packed, v_scales)
    return out.transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Streaming-head attention (sink buffer + ring buffer)
# ---------------------------------------------------------------------------


def _stream_masks(slot_or_pos, qpos, *, region, cs, t, R, sink, recent):
    """Visibility per cache.py: sink region by slot; ring region by the
    position-arithmetic g formula."""
    if region == "sink":
        slot = slot_or_pos
        return (slot < sink) & (slot <= qpos)
    g = t - 1 - ((t - 1 - slot_or_pos) % R)
    window_lo = jnp.maximum(cs - recent, 0)
    return (g >= sink) & (g >= window_lo) & (g <= qpos) & (g >= 0)


def _stream_kernel(
    sc_ref, q_ref, ks_ref, vs_ref, kr_ref, vr_ref, o_ref,
    m_scr, l_scr, acc_scr,
    *, rows, bq, bks, bk, n_sink, n_vis, n_ring, R, sink, recent, scale, decode,
):
    """Grid minor dim j walks n_sink sink blocks then n_vis ring blocks.

    For decode (rows = G query heads of one KV head), ring blocks are a
    window starting at base = floor(window_lo/bk) mod n_ring; for prefill
    (rows = bq query positions) every ring block is visited. Sink blocks
    have their own width bks (the sink buffer can be smaller than a ring
    block).
    """
    i, j = pl.program_id(2), pl.program_id(3)
    b = pl.program_id(0)
    cs, t = sc_ref[0, b], sc_ref[1, b]  # per-sequence (chunk_start, total)
    osm = _OnlineSoftmax(m_scr, l_scr, acc_scr, scale)

    @pl.when(j == 0)
    def _():
        osm.init()

    if decode:
        qpos = jnp.full((rows, 1), 0, jnp.int32) + cs
    else:
        qpos = (
            cs + i * bq + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        )

    @pl.when(j < n_sink)
    def _():
        slot = jax.lax.broadcasted_iota(jnp.int32, (rows, bks), 1) + j * bks
        mask = _stream_masks(
            slot, qpos, region="sink", cs=cs, t=t, R=R, sink=sink, recent=recent
        )
        osm.update(q_ref[0, 0], ks_ref[0, 0], vs_ref[0, 0], mask)

    @pl.when(j >= n_sink)
    def _():
        if decode:
            base = (jnp.maximum(cs - recent, 0) // bk) % n_ring
            blk = (base + (j - n_sink)) % n_ring
        else:
            blk = j - n_sink
        slot = jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 1) + blk * bk
        mask = _stream_masks(
            slot, qpos, region="ring", cs=cs, t=t, R=R, sink=sink, recent=recent
        )
        osm.update(q_ref[0, 0], kr_ref[0, 0], vr_ref[0, 0], mask)

    @pl.when(j == n_sink + n_vis - 1)
    def _():
        osm.finalize(o_ref)


def streaming_cache_attention(
    q: jnp.ndarray,
    k_sink: jnp.ndarray,
    v_sink: jnp.ndarray,
    k_ring: jnp.ndarray,
    v_ring: jnp.ndarray,
    cs,
    total_after,
    sink_size: int,
    recent_size: int,
    *,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
) -> jnp.ndarray:
    """Streaming-head attention over sink + ring buffers.

    q: [B, S, Hsq, D]; k/v_sink: [B, Hs, sink+C, D]; k/v_ring: [B, Hs, R, D].
    Buffers already contain the incoming chunk. cs/total_after: traced
    scalars or per-sequence [B] vectors (continuous batching). Decode
    (S==1) visits only ceil(recent/bk)+2 ring blocks; prefill visits all
    of them. Returns [B, S, Hsq, D].
    """
    B, S, Hsq, D = q.shape
    _, Hs, R, _ = k_ring.shape
    G = Hsq // Hs
    scale = 1.0 / (D**0.5)
    decode = S == 1

    bk = block_k or _pick_block(R)
    n_ring = R // bk
    # Sink blocks get their own width: big enough to cover [0, sink) but
    # never exceeding the sink buffer.
    Ts = k_sink.shape[2]
    if sink_size > 0:
        bks = min(max(_round_up(sink_size, 128), 128), Ts)
        n_sink = -(-sink_size // bks)
        assert n_sink * bks <= Ts, (
            f"sink buffer too small: {Ts} < {n_sink * bks}; "
            "prefill_chunk_size must be >= 128"
        )
    else:
        bks, n_sink = 128, 0

    scalars = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(cs, jnp.int32).reshape(-1), (B,)),
            jnp.broadcast_to(
                jnp.asarray(total_after, jnp.int32).reshape(-1), (B,)
            ),
        ]
    )  # [2, B]

    if decode:
        n_vis = min(recent_size // bk + 2, n_ring)
        rows = G
        qg = q.reshape(B, Hs, G, D)
        grid = (B, Hs, 1, n_sink + n_vis)

        def sink_idx(b, h, i, j, sc):
            return (b, h, jnp.minimum(j, max(n_sink - 1, 0)), 0)

        def ring_idx(b, h, i, j, sc):
            base = (jnp.maximum(sc[0, b] - recent_size, 0) // bk) % n_ring
            t = jnp.clip(j - n_sink, 0, n_vis - 1)
            return (b, h, (base + t) % n_ring, 0)

        q_spec = pl.BlockSpec((1, 1, G, D), lambda b, h, i, j, sc: (b, h, 0, 0))
        o_spec = pl.BlockSpec((1, 1, G, D), lambda b, h, i, j, sc: (b, h, 0, 0))
        out_shape = jax.ShapeDtypeStruct((B, Hs, G, D), q.dtype)
        q_in = qg
    else:
        bq = block_q or _pick_block(S, (256, 128))
        n_vis = n_ring
        rows = bq
        n_q = S // bq
        qt = q.transpose(0, 2, 1, 3)
        grid = (B, Hsq, n_q, n_sink + n_vis)

        def sink_idx(b, h, i, j, sc):
            return (b, h // G, jnp.minimum(j, max(n_sink - 1, 0)), 0)

        def ring_idx(b, h, i, j, sc):
            return (b, h // G, jnp.clip(j - n_sink, 0, n_ring - 1), 0)

        q_spec = pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j, sc: (b, h, i, 0))
        o_spec = pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j, sc: (b, h, i, 0))
        out_shape = jax.ShapeDtypeStruct((B, Hsq, S, D), q.dtype)
        q_in = qt

    out = pl.pallas_call(
        functools.partial(
            _stream_kernel,
            rows=rows,
            bq=(1 if decode else rows),
            bks=bks,
            bk=bk,
            n_sink=n_sink,
            n_vis=n_vis,
            n_ring=n_ring,
            R=R,
            sink=sink_size,
            recent=recent_size,
            scale=scale,
            decode=decode,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                q_spec,
                pl.BlockSpec((1, 1, bks, D), sink_idx),
                pl.BlockSpec((1, 1, bks, D), sink_idx),
                pl.BlockSpec((1, 1, bk, D), ring_idx),
                pl.BlockSpec((1, 1, bk, D), ring_idx),
            ],
            out_specs=o_spec,
            scratch_shapes=[
                pltpu.VMEM((rows, LANES), jnp.float32),
                pltpu.VMEM((rows, LANES), jnp.float32),
                pltpu.VMEM((rows, D), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(scalars, q_in, k_sink, v_sink, k_ring, v_ring)

    if decode:
        return out.reshape(B, 1, Hsq, D)
    return out.transpose(0, 2, 1, 3)
