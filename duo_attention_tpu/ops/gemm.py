"""Pallas W8A8 GEMM: int8 x int8 -> int32 on the MXU, scale epilogue fused.

Why a kernel when ``lax.dot_general`` already runs int8 on the MXU: XLA
materializes the int32 accumulator and the f32 scale product as HBM temps
between fusions — at prefill shapes ([8192, 14336] f32 ≈ 470 MB each,
several layers in flight) that alone blows a 16 GB chip (observed 19.6 GB
compile peak for the 32-layer 8B). Fusing the epilogue in-kernel writes
only the bf16 result, which is also the reference's QServe linear contract
(W8A8OF16LinearDynamicInputScale: int8 GEMM -> fp16 out with per-token
activation scale x per-channel weight scale, demo/w8a8kv4_llama.py:39-96).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick(n: int, prefer) -> int:
    for b in prefer:
        if n % b == 0:
            return b
    return n


def _w8a8_kernel(xq_ref, xs_ref, wq_ref, ws_ref, o_ref, acc_ref, *, n_k):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # precision pinned to DEFAULT: ambient "highest" matmul precision would
    # request fp32 contraction on int8 operands (Mosaic: "Bad lhs type")
    acc_ref[...] += jax.lax.dot_general(
        xq_ref[...], wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )

    @pl.when(k == n_k - 1)
    def _():
        out = acc_ref[...].astype(jnp.float32)
        out = out * xs_ref[...] * ws_ref[...]  # [bm,1] x [1,bn] broadcasts
        o_ref[...] = out.astype(o_ref.dtype)


def w8a8_matmul(
    xq: jnp.ndarray,
    x_scale: jnp.ndarray,
    wq: jnp.ndarray,
    w_scale: jnp.ndarray,
    out_dtype=jnp.bfloat16,
    block_m: Optional[int] = None,
    block_n: int = 512,
    block_k: int = 512,
) -> jnp.ndarray:
    """xq [M, K] int8, x_scale [M, 1] f32, wq [K, N] int8, w_scale [N] f32
    -> [M, N] out_dtype. Exact int32 accumulation (identical math to
    ops.quant.int8_matmul)."""
    M, K = xq.shape
    _, N = wq.shape
    bm = block_m or _pick(M, (512, 256, 128, 64, 32))
    bn = _pick(N, (block_n, 256, 128))
    bk = _pick(K, (block_k, 256, 128))
    n_k = K // bk
    grid = (M // bm, N // bn, n_k)

    return pl.pallas_call(
        functools.partial(_w8a8_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(xq, x_scale, wq, w_scale.reshape(1, N).astype(jnp.float32))
