"""Pallas TPU kernel: int8 weight-only quantized matmul, per-channel scales.

No counterpart in the reference (pure fp16 torch); this is the TPU-native
analogue of the fused dequant-matmul CUDA kernels serving stacks rely on.
Weights are stored int8 with one fp32 scale per output channel
(``w ≈ w_q * scale[None, :]``); activations stay bf16/fp32. The kernel
accumulates x @ w_q in fp32 on the MXU over K-blocks and applies the column
scales once at the end — halving weight HBM traffic, which is what bounds
single-stream decode.

``quantize_weights`` is the symmetric per-channel quantizer used by
layerskip_tpu.quant to compress a whole LlamaParams tree.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weights(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[K, N] float -> ([K, N] int8, [N] fp32 scales), symmetric per-channel."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)  # [N]
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def _dot_precision(dtype) -> jax.lax.Precision:
    """MXU operand precision for the in-kernel dot.

    ``preferred_element_type=fp32`` only picks the ACCUMULATOR dtype; at the
    default precision the MXU truncates fp32 *operands* to one bf16 pass
    (measured on v5e: max_abs_err 0.13 vs a precision='highest' fp32 oracle
    at K=512 N(0,1) inputs — exactly bf16 operand rounding). bf16
    activations and int8->bf16 weights are exact in bf16, so production
    decode takes the fast single-pass path; fp32 callers (e.g. a quantized
    LM head fed fp32 hidden states) get the 3-pass bf16 emulation."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _qmm_kernel(
    x_ref, wq_ref, scale_ref, o_ref, acc_ref, *, k_blocks: int, k_total: int
):
    """Grid (M/bm, N/bn, K/bk); K is innermost and accumulates in VMEM."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # [bm, bk] activation dtype
    w = wq_ref[:].astype(x.dtype)  # [bk, bn] int8 -> activation dtype for MXU
    bk = x.shape[1]
    if k_total % bk:  # ragged K tail: zero padded columns/rows explicitly
        valid = k_total - kb * bk
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.where(col < valid, x, 0)
        row = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
        w = jnp.where(row < valid, w, 0)
    acc_ref[:] += jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(x.dtype),
    )

    @pl.when(kb == k_blocks - 1)
    def _():
        o_ref[:] = (acc_ref[:] * scale_ref[0].astype(jnp.float32)[None, :]).astype(
            o_ref.dtype
        )


def _qmm_t_kernel(
    x_ref, wq_ref, scale_ref, o_ref, acc_ref, *, k_blocks: int, k_total: int
):
    """Transposed-weight variant: w stored [N, K], contraction on K."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # [bm, bk]
    w = wq_ref[:].astype(x.dtype)  # [bn, bk]
    bk = x.shape[1]
    if k_total % bk:
        valid = k_total - kb * bk
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.where(col < valid, x, 0)
        wcol = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
        w = jnp.where(wcol < valid, w, 0)
    acc_ref[:] += jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(x.dtype),  # see _dot_precision
    )

    @pl.when(kb == k_blocks - 1)
    def _():
        o_ref[:] = (acc_ref[:] * scale_ref[0].astype(jnp.float32)[None, :]).astype(
            o_ref.dtype
        )


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "interpret")
)
def quant_matmul_t(
    x: jnp.ndarray,  # [M, K] bf16/fp32
    w_q: jnp.ndarray,  # [N, K] int8 (transposed storage)
    scale: jnp.ndarray,  # [N] fp32
    *,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x @ (w_q * scale)^T with fp32 accumulation; returns x.dtype."""
    m, k = x.shape
    n, k2 = w_q.shape
    assert k == k2 and scale.shape == (n,)
    bm, bn, bk = min(block_m, m), min(block_n, n), min(block_k, k)
    k_blocks = pl.cdiv(k, bk)
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), k_blocks)
    return pl.pallas_call(
        functools.partial(_qmm_t_kernel, k_blocks=k_blocks, k_total=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kb: (i, kb), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk), lambda i, j, kb: (j, kb), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kb: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, kb: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * x.dtype.itemsize + k * n + m * n * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, w_q, scale.reshape(1, -1))


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "interpret")
)
def quant_matmul(
    x: jnp.ndarray,  # [M, K] bf16/fp32
    w_q: jnp.ndarray,  # [K, N] int8
    scale: jnp.ndarray,  # [N] fp32
    *,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x @ (w_q * scale) with fp32 accumulation; returns x.dtype."""
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2 and scale.shape == (n,)
    bm, bn, bk = min(block_m, m), min(block_n, n), min(block_k, k)
    k_blocks = pl.cdiv(k, bk)
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), k_blocks)
    return pl.pallas_call(
        functools.partial(_qmm_kernel, k_blocks=k_blocks, k_total=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kb: (i, kb), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kb: (kb, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kb: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, kb: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * x.dtype.itemsize + k * n + m * n * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, w_q, scale.reshape(1, -1))
