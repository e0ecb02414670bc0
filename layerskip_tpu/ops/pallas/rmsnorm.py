"""Pallas TPU kernel: RMSNorm (optionally fused with residual add).

TPU-native counterpart of the RMSNorm the reference inherits from HF Llama
modules (applied per layer and as the shared final norm at every exit depth
— llama_model_utils.py:271-273). The fused variant computes
``rms_norm(x + residual)`` and also returns the new residual stream, saving
one HBM round-trip of the hidden states in the decoder-layer hot path.

fp32 statistics, output in the input dtype — same numerics as the jnp
implementation (layerskip_tpu/ops/rmsnorm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rmsnorm_kernel(x_ref, w_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    o_ref[:] = (
        x * jax.lax.rsqrt(var + eps) * w_ref[0].astype(jnp.float32)
    ).astype(o_ref.dtype)


def _rmsnorm_residual_kernel(x_ref, r_ref, w_ref, o_ref, new_r_ref, *, eps: float):
    h = x_ref[:].astype(jnp.float32) + r_ref[:].astype(jnp.float32)
    new_r_ref[:] = h.astype(new_r_ref.dtype)
    var = jnp.mean(h * h, axis=-1, keepdims=True)
    o_ref[:] = (
        h * jax.lax.rsqrt(var + eps) * w_ref[0].astype(jnp.float32)
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def rms_norm(
    x: jnp.ndarray,  # [..., D]
    weight: jnp.ndarray,  # [D]
    eps: float = 1e-5,
    *,
    block_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    shape = x.shape
    d = shape[-1]
    rows = 1
    for s in shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)
    bm = min(block_rows, rows)
    grid = (pl.cdiv(rows, bm),)
    out = pl.pallas_call(
        functools.partial(_rmsnorm_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        interpret=interpret,
    )(x2, weight.reshape(1, d))
    return out.reshape(shape)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def rms_norm_residual(
    x: jnp.ndarray,  # [..., D] sublayer output
    residual: jnp.ndarray,  # [..., D] residual stream
    weight: jnp.ndarray,  # [D]
    eps: float = 1e-5,
    *,
    block_rows: int = 256,
    interpret: bool = False,
):
    """Returns (rms_norm(x + residual) * weight, x + residual)."""
    shape = x.shape
    d = shape[-1]
    rows = 1
    for s in shape[:-1]:
        rows *= s
    bm = min(block_rows, rows)
    grid = (pl.cdiv(rows, bm),)
    out, new_r = pl.pallas_call(
        functools.partial(_rmsnorm_residual_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, d), x.dtype),
            jax.ShapeDtypeStruct((rows, d), x.dtype),
        ),
        interpret=interpret,
    )(x.reshape(rows, d), residual.reshape(rows, d), weight.reshape(1, d))
    return out.reshape(shape), new_r.reshape(shape)
