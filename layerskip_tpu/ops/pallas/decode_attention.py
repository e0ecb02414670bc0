"""Pallas TPU kernel: fused GQA decode/verify attention over the KV cache.

The hot attention shapes of self-speculative decoding are *short-query*:
draft steps have T=1 and verification has T=W+1 (SURVEY §2.2-2.3), against a
long static KV buffer [S, Dh]. The XLA fallback
(layerskip_tpu/ops/attention.py) materializes fp32 scores in HBM between two
einsums; this kernel keeps Q*K^T, the masked softmax, and the PV product in
VMEM for one (batch, kv-head) grid cell — K/V are each read from HBM exactly
once, which is the bandwidth lower bound for attention.

Masking replaces the reference's dense additive mask tensors
(llama_model_utils.py:21-73): a key slot j is visible iff ``j <= q_pos``.
The [T*G, S] 0/1 mask is built outside the kernel (tiny: T*G < 64 rows) and
streamed in as int8 — Mosaic's vector layouts dislike 1D->3D reshapes of
scalar-prefetch values, so this is both simpler and more portable.

Layout: grid (B, Hkv); blocks q/out [T*G, Dh], k/v [S, Dh]. T*G is tiny,
S*Dh is ~1 MB at S=4096/bf16 — both fit VMEM comfortably, so a single-pass
(non-online) softmax is exact and cheapest.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale: float):
    q = q_ref[0, 0].astype(jnp.float32)  # [T*G, Dh]
    k = k_ref[0, 0]  # [S, Dh]

    scores = jax.lax.dot_general(
        q, k.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [T*G, S]
    scores = jnp.where(m_ref[0] != 0, scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jax.lax.dot_general(
        probs, v_ref[0, 0].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T*G, Dh]
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _attn_kernel_q8(
    q_ref, k_ref, ks_ref, v_ref, vs_ref, m_ref, o_ref, *, scale: float
):
    """int8-KV variant: K/V arrive quantized with per-(token, head) scales
    and are dequantized in VMEM — HBM sees only the int8 bytes."""
    q = q_ref[0, 0].astype(jnp.float32)  # [T*G, Dh]
    k = k_ref[0, 0].astype(jnp.float32) * ks_ref[0, 0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    scores = jnp.where(m_ref[0] != 0, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    v = v_ref[0, 0].astype(jnp.float32) * vs_ref[0, 0].astype(jnp.float32)
    out = jax.lax.dot_general(
        probs, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_heads_per_kv", "interpret"))
def decode_attention_q8(
    q: jnp.ndarray,  # [B, T, Hq, Dh] post-RoPE
    k_q: jnp.ndarray,  # [B, S, Hkv, Dh] int8
    k_scale: jnp.ndarray,  # [B, S, Hkv]
    v_q: jnp.ndarray,  # [B, S, Hkv, Dh] int8
    v_scale: jnp.ndarray,  # [B, S, Hkv]
    q_positions: jnp.ndarray,  # [T] or [B, T] int32
    *,
    q_heads_per_kv: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused short-query GQA attention over an int8-quantized KV cache."""
    b, t, hq, dh = q.shape
    s, hkv = k_q.shape[1], k_q.shape[2]
    g = q_heads_per_kv
    assert hq == hkv * g

    q_rows = (
        q.reshape(b, t, hkv, g, dh).transpose(0, 2, 1, 3, 4).reshape(b, hkv, t * g, dh)
    )
    k_t = k_q.transpose(0, 2, 1, 3)  # [B, Hkv, S, Dh]
    v_t = v_q.transpose(0, 2, 1, 3)
    # scales carried as [B, Hkv, S, 1]: the trailing 1 keeps the block
    # shape TPU-legal (last two dims must divide (8, 128) or equal the array)
    ks_t = k_scale.transpose(0, 2, 1)[..., None]
    vs_t = v_scale.transpose(0, 2, 1)[..., None]

    q_positions = jnp.broadcast_to(q_positions.astype(jnp.int32), (b, t))
    key_idx = jnp.arange(s, dtype=jnp.int32)
    mask = key_idx[None, None, :] <= q_positions[:, :, None]
    mask8 = jnp.repeat(mask, g, axis=1).astype(jnp.int8)

    out = pl.pallas_call(
        functools.partial(_attn_kernel_q8, scale=1.0 / (dh ** 0.5)),
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, t * g, dh), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, dh), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, dh), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t * g, s), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, t * g, dh), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, t * g, dh), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hkv * t * g * s * dh,
            bytes_accessed=2 * b * s * hkv * dh,
            transcendentals=b * hkv * t * g * s,
        ),
    )(q_rows, k_t, ks_t, v_t, vs_t, mask8)

    return (
        out.reshape(b, hkv, t, g, dh).transpose(0, 2, 1, 3, 4).reshape(b, t, hq, dh)
    )


@functools.partial(jax.jit, static_argnames=("q_heads_per_kv", "interpret"))
def decode_attention(
    q: jnp.ndarray,  # [B, T, Hq, Dh] post-RoPE
    k_cache: jnp.ndarray,  # [B, S, Hkv, Dh]
    v_cache: jnp.ndarray,  # [B, S, Hkv, Dh]
    q_positions: jnp.ndarray,  # [T] or [B, T] int32
    *,
    q_heads_per_kv: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused short-query GQA attention; returns [B, T, Hq, Dh] in q.dtype."""
    b, t, hq, dh = q.shape
    s, hkv = k_cache.shape[1], k_cache.shape[2]
    g = q_heads_per_kv
    assert hq == hkv * g

    # [B, T, Hkv, G, Dh] -> [B, Hkv, T*G, Dh]; row r belongs to query r // G
    q_rows = (
        q.reshape(b, t, hkv, g, dh).transpose(0, 2, 1, 3, 4).reshape(b, hkv, t * g, dh)
    )
    k_t = k_cache.transpose(0, 2, 1, 3)  # [B, Hkv, S, Dh]
    v_t = v_cache.transpose(0, 2, 1, 3)

    q_positions = jnp.broadcast_to(q_positions.astype(jnp.int32), (b, t))
    key_idx = jnp.arange(s, dtype=jnp.int32)
    mask = key_idx[None, None, :] <= q_positions[:, :, None]  # [B, T, S]
    mask8 = jnp.repeat(mask, g, axis=1).astype(jnp.int8)  # [B, T*G, S], t-outer

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=1.0 / (dh ** 0.5)),
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, t * g, dh), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, dh), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, dh), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t * g, s), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, t * g, dh), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, t * g, dh), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hkv * t * g * s * dh,
            bytes_accessed=2 * b * s * hkv * dh * k_cache.dtype.itemsize,
            transcendentals=b * hkv * t * g * s,
        ),
    )(q_rows, k_t, v_t, mask8)

    # [B, Hkv, T*G, Dh] -> [B, T, Hq, Dh]
    return (
        out.reshape(b, hkv, t, g, dh).transpose(0, 2, 1, 3, 4).reshape(b, t, hq, dh)
    )
