"""Pallas TPU kernel: flash prefill attention (online softmax, causal).

The decode/verify kernel (decode_attention.py) covers short queries; prefill
runs T up to thousands of tokens, where the XLA fallback materializes the
fp32 [T, S] score tensor in HBM between two einsums. This kernel computes
attention block-wise with the online-softmax recurrence, keeping scores in
VMEM — the classic flash-attention structure, with this engine's single
masking rule ``key_slot <= past_len + q_idx`` (covers causal + past-KV
prefix in one comparison; reference builds dense additive masks,
llama_model_utils.py:21-73).

Grid: (B, Hq, Tq/BQ, S/BK) — the KV-block axis is innermost; m/l/acc scratch
persists across it and the output block is written on the last KV step.
GQA is handled in the index maps (query head h reads KV head h // G).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    past_ref,  # SMEM (1, 1) int32: past length
    win_ref,  # SMEM (1, 1) int32: sliding window (0 = dense causal) — a
    # runtime operand so Gemma-2/3's per-layer alternation reaches the
    # kernel from inside the layer scan
    q_ref,  # VMEM [1, 1, BQ, Dh]
    k_ref,  # VMEM [1, 1, BK, Dh]
    v_ref,  # VMEM [1, 1, BK, Dh]
    o_ref,  # VMEM [1, 1, BQ, Dh]
    m_ref,  # scratch [BQ, 1] fp32 running max
    l_ref,  # scratch [BQ, 1] fp32 running denom
    acc_ref,  # scratch [BQ, Dh] fp32
    *,
    scale: float,
    softcap: float,
    block_q: int,
    block_k: int,
):
    iq = pl.program_id(2)
    kb = pl.program_id(3)
    n_kb = pl.num_programs(3)

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    past = past_ref[0, 0]
    win = win_ref[0, 0]
    q_pos = past + iq * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )
    k_pos = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )
    # skip blocks fully above the causal frontier (and, with a window,
    # blocks whose every key is older than any query's window)
    first_q_pos = past + iq * block_q
    run = kb * block_k <= first_q_pos + block_q - 1
    run = jnp.logical_and(
        run,
        jnp.logical_or(
            win <= 0, kb * block_k + block_k - 1 > first_q_pos - win
        ),
    )

    @pl.when(run)
    def _():
        # native-dtype operands: the MXU multiplies bf16 inputs exactly
        # and accumulates fp32; whole-block fp32 casts are VPU overhead
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [BQ, BK]
        if softcap:  # Gemma-2 score soft-capping (static)
            s = softcap * jnp.tanh(s / softcap)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        s = jnp.where(
            jnp.logical_or(win <= 0, k_pos > q_pos - win), s, NEG_INF
        )

        m_prev = m_ref[:]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        # NEG_INF is finite: a fully-masked row (possible under a window)
        # would otherwise get exp(0)=1 per masked lane
        p = jnp.where(s > NEG_INF * 0.5, jnp.exp(s - m_cur), 0.0)  # [BQ, BK]
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        # p in the value dtype mirrors the XLA path (probs cast to
        # v.dtype before the weighted sum)
        v_blk = v_ref[0, 0]
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_cur

    @pl.when(kb == n_kb - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(
            o_ref.dtype
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "q_heads_per_kv", "block_q", "block_k", "score_scale",
        "logit_softcap", "interpret"
    ),
)
def flash_prefill_attention(
    q: jnp.ndarray,  # [B, T, Hq, Dh] post-RoPE
    k_cache: jnp.ndarray,  # [B, S, Hkv, Dh]
    v_cache: jnp.ndarray,  # [B, S, Hkv, Dh]
    past_len: jnp.ndarray,  # [] int32 (shared prefill offset; usually 0)
    *,
    q_heads_per_kv: int,
    sliding_window=0,  # int OR traced int32 scalar (Gemma per-layer window)
    block_q: int = 256,
    block_k: int = 512,
    score_scale: float = 0.0,  # 0 => head_dim**-0.5 (Gemma query scale)
    logit_softcap: float = 0.0,  # Gemma-2 score soft-capping (static)
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [B, T, Hq, Dh] in q.dtype. Requires BQ | T and BK | S."""
    b, t, hq, dh = q.shape
    s, hkv = k_cache.shape[1], k_cache.shape[2]
    g = q_heads_per_kv
    assert hq == hkv * g
    bq = min(block_q, t)
    bk = min(block_k, s)
    assert t % bq == 0 and s % bk == 0, (t, bq, s, bk)

    q_t = q.transpose(0, 2, 1, 3)  # [B, Hq, T, Dh]
    k_t = k_cache.transpose(0, 2, 1, 3)  # [B, Hkv, S, Dh]
    v_t = v_cache.transpose(0, 2, 1, 3)
    past = jnp.reshape(past_len.astype(jnp.int32), (1, 1))
    win = jnp.reshape(jnp.asarray(sliding_window, jnp.int32), (1, 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, hq, t // bq, s // bk),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j, iq, kb: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j, iq, kb: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, bq, dh), lambda i, j, iq, kb: (i, j, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, dh), lambda i, j, iq, kb: (i, j // g, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, dh), lambda i, j, iq, kb: (i, j // g, kb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bq, dh), lambda i, j, iq, kb: (i, j, iq, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, dh), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel,
            scale=float(score_scale) or 1.0 / (dh ** 0.5),
            softcap=float(logit_softcap or 0.0),
            block_q=bq, block_k=bk,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, t, dh), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * t * s * dh // 2,  # ~half masked out
            bytes_accessed=(
                b * hq * t * dh * q.dtype.itemsize
                + 2 * b * hkv * s * dh * k_cache.dtype.itemsize
            ),
            transcendentals=b * hq * t * s,
        ),
    )(past, win, q_t, k_t, v_t)
    return out.transpose(0, 2, 1, 3)  # [B, T, Hq, Dh]
