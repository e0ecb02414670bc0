"""Pallas TPU kernel: fused GQA decode/verify attention over the KV cache.

The hot attention shapes of self-speculative decoding are *short-query*:
draft steps have T=1 and verification has T=W+1 (SURVEY §2.2-2.3), against a
long static KV buffer [S, Dh]. The XLA fallback
(layerskip_tpu/ops/attention.py) materializes fp32 scores in HBM between two
einsums; this kernel keeps Q*K^T, the masked softmax, and the PV product in
VMEM — K/V are each read from HBM exactly once, which is the bandwidth lower
bound for attention.

KV-blocked with an online (flash-style) softmax: the grid's innermost
dimension walks KV blocks of ``block_s`` keys carrying running
(max, sum, accumulator) scratch, so the KV length S is unbounded — nothing
ever has to fit a whole [S, Dh] slab in VMEM, and S does not need to divide
the block (the tail block is mask-padded). Masking replaces the reference's
dense additive mask tensors (llama_model_utils.py:21-73): a key slot j is
visible iff ``j <= q_pos`` (and, under a Mistral-style sliding window,
``j > q_pos - window`` — llama_model_utils.py mirrors HF's window masking).
Visibility is computed *in kernel* from a tiny per-row position vector —
no [T, S] mask tensor crosses HBM at all. Blocks past every row's frontier
(or entirely behind the window) skip their compute via ``pl.when``.

Layout: grid (B, Hkv, S_blocks); blocks q/out [T*G, Dh], k/v [block_s, Dh].
Row r of the q block belongs to query r // G (G = q heads per kv head).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

DEFAULT_BLOCK_S = 512


def _online_block(
    scores: jnp.ndarray,  # [TG, BS] fp32, already masked with NEG_INF
    v_blk: jnp.ndarray,  # [BS, Dh] fp32
    m_ref,  # [TG, 1] f32 running max
    l_ref,  # [TG, 1] f32 running sum
    acc_ref,  # [TG, Dh] f32 running weighted sum
):
    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
    # NEG_INF is finite, so a fully-masked row would give exp(0)=1 per lane;
    # the explicit mask keeps those lanes at exactly zero
    p = jnp.where(
        scores > NEG_INF * 0.5, jnp.exp(scores - m_new), 0.0
    )  # [TG, BS]
    corr = jnp.exp(m_prev - m_new)  # [TG, 1]
    m_ref[:] = m_new
    l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        p, v_blk,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _decode_kernel(
    pos_ref,  # [1, TG, 1] int32 per-q-row absolute positions
    q_ref,  # [1, 1, TG, Dh]
    k_ref,  # [1, 1, BS, Dh]
    v_ref,  # [1, 1, BS, Dh]
    o_ref,  # [1, 1, TG, Dh]
    m_scr,  # [TG, 1] f32
    l_scr,  # [TG, 1] f32
    acc_scr,  # [TG, Dh] f32
    *,
    scale: float,
    block_s: int,
    kv_len: int,
    window: int,  # 0 = no sliding window
):
    nb = pl.program_id(2)
    tg = q_ref.shape[2]

    @pl.when(nb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    pos = pos_ref[0]  # [TG, 1] int32
    start = nb * block_s
    # any visible key in this block? keys span [start, start + BS)
    pos_max = jnp.max(pos)
    visible = start <= pos_max
    if window > 0:
        pos_min = jnp.min(pos)
        visible = jnp.logical_and(visible, start + block_s > pos_min - window + 1)

    @pl.when(visible)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)  # [TG, Dh]
        k = k_ref[0, 0].astype(jnp.float32)  # [BS, Dh]
        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [TG, BS]
        key_idx = start + jax.lax.broadcasted_iota(
            jnp.int32, (tg, block_s), 1
        )
        mask = key_idx <= pos
        if kv_len % block_s != 0:
            mask = jnp.logical_and(mask, key_idx < kv_len)
        if window > 0:
            mask = jnp.logical_and(mask, key_idx > pos - window)
        scores = jnp.where(mask, scores, NEG_INF)
        v = v_ref[0, 0].astype(jnp.float32)
        if kv_len % block_s != 0:
            # the tail block's out-of-range V rows are pad garbage (NaN in
            # interpret mode); their probabilities are 0, but 0*NaN = NaN
            row_id = start + jax.lax.broadcasted_iota(
                jnp.int32, (block_s, 1), 0
            )
            v = jnp.where(row_id < kv_len, v, 0.0)
        _online_block(scores, v, m_scr, l_scr, acc_scr)

    @pl.when(nb == pl.num_programs(2) - 1)
    def _finish():
        # every row sees at least one key (pos >= 0), so l > 0
        o_ref[0, 0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _decode_kernel_q8(
    pos_ref,  # [1, TG, 1] int32
    q_ref,  # [1, 1, TG, Dh]
    k_ref,  # [1, 1, BS, Dh] int8
    ks_ref,  # [1, 1, BS, 1] f32/bf16 scales
    v_ref,  # [1, 1, BS, Dh] int8
    vs_ref,  # [1, 1, BS, 1]
    o_ref,  # [1, 1, TG, Dh]
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale: float,
    block_s: int,
    kv_len: int,
    window: int,
):
    """int8-KV variant: K/V arrive quantized with per-(token, head) scales
    and are dequantized in VMEM — HBM sees only the int8 bytes."""
    nb = pl.program_id(2)
    tg = q_ref.shape[2]

    @pl.when(nb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    pos = pos_ref[0]  # [TG, 1]
    start = nb * block_s
    pos_max = jnp.max(pos)
    visible = start <= pos_max
    if window > 0:
        pos_min = jnp.min(pos)
        visible = jnp.logical_and(visible, start + block_s > pos_min - window + 1)

    @pl.when(visible)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32) * ks_ref[0, 0].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        key_idx = start + jax.lax.broadcasted_iota(
            jnp.int32, (tg, block_s), 1
        )
        mask = key_idx <= pos
        if kv_len % block_s != 0:
            mask = jnp.logical_and(mask, key_idx < kv_len)
        if window > 0:
            mask = jnp.logical_and(mask, key_idx > pos - window)
        scores = jnp.where(mask, scores, NEG_INF)
        v = v_ref[0, 0].astype(jnp.float32) * vs_ref[0, 0].astype(jnp.float32)
        if kv_len % block_s != 0:
            row_id = start + jax.lax.broadcasted_iota(
                jnp.int32, (block_s, 1), 0
            )
            v = jnp.where(row_id < kv_len, v, 0.0)
        _online_block(scores, v, m_scr, l_scr, acc_scr)

    @pl.when(nb == pl.num_programs(2) - 1)
    def _finish():
        o_ref[0, 0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _row_positions(q_positions: jnp.ndarray, b: int, t: int, g: int) -> jnp.ndarray:
    """[B, T] query positions -> [B, T*G, 1] per-q-row positions (row r of the
    flattened (T, G) query block belongs to query r // G)."""
    pos = jnp.broadcast_to(q_positions.astype(jnp.int32), (b, t))
    return jnp.repeat(pos, g, axis=1)[..., None]  # [B, T*G, 1]


def _pick_block(s: int) -> int:
    if s <= DEFAULT_BLOCK_S:
        # single block: round up to the fp32 sublane tile
        return max(-(-s // 128) * 128, 128)
    return DEFAULT_BLOCK_S


@functools.partial(
    jax.jit, static_argnames=("q_heads_per_kv", "sliding_window", "interpret")
)
def decode_attention(
    q: jnp.ndarray,  # [B, T, Hq, Dh] post-RoPE
    k_cache: jnp.ndarray,  # [B, S, Hkv, Dh]
    v_cache: jnp.ndarray,  # [B, S, Hkv, Dh]
    q_positions: jnp.ndarray,  # [T] or [B, T] int32
    *,
    q_heads_per_kv: int,
    sliding_window: int = 0,  # 0 = dense causal
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
    rowpos = _row_positions(q_positions, b, t, g)

    bs = _pick_block(s)
    nb = pl.cdiv(s, bs)
    tg = t * g
    out = pl.pallas_call(
        functools.partial(
            _decode_kernel, scale=1.0 / (dh ** 0.5), block_s=bs, kv_len=s,
            window=int(sliding_window or 0),
        ),
        grid=(b, hkv, nb),
        in_specs=[
            pl.BlockSpec((1, tg, 1), lambda i, j, n: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tg, dh), lambda i, j, n: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bs, dh), lambda i, j, n: (i, j, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bs, dh), lambda i, j, n: (i, j, n, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tg, dh), lambda i, j, n: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, tg, dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((tg, 1), jnp.float32),
            pltpu.VMEM((tg, 1), jnp.float32),
            pltpu.VMEM((tg, dh), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hkv * tg * s * dh,
            bytes_accessed=2 * b * s * hkv * dh * k_cache.dtype.itemsize,
            transcendentals=b * hkv * tg * s,
        ),
    )(rowpos, q_rows, k_t, v_t)

    # [B, Hkv, T*G, Dh] -> [B, T, Hq, Dh]
    return (
        out.reshape(b, hkv, t, g, dh).transpose(0, 2, 1, 3, 4).reshape(b, t, hq, dh)
    )


@functools.partial(
    jax.jit, static_argnames=("q_heads_per_kv", "sliding_window", "interpret")
)
def decode_attention_q8(
    q: jnp.ndarray,  # [B, T, Hq, Dh] post-RoPE
    k_q: jnp.ndarray,  # [B, S, Hkv, Dh] int8
    k_scale: jnp.ndarray,  # [B, S, Hkv]
    v_q: jnp.ndarray,  # [B, S, Hkv, Dh] int8
    v_scale: jnp.ndarray,  # [B, S, Hkv]
    q_positions: jnp.ndarray,  # [T] or [B, T] int32
    *,
    q_heads_per_kv: int,
    sliding_window: int = 0,
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
    rowpos = _row_positions(q_positions, b, t, g)

    bs = _pick_block(s)
    nb = pl.cdiv(s, bs)
    tg = t * g
    out = pl.pallas_call(
        functools.partial(
            _decode_kernel_q8, scale=1.0 / (dh ** 0.5), block_s=bs, kv_len=s,
            window=int(sliding_window or 0),
        ),
        grid=(b, hkv, nb),
        in_specs=[
            pl.BlockSpec((1, tg, 1), lambda i, j, n: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tg, dh), lambda i, j, n: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bs, dh), lambda i, j, n: (i, j, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bs, 1), lambda i, j, n: (i, j, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bs, dh), lambda i, j, n: (i, j, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bs, 1), lambda i, j, n: (i, j, n, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tg, dh), lambda i, j, n: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, tg, dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((tg, 1), jnp.float32),
            pltpu.VMEM((tg, 1), jnp.float32),
            pltpu.VMEM((tg, dh), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hkv * tg * s * dh,
            bytes_accessed=2 * b * s * hkv * dh,
            transcendentals=b * hkv * tg * s,
        ),
    )(rowpos, q_rows, k_t, ks_t, v_t, vs_t)

    return (
        out.reshape(b, hkv, t, g, dh).transpose(0, 2, 1, 3, 4).reshape(b, t, hq, dh)
    )
