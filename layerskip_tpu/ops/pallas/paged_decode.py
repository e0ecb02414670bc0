"""Pallas TPU kernel: paged GQA decode/verify attention.

Same online-softmax structure as ``decode_attention`` (decode_attention.py:
grid (B, Hkv, blocks), flash-style (m, l, acc) scratch, visibility computed
in-kernel from the per-row position vector) — but the KV block for grid step
``n`` is fetched **through the page table**: the BlockSpec index_map reads
the scalar-prefetched ``table[B, max_pages]`` and maps logical page ``n`` of
row ``i`` to physical pool page ``table[i, n]``. One page = one KV block, so
paging costs no extra HBM traffic over the contiguous kernel; pages are
simply visited in logical order wherever they physically live.

The pool is stored page-major/head-contiguous ``[P, Hkv, page, Dh]`` so a
block is one ``(page, Dh)`` tile per head. Masking is identical to the
contiguous kernel: key ``j`` visible iff ``j <= q_pos`` (and
``j > q_pos - window`` under a sliding window); logical key indices come
from the grid step, so trash-mapped pages beyond a row's mapped capacity are
never visible (see ops/paged_kv.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from layerskip_tpu.ops.pallas.decode_attention import NEG_INF, _online_block


def _key_coords(start, tg, page, fanout, scr):
    """Logical key slot -> (RoPE/causal position, chain id) for tree slots.

    Tree speculation stores chain tokens in interleaved slots past the
    committed frontier: slot = scr + (depth-1)*fanout + chain, so chains at
    one depth share a logical position (engine.py::_tree_round). Non-tree
    (fanout <= 1): positions are the slot indices, chain = -1 (visible to
    every query)."""
    key_idx = start + jax.lax.broadcasted_iota(jnp.int32, (tg, page), 1)
    if fanout <= 1:
        return key_idx, None
    rel = key_idx - scr
    in_scr = rel >= 0
    key_pos = jnp.where(in_scr, scr + rel // fanout, key_idx)
    key_chain = jnp.where(in_scr, rel % fanout, -1)
    return key_pos, key_chain


def _block_visible(start, page, fanout, scr, pos, win):
    """Conservative block-level skip test (per-key masking is exact).

    ``win`` is a TRACED int32 scalar (0 = no window): Gemma-2/3's
    per-layer alternation makes the window a runtime value inside the
    layer scan, so the skip test composes it with jnp ops instead of a
    static Python branch."""
    pos_max = jnp.max(pos)
    if fanout > 1:
        # the smallest mapped position in this block (tree slots compress:
        # fanout slots share one position)
        blk_min = jnp.where(
            start >= scr, scr + (start - scr) // fanout, start
        )
    else:
        blk_min = start
    visible = blk_min <= pos_max
    pos_min = jnp.min(pos)
    visible = jnp.logical_and(
        visible,
        jnp.logical_or(win <= 0, start + page > pos_min - win + 1),
    )
    return visible


def _paged_kernel(
    table_ref,  # [B, maxp] int32 scalar-prefetch (index_map only)
    pos_ref,  # [1, TG, 1] int32 per-q-row absolute positions
    chain_ref,  # [1, TG, 1] int32 per-q-row chain ids (-1 outside trees)
    scr_ref,  # [1, TG, 1] int32 per-row scratch start (tree slots region)
    win_ref,  # SMEM (1, 1) int32 sliding window (0 = global; a runtime
    # operand so Gemma-2/3's per-layer alternation reaches the kernel)
    q_ref,  # [1, 1, TG, Dh]
    k_ref,  # [1, 1, pg, Dh] — pool page table_ref[i, n], head j
    v_ref,  # [1, 1, pg, Dh]
    o_ref,  # [1, 1, TG, Dh]
    m_scr,  # [TG, 1] f32
    l_scr,  # [TG, 1] f32
    acc_scr,  # [TG, Dh] f32
    *,
    scale: float,
    softcap: float,
    page: int,
    fanout: int,
):
    nb = pl.program_id(2)
    tg = q_ref.shape[2]

    @pl.when(nb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    pos = pos_ref[0]  # [TG, 1]
    start = nb * page  # logical key offset of this page
    scr = scr_ref[0][0, 0]  # per-row scalar (replicated across TG)
    win = win_ref[0, 0]  # per-call scalar
    visible = _block_visible(start, page, fanout, scr, pos, win)

    @pl.when(visible)
    def _compute():
        # native-dtype operands: the MXU multiplies bf16 inputs exactly and
        # accumulates fp32 — casting whole pages to fp32 in VMEM is pure
        # VPU overhead (measured on the removed contiguous kernels)
        q = q_ref[0, 0]  # [TG, Dh]
        k = k_ref[0, 0]  # [pg, Dh]
        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [TG, pg]
        if softcap:  # Gemma-2 score soft-capping (static)
            scores = softcap * jnp.tanh(scores / softcap)
        key_pos, key_chain = _key_coords(start, tg, page, fanout, scr)
        mask = key_pos <= pos
        if fanout > 1:
            qchain = chain_ref[0]  # [TG, 1]
            mask = jnp.logical_and(
                mask, jnp.logical_or(key_chain < 0, key_chain == qchain)
            )
        mask = jnp.logical_and(
            mask, jnp.logical_or(win <= 0, key_pos > pos - win)
        )
        scores = jnp.where(mask, scores, NEG_INF)
        _online_block(scores, v_ref[0, 0], m_scr, l_scr, acc_scr)

    @pl.when(nb == pl.num_programs(2) - 1)
    def _finish():
        o_ref[0, 0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _paged_kernel_q8(
    table_ref,  # [B, maxp] int32 scalar-prefetch (index_map only)
    pos_ref,  # [1, TG, 1] int32
    chain_ref,  # [1, TG, 1] int32 per-q-row chain ids (-1 outside trees)
    scr_ref,  # [1, TG, 1] int32 per-row scratch start
    win_ref,  # SMEM (1, 1) int32 sliding window (0 = global; runtime operand)
    q_ref,  # [1, 1, TG, Dh]
    k_ref,  # [1, 1, pg, Dh] int8 — pool page table_ref[i, n], head j
    ks_ref,  # [1, 1, pg, 1] bf16 scales
    v_ref,  # [1, 1, pg, Dh] int8
    vs_ref,  # [1, 1, pg, 1]
    o_ref,  # [1, 1, TG, Dh]
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale: float,
    softcap: float,
    page: int,
    fanout: int,
):
    """int8 paged variant: pages arrive quantized with per-(token, head)
    scales and are dequantized in VMEM (cf. decode_attention.py
    _decode_kernel_q8) — HBM sees only the int8 page bytes."""
    nb = pl.program_id(2)
    tg = q_ref.shape[2]

    @pl.when(nb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    pos = pos_ref[0]
    start = nb * page
    scr = scr_ref[0][0, 0]
    win = win_ref[0, 0]
    visible = _block_visible(start, page, fanout, scr, pos, win)

    @pl.when(visible)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32) * ks_ref[0, 0].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if softcap:  # Gemma-2 score soft-capping (static)
            scores = softcap * jnp.tanh(scores / softcap)
        key_pos, key_chain = _key_coords(start, tg, page, fanout, scr)
        mask = key_pos <= pos
        if fanout > 1:
            qchain = chain_ref[0]
            mask = jnp.logical_and(
                mask, jnp.logical_or(key_chain < 0, key_chain == qchain)
            )
        mask = jnp.logical_and(
            mask, jnp.logical_or(win <= 0, key_pos > pos - win)
        )
        scores = jnp.where(mask, scores, NEG_INF)
        v = v_ref[0, 0].astype(jnp.float32) * vs_ref[0, 0].astype(jnp.float32)
        _online_block(scores, v, m_scr, l_scr, acc_scr)

    @pl.when(nb == pl.num_programs(2) - 1)
    def _finish():
        o_ref[0, 0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)




def _tree_rows(tree_chain, tree_scratch, b, t, g, rowpos):
    """Per-q-row chain ids + per-row scratch starts, shaped like rowpos.

    Non-tree callers pass None: chains become -1 (every key visible under
    the plain causal rule) and scratch an unreachable sentinel."""
    from layerskip_tpu.ops.pallas.decode_attention import _row_positions

    if tree_chain is None:
        chains = jnp.full_like(rowpos, -1)
        scr = jnp.full_like(rowpos, jnp.iinfo(jnp.int32).max // 2)
        return chains, scr
    chains = _row_positions(tree_chain, b, t, g)
    scr = _row_positions(
        jnp.broadcast_to(
            jnp.asarray(tree_scratch, jnp.int32).reshape(-1, 1), (b, t)
        ),
        b, t, g,
    )
    return chains, scr


@functools.partial(
    jax.jit, static_argnames=("q_heads_per_kv", "tree_fanout",
                              "score_scale", "logit_softcap", "interpret")
)
def paged_decode_attention_q8(
    q: jnp.ndarray,  # [B, T, Hq, Dh] post-RoPE
    k_pool: jnp.ndarray,  # [P, Hkv, page, Dh] int8
    k_scale: jnp.ndarray,  # [P, Hkv, page]
    v_pool: jnp.ndarray,  # [P, Hkv, page, Dh] int8
    v_scale: jnp.ndarray,  # [P, Hkv, page]
    table: jnp.ndarray,  # [B, max_pages] int32
    q_positions: jnp.ndarray,  # [T] or [B, T] int32 logical positions
    *,
    q_heads_per_kv: int,
    sliding_window=0,  # int OR traced int32 scalar (Gemma per-layer window)
    tree_chain: jnp.ndarray = None,  # [B, T] per-query chain ids (tree)
    tree_scratch: jnp.ndarray = None,  # [] or [B] scratch region start
    tree_fanout: int = 0,  # chains per depth (static); 0 = no tree
    score_scale: float = 0.0,  # 0 => head_dim**-0.5 (Gemma query scale)
    logit_softcap: float = 0.0,  # Gemma-2 score soft-capping (static)
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused short-query GQA attention over an int8 paged KV pool."""
    from layerskip_tpu.ops.pallas.decode_attention import _row_positions

    b, t, hq, dh = q.shape
    hkv, page = k_pool.shape[1], k_pool.shape[2]
    maxp = table.shape[1]
    g = q_heads_per_kv
    assert hq == hkv * g

    q_rows = (
        q.reshape(b, t, hkv, g, dh).transpose(0, 2, 1, 3, 4).reshape(b, hkv, t * g, dh)
    )
    rowpos = _row_positions(q_positions, b, t, g)
    tg = t * g
    # trailing 1 keeps the scale block shape TPU-legal (cf.
    # decode_attention.py decode_attention_q8)
    ks = k_scale[..., None]
    vs = v_scale[..., None]
    chains, scrs = _tree_rows(tree_chain, tree_scratch, b, t, g, rowpos)
    # the window is a per-call SCALAR: ship it as a (1, 1) SMEM block
    # (the flash kernel's pattern) rather than a broadcast VMEM row
    wins = jnp.reshape(jnp.asarray(sliding_window, jnp.int32), (1, 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv, maxp),
        in_specs=[
            pl.BlockSpec((1, tg, 1), lambda i, j, n, tbl: (i, 0, 0)),
            pl.BlockSpec((1, tg, 1), lambda i, j, n, tbl: (i, 0, 0)),
            pl.BlockSpec((1, tg, 1), lambda i, j, n, tbl: (i, 0, 0)),
            pl.BlockSpec((1, 1), lambda i, j, n, tbl: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, tg, dh), lambda i, j, n, tbl: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, page, dh),
                         lambda i, j, n, tbl: (tbl[i, n], j, 0, 0)),
            pl.BlockSpec((1, 1, page, 1),
                         lambda i, j, n, tbl: (tbl[i, n], j, 0, 0)),
            pl.BlockSpec((1, 1, page, dh),
                         lambda i, j, n, tbl: (tbl[i, n], j, 0, 0)),
            pl.BlockSpec((1, 1, page, 1),
                         lambda i, j, n, tbl: (tbl[i, n], j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, tg, dh), lambda i, j, n, tbl: (i, j, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((tg, 1), jnp.float32),
            pltpu.VMEM((tg, 1), jnp.float32),
            pltpu.VMEM((tg, dh), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _paged_kernel_q8,
            scale=float(score_scale) or 1.0 / (dh ** 0.5),
            softcap=float(logit_softcap or 0.0),
            page=page, fanout=int(tree_fanout or 0),
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, tg, dh), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hkv * tg * maxp * page * dh,
            bytes_accessed=2 * b * maxp * page * hkv * dh,
            transcendentals=b * hkv * tg * maxp * page,
        ),
    )(table, rowpos, chains, scrs, wins, q_rows, k_pool, ks, v_pool, vs)

    return (
        out.reshape(b, hkv, t, g, dh).transpose(0, 2, 1, 3, 4).reshape(b, t, hq, dh)
    )


@functools.partial(
    jax.jit, static_argnames=("q_heads_per_kv", "tree_fanout",
                              "score_scale", "logit_softcap", "interpret")
)
def paged_decode_attention(
    q: jnp.ndarray,  # [B, T, Hq, Dh] post-RoPE
    k_pool: jnp.ndarray,  # [P, Hkv, page, Dh]
    v_pool: jnp.ndarray,  # [P, Hkv, page, Dh]
    table: jnp.ndarray,  # [B, max_pages] int32
    q_positions: jnp.ndarray,  # [T] or [B, T] int32 logical positions
    *,
    q_heads_per_kv: int,
    sliding_window=0,  # int OR traced int32 scalar (Gemma per-layer window)
    tree_chain: jnp.ndarray = None,  # [B, T] per-query chain ids (tree)
    tree_scratch: jnp.ndarray = None,  # [] or [B] scratch region start
    tree_fanout: int = 0,  # chains per depth (static); 0 = no tree
    score_scale: float = 0.0,  # 0 => head_dim**-0.5 (Gemma query scale)
    logit_softcap: float = 0.0,  # Gemma-2 score soft-capping (static)
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused short-query GQA attention over a paged KV pool; [B, T, Hq, Dh]."""
    from layerskip_tpu.ops.pallas.decode_attention import _row_positions

    b, t, hq, dh = q.shape
    hkv, page = k_pool.shape[1], k_pool.shape[2]
    maxp = table.shape[1]
    g = q_heads_per_kv
    assert hq == hkv * g

    q_rows = (
        q.reshape(b, t, hkv, g, dh).transpose(0, 2, 1, 3, 4).reshape(b, hkv, t * g, dh)
    )
    rowpos = _row_positions(q_positions, b, t, g)
    tg = t * g
    chains, scrs = _tree_rows(tree_chain, tree_scratch, b, t, g, rowpos)
    # per-call scalar window as a (1, 1) SMEM block (flash pattern)
    wins = jnp.reshape(jnp.asarray(sliding_window, jnp.int32), (1, 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # the page table
        grid=(b, hkv, maxp),
        in_specs=[
            pl.BlockSpec((1, tg, 1), lambda i, j, n, tbl: (i, 0, 0)),
            pl.BlockSpec((1, tg, 1), lambda i, j, n, tbl: (i, 0, 0)),
            pl.BlockSpec((1, tg, 1), lambda i, j, n, tbl: (i, 0, 0)),
            pl.BlockSpec((1, 1), lambda i, j, n, tbl: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, tg, dh), lambda i, j, n, tbl: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, page, dh),
                         lambda i, j, n, tbl: (tbl[i, n], j, 0, 0)),
            pl.BlockSpec((1, 1, page, dh),
                         lambda i, j, n, tbl: (tbl[i, n], j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, tg, dh), lambda i, j, n, tbl: (i, j, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((tg, 1), jnp.float32),
            pltpu.VMEM((tg, 1), jnp.float32),
            pltpu.VMEM((tg, dh), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _paged_kernel,
            scale=float(score_scale) or 1.0 / (dh ** 0.5),
            softcap=float(logit_softcap or 0.0),
            page=page, fanout=int(tree_fanout or 0),
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, tg, dh), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hkv * tg * maxp * page * dh,
            bytes_accessed=2 * b * maxp * page * hkv * dh
            * k_pool.dtype.itemsize,
            transcendentals=b * hkv * tg * maxp * page,
        ),
    )(table, rowpos, chains, scrs, wins, q_rows, k_pool, v_pool)

    return (
        out.reshape(b, hkv, t, g, dh).transpose(0, 2, 1, 3, 4).reshape(b, t, hq, dh)
    )
