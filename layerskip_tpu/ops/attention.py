"""Grouped-query attention over the static KV cache.

Replaces the reference's dense additive O(T^2) mask tensors
(self_speculation/llama_model_utils.py:21-73) with masks computed on the fly
from position counters — no mask materialisation on the host, no dynamic
shapes. The single rule ``key_slot <= query_position`` covers every phase:

  * prefill (past = 0, causal over the prompt),
  * single-token decode (one query against all past keys),
  * the verification window's "full" layers (queries at positions
    ``full_len..full_len+W`` against keys ``0..draft_len+1`` — reference
    llama_model_utils.py:331-337),
  * the verification window's "early" layers (one query at
    ``draft_len`` — reference llama_model_utils.py:323-329).

Softmax and score accumulation are fp32 (MXU output precision); the weighted
sum returns in the activation dtype.
"""

from __future__ import annotations

import contextlib
import contextvars
import os

import jax.numpy as jnp
import jax

NEG_INF = -1e30  # large-but-finite: avoids NaNs from (-inf) - (-inf)

# Sequence-sharded decode (SURVEY §5.7 long-context): when set, the KV
# cache's sequence dim is sharded over this mesh axis, each device holds a
# contiguous slab of keys, and GSPMD turns the masked-softmax reductions
# below into cross-device collectives (flash-decoding across chips). The
# Pallas kernels are gated off — a custom call cannot be auto-partitioned
# along its KV dim — so attention takes the einsum path, which XLA
# partitions. Trace-time state: Engine enters kv_seq_sharding(axis) around
# compilation, so the flag is baked into the executable.
_KV_SEQ_SHARD: contextvars.ContextVar = contextvars.ContextVar(
    "layerskip_kv_seq_shard", default=None
)


@contextlib.contextmanager
def kv_seq_sharding(axis: str):
    tok = _KV_SEQ_SHARD.set(axis)
    try:
        yield
    finally:
        _KV_SEQ_SHARD.reset(tok)


def current_kv_seq_shard():
    return _KV_SEQ_SHARD.get()

# Pallas dispatch: on TPU, short-query attention over PAGED KV goes through
# the page-table kernels (ops/pallas/paged_decode — XLA cannot read through
# a page table without materializing the gathered view), and long prompt
# prefill goes through the flash kernel. Contiguous-cache decode stays on
# XLA — see the dispatch comments in gqa_attention.
# Disable all kernels with LAYERSKIP_TPU_DISABLE_PALLAS=1.
_MAX_PALLAS_QUERY = 16  # draft T=1, verify T=W+1; prefill stays on XLA
_PALLAS_HEAD_DIMS = (64, 128, 256)


def _use_pallas(t: int, s: int, dh: int) -> bool:
    """Gate for the PAGED decode kernels (ops/pallas/paged_decode.py) —
    the only decode-path Pallas dispatch left; see the dispatch comments
    in gqa_attention for why the contiguous kernels were removed."""
    if os.environ.get("LAYERSKIP_TPU_DISABLE_PALLAS") == "1":
        return False
    if _KV_SEQ_SHARD.get() is not None:
        return False
    return (
        jax.default_backend() == "tpu"
        and t <= _MAX_PALLAS_QUERY
        and dh in _PALLAS_HEAD_DIMS
    )


def _use_flash_prefill(t: int, s: int, dh: int) -> bool:
    if os.environ.get("LAYERSKIP_TPU_DISABLE_PALLAS") == "1":
        return False
    if _KV_SEQ_SHARD.get() is not None:
        return False
    return (
        jax.default_backend() == "tpu"
        and t > _MAX_PALLAS_QUERY
        and t % 256 == 0
        and s % 512 == 0
        and dh in _PALLAS_HEAD_DIMS
    )


def gqa_attention(
    q: jnp.ndarray,  # [B, T, Hq, Dh]  (post-RoPE)
    k_cache: jnp.ndarray,  # [B, S, Hkv, Dh] (post-RoPE, updated)
    v_cache: jnp.ndarray,  # [B, S, Hkv, Dh]
    q_positions: jnp.ndarray,  # [T] or [B, T] absolute query positions (int32)
    *,
    q_heads_per_kv: int,
    past_scalar=None,  # set when positions are past + arange(T), shared rows
    sliding_window=None,  # Mistral-family: keys older than this are masked
    tree_meta=None,  # (q_chain [B,T], scratch_start scalar, fanout int):
    # multi-candidate speculation — cache slots >= scratch_start hold
    # ``fanout`` interleaved draft chains (slot = scratch + depth*fanout +
    # chain); a query sees committed slots plus its OWN chain's ancestors
    score_scale=None,  # None => head_dim**-0.5; Gemma-2 passes
    # query_pre_attn_scalar**-0.5
    logit_softcap: float = 0.0,  # Gemma-2 attention score soft-capping:
    # scores = cap * tanh(scores / cap), applied pre-mask (0 disables)
) -> jnp.ndarray:
    """Returns attention output [B, T, Hq, Dh] in q.dtype.

    ``q_positions`` may be per-batch-row ([B, T]) — rows of a batch decode at
    different sequence offsets (continuous batching), so each row gets its
    own visibility frontier.

    ``tree_meta`` decouples a key's logical position from its cache slot in
    the scratch region and adds one chain-visibility clause to the masking
    rule: ``key_pos <= q_pos AND (key_chain == -1 OR key_chain == q_chain)``
    (committed slots have chain -1). This is the whole of "tree attention"
    on TPU — no mask tensors are materialized. The dense XLA masked-softmax
    path and the paged Pallas kernels both carry the clause (the kernels
    recover a key's (position, chain) from its slot index in-kernel).
    """
    from layerskip_tpu.ops.kv_cache import QuantKV
    from layerskip_tpu.ops.paged_kv import PagedKV, PagedQuantKV

    b, t, hq, dh = q.shape
    q_positions = jnp.broadcast_to(
        q_positions.astype(jnp.int32), (b, t)
    )
    # windowed visibility is one extra clause on the masking rule, carried
    # straight into every kernel (Mistral no longer falls back to dense).
    # Gemma-2/3's ALTERNATING pattern passes the window as a traced
    # per-layer scalar: the paged AND flash-prefill kernels take it as a
    # runtime operand (plus static softcap / score scale), so Gemma
    # models run every kernel path.
    _dyn_window = isinstance(sliding_window, jnp.ndarray)
    _window = 0 if _dyn_window else (
        int(sliding_window) if sliding_window is not None else 0
    )
    _kernel_window = sliding_window if _dyn_window else _window
    _softcap = float(logit_softcap or 0.0)
    _kscale = 0.0 if score_scale is None else float(score_scale)  # 0 =>
    # the kernels default to head_dim**-0.5 themselves
    if tree_meta is not None:
        # per-query chain ids / per-row scratch start for the paged kernels
        # (they recover a key's (position, chain) from its slot in-kernel)
        _tc, _ts, _tf = tree_meta
        _tree_kw = dict(
            tree_chain=jnp.broadcast_to(_tc.astype(jnp.int32), (b, t)),
            tree_scratch=_ts, tree_fanout=int(_tf),
        )
    else:
        _tree_kw = {}
    if isinstance(k_cache, PagedKV):
        if _use_pallas(t, k_cache.max_pages * k_cache.page_size, dh):
            from layerskip_tpu.ops.pallas.paged_decode import (
                paged_decode_attention,
            )

            return paged_decode_attention(
                q, k_cache.pool, v_cache.pool, k_cache.table, q_positions,
                q_heads_per_kv=q_heads_per_kv, sliding_window=_kernel_window,
                score_scale=_kscale, logit_softcap=_softcap,
                **_tree_kw,
            )
        # XLA fallback (CPU tests / long-query): materialize the logical
        # per-slot view by gathering pages, then the dense masked path
        k_cache = k_cache.gather_view(q.dtype)
        v_cache = v_cache.gather_view(q.dtype)
    elif isinstance(k_cache, PagedQuantKV):
        if _use_pallas(t, k_cache.max_pages * k_cache.page_size, dh):
            from layerskip_tpu.ops.pallas.paged_decode import (
                paged_decode_attention_q8,
            )

            return paged_decode_attention_q8(
                q, k_cache.pool, k_cache.scale, v_cache.pool, v_cache.scale,
                k_cache.table, q_positions,
                q_heads_per_kv=q_heads_per_kv, sliding_window=_kernel_window,
                score_scale=_kscale, logit_softcap=_softcap,
                **_tree_kw,
            )
        k_cache = k_cache.gather_view(q.dtype)
        v_cache = v_cache.gather_view(q.dtype)
    elif isinstance(k_cache, QuantKV):
        # XLA fuses the elementwise dequant into the attention matmul, so
        # the int8 bytes are what crosses HBM. A Pallas in-VMEM-dequant
        # kernel was built and MEASURED SLOWER or equal at every shape
        # (0.67 vs 0.93 ms at S=4k, parity at 31k, 7B shapes) — removed,
        # like the contiguous bf16 decode kernel below.
        k_cache = k_cache.dequantize(q.dtype)
        v_cache = v_cache.dequantize(q.dtype)
    # Contiguous-cache short-query decode deliberately has NO Pallas
    # kernel: XLA's fused masked-softmax attention runs the T=1..W+1
    # query shapes on the VPU at up to 421 GB/s, while every kernel
    # formulation measured slower — per-head blocks pay whole-cache
    # transpose copies (3x traffic), native-layout per-head blocks pay
    # strided 256B reads (181 GB/s), and full-width block-diagonal
    # packing turns the M=1 dot MXU-bound (hkv x wasted FLOPs). E2E at
    # 7B the XLA path also wins (130.2 vs 127.0 spec tok/s). Pallas pays
    # only where XLA cannot express the access pattern: paged KV (above)
    # and long prefill (below).
    if past_scalar is not None and tree_meta is None and _use_flash_prefill(
        q.shape[1], k_cache.shape[1], q.shape[3]
    ):
        from layerskip_tpu.ops.pallas.flash_prefill import flash_prefill_attention

        return flash_prefill_attention(
            q, k_cache, v_cache, past_scalar, q_heads_per_kv=q_heads_per_kv,
            sliding_window=_kernel_window,
            score_scale=_kscale, logit_softcap=_softcap,
        )
    s = k_cache.shape[1]
    hkv = k_cache.shape[2]
    g = q_heads_per_kv
    assert hq == hkv * g

    qg = q.reshape(b, t, hkv, g, dh)
    # scores: [B, Hkv, G, T, S] in fp32
    scores = jnp.einsum(
        "bthgd,bshd->bhgts", qg, k_cache, preferred_element_type=jnp.float32
    )
    # 0/None => head_dim**-0.5 (same convention as the paged kernels —
    # a literal 0 scale is never meaningful)
    _scale = float(score_scale) if score_scale else dh ** -0.5
    scores = scores * jnp.float32(_scale)
    if logit_softcap:
        cap = jnp.float32(logit_softcap)
        scores = cap * jnp.tanh(scores / cap)  # Gemma-2 soft-capping

    key_idx = jnp.arange(s, dtype=jnp.int32)
    if tree_meta is not None:
        q_chain, scratch_start, fanout = tree_meta
        scratch_start = jnp.broadcast_to(
            jnp.asarray(scratch_start, jnp.int32), (b,)
        )  # per-row scratch region start (ragged prompts => per-row ctx)
        rel = key_idx[None, :] - scratch_start[:, None]  # [B, S]
        in_scr = rel >= 0
        # slot = scratch + (depth-1)*fanout + chain  ->  logical position =
        # scratch + depth - 1 (chains at one depth share a RoPE position)
        key_pos = jnp.where(
            in_scr, scratch_start[:, None] + rel // fanout, key_idx[None, :]
        )
        key_chain = jnp.where(in_scr, rel % fanout, -1)
        q_chain = jnp.broadcast_to(q_chain.astype(jnp.int32), (b, t))
        mask = (key_pos[:, None, :] <= q_positions[:, :, None]) & (
            (key_chain[:, None, :] < 0)
            | (key_chain[:, None, :] == q_chain[:, :, None])
        )
        if _dyn_window:
            win = sliding_window.astype(jnp.int32)
            mask &= (win <= 0) | (
                key_pos[:, None, :] > (q_positions[:, :, None] - win)
            )
        elif _window > 0:
            mask &= key_pos[:, None, :] > (q_positions[:, :, None] - _window)
    else:
        mask = key_idx[None, None, :] <= q_positions[:, :, None]  # [B, T, S]
        if _dyn_window:
            win = sliding_window.astype(jnp.int32)
            mask &= (win <= 0) | (
                key_idx[None, None, :] > (q_positions[:, :, None] - win)
            )
        elif _window > 0:
            mask &= key_idx[None, None, :] > (q_positions[:, :, None] - _window)
    scores = jnp.where(mask[:, None, None], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhgts,bshd->bthgd",
        probs.astype(v_cache.dtype),
        v_cache,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, t, hq, dh).astype(q.dtype)
