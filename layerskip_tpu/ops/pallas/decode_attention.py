"""Shared building blocks for the Pallas attention kernels.

This module once held fused contiguous-cache decode/verify attention
kernels (bf16 and int8-KV variants). They were REMOVED after systematic
on-chip measurement showed XLA's fused masked-softmax attention beating
every formulation at the short-query decode shapes (T = 1..W+1):

  * per-head grid over transposed [B, Hkv, S, Dh] blocks — the transpose
    is a whole-cache relayout copy per attention call (3x HBM traffic);
    XLA won 1.8x at S=31k;
  * per-head grid over native-layout [B, S, Hkv, Dh] lane blocks — reads
    become 256-byte strided runs (181 GB/s vs XLA's 421 GB/s);
  * full-width block-diagonal head packing (one [Hkv*TG, Hkv*Dh] dot) —
    contiguous reads, but the M=1 dot turns MXU-bound on hkv-x wasted
    FLOPs (2.8 ms vs XLA's 1.3 ms at S=31k);
  * int8-KV in-VMEM dequant — XLA's fused elementwise dequant matched or
    beat it at every shape (0.67 vs 0.93 ms at S=4k).

End-to-end at 7B the XLA decode path also measured faster (spec 130.2 vs
127.0 tok/s), so per the project's kernel policy ("kernels where they pay
— and only there"; cf. the removed Pallas RMSNorm, ops/rmsnorm.py) the
contiguous kernels are gone. Pallas still pays where XLA cannot express
the access pattern: paged KV read through scalar-prefetched page tables
(ops/pallas/paged_decode.py, which imports the helpers below) and long
prompt prefill (ops/pallas/flash_prefill.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _online_block(
    scores: jnp.ndarray,  # [TG, BS] fp32, already masked with NEG_INF
    v_blk: jnp.ndarray,  # [BS, Dh] — native dtype (the MXU takes bf16
    # directly with fp32 accumulation; casting whole K/V blocks to fp32 in
    # VMEM cost ~1us per grid cell and halved the paged kernel's bandwidth)
    m_ref,  # [TG, 1] f32 running max
    l_ref,  # [TG, 1] f32 running sum
    acc_ref,  # [TG, Dh] f32 running weighted sum
):
    """One flash-style online-softmax accumulation step (shared scratch
    update used by the paged decode kernels)."""
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
    # p in the value dtype mirrors the XLA fallback exactly
    # (ops/attention.py casts softmax probs to v.dtype before the einsum)
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        p.astype(v_blk.dtype), v_blk,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _row_positions(q_positions: jnp.ndarray, b: int, t: int, g: int) -> jnp.ndarray:
    """[B, T] query positions -> [B, T*G, 1] per-q-row positions (row r of the
    flattened (T, G) query block belongs to query r // G)."""
    pos = jnp.broadcast_to(q_positions.astype(jnp.int32), (b, t))
    return jnp.repeat(pos, g, axis=1)[..., None]  # [B, T*G, 1]
