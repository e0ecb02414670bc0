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

import jax.numpy as jnp
import jax

NEG_INF = -1e30  # large-but-finite: avoids NaNs from (-inf) - (-inf)


def gqa_attention(
    q: jnp.ndarray,  # [B, T, Hq, Dh]  (post-RoPE)
    k_cache: jnp.ndarray,  # [B, S, Hkv, Dh] (post-RoPE, updated)
    v_cache: jnp.ndarray,  # [B, S, Hkv, Dh]
    q_positions: jnp.ndarray,  # [T] absolute positions of queries (int32)
    *,
    q_heads_per_kv: int,
) -> jnp.ndarray:
    """Returns attention output [B, T, Hq, Dh] in q.dtype."""
    b, t, hq, dh = q.shape
    s = k_cache.shape[1]
    hkv = k_cache.shape[2]
    g = q_heads_per_kv
    assert hq == hkv * g

    qg = q.reshape(b, t, hkv, g, dh)
    # scores: [B, Hkv, G, T, S] in fp32
    scores = jnp.einsum(
        "bthgd,bshd->bhgts", qg, k_cache, preferred_element_type=jnp.float32
    )
    scores = scores * (1.0 / jnp.sqrt(dh).astype(jnp.float32))

    key_idx = jnp.arange(s, dtype=jnp.int32)
    mask = key_idx[None, :] <= q_positions.astype(jnp.int32)[:, None]  # [T, S]
    scores = jnp.where(mask[None, None, None], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhgts,bshd->bthgd",
        probs.astype(v_cache.dtype),
        v_cache,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, t, hq, dh).astype(q.dtype)
