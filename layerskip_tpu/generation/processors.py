"""On-device logits processors.

Counterpart of the reference's HF ``LogitsProcessorList`` hook
(generator_base.py:77-85 builds ``NoRepeatNGramLogitsProcessor``; applied to
AR logits at autoregressive_generator.py:59-61 and draft logits at
self_speculation_generator.py:138-139). Two deliberate upgrades:

  1. The reference passes only the *fed* token(s) to the processors — with a
     KV cache that is one token — so its n-gram ban never sees enough
     history to fire. Here the ban is computed over the true
     prompt+generated history and actually works.
  2. The ban is also applied position-wise to the verification window, so
     greedy self-speculative output remains exactly equal to greedy AR
     output when the processor is active.

Everything is traced jnp — the processors run inside the generation XLA
program (the reference syncs to host per token).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def no_repeat_ngram_banned(
    history: jnp.ndarray,  # [B, H] prompt+generated token buffer
    hist_len: jnp.ndarray,  # [] or [B] int32 valid length(s)
    ngram: int,  # static n (ban token completing any repeated n-gram)
    vocab_size: int,
) -> jnp.ndarray:
    """[B, V] bool mask, True = token would complete an already-seen n-gram.

    Matches HF ``NoRepeatNGramLogitsProcessor`` semantics: with the last
    ``n-1`` tokens as context, ban every token x such that the n-gram
    ``context + [x]`` already occurs in the history. ``hist_len`` may be
    per-row (batched decode at different lengths).
    """
    assert ngram >= 1
    b, h = history.shape
    hist_len = jnp.broadcast_to(jnp.asarray(hist_len, jnp.int32), (b,))
    n1 = ngram - 1
    if n1 == 0:
        # n=1: every previously seen token is banned
        idx = jnp.arange(h)
        seen = idx[None, :] < hist_len[:, None]
        return _scatter_ban(history, seen, vocab_size)

    # last (n-1)-gram per row; undefined when hist_len < n-1 (mask handles it)
    start = jnp.maximum(hist_len - n1, 0)
    gram = jax.vmap(
        lambda row, st: jax.lax.dynamic_slice(row, (st,), (n1,))
    )(history, start)  # [B, n-1]

    # window i matches iff history[i : i+n-1] == gram and i+n-1 < hist_len
    wins = h - ngram + 1
    if wins <= 0:
        return jnp.zeros((b, vocab_size), bool)
    match = jnp.ones((b, wins), bool)
    for j in range(n1):
        match &= history[:, j : j + wins] == gram[:, j : j + 1]
    idx = jnp.arange(wins)
    match &= (idx[None, :] + n1) < hist_len[:, None]
    match &= (hist_len >= n1)[:, None]  # no context yet -> nothing banned
    banned_tokens = history[:, n1 : n1 + wins]  # token that completed each window
    return _scatter_ban(banned_tokens, match, vocab_size)


def _scatter_ban(tokens: jnp.ndarray, flags: jnp.ndarray, v: int) -> jnp.ndarray:
    """Per-batch scatter of flagged token ids into a [B, V] bool mask."""

    def one(tok_row, flag_row):
        return jnp.zeros((v,), bool).at[tok_row].max(flag_row)

    return jax.vmap(one)(tokens, flags)


def apply_ban(logits: jnp.ndarray, banned: jnp.ndarray) -> jnp.ndarray:
    """Additive -inf on banned tokens ([..., V] logits, [..., V] bool)."""
    return jnp.where(banned, NEG_INF, logits)
