"""Jit-compiled generation engines: autoregressive + self-speculative.

TPU-native re-design of the reference's generation strategies
(self_speculation/autoregressive_generator.py, self_speculation_generator.py).
The reference's hot loop crosses the host boundary once or more per token
(``.item()`` at self_speculation_generator.py:141,190,195,198); here the
*entire generation* — prefill, draft scan, verification, acceptance,
KV rollback, EOS detection — is a single ``lax.while_loop`` inside one XLA
program. The host sees exactly one device sync per generation.

Static-shape design (SURVEY §7 hard parts):
  * prompts are right-padded to a bucket length; true length is a traced
    scalar; pad-slot KV is junk but every key slot ``<= q_pos`` is always
    freshly written before any query reaches it (frontier invariant), so
    correctness never depends on pad contents;
  * the speculation window is a fixed ``W = num_speculations``; the
    reference's per-round clamp ``min(W, max_steps - len(out) - 1)``
    (self_speculation_generator.py:63-66) is reproduced by clamping the
    *accepted* count, not the drafted count;
  * KV rollback is a length-counter update (the reference physically slices
    tensors, llama_model_utils.py:134-149);
  * EOS stops the loop via a flag; the committed window past the first EOS
    is dropped on the host afterwards (reference semantics: EOS token itself
    excluded — self_speculation_generator.py:82-91,
    autoregressive_generator.py:66-67).

Acceptance uses one code path for greedy and sampling: greedy distributions
are one-hot, under which speculative rejection sampling degenerates exactly
to longest-prefix matching (reference splits the two at
self_speculation_generator.py:186-199).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from layerskip_tpu.config import GenerationConfig, ModelConfig
from layerskip_tpu.generation.processors import apply_ban, no_repeat_ngram_banned
from layerskip_tpu.generation.sampling import (
    SamplingConfig,
    draw,
    token_distribution,
)
from layerskip_tpu.models import llama
from layerskip_tpu.models.llama import LlamaParams
from layerskip_tpu.ops.kv_cache import KVCache, QuantKV


def _mk_group_cache(
    cfg: "ModelConfig", nlayers: int, b: int, max_len: int, kv_quant: bool
) -> KVCache:
    """Preallocate a layer-group KV cache (bf16 or int8-quantized).

    Under an active ``kv_seq_sharding`` context (sequence-sharded decode,
    ops/attention.py), the sequence dim is constrained to that mesh axis:
    each device holds a contiguous KV slab and GSPMD inserts the attention
    collectives — contexts larger than one chip's HBM spread over ICI."""
    from jax.sharding import PartitionSpec as P

    from layerskip_tpu.ops.attention import current_kv_seq_shard

    axis = current_kv_seq_shard()

    def seq_shard(x, spec_dims=5):
        if axis is None:
            return x
        spec = [None] * spec_dims
        spec[2] = axis  # [L, B, S, ...]: shard S
        return jax.lax.with_sharding_constraint(x, P(*spec))

    shape = (nlayers, b, max_len, cfg.num_key_value_heads, cfg.head_dim)
    if kv_quant:
        mk = lambda: QuantKV(  # noqa: E731
            q=seq_shard(jnp.zeros(shape, jnp.int8)),
            scale=seq_shard(jnp.zeros(shape[:-1], jnp.bfloat16), 4),
        )
        return KVCache(k=mk(), v=mk())
    return KVCache(
        k=seq_shard(jnp.zeros(shape, cfg.dtype)),
        v=seq_shard(jnp.zeros(shape, cfg.dtype)),
    )


def _is_eos(tokens: jnp.ndarray, eos_ids: Tuple[int, ...]) -> jnp.ndarray:
    """Elementwise membership in the (static) EOS id set."""
    hit = jnp.zeros(tokens.shape, dtype=bool)
    for e in eos_ids:
        hit = hit | (tokens == e)
    return hit


def _row_keys(rng: jax.Array, b: int) -> jax.Array:
    """One independent key per batch row ([B, 2])."""
    if rng.ndim == 2:
        return rng
    return jax.vmap(lambda i: jax.random.fold_in(rng, i))(jnp.arange(b))


def _split_rows(keys: jax.Array):
    """Per-row split: [B, 2] -> (use [B, 2], carry [B, 2])."""
    both = jax.vmap(lambda k: jax.random.split(k))(keys)  # [B, 2, 2]
    return both[:, 0], both[:, 1]


def _row_update(buf: jnp.ndarray, block: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Per-row dynamic update: buf [B, L], block [B, T], pos [B]."""
    return jax.vmap(
        lambda b_, n_, p_: jax.lax.dynamic_update_slice(b_, n_, (p_,))
    )(buf, block, pos.astype(jnp.int32))


def _row_gather(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x [B, T, ...] -> x[r, idx[r]] per row ([B, ...])."""
    return jax.vmap(lambda row, i: row[i])(x, idx.astype(jnp.int32))


class GenerateOutput(NamedTuple):
    """Device-side result of one generation (pre-EOS-truncation).

    ``tokens[:, :num_tokens]`` are committed tokens which may *include* an
    EOS; the facade truncates at the first EOS (reference excludes it).
    """

    tokens: jnp.ndarray  # [B, OUT] int32
    num_tokens: jnp.ndarray  # [B] int32 committed count (may exceed max_steps by <= W)
    matches: jnp.ndarray  # [] int32 total accepted drafts (spec only)
    drafts: jnp.ndarray  # [] int32 total drafted tokens (spec only)


# ---------------------------------------------------------------------------
# Autoregressive engine
# ---------------------------------------------------------------------------


@struct.dataclass
class _ARState:
    cache: KVCache  # early group only when exit_layer > 0, else all layers
    ctx: jnp.ndarray  # [] int32 tokens written to KV so far
    next_tok: jnp.ndarray  # [B, 1] int32
    out: jnp.ndarray  # [B, OUT] int32
    hist: jnp.ndarray  # [B, P+OUT] prompt+generated (for logits processors)
    out_len: jnp.ndarray  # [] int32
    done: jnp.ndarray  # [] bool
    rng: jax.Array


def ar_generate(
    params: LlamaParams,
    cfg: ModelConfig,
    ids: jnp.ndarray,  # [B, P] right-padded prompt (per-row lengths)
    true_len: jnp.ndarray,  # [] or [B] int32
    rng: jax.Array,
    *,
    max_steps: int,
    exit_layer: int,  # <= 0 => full model (reference autoregressive_generator.py:44-57)
    scfg: SamplingConfig,
    eos_ids: Tuple[int, ...],
    max_cache_len: int,
    ngram: int = 0,  # no_repeat_ngram_size (0 = off)
    kv_quant: bool = False,  # int8 KV cache
) -> GenerateOutput:
    """Whole AR generation as one XLA program.

    With ``exit_layer > 0`` this is the paper's *pure early-exit inference*
    (draft-only model): layers [0, E) + shared head, exactly what the
    reference does in that mode (autoregressive_generator.py:44-51).
    """
    b, p = ids.shape
    nlayers = exit_layer if exit_layer > 0 else cfg.num_hidden_layers
    layers = params.layers  # full stack; the cache group picks layers [0, n)
    cache = _mk_group_cache(cfg, nlayers, b, max_cache_len, kv_quant)
    v_size = cfg.vocab_size

    def ban(logits, hist, hist_len):
        if ngram <= 0:
            return logits
        return apply_ban(
            logits, no_repeat_ngram_banned(hist, hist_len, ngram, v_size)
        )

    true_len = jnp.broadcast_to(jnp.asarray(true_len, jnp.int32), (b,))

    # Prefill the padded prompt; logits at true_len-1 give the first token.
    h = llama.embed_tokens(params, ids, cfg)
    h, k, v = llama.run_layers(cfg, layers, h, cache.k, cache.v, jnp.int32(0))
    last_h = _row_gather(h, true_len - 1)  # [B, D]
    logits0 = llama.lm_logits(params, cfg, last_h[:, None])[:, 0]  # [B, V]
    hist = jnp.concatenate([ids, jnp.zeros((b, max_steps + 1), jnp.int32)], axis=1)
    logits0 = ban(logits0, hist, true_len)
    keys = _row_keys(rng, b)
    key, keys = _split_rows(keys)
    tok0 = draw(token_distribution(logits0, scfg), key, scfg)  # [B]
    hist = _row_update(hist, tok0[:, None], true_len)

    out = jnp.zeros((b, max_steps), jnp.int32)
    out = out.at[:, 0].set(tok0)
    # The reference breaks *before* appending EOS; out_len counts committed.
    state = _ARState(
        cache=KVCache(k=k, v=v),
        ctx=true_len,
        next_tok=tok0[:, None],
        out=out,
        hist=hist,
        out_len=jnp.ones((b,), jnp.int32),
        done=_is_eos(tok0, eos_ids) | (max_steps <= 1),
        rng=keys,
    )

    def cond(s: _ARState):
        return jnp.any(~s.done)

    def body(s: _ARState):
        h = llama.embed_tokens(params, s.next_tok, cfg)
        h, k, v = llama.run_layers(cfg, layers, h, s.cache.k, s.cache.v, s.ctx)
        logits = llama.lm_logits(params, cfg, h)[:, -1]
        logits = ban(logits, s.hist, true_len + s.out_len)
        key, rng = _split_rows(s.rng)
        tok = draw(token_distribution(logits, scfg), key, scfg)
        active = ~s.done  # frozen rows keep buffers/counters unchanged
        out = jnp.where(
            active[:, None], _row_update(s.out, tok[:, None], s.out_len), s.out
        )
        hist = jnp.where(
            active[:, None],
            _row_update(s.hist, tok[:, None], true_len + s.out_len),
            s.hist,
        )
        out_len = s.out_len + active.astype(jnp.int32)
        done = s.done | _is_eos(tok, eos_ids) | (out_len >= max_steps)
        return _ARState(
            cache=KVCache(k=k, v=v),
            ctx=s.ctx + active.astype(jnp.int32),
            next_tok=tok[:, None],
            out=out,
            hist=hist,
            out_len=out_len,
            done=done,
            rng=rng,
        )

    final = jax.lax.while_loop(cond, body, state)
    return GenerateOutput(
        tokens=final.out,
        num_tokens=final.out_len,
        matches=jnp.int32(0),
        drafts=jnp.int32(0),
    )


# ---------------------------------------------------------------------------
# Self-speculative engine
# ---------------------------------------------------------------------------


@struct.dataclass
class _SpecState:
    early: KVCache  # layers [0, E)
    full: KVCache  # layers [E, L)
    ctx: jnp.ndarray  # [B] int32 committed context length (excl. next_tok)
    prompt_len: jnp.ndarray  # [B] int32 (true prompt lengths)
    next_tok: jnp.ndarray  # [B, 1] int32 committed but not yet in KV
    out: jnp.ndarray  # [B, OUT] int32
    hist: jnp.ndarray  # [B, P+OUT] prompt+generated (for logits processors)
    out_len: jnp.ndarray  # [B] int32
    steps: jnp.ndarray  # [B] int32 per-row step budget (<= program max_steps)
    done: jnp.ndarray  # [B] bool
    rng: jax.Array
    matches: jnp.ndarray  # [B] int32 accepted drafts per row
    drafts: jnp.ndarray  # [B] int32 drafted tokens per row


def _spec_prefill(
    params: LlamaParams,
    cfg: ModelConfig,
    ids: jnp.ndarray,  # [B, P] right-padded prompt (per-row lengths)
    true_len: jnp.ndarray,  # [] or [B] int32
    rng: jax.Array,
    *,
    max_steps: int,
    exit_layer: int,
    num_speculations: int,
    scfg: SamplingConfig,
    eos_ids: Tuple[int, ...],
    max_cache_len: int,
    ngram: int = 0,
    kv_quant: bool = False,
) -> _SpecState:
    """Prompt prefill -> initial speculation state.

    The reference instead routes the whole prompt through its first
    draft+verify round (self_speculation_generator.py:121-170); a dedicated
    full prefill is equivalent (committed tokens are the full model's
    continuation either way) and keeps every subsequent round
    shape-identical — the "no per-round recompilation" requirement.
    """
    b, p = ids.shape
    e, nl, w = exit_layer, cfg.num_hidden_layers, num_speculations
    assert 0 < e < nl and w >= 1
    true_len = jnp.broadcast_to(jnp.asarray(true_len, jnp.int32), (b,))

    res = llama.forward_split(
        params, cfg, ids,
        _mk_group_cache(cfg, e, b, max_cache_len, kv_quant),
        _mk_group_cache(cfg, nl - e, b, max_cache_len, kv_quant),
        jnp.int32(0), e, last_pos=true_len - 1,
    )
    last_logits = res.logits[:, 0]  # [B, V]
    out_size = max_steps + w + 1  # rounds may overshoot max_steps by <= W
    hist = jnp.concatenate([ids, jnp.zeros((b, out_size), jnp.int32)], axis=1)
    if ngram > 0:
        last_logits = apply_ban(
            last_logits,
            no_repeat_ngram_banned(hist, true_len, ngram, cfg.vocab_size),
        )
    keys = _row_keys(rng, b)
    use, keys = _split_rows(keys)
    tok0 = draw(token_distribution(last_logits, scfg), use, scfg)  # [B]
    hist = _row_update(hist, tok0[:, None], true_len)

    out = jnp.zeros((b, out_size), jnp.int32).at[:, 0].set(tok0)
    return _SpecState(
        early=res.early_cache,
        full=res.full_cache,
        ctx=true_len,
        prompt_len=true_len,
        next_tok=tok0[:, None],
        out=out,
        hist=hist,
        out_len=jnp.ones((b,), jnp.int32),
        steps=jnp.full((b,), max_steps, jnp.int32),
        done=_is_eos(tok0, eos_ids) | (max_steps <= 1),
        rng=keys,
        matches=jnp.zeros((b,), jnp.int32),
        drafts=jnp.zeros((b,), jnp.int32),
    )


def _pld_propose(
    hist: jnp.ndarray,  # [B, L] committed history (prompt + outputs)
    hist_len: jnp.ndarray,  # [B] committed length incl. next_tok
    w: int,
    n: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Prompt-lookup proposals: ``(proposals [B, W], has_match [B])`` — the
    continuation of the most recent earlier occurrence of each row's
    last-``n`` committed tokens, and whether such an occurrence exists
    (the hybrid strategy's draft-source selector).

    Fully vectorized over the static history buffer (n static shifted
    compares + one reversed argmax), so a round's drafting costs O(L*n)
    VPU compares and zero model calls. Rows without a match propose their
    own trailing tokens (harmless: the verifier rejects disagreements)."""
    b, l = hist.shape
    idx = jnp.arange(l, dtype=jnp.int32)
    # each row's suffix hist[len-n .. len-1]
    sfx = jnp.take_along_axis(
        hist, jnp.clip(hist_len[:, None] - n + jnp.arange(n)[None], 0, l - 1),
        axis=1,
    )  # [B, n]
    # match[j]: the n-window ENDING at j equals the suffix
    match = jnp.ones((b, l), bool)
    for i in range(n):  # static, small
        shift = idx[None, :] - (n - 1) + i
        vals = jnp.take_along_axis(hist, jnp.clip(shift, 0, l - 1), axis=1)
        match &= (vals == sfx[:, i:i + 1]) & (shift >= 0)
    # strictly earlier than the suffix's own occurrence, window complete
    match &= (idx[None] < (hist_len - 1)[:, None]) & (idx[None] >= n - 1)
    has = jnp.any(match, axis=1)
    jstar = (l - 1) - jnp.argmax(match[:, ::-1], axis=1).astype(jnp.int32)
    jstar = jnp.where(has, jstar, jnp.maximum(hist_len - 2, 0))
    prop = jstar[:, None] + 1 + jnp.arange(w, dtype=jnp.int32)[None]
    return jnp.take_along_axis(hist, jnp.clip(prop, 0, l - 1), axis=1), has


def spec_generate(
    params: LlamaParams,
    cfg: ModelConfig,
    ids: jnp.ndarray,  # [B, P] right-padded prompt
    true_len: jnp.ndarray,  # [] int32
    rng: jax.Array,
    *,
    max_steps: int,
    exit_layer: int,
    num_speculations: int,
    scfg: SamplingConfig,
    eos_ids: Tuple[int, ...],
    max_cache_len: int,
    ngram: int = 0,
    kv_quant: bool = False,
    draft_exit_prob: float = 0.0,
    pld_ngram: int = 0,
    hybrid: bool = False,
    tree_width: int = 0,
    draft_params: Optional[LlamaParams] = None,
) -> GenerateOutput:
    """Whole self-speculative generation as one XLA program.

    One loop iteration = one draft+verify round (reference
    ``single_step_speculation``, self_speculation_generator.py:102-229).
    """
    assert draft_params is None or tree_width <= 1, \
        "draft_params is not wired into tree speculation"
    e, w = exit_layer, num_speculations
    state = _spec_prefill(
        params, cfg, ids, true_len, rng,
        max_steps=max_steps, exit_layer=e, num_speculations=w,
        scfg=scfg, eos_ids=eos_ids, max_cache_len=max_cache_len, ngram=ngram,
        kv_quant=kv_quant,
    )
    b = ids.shape[0]

    def cond(s: _SpecState):
        return jnp.any(~s.done)

    def body(s: _SpecState):
        if tree_width > 1:
            s, _, _ = _tree_round(
                params, cfg, s,
                exit_layer=e, num_speculations=w, tree_width=tree_width,
                scfg=scfg, eos_ids=eos_ids, ngram=ngram,
            )
        else:
            s, _, _ = _spec_round(
                params, cfg, s,
                max_steps=max_steps, exit_layer=e, num_speculations=w,
                scfg=scfg, eos_ids=eos_ids, ngram=ngram,
                draft_exit_prob=draft_exit_prob, pld_ngram=pld_ngram,
                hybrid=hybrid, draft_params=draft_params,
            )
        return s

    final = jax.lax.while_loop(cond, body, state)
    return GenerateOutput(
        tokens=final.out,
        num_tokens=jnp.minimum(final.out_len, final.steps),
        matches=jnp.sum(final.matches),
        drafts=jnp.sum(final.drafts),
    )


def _spec_round(
    params: LlamaParams,
    cfg: ModelConfig,
    s: _SpecState,
    *,
    max_steps: int,
    exit_layer: int,
    num_speculations: int,
    scfg: SamplingConfig,
    eos_ids: Tuple[int, ...],
    ngram: int = 0,
    draft_exit_prob: float = 0.0,
    pld_ngram: int = 0,
    hybrid: bool = False,
    draft_params: Optional[LlamaParams] = None,
) -> Tuple[_SpecState, jnp.ndarray, jnp.ndarray]:
    """One draft+verify round (reference ``single_step_speculation``,
    self_speculation_generator.py:102-229). Returns
    ``(new_state, window [B, W+1], n [B])`` where ``window[:, :n+1]`` is the
    committed token run — used by the streaming/stepped mode; the
    whole-generation while_loop discards the extras.

    ``draft_exit_prob > 0`` enables confidence-adaptive drafting (net-new,
    Draft&Verify-style): the draft loop becomes a ``lax.while_loop`` that
    stops extending a row's window once its drafted token's probability
    falls below the threshold — skipped early-layer passes are the compute
    saving at low acceptance. Committed tokens are invariant to the draft
    length (verification + rejection sampling see only the drafted prefix),
    so greedy spec == greedy AR still holds exactly.

    ``pld_ngram > 0`` switches the DRAFT source to prompt-lookup decoding
    (net-new): the window is proposed by matching the last ``pld_ngram``
    committed tokens against the history and copying what followed the
    most recent earlier occurrence — zero model calls to draft. The draft
    distributions are one-hot, under which the rejection sampler reduces
    to "accept while the verifier agrees" (exactly the greedy-draft
    degeneration this engine already uses), so greedy PLD == greedy AR
    and sampling stays distribution-correct. Verification runs the
    stitched window through ALL layers via ``forward_split`` (there is no
    draft/exit split to exploit)."""
    assert draft_params is None or (
        draft_exit_prob <= 0.0 and pld_ngram == 0 and not hybrid
    ), "draft_params applies only to the static early-exit draft path"
    b = s.next_tok.shape[0]
    e, w = exit_layer, num_speculations
    v_size = cfg.vocab_size
    # committed history lengths incl. next_tok (prompt + out_len tokens), [B]
    hist_len0 = s.prompt_len + s.out_len

    def ban(logits, hist, hist_len):
        if ngram <= 0:
            return logits
        return apply_ban(
            logits, no_repeat_ngram_banned(hist, hist_len, ngram, v_size)
        )

    # ---- draft phase: W early-exit steps under lax.scan
    # (reference draft loop, self_speculation_generator.py:121-148; the
    # reference applies logits processors to draft logits at :138-139) ----

    def _pld_draft_verify(proposals: jnp.ndarray):
        """Prompt-lookup draft + full-stack verify, as one unit.

        Drafting copies the continuation of the most recent earlier
        occurrence of the last-n committed tokens — no model calls;
        unmatched rows propose their own recent tokens, which the verifier
        simply rejects (cost: one wasted window). Verification runs the
        stitched window through ALL layers via ``forward_split`` (there is
        no draft/exit split to exploit). Returns the branch-shared tuple
        (drafts, p_draft, hist, w_dyn, rng, vlogits, early_after,
        full_after)."""
        drafts = proposals  # [B, W]
        p_draft = jax.nn.one_hot(drafts, v_size, dtype=jnp.float32)
        hist = _row_update(s.hist, drafts, hist_len0)
        w_dyn = jnp.full((b,), w, jnp.int32)
        window_ids = jnp.concatenate([s.next_tok, drafts], axis=1)
        vres = llama.forward_split(
            params, cfg, window_ids, s.early, s.full, s.ctx, e
        )
        return (drafts, p_draft, hist, w_dyn, s.rng,
                vres.logits, vres.early_cache, vres.full_cache)

    def _model_draft_verify():
        """Early-exit draft scan + remainder verify, as one unit (the
        self-speculative hot path). Same return tuple as
        ``_pld_draft_verify``.

        With ``draft_params`` (a quantized copy of the draft layer group,
        quant.quantize_draft_params — net-new, no reference counterpart):
        the draft scan reads the cheap weights, but the verify must NOT
        reuse the draft's exit hiddens (they came through quantized
        layers — feeding them to ``forward_remainder`` would verify
        against a hybrid-precision model, silently changing outputs).
        Instead the stitched window re-runs the FULL bf16 stack via
        ``forward_split`` — exactly the prompt-lookup verify — so
        committed tokens are judged by the exact base model: greedy
        draft-quant spec == greedy bf16 AR, and the early KV for
        committed positions is rewritten by the bf16 pass (draft-step KV
        within the round is quantized-derived, which only nudges draft
        quality, never correctness). The extra cost is E re-run layers in
        the verify; the saving is W draft passes at ~bits/16 the weight
        bytes — net positive whenever W >= ~2 at int8."""
        dparams = params if draft_params is None else draft_params

        def dstep(carry, i):
            early, tok, rng, hist = carry
            r = llama.forward_early(dparams, cfg, tok, early, s.ctx + i, e)
            key, rng = _split_rows(rng)
            logits = ban(r.logits[:, -1], hist, hist_len0 + i)
            probs = token_distribution(logits, scfg)  # [B, V]
            d_tok = draw(probs, key, scfg)  # [B]
            hist = _row_update(hist, d_tok[:, None], hist_len0 + i)
            return (r.cache, d_tok[:, None], rng, hist), (d_tok, probs, r.hidden[:, 0])

        (early, last_inp, rng, hist), (d_toks, d_probs, exit_h) = jax.lax.scan(
            dstep,
            (s.early, s.next_tok, s.rng, s.hist),
            jnp.arange(w, dtype=jnp.int32),
        )
        drafts = jnp.transpose(d_toks)  # [B, W]
        p_draft = jnp.transpose(d_probs, (1, 0, 2))  # [B, W, V]
        w_dyn = jnp.full((b,), w, jnp.int32)  # every row drafts the full W
        if draft_params is not None:
            # full-stack bf16 verify from s.early/s.full at s.ctx — the
            # draft scan's quantized-derived early KV advance is discarded
            window_ids = jnp.concatenate([s.next_tok, drafts], axis=1)
            vres = llama.forward_split(
                params, cfg, window_ids, s.early, s.full, s.ctx, e
            )
        else:
            exit_hidden = jnp.transpose(exit_h, (1, 0, 2))  # [B, W, D]
            vres = llama.forward_remainder(
                params, cfg, last_inp, exit_hidden, early, s.full,
                draft_len=s.ctx + w, full_len=s.ctx, exit_layer=e,
            )
        return (drafts, p_draft, hist, w_dyn, rng,
                vres.logits, vres.early_cache, vres.full_cache)

    if hybrid:
        # ---- hybrid drafting (net-new; no reference counterpart): rounds
        # whose active rows ALL have a prompt-lookup match draft for free
        # by copying; other rounds draft with the early-exit model. Both
        # branches commit through the identical acceptance/rejection math
        # below, so greedy hybrid == greedy AR exactly, and a PLD round
        # skips all W early-layer draft passes (the branch's saving).
        assert pld_ngram > 0 and draft_exit_prob <= 0.0, \
            "hybrid = pld + early-exit drafting; adaptive drafting n/a"
        proposals, has = _pld_propose(s.hist, hist_len0, w, pld_ngram)
        use_pld = jnp.all(has | s.done)
        (drafts, p_draft, hist, w_dyn, rng,
         vlogits, early_after, full_after) = jax.lax.cond(
            use_pld,
            lambda _: _pld_draft_verify(proposals),
            lambda _: _model_draft_verify(),
            operand=None,
        )
    elif pld_ngram > 0:
        proposals, _has = _pld_propose(s.hist, hist_len0, w, pld_ngram)
        (drafts, p_draft, hist, w_dyn, rng,
         vlogits, early_after, full_after) = _pld_draft_verify(proposals)
    elif draft_exit_prob <= 0.0:
        (drafts, p_draft, hist, w_dyn, rng,
         vlogits, early_after, full_after) = _model_draft_verify()
    else:
        # Confidence-adaptive drafting: a while_loop that runs only while
        # some row is still extending. Per-row bookkeeping is masked so a
        # stopped row's rng stream, history, and buffers are untouched by
        # other rows' extra iterations (per-request reproducibility); its
        # early-KV junk writes land beyond its own w_dyn frontier.
        tau = jnp.float32(draft_exit_prob)
        hid_dtype = params.embed.dtype
        carry0 = (
            s.early, s.next_tok, s.rng, s.hist,
            jnp.int32(0),  # i
            ~s.done,  # drafting: done rows never draft
            jnp.zeros((b,), jnp.int32),  # w_dyn
            jnp.zeros((b, w), jnp.int32),  # drafts
            jnp.zeros((b, w, v_size), jnp.float32),  # p_draft
            jnp.zeros((b, w, cfg.hidden_size), hid_dtype),  # exit_hidden
        )

        def dcond(c):
            return (c[4] < w) & jnp.any(c[5])

        def dbody(c):
            (early, tok, rng, hist, i, drafting, w_dyn,
             d_toks, p_dr, ex_h) = c
            r = llama.forward_early(params, cfg, tok, early, s.ctx + i, e)
            key, rng2 = _split_rows(rng)
            logits = ban(r.logits[:, -1], hist, hist_len0 + i)
            probs = token_distribution(logits, scfg)  # [B, V]
            d_tok = draw(probs, key, scfg)  # [B]
            rec = drafting
            col = jnp.arange(w) == i
            d_toks = jnp.where(
                col[None, :] & rec[:, None], d_tok[:, None], d_toks
            )
            p_dr = jnp.where(
                col[None, :, None] & rec[:, None, None],
                probs[:, None].astype(p_dr.dtype), p_dr,
            )
            ex_h = jnp.where(
                col[None, :, None] & rec[:, None, None],
                r.hidden[:, :1].astype(ex_h.dtype), ex_h,
            )
            hist = jnp.where(
                rec[:, None],
                _row_update(hist, d_tok[:, None], hist_len0 + i), hist,
            )
            tok = jnp.where(rec[:, None], d_tok[:, None], tok)
            rng = jnp.where(rec[:, None], rng2, rng)
            w_dyn = w_dyn + rec.astype(jnp.int32)
            # stop extending once the drafted token's raw-softmax
            # probability drops below the threshold (it stays in the
            # window — it was a valid sample; the verifier will judge it).
            # NOT the sampling distribution: greedy one-hot would report
            # confidence 1.0 for every token and never stop.
            lf = logits.astype(jnp.float32)
            lse = jax.scipy.special.logsumexp(lf, axis=-1)
            sel = jnp.take_along_axis(lf, d_tok[:, None], axis=-1)[:, 0]
            conf = jnp.exp(sel - lse)
            drafting = rec & (conf >= tau)
            return (r.cache, tok, rng, hist, i + 1, drafting, w_dyn,
                    d_toks, p_dr, ex_h)

        (early, last_inp, rng, hist, _, _, w_dyn,
         drafts, p_draft, exit_hidden) = jax.lax.while_loop(
            dcond, dbody, carry0
        )
        # Rows that drafted nothing (done rows / w_eff-clamped corner):
        # give them w_dyn=1 semantics over the zero buffers — acceptance
        # masks below force n=0 there, and frozen rows commit nothing.
        w_dyn = jnp.maximum(w_dyn, 1)

        # ---- verify phase: one pass over the stitched window
        # (reference self_speculation_generator.py:150-182; the pld and
        # static-draft paths verify inside their draft closures above) ----
        # per-row stitched window: the last draft token's exit hidden goes
        # at window position w_dyn (not the static W), garbage beyond it —
        # position j's verifier logits depend only on tokens < j, so
        # positions <= w_dyn are exactly the static semantics
        r_last = llama.forward_early(
            params, cfg, last_inp, early, s.ctx + w_dyn, e
        )
        h1 = r_last.hidden  # [B, 1, D]
        win_h = jnp.concatenate(
            [exit_hidden, jnp.zeros_like(exit_hidden[:, :1])], axis=1
        )  # [B, W+1, D]
        sel = jnp.arange(w + 1)[None, :, None] == w_dyn[:, None, None]
        win_h = jnp.where(sel, h1.astype(win_h.dtype), win_h)
        full_h, kf, vf = llama.run_layers(
            cfg, params.layers, win_h, s.full.k, s.full.v, s.ctx,
            layer_offset=e,
        )
        vlogits = llama.lm_logits(params, cfg, full_h)  # [B, W+1, V]
        early_after = r_last.cache
        full_after = KVCache(k=kf, v=vf)
    if ngram > 0:
        # position j verifies with history = committed + drafts < j (the
        # drafts are already in ``hist``), keeping greedy spec == greedy AR
        # under the processor
        vlogits = jnp.stack(
            [ban(vlogits[:, j], hist, hist_len0 + j) for j in range(w + 1)],
            axis=1,
        )
    p_verify = token_distribution(vlogits, scfg)  # [B, W+1, V]

    # ---- acceptance: rejection sampling; one-hot => greedy prefix match
    # (reference self_speculation_generator.py:184-199) ----
    pv_d = jnp.take_along_axis(
        p_verify[:, :w], drafts[..., None], axis=-1
    )[..., 0]  # [B, W]
    pd_d = jnp.take_along_axis(p_draft, drafts[..., None], axis=-1)[..., 0]
    ku, rng = _split_rows(rng)
    kr, rng = _split_rows(rng)
    u = jax.vmap(lambda k: jax.random.uniform(k, (w,)))(ku)  # [B, W]
    accept = u * pd_d < pv_d
    # adaptive drafting: positions past a row's dynamic draft count hold
    # garbage and are never acceptable (no-op when w_dyn == w)
    accept = accept & (jnp.arange(w)[None, :] < w_dyn[:, None])
    n_raw = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1)  # [B]
    # Reference clamps speculations near max_steps
    # (self_speculation_generator.py:63-66); we clamp acceptances so the
    # committed count and bookkeeping match.
    w_eff = jnp.clip(s.steps - s.out_len - 1, 0, w)  # [B]
    n = jnp.minimum(n_raw, w_eff)  # [B]

    # Extra token: residual resample on rejection, bonus draw otherwise
    # (reference max_fn residual :27-29,:191-199; bonus :203-205).
    # The bonus comes from p_verify at position n itself (n can be w — the
    # window has w+1 positions); p_draft only has w entries, so its gather
    # clamps — it is only consumed on true rejections, where n < w.
    pv_n = jnp.take_along_axis(p_verify, n[:, None, None], axis=1)[:, 0]
    pd_pos = jnp.minimum(n, w_dyn - 1)
    pd_n = jnp.take_along_axis(p_draft, pd_pos[:, None, None], axis=1)[:, 0]
    residual = jnp.clip(pv_n - pd_n, 0.0, None)
    residual = residual / jnp.maximum(
        jnp.sum(residual, axis=-1, keepdims=True), 1e-30
    )
    # full-window acceptance (w_dyn == w when not adaptive) or the
    # near-max_steps clamp => bonus draw, not a true rejection
    all_accepted = (n == w_dyn) | (n == w_eff)
    extra_dist = jnp.where(all_accepted[:, None], pv_n, residual)
    extra_tok = draw(extra_dist, kr, scfg)  # [B]

    # ---- commit: accepted drafts + extra token
    # (reference :201-221; KV rollback is just the ctx counter here) ----
    window = drafts  # [B, W]
    window = jnp.concatenate([window, jnp.zeros((b, 1), jnp.int32)], axis=1)
    window = jnp.where(
        jnp.arange(w + 1)[None, :] == n[:, None], extra_tok[:, None], window
    )
    active = ~s.done  # frozen rows keep buffers/counters/KV frontier fixed
    out = jnp.where(
        active[:, None], _row_update(s.out, window, s.out_len), s.out
    )
    # keep the processor history aligned: drafts are already in place; this
    # overwrites the rejected tail and writes the extra token at position n
    hist = jnp.where(
        active[:, None], _row_update(hist, window, hist_len0), s.hist
    )
    committed = jnp.where(active, n + 1, 0)  # [B]
    out_len = s.out_len + committed

    # EOS inside the committed window?
    idx = jnp.arange(w + 1)[None, :]
    eos_hit = jnp.any(_is_eos(window, eos_ids) & (idx <= n[:, None]), axis=1)
    done = s.done | eos_hit | (out_len >= s.steps)

    # ---- acceptance-rate stats (reference generator_base-style counters):
    # the reference's draft loop *breaks* after drafting an EOS
    # (self_speculation_generator.py:145-148), so its per-round draft count
    # is min(W, first-EOS-draft + 1); near max_steps its W itself shrinks
    # (self_speculation_generator.py:63-66) — a fully-clamped round (w_eff=0)
    # drafts nothing. Matches are capped to the same denominator so
    # acceptance stays in [0, 1]. Output tokens are unaffected.
    d_eos = _is_eos(drafts, eos_ids) & (
        jnp.arange(w)[None, :] < w_dyn[:, None]
    )  # [B, W]
    eos_cap = jnp.where(
        jnp.any(d_eos, axis=1),
        jnp.argmax(d_eos, axis=1).astype(jnp.int32) + 1,
        jnp.int32(w),
    )
    drafted = jnp.minimum(jnp.minimum(w_eff, eos_cap), w_dyn)  # [B]
    act32 = active.astype(jnp.int32)
    new_state = _SpecState(
        early=early_after,
        full=full_after,
        ctx=s.ctx + committed,
        prompt_len=s.prompt_len,
        next_tok=extra_tok[:, None],
        out=out,
        hist=hist,
        out_len=out_len,
        steps=s.steps,
        done=done,
        rng=rng,
        matches=s.matches + jnp.minimum(n, drafted) * act32,
        drafts=s.drafts + drafted * act32,
    )
    return new_state, window, n


def _tree_compact(
    buf: jnp.ndarray,
    start: jnp.ndarray,
    first: jnp.ndarray,
    stride: int,
    w: int,
):
    """Move the winning chain's KV slots to the contiguous frontier.

    ``buf`` [L, B, S, *rest] (bf16 KV [L, B, S, H, Dh]; int8 QuantKV values
    share the shape and its per-slot scales are [L, B, S, H]); ``start``
    [B] destination offset; source slots are the AFFINE sequence
    ``first[b] + d*stride`` for d in [0, w) (= scratch + c_star + d*k —
    chains are interleaved).

    The affine structure is load-bearing for performance: a general
    ``take_along_axis`` gather along the non-minor S axis lowered
    pathologically on v5e — 32.3 ms per round for the four KV buffers
    (vs 2.5 ms for this formulation), which single-handedly erased tree
    speculation's acceptance win at 7B (ceiling 78.5 vs linear 129.7
    tok/s). One contiguous dynamic_slice (span (w-1)*stride+1, inside the
    W*k scratch slack the cache reserves) + a static strided slice + one
    dynamic_update_slice per row are all fast-path Mosaic ops. Rows are
    unrolled (batch is static and small); vmap would re-introduce the
    gather/scatter lowering (measured 24.5 ms)."""
    lsub, b = buf.shape[:2]
    rest = buf.shape[3:]
    span = (w - 1) * stride + 1
    zero = jnp.zeros((), jnp.int32)
    first = first.astype(jnp.int32)
    start = start.astype(jnp.int32)
    for r in range(b):
        blk = jax.lax.dynamic_slice(
            buf, (zero, jnp.int32(r), first[r]) + (zero,) * len(rest),
            (lsub, 1, span) + rest,
        )
        blk = jax.lax.slice_in_dim(blk, 0, span, stride, axis=2)
        buf = jax.lax.dynamic_update_slice(
            buf, blk, (zero, jnp.int32(r), start[r]) + (zero,) * len(rest)
        )
    return buf


def _tree_round(
    params: LlamaParams,
    cfg: ModelConfig,
    s: _SpecState,
    *,
    exit_layer: int,
    num_speculations: int,
    tree_width: int,
    scfg: SamplingConfig,
    eos_ids: Tuple[int, ...],
    ngram: int = 0,
) -> Tuple[_SpecState, jnp.ndarray, jnp.ndarray]:
    """One multi-candidate draft+verify round (net-new; no reference
    counterpart — SpecInfer/Medusa-style tree speculation, redesigned for
    TPU).

    ``tree_width`` (k) chains branch at the round's FIRST draft position:
    the early-exit model's top-k candidates each continue greedily for
    ``num_speculations`` (W) depths. All k*W+1 window tokens verify in ONE
    full-model pass — on a bandwidth-bound TPU decode the verify cost is
    set by the weight bytes, not the token count, so the extra candidates
    are nearly free; what they buy is rescuing rounds whose single greedy
    draft would die at position 1 (the verifier's token is in the top-k
    with much higher probability than it is the top-1 of the draft head).

    Chains live in interleaved cache slots ``scratch + (depth-1)*k + chain``
    past the committed frontier; visibility is one extra clause on the
    attention mask (ops/attention.gqa_attention tree_meta) and the winning
    chain's KV is compacted into the contiguous frontier afterwards — no
    mask tensors, no re-prefill, static shapes throughout.

    Greedy (``scfg.sample=False``): drafts are argmax chains and commits
    follow the verifier's argmax, so greedy tree == greedy AR
    token-for-token (at most one chain can match the verifier at depth 1 —
    the top-k candidates are distinct).

    Sampling (``scfg.sample=True``): the k depth-1 candidates are i.i.d.
    draws from the draft distribution and chains extend by sampling with
    per-chain streams; acceptance runs SpecInfer-style multi-round
    rejection over the siblings (test candidates in order, shrinking the
    target to ``norm(max(q - p, 0))`` after each rejection — the committed
    branch token is exactly target-distributed), then standard pairwise
    rejection along the accepted chain. Distribution-correctness is pinned
    by the TV-distance tests in tests/test_sampling_equivalence.py.
    """
    b = s.next_tok.shape[0]
    e, w, kk = exit_layer, num_speculations, tree_width
    v_size = cfg.vocab_size
    hist_len0 = s.prompt_len + s.out_len
    scratch = (s.ctx + 1).astype(jnp.int32)  # [B]

    if scfg.sample:
        k_cand, keys = _split_rows(s.rng)  # branch candidate draws
        k_chain, keys = _split_rows(keys)  # chain extension draws
        k_ubr, keys = _split_rows(keys)  # branch acceptance uniforms
        k_uch, keys = _split_rows(keys)  # chain acceptance uniforms
        k_extra, keys_next = _split_rows(keys)  # residual/bonus draw
    else:
        keys_next = s.rng

    # ---- draft phase: root pass, then W chain steps of width k ----
    # (scratch is empty at the root step, so the plain causal rule applies)
    r0 = llama.forward_early(params, cfg, s.next_tok, s.early, s.ctx, e)
    root_h = r0.hidden  # [B, 1, D]
    root_logits = r0.logits[:, -1]
    if ngram > 0:
        root_logits = apply_ban(
            root_logits,
            no_repeat_ngram_banned(s.hist, hist_len0, ngram, v_size),
        )
    if scfg.sample:
        p0 = token_distribution(root_logits, scfg)  # [B, V]
        cand_keys = jax.vmap(lambda kr: jax.random.split(kr, kk))(k_cand)
        top = jax.vmap(
            lambda ck: draw(p0, ck, scfg), in_axes=1, out_axes=1
        )(cand_keys).astype(jnp.int32)  # [B, k] i.i.d. draws from p0
    else:
        _, top = jax.lax.top_k(root_logits, kk)  # [B, k] candidates
        top = top.astype(jnp.int32)
    q_chain_d = jnp.broadcast_to(jnp.arange(kk, dtype=jnp.int32)[None], (b, kk))

    # per-chain committed+draft history, for ngram bans along each chain
    # (each chain's prefix differs from depth 1 on)
    if ngram > 0:
        hist_tree0 = jax.vmap(
            lambda t_c: _row_update(s.hist, t_c[:, None], hist_len0),
            in_axes=1, out_axes=1,
        )(top)  # [B, k, L]
    else:
        hist_tree0 = jnp.zeros((b, kk, 1), jnp.int32)  # untouched dummy

    def dstep(carry, i):
        ke, ve, tips, hist_tree = carry  # tips [B, k]: depth-(i+1) tokens
        h = llama.embed_tokens(params, tips, cfg)
        h, ke, ve = llama.run_layers(
            cfg, params.layers, h, ke, ve, s.ctx, layer_offset=0,
            q_positions=jnp.broadcast_to((s.ctx + 1 + i)[:, None], (b, kk)),
            write_pos=scratch + i * kk,
            tree_meta=(q_chain_d, scratch, kk),
        )
        logits = llama.lm_logits(params, cfg, h)  # [B, k, V]
        if ngram > 0:
            banned = jax.vmap(
                lambda hc: no_repeat_ngram_banned(
                    hc, hist_len0 + 1 + i, ngram, v_size
                ),
                in_axes=1, out_axes=1,
            )(hist_tree)  # [B, k, V]
            logits = apply_ban(logits, banned)
        if scfg.sample:
            pd = token_distribution(logits, scfg)  # [B, k, V]
            kk_i = jax.vmap(lambda kr: jax.random.fold_in(kr, i))(k_chain)
            ck = jax.vmap(lambda kr: jax.random.split(kr, kk))(kk_i)
            nxt = jax.vmap(
                lambda kc, pc: draw(pc, kc, scfg), in_axes=1, out_axes=1
            )(ck, pd).astype(jnp.int32)
        else:
            pd = jnp.zeros((b, kk, 0), jnp.float32)  # unused placeholder
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if ngram > 0:
            hist_tree = jax.vmap(
                lambda hc, t_c: _row_update(
                    hc, t_c[:, None], hist_len0 + 1 + i
                ),
                in_axes=(1, 1), out_axes=1,
            )(hist_tree, nxt)
        return (ke, ve, nxt, hist_tree), (tips, h, pd)

    (ke, ve, _, hist_tree), (toks_steps, h_steps, pd_steps) = jax.lax.scan(
        dstep, (r0.cache.k, r0.cache.v, top, hist_tree0),
        jnp.arange(w, dtype=jnp.int32),
    )
    chain_toks = jnp.transpose(toks_steps, (1, 0, 2))  # [B, W, k]
    draft_h = jnp.transpose(h_steps, (1, 0, 2, 3)).reshape(b, w * kk, -1)

    # ---- verify phase: one full-stack pass over the whole tree window ----
    win_h = jnp.concatenate([root_h, draft_h], axis=1)  # [B, 1+W*k, D]
    offs = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        1 + jnp.repeat(jnp.arange(w, dtype=jnp.int32), kk),
    ])
    q_chain_v = jnp.concatenate([
        -jnp.ones((1,), jnp.int32),
        jnp.tile(jnp.arange(kk, dtype=jnp.int32), w),
    ])
    full_h, kf, vf = llama.run_layers(
        cfg, params.layers, win_h, s.full.k, s.full.v, s.ctx, layer_offset=e,
        q_positions=s.ctx[:, None] + offs[None, :],
        write_pos=s.ctx,
        tree_meta=(jnp.broadcast_to(q_chain_v[None], (b, 1 + w * kk)),
                   scratch, kk),
    )
    vlogits = llama.lm_logits(params, cfg, full_h)  # [B, 1+W*k, V] fp32
    if ngram > 0:
        # verifier bans mirror the drafts': the root position uses the
        # committed history; node (d, c) uses chain c's prefix of length
        # hist_len0 + d + 1 — identical prefixes to what AR-with-bans
        # would see along the accepted chain, so greedy tree == greedy AR
        # holds under bans too
        root_ban = no_repeat_ngram_banned(s.hist, hist_len0, ngram, v_size)
        lens = hist_len0[:, None] + 1 + jnp.arange(w, dtype=jnp.int32)[None]
        node_ban = jax.vmap(  # over depth
            lambda ln: jax.vmap(  # over chain
                lambda hc: no_repeat_ngram_banned(hc, ln, ngram, v_size),
                in_axes=1, out_axes=1,
            )(hist_tree),
            in_axes=1, out_axes=1,
        )(lens)  # [B, W, k, V]
        vlogits = apply_ban(vlogits, jnp.concatenate(
            [root_ban[:, None], node_ban.reshape(b, w * kk, v_size)], axis=1
        ))

    w_eff = jnp.clip(s.steps - s.out_len - 1, 0, w)  # near-max_steps clamp
    if not scfg.sample:
        # ---- acceptance (greedy): longest verifier-argmax chain prefix ----
        g = jnp.argmax(vlogits, axis=-1).astype(jnp.int32)  # [B, 1+W*k]
        g_root = g[:, 0]
        g_nodes = g[:, 1:].reshape(b, w, kk)  # greedy continuation of (d, c)
        ok = jnp.concatenate([
            chain_toks[:, :1] == g_root[:, None, None],
            chain_toks[:, 1:] == g_nodes[:, :-1],
        ], axis=1)  # [B, W, k]
        n_c = jnp.sum(
            jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1
        )  # [B, k]
        c_star = jnp.argmax(n_c, axis=1).astype(jnp.int32)  # [B]
        n = jnp.minimum(jnp.max(n_c, axis=1), w_eff)  # [B]
        # bonus: the verifier's token after the accepted prefix
        bonus_idx = jnp.where(n > 0, 1 + (n - 1) * kk + c_star, 0)
        extra_tok = jnp.take_along_axis(g, bonus_idx[:, None], axis=1)[:, 0]
    else:
        # ---- acceptance (sampling): multi-round rejection at the branch,
        # pairwise rejection along the accepted chain ----
        q_all = token_distribution(vlogits, scfg)  # [B, 1+W*k, V] warped
        q_root = q_all[:, 0]
        q_nodes = q_all[:, 1:].reshape(b, w, kk, v_size)
        p_chain = jnp.transpose(pd_steps, (1, 0, 2, 3))  # [B, W, k, V]
        # SpecInfer multi-round rejection: candidates are i.i.d. ~ p0, so
        # test them in order; each rejection shrinks the target to
        # norm(max(q - p0, 0)); the first passing candidate's token is
        # exactly target-distributed, as is the final-residual resample.
        u_br = jax.vmap(lambda kr: jax.random.uniform(kr, (kk,)))(k_ubr)
        qq = q_root
        acc_c = jnp.full((b,), -1, jnp.int32)
        for c in range(kk):  # k is small and static: unrolled
            x_c = top[:, c:c + 1]
            qx = jnp.take_along_axis(qq, x_c, axis=1)[:, 0]
            px = jnp.take_along_axis(p0, x_c, axis=1)[:, 0]
            ok_c = (u_br[:, c] * px <= qx) & (acc_c < 0)
            acc_c = jnp.where(ok_c, c, acc_c)
            resid = jnp.clip(qq - p0, 0.0, None)
            resid = resid / jnp.maximum(
                jnp.sum(resid, axis=-1, keepdims=True), 1e-30
            )
            qq = jnp.where((acc_c < 0)[:, None], resid, qq)
        branch_resid = qq  # valid exactly where every candidate rejected
        branch_ok = acc_c >= 0
        c_star = jnp.maximum(acc_c, 0)
        # winning chain's tokens/dists; token depth d+1 (d >= 1) was drawn
        # from p_chain[d-1] and is verified against q_nodes[d-1]
        toks_c = jnp.take_along_axis(
            chain_toks, c_star[:, None, None], axis=2
        )[..., 0]  # [B, W]
        q_c = jnp.take_along_axis(
            q_nodes, c_star[:, None, None, None], axis=2
        )[:, :, 0]  # [B, W, V]
        p_c = jnp.take_along_axis(
            p_chain, c_star[:, None, None, None], axis=2
        )[:, :, 0]  # [B, W, V]
        u_ch = jax.vmap(lambda kr: jax.random.uniform(kr, (w,)))(k_uch)
        xq = jnp.take_along_axis(
            q_c[:, : w - 1], toks_c[:, 1:, None], axis=2
        )[..., 0]  # [B, W-1]
        xp = jnp.take_along_axis(
            p_c[:, : w - 1], toks_c[:, 1:, None], axis=2
        )[..., 0]
        ok_full = jnp.concatenate(
            [branch_ok[:, None], u_ch[:, : w - 1] * xp <= xq], axis=1
        )  # [B, W]
        n_acc = jnp.sum(jnp.cumprod(ok_full.astype(jnp.int32), axis=1), axis=1)
        n = jnp.minimum(n_acc, w_eff)
        # extra token: residual resample on a true rejection, bonus draw
        # otherwise (incl. the near-max_steps clamp) — mirrors _spec_round
        q_at = jnp.concatenate([q_root[:, None], q_c], axis=1)  # [B, W+1, V]
        q_n = jnp.take_along_axis(q_at, n[:, None, None], axis=1)[:, 0]
        p_at = jnp.concatenate([p0[:, None], p_c[:, : w - 1]], axis=1)
        p_n = jnp.take_along_axis(
            p_at, jnp.minimum(n, w - 1)[:, None, None], axis=1
        )[:, 0]
        pair_resid = jnp.clip(q_n - p_n, 0.0, None)
        pair_resid = pair_resid / jnp.maximum(
            jnp.sum(pair_resid, axis=-1, keepdims=True), 1e-30
        )
        true_reject = (n == n_acc) & (n_acc < w)
        extra_dist = jnp.where(
            true_reject[:, None],
            jnp.where((n == 0)[:, None], branch_resid, pair_resid),
            q_n,
        )
        extra_tok = draw(extra_dist, k_extra, scfg)

    # ---- commit: winning chain prefix + extra (mirrors _spec_round) ----
    win_toks = jnp.take_along_axis(
        chain_toks, c_star[:, None, None], axis=2
    )[..., 0]  # [B, W]
    window = jnp.concatenate([win_toks, jnp.zeros((b, 1), jnp.int32)], axis=1)
    window = jnp.where(
        jnp.arange(w + 1)[None, :] == n[:, None], extra_tok[:, None], window
    )
    active = ~s.done
    out = jnp.where(
        active[:, None], _row_update(s.out, window, s.out_len), s.out
    )
    hist = jnp.where(
        active[:, None], _row_update(s.hist, window, hist_len0), s.hist
    )
    committed = jnp.where(active, n + 1, 0)
    out_len = s.out_len + committed
    idx = jnp.arange(w + 1)[None, :]
    eos_hit = jnp.any(_is_eos(window, eos_ids) & (idx <= n[:, None]), axis=1)
    done = s.done | eos_hit | (out_len >= s.steps)

    # ---- compact the winning chain's KV into the contiguous frontier ----
    # source slots are affine: scratch + c_star + d*kk (see _tree_compact)
    first = scratch + c_star
    src = scratch[:, None] + (
        jnp.arange(w, dtype=jnp.int32) * kk
    )[None, :] + c_star[:, None]  # [B, W] absolute source slots (paged path)

    def compact(group):
        # contiguous: raw arrays or QuantKV pytrees (values + scales);
        # paged: a W-slot gather+scatter through the page table
        from layerskip_tpu.ops.paged_kv import PagedKV, PagedQuantKV

        if isinstance(group, (PagedKV, PagedQuantKV)):
            return group.tree_compact(scratch, src)
        return jax.tree.map(
            lambda a: _tree_compact(a, scratch, first, kk, w), group
        )

    early_after = KVCache(k=compact(ke), v=compact(ve))
    full_after = KVCache(k=compact(kf), v=compact(vf))

    d_eos = _is_eos(win_toks, eos_ids)
    eos_cap = jnp.where(
        jnp.any(d_eos, axis=1),
        jnp.argmax(d_eos, axis=1).astype(jnp.int32) + 1,
        jnp.int32(w),
    )
    drafted = jnp.minimum(w_eff, eos_cap)
    act32 = active.astype(jnp.int32)
    new_state = _SpecState(
        early=early_after,
        full=full_after,
        ctx=s.ctx + committed,
        prompt_len=s.prompt_len,
        next_tok=extra_tok[:, None],
        out=out,
        hist=hist,
        out_len=out_len,
        steps=s.steps,
        done=done,
        rng=keys_next,
        matches=s.matches + jnp.minimum(n, drafted) * act32,
        drafts=s.drafts + drafted * act32,
    )
    return new_state, window, n



def _spec_insert_rows(
    params: LlamaParams,
    cfg: ModelConfig,
    s: _SpecState,
    row_mask: jnp.ndarray,  # [B] bool: rows to (re)initialize
    ids: jnp.ndarray,  # [B, P] right-padded prompts (only masked rows read)
    true_len: jnp.ndarray,  # [B] int32
    seeds: Optional[jnp.ndarray] = None,  # [B] int32 per-request sampling seeds
    steps: Optional[jnp.ndarray] = None,  # [B] int32 per-request max tokens
    new_table: Optional[jnp.ndarray] = None,  # [B, maxp] page table rows
    # for the inserted slots (paged KV only; see ops/paged_kv.py)
    prefix_len: Optional[jnp.ndarray] = None,  # [B] int32 page-aligned
    # cached-prompt-prefix lengths (prefix caching, paged only): those
    # positions' KV already lives in shared pages mapped by ``new_table``,
    # so the prefill runs on the prompt SUFFIX at past=prefix_len
    suffix_ids: Optional[jnp.ndarray] = None,  # [B, SB] host-shifted suffix
    # tokens in a NARROW bucket (SB < P): the prefill then computes SB
    # positions instead of P — the prefix cache's time-to-first-token win
    # (a static [B, P] window costs full-prompt FLOPs even on a hit)
    *,
    max_steps: int,
    exit_layer: int,
    num_speculations: int,
    scfg: SamplingConfig,
    eos_ids: Tuple[int, ...],
    ngram: int = 0,
) -> _SpecState:
    """Prefill new requests into selected rows of a LIVE speculation state.

    The continuous-batching primitive (net-new; the reference is batch=1):
    frozen/in-flight rows keep their KV, counters and buffers while the
    masked rows are prefilled from scratch. The batched prefill necessarily
    runs every row through the prompt pass; non-masked rows write into a
    trash region past their frontier (positions ``ctx``..), which the
    masking rule keeps invisible and later writes legitimately overwrite —
    and their state is restored wholesale afterwards, so the wasted compute
    is one prompt pass per insertion.
    """
    from layerskip_tpu.ops.paged_kv import PagedKV, PagedQuantKV

    b, p_bucket = ids.shape
    e, w = exit_layer, num_speculations
    if isinstance(s.early.k, (PagedKV, PagedQuantKV)):
        # paged: the trash region starts at the page-aligned trash_start;
        # merge the inserted rows' page-table entries (same table for k/v
        # and both layer groups) BEFORE the prefill writes through it
        park = jnp.int32(s.early.k.trash_start)

        def upd(pkv):
            tbl = jnp.where(
                row_mask[None, :, None], new_table[None], pkv.table
            )
            return pkv.replace(table=tbl)

        s = s.replace(
            early=KVCache(k=upd(s.early.k), v=upd(s.early.v)),
            full=KVCache(k=upd(s.full.k), v=upd(s.full.v)),
        )
    else:
        max_len = jax.tree.leaves(s.early)[0].shape[2]
        # Frozen rows write into a dedicated trash zone at the end of the KV
        # buffer (the continuous-mode cache allocates ``p_bucket`` extra
        # slots for exactly this): beyond every possible valid frontier,
        # never visible to the masking rule, never read.
        park = jnp.int32(max_len - p_bucket)
    if prefix_len is None:
        past = jnp.where(row_mask, 0, park)
        res = llama.forward_split(
            params, cfg, ids, s.early, s.full, past, e,
            last_pos=true_len - 1,
        )
        last_logits = res.logits[:, 0]  # [B, V]
    else:
        # prefix caching: the first ``prefix_len`` positions' KV is already
        # in shared pages — prefill only the suffix, shifted to the front
        # of the window, at past=prefix_len. Positions past the true suffix
        # process junk-but-real token ids; their KV lands beyond the row's
        # frontier (invisible to the mask rule, legitimately overwritten by
        # later decode writes) — the same argument as padded prompt tails.
        pl = jnp.where(row_mask, prefix_len.astype(jnp.int32), 0)
        if suffix_ids is None:
            idx = pl[:, None] + jnp.arange(p_bucket, dtype=jnp.int32)[None]
            suffix_ids = jnp.take_along_axis(
                ids, jnp.minimum(idx, p_bucket - 1), axis=1
            )
        suffix_len = jnp.maximum(true_len - pl, 1)
        past = jnp.where(row_mask, pl, park)
        res = llama.forward_split(
            params, cfg, suffix_ids, s.early, s.full, past, e,
            last_pos=suffix_len - 1,
        )
        last_logits = res.logits[:, 0]  # [B, V]
    out_size = max_steps + w + 1
    hist_new = jnp.concatenate(
        [ids, jnp.zeros((b, out_size), jnp.int32)], axis=1
    )
    if ngram > 0:
        last_logits = apply_ban(
            last_logits,
            no_repeat_ngram_banned(hist_new, true_len, ngram, cfg.vocab_size),
        )
    keys = _row_keys(s.rng, b)
    if seeds is not None:
        base = jax.random.PRNGKey(0)
        fresh = jax.vmap(lambda sd: jax.random.fold_in(base, sd))(seeds)
        keys = jnp.where(row_mask[:, None], fresh, keys)
    key, keys = _split_rows(keys)
    tok0 = draw(token_distribution(last_logits, scfg), key, scfg)
    hist_new = _row_update(hist_new, tok0[:, None], true_len)
    out_new = jnp.zeros((b, out_size), jnp.int32).at[:, 0].set(tok0)

    m = row_mask
    m1 = m[:, None]
    row_steps = (
        jnp.clip(steps, 1, max_steps) if steps is not None
        else jnp.full((b,), max_steps, jnp.int32)
    )
    return _SpecState(
        early=res.early_cache,
        full=res.full_cache,
        ctx=jnp.where(m, true_len, s.ctx),
        prompt_len=jnp.where(m, true_len, s.prompt_len),
        next_tok=jnp.where(m1, tok0[:, None], s.next_tok),
        out=jnp.where(m1, out_new, s.out),
        hist=jnp.where(m1, hist_new, s.hist),
        out_len=jnp.where(m, 1, s.out_len),
        steps=jnp.where(m, row_steps, s.steps),
        done=jnp.where(
            m, _is_eos(tok0, eos_ids) | (row_steps <= 1), s.done
        ),
        rng=keys,
        matches=jnp.where(m, 0, s.matches),
        drafts=jnp.where(m, 0, s.drafts),
    )


def _chunk_prefill_rows(
    params: LlamaParams,
    cfg: ModelConfig,
    s: _SpecState,
    row_mask: jnp.ndarray,  # [B] bool: rows being chunk-prefilled
    chunk_ids: jnp.ndarray,  # [B, C] one C-token slice of the prompt
    off: jnp.ndarray,  # scalar int32: chunk start position
    *,
    exit_layer: int,
    prompt_bucket: int,
) -> _SpecState:
    """KV-only prefill of ONE prompt chunk into selected rows (net-new;
    Sarathi-style chunked prefill for continuous batching — the reference
    is batch=1 and prefills whole prompts).

    Writes the masked rows' KV at positions [off, off+C); frozen rows pass
    through the trash zone exactly as in ``_spec_insert_rows``. No sampling
    or counter updates happen here. The inserted row's ``ctx`` is PARKED at
    the trash start for the duration of the chunked insert: decode rounds
    interleaved between chunks run every row (done rows included) and write
    W+1 KV slots at each row's ctx — without parking, those writes would
    land inside the half-built prompt region of a row whose previous
    request ended there. ``_spec_insert_rows`` with a 1-token suffix window
    (prefix_len = true_len - 1) finalizes: samples the first token, sets
    the real ctx/prompt_len/counters, and un-parks the row.
    """
    b = chunk_ids.shape[0]
    max_len = jax.tree.leaves(s.early)[0].shape[2]
    park = jnp.int32(max_len - prompt_bucket)
    past = jnp.where(row_mask, jnp.asarray(off, jnp.int32), park)
    res = llama.forward_split(
        params, cfg, chunk_ids, s.early, s.full, past, exit_layer,
        last_pos=jnp.zeros((b,), jnp.int32),  # logits discarded; project
        # one position so the [B, C, V] tensor is never materialized
    )
    return s.replace(
        early=res.early_cache,
        full=res.full_cache,
        ctx=jnp.where(row_mask, park, s.ctx),
    )


# ---------------------------------------------------------------------------
# Compiled-engine facade
# ---------------------------------------------------------------------------


def _bucket(n: int, sizes: Sequence[int] = (64, 128, 256, 512, 1024, 2048, 4096)) -> int:
    for s in sizes:
        if n <= s:
            return s
    return ((n + 1023) // 1024) * 1024


class _LRUCache:
    """Bounded executable cache with dict syntax.

    Eviction calls ``clear_cache()`` on the evicted ``jax.jit`` wrappers
    (tuples of them for the stepped/continuous entries), releasing the
    compiled executable and the KV-zeros constants it pins on device.
    """

    def __init__(self, maxsize: int):
        import collections

        self.maxsize = max(int(maxsize), 1)
        self._data = collections.OrderedDict()
        self.evictions = 0

    def __contains__(self, key) -> bool:
        return key in self._data

    def __len__(self) -> int:
        return len(self._data)

    def __getitem__(self, key):
        self._data.move_to_end(key)
        return self._data[key]

    def __setitem__(self, key, value) -> None:
        self._data[key] = value
        self._data.move_to_end(key)
        while len(self._data) > self.maxsize:
            _, old = self._data.popitem(last=False)
            self.evictions += 1
            for fn in old if isinstance(old, tuple) else (old,):
                if hasattr(fn, "clear_cache"):
                    fn.clear_cache()


class Engine:
    """Holds params and a cache of jit-compiled generate functions.

    One executable per (strategy, prompt-bucket, batch) — everything after
    prefill is shape-invariant across rounds (SURVEY §7: no per-round
    recompilation).
    """

    def __init__(self, params: LlamaParams, cfg: ModelConfig,
                 mesh=None, kv_shard_axis: Optional[str] = None,
                 exec_cache_size: Optional[int] = None):
        # quantized draft-layer-group copies, keyed (exit_layer, bits) —
        # built once per engine (int8 at 7B E=8 holds ~1.6 GB of HBM).
        # Declared before ``params`` (whose setter invalidates it).
        self._draft_cache: dict = {}
        self.params = params
        self.cfg = cfg
        # sequence-sharded decode: shard the KV sequence dim over
        # ``kv_shard_axis`` of ``mesh`` (see ops/attention.kv_seq_sharding)
        self.mesh = mesh
        self.kv_shard_axis = kv_shard_axis
        assert kv_shard_axis is None or mesh is not None, \
            "kv_shard_axis requires a mesh"
        # per-instance executable caches — a class-level functools.lru_cache
        # would key on ``self`` and keep params alive forever (a leak when
        # engines are rebuilt, e.g. bench size fallback). Bounded LRU: every
        # (bucket, batch, max_steps, scfg, ...) combo pins a compiled
        # executable plus its KV-zeros constants, so a long-lived gather
        # server fed varied GenerationConfigs would otherwise grow without
        # bound (VERDICT r2 #6).
        if exec_cache_size is None:
            exec_cache_size = int(os.environ.get("LAYERSKIP_EXEC_CACHE", 64))
        self._exec_cache = _LRUCache(exec_cache_size)
        self._stepped_cache = _LRUCache(exec_cache_size)

    @property
    def params(self) -> LlamaParams:
        return self._params

    @params.setter
    def params(self, value) -> None:
        # swapping weights (bench.py tail_eps sweeps) must drop the
        # quantized draft copies built from the OLD weights
        self._params = value
        self._draft_cache.clear()

    def _resolve_draft_quant(self, gen_cfg, strategy: str,
                             tree_width: int) -> int:
        """Effective draft_quant bits for this request: only the linear
        early-exit draft path drafts with a separate weight copy, and a
        base model that is ALREADY quantized drafts cheaply as-is."""
        draft_quant = int(getattr(gen_cfg, "draft_quant", 0) or 0)
        if strategy != "self_speculative" or tree_width > 1:
            return 0
        if draft_quant:
            from layerskip_tpu.ops.linear import QuantTensor

            assert not gen_cfg.draft_exit_prob, \
                "draft_quant excludes adaptive drafting"
            if isinstance(self.params.layers.wq, QuantTensor):
                return 0
        return draft_quant

    def _draft_params(self, exit_layer: int, bits: int, head: bool = False,
                      mlp_only: bool = False):
        """Quantized copy of layers [0, exit_layer) for cheap drafting
        (GenerationConfig.draft_quant; see quant.quantize_draft_params).
        ``head`` additionally quantizes the drafter's exit head
        (GenerationConfig.draft_quant_head); ``mlp_only`` keeps attention
        bf16 and quantizes only the MLP triple
        (GenerationConfig.draft_quant_mlp_only)."""
        key = (exit_layer, bits, head, mlp_only)
        if key not in self._draft_cache:
            from layerskip_tpu.quant import (
                _MLP_FIELDS, _QUANT_FIELDS, quantize_draft_params,
            )

            group = 0 if bits == 8 else 128
            self._draft_cache[key] = quantize_draft_params(
                self.params, exit_layer, bits=bits, group=group,
                quantize_head=head,
                fields=_MLP_FIELDS if mlp_only else _QUANT_FIELDS,
            )
        return self._draft_cache[key]

    def _trace_ctx(self):
        """Context active around compiled-fn calls: the mesh (for bare-
        PartitionSpec sharding constraints) and the KV sequence-shard flag
        (baked in at trace time)."""
        import contextlib

        from layerskip_tpu.ops.attention import kv_seq_sharding

        stack = contextlib.ExitStack()
        if self.mesh is not None:
            stack.enter_context(self.mesh)
        if self.kv_shard_axis is not None:
            stack.enter_context(kv_seq_sharding(self.kv_shard_axis))
        return stack

    def _compiled(
        self,
        strategy: str,
        prompt_bucket: int,
        batch: int,
        max_steps: int,
        exit_layer: int,
        num_speculations: int,
        scfg: SamplingConfig,
        eos_ids: Tuple[int, ...],
        ngram: int = 0,
        kv_quant: bool = False,
        draft_exit_prob: float = 0.0,
        pld_ngram: int = 0,
        tree_width: int = 0,
        draft_quant: int = 0,
        draft_quant_head: bool = False,
        draft_quant_mlp: bool = False,
    ):
        key = (strategy, prompt_bucket, batch, max_steps, exit_layer,
               num_speculations, scfg, eos_ids, ngram, kv_quant,
               draft_exit_prob, pld_ngram, tree_width, draft_quant,
               draft_quant_head, draft_quant_mlp)
        if key in self._exec_cache:
            return self._exec_cache[key]
        # tree speculation parks k interleaved chains past the frontier
        spec_slack = num_speculations * max(tree_width, 1)
        max_cache_len = prompt_bucket + max_steps + spec_slack + 2
        if prompt_bucket % 256 == 0:
            # round the KV buffer to the flash-prefill kernel's block size so
            # long-prompt prefills dispatch to it (ops/attention.py)
            max_cache_len = -(-max_cache_len // 512) * 512

        if strategy in ("self_speculative", "prompt_lookup", "hybrid"):
            pld = pld_ngram if strategy in ("prompt_lookup", "hybrid") else 0

            def fn(params, draft, ids, true_len, rng):
                return spec_generate(
                    params, self.cfg, ids, true_len, rng,
                    max_steps=max_steps, exit_layer=exit_layer,
                    num_speculations=num_speculations, scfg=scfg,
                    eos_ids=eos_ids, max_cache_len=max_cache_len, ngram=ngram,
                    kv_quant=kv_quant, draft_exit_prob=draft_exit_prob,
                    pld_ngram=pld, hybrid=(strategy == "hybrid"),
                    tree_width=tree_width, draft_params=draft,
                )

        elif strategy == "autoregressive":

            def fn(params, draft, ids, true_len, rng):
                del draft  # AR has no draft pass
                return ar_generate(
                    params, self.cfg, ids, true_len, rng,
                    max_steps=max_steps, exit_layer=exit_layer, scfg=scfg,
                    eos_ids=eos_ids, max_cache_len=max_cache_len, ngram=ngram,
                    kv_quant=kv_quant,
                )

        else:
            raise ValueError(f"unknown strategy: {strategy}")

        self._exec_cache[key] = jax.jit(fn)
        return self._exec_cache[key]

    def generate(
        self,
        prompt_ids,  # list[int] (batch=1), list[list[int]] (ragged batch), or [B, T]
        gen_cfg: GenerationConfig,
        rng: Optional[jax.Array] = None,
        eos_ids: Sequence[int] = (),
    ) -> GenerateOutput:
        padded, true_lens = _pad_prompts(
            prompt_ids, fixed_bucket=gen_cfg.max_prompt_len or None
        )
        b, bucket = padded.shape

        scfg = SamplingConfig(
            sample=gen_cfg.sample,
            temperature=gen_cfg.temperature,
            top_k=gen_cfg.top_k,
            top_p=gen_cfg.top_p,
        )
        eos = tuple(int(x) for x in eos_ids) or tuple(self.cfg.eos_token_ids)
        if gen_cfg.stop_token_ids:
            eos = eos + tuple(int(x) for x in gen_cfg.stop_token_ids)
        exit_layer = gen_cfg.exit_layer
        strategy = gen_cfg.generation_strategy
        tree_width = int(gen_cfg.spec_tree_width or 0)
        if strategy == "self_speculative":
            assert exit_layer > 0 and gen_cfg.num_speculations > 0
            if tree_width > 1:
                # greedy follows the verifier's argmax; sampling runs
                # SpecInfer-style multi-round rejection (_tree_round)
                assert not gen_cfg.draft_exit_prob, \
                    "spec_tree_width excludes adaptive drafting"
        elif strategy == "prompt_lookup":
            assert gen_cfg.num_speculations > 0
            # the exit split is irrelevant to PLD math; any valid split works
            if exit_layer <= 0:
                exit_layer = max(self.cfg.num_hidden_layers // 2, 1)
        elif strategy == "hybrid":
            # pld drafting when the context matches, early-exit otherwise
            assert exit_layer > 0 and gen_cfg.num_speculations > 0
            assert (gen_cfg.pld_ngram or 0) > 0
            assert not gen_cfg.draft_exit_prob, \
                "hybrid and adaptive drafting are mutually exclusive"
        if strategy != "self_speculative":
            tree_width = 0  # trees only apply to early-exit drafting
        max_steps = gen_cfg.max_steps
        cap = gen_cfg.max_seq_len or self.cfg.max_position_embeddings
        if bucket + max_steps > cap:
            # keep positions inside the model's trained RoPE range
            max_steps = max(cap - bucket, 1)
        draft_quant = self._resolve_draft_quant(gen_cfg, strategy, tree_width)
        # fidelity knobs are no-ops without draft_quant: normalize them out
        # of the cache key so configs differing only in dead knobs share one
        # executable (one-executable-per-donated-state invariant)
        dq_head = bool(draft_quant) and bool(
            getattr(gen_cfg, "draft_quant_head", False))
        dq_mlp = bool(draft_quant) and bool(
            getattr(gen_cfg, "draft_quant_mlp_only", False))
        fn = self._compiled(
            strategy, bucket, b, max_steps, exit_layer,
            max(gen_cfg.num_speculations, 1), scfg, eos,
            int(gen_cfg.no_repeat_ngram_size or 0), bool(gen_cfg.kv_quant),
            float(gen_cfg.draft_exit_prob or 0.0),
            int(gen_cfg.pld_ngram or 0),
            tree_width,
            draft_quant,
            dq_head,
            dq_mlp,
        )
        draft = (self._draft_params(exit_layer, draft_quant, dq_head,
                                    dq_mlp)
                 if draft_quant else None)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        with self._trace_ctx():
            return fn(
                self.params, draft, jnp.asarray(padded),
                jnp.asarray(true_lens), rng
            )

    # -- continuous batching mode -------------------------------------------

    def _compiled_continuous(
        self,
        prompt_bucket: int,
        batch: int,
        max_steps: int,
        exit_layer: int,
        num_speculations: int,
        scfg: SamplingConfig,
        eos_ids: Tuple[int, ...],
        ngram: int = 0,
        kv_quant: bool = False,
        paged: Optional[Tuple[int, int]] = None,  # (pool_pages, page_size)
        draft_exit_prob: float = 0.0,
        pld_ngram: int = 0,
        hybrid: bool = False,
        tree_width: int = 0,
        draft_quant: int = 0,
        draft_quant_head: bool = False,
        draft_quant_mlp: bool = False,
    ):
        """(blank_state_fn, insert_fn, round_fn[, park_fn]) for in-flight
        batching.

        The KV cache gets ``prompt_bucket`` extra trailing slots — the trash
        zone frozen rows write through during other rows' prefills. Under
        ``paged`` the trash is a dedicated page region instead and slots map
        logical positions through per-row page tables (ops/paged_kv.py).
        """
        key = ("cont", prompt_bucket, batch, max_steps, exit_layer,
               num_speculations, scfg, eos_ids, ngram, kv_quant, paged,
               draft_exit_prob, pld_ngram, hybrid, tree_width, draft_quant,
               draft_quant_head, draft_quant_mlp)
        if key in self._stepped_cache:
            return self._stepped_cache[key]
        max_cache_len = (2 * prompt_bucket + max_steps
                         + num_speculations * max(tree_width, 1) + 2)
        cfg = self.cfg
        e, nl, w = exit_layer, cfg.num_hidden_layers, num_speculations
        out_size = max_steps + num_speculations + 1
        if paged:
            from layerskip_tpu.ops.paged_kv import init_paged_group

            pool_pages, page_size = paged
            capacity = (prompt_bucket + max_steps
                        + num_speculations * max(tree_width, 1) + 2)

            def _mk_paged(nlayers):
                return init_paged_group(
                    cfg, nlayers, batch, pool_pages, page_size,
                    capacity, prompt_bucket, quant=kv_quant,
                )

        def blank_state():
            b = batch
            if paged:
                return _SpecState(
                    early=_mk_paged(e),
                    full=_mk_paged(nl - e),
                    ctx=jnp.zeros((b,), jnp.int32),
                    prompt_len=jnp.ones((b,), jnp.int32),
                    next_tok=jnp.zeros((b, 1), jnp.int32),
                    out=jnp.zeros((b, out_size), jnp.int32),
                    hist=jnp.zeros((b, prompt_bucket + out_size), jnp.int32),
                    out_len=jnp.zeros((b,), jnp.int32),
                    steps=jnp.full((b,), max_steps, jnp.int32),
                    done=jnp.ones((b,), bool),
                    rng=_row_keys(jax.random.PRNGKey(0), b),
                    matches=jnp.zeros((b,), jnp.int32),
                    drafts=jnp.zeros((b,), jnp.int32),
                )
            return _SpecState(
                early=_mk_group_cache(cfg, e, b, max_cache_len, kv_quant),
                full=_mk_group_cache(cfg, nl - e, b, max_cache_len, kv_quant),
                ctx=jnp.zeros((b,), jnp.int32),
                prompt_len=jnp.ones((b,), jnp.int32),
                next_tok=jnp.zeros((b, 1), jnp.int32),
                out=jnp.zeros((b, out_size), jnp.int32),
                hist=jnp.zeros((b, prompt_bucket + out_size), jnp.int32),
                out_len=jnp.zeros((b,), jnp.int32),
                steps=jnp.full((b,), max_steps, jnp.int32),
                done=jnp.ones((b,), bool),
                rng=_row_keys(jax.random.PRNGKey(0), b),
                matches=jnp.zeros((b,), jnp.int32),
                drafts=jnp.zeros((b,), jnp.int32),
            )

        if paged:
            def insert_fn(params, state, row_mask, ids, true_len, seeds,
                          steps, new_table, prefix_len):
                return _spec_insert_rows(
                    params, cfg, state, row_mask, ids, true_len, seeds,
                    steps, new_table, prefix_len,
                    max_steps=max_steps, exit_layer=e, num_speculations=w,
                    scfg=scfg, eos_ids=eos_ids, ngram=ngram,
                )

            narrow_cache = {}

            def narrow_insert(suffix_bucket: int):
                """Compiled insert whose prefill window is ``suffix_bucket``
                wide: on prefix-cache hits the device computes only the
                prompt suffix (full ids still populate history/ngram).
                One extra (cached) compile per distinct suffix bucket."""
                fn = narrow_cache.get(suffix_bucket)
                if fn is None:
                    def fn_raw(params, state, row_mask, ids, true_len,
                               seeds, steps, new_table, prefix_len,
                               suffix_ids):
                        return _spec_insert_rows(
                            params, cfg, state, row_mask, ids, true_len,
                            seeds, steps, new_table, prefix_len, suffix_ids,
                            max_steps=max_steps, exit_layer=e,
                            num_speculations=w, scfg=scfg, eos_ids=eos_ids,
                            ngram=ngram,
                        )

                    fn = jax.jit(fn_raw, donate_argnums=(1,))
                    narrow_cache[suffix_bucket] = fn
                return fn

            def park_fn(state, row_mask):
                """Redirect ``row_mask`` rows' tables to the trash pages —
                the host may then reclaim their physical pages. (Frozen
                rows keep writing at their frontier every round, so a
                slot's pages must never be handed to another slot while
                its table still points at them.)"""
                from layerskip_tpu.ops.paged_kv import PagedKV

                def upd(pkv):
                    trash = jnp.full_like(pkv.table, pool_pages)
                    tbl = jnp.where(row_mask[None, :, None], trash, pkv.table)
                    return pkv.replace(table=tbl)

                return state.replace(
                    early=KVCache(k=upd(state.early.k), v=upd(state.early.v)),
                    full=KVCache(k=upd(state.full.k), v=upd(state.full.v)),
                )
        else:
            def insert_fn(params, state, row_mask, ids, true_len, seeds, steps):
                return _spec_insert_rows(
                    params, cfg, state, row_mask, ids, true_len, seeds, steps,
                    max_steps=max_steps, exit_layer=e, num_speculations=w,
                    scfg=scfg, eos_ids=eos_ids, ngram=ngram,
                )
            park_fn = None
            narrow_insert = None

            chunk_cache = {}

            def chunk_insert(chunk_c: int):
                """Compiled one-chunk prefill pass (one cached compile per
                distinct chunk width — serving should pick ONE width)."""
                fn = chunk_cache.get(chunk_c)
                if fn is None:
                    def fn_raw(params, state, row_mask, chunk_ids, off):
                        return _chunk_prefill_rows(
                            params, cfg, state, row_mask, chunk_ids, off,
                            exit_layer=e, prompt_bucket=prompt_bucket,
                        )

                    fn = jax.jit(fn_raw, donate_argnums=(1,))
                    chunk_cache[chunk_c] = fn
                return fn

            def finalize_raw(params, state, row_mask, ids, true_len, seeds,
                             steps, last_tok):
                # 1-token suffix window at prefix_len = true_len - 1: the
                # chunk passes already wrote every prompt position's KV;
                # this recomputes only the last position (a decode-sized
                # step) to get the first-token logits + full bookkeeping
                return _spec_insert_rows(
                    params, cfg, state, row_mask, ids, true_len, seeds,
                    steps, None, jnp.maximum(true_len - 1, 0), last_tok,
                    max_steps=max_steps, exit_layer=e, num_speculations=w,
                    scfg=scfg, eos_ids=eos_ids, ngram=ngram,
                )

            finalize_insert = jax.jit(finalize_raw, donate_argnums=(1,))
        if paged:
            chunk_insert = None
            finalize_insert = None

        def round_fn(params, draft, state):
            if tree_width > 1:
                return _tree_round(
                    params, cfg, state,
                    exit_layer=e, num_speculations=w, tree_width=tree_width,
                    scfg=scfg, eos_ids=eos_ids, ngram=ngram,
                )
            return _spec_round(
                params, cfg, state,
                max_steps=max_steps, exit_layer=e, num_speculations=w,
                scfg=scfg, eos_ids=eos_ids, ngram=ngram,
                draft_exit_prob=draft_exit_prob, pld_ngram=pld_ngram,
                hybrid=hybrid, draft_params=draft,
            )

        def multi_round_fn(params, draft, state, k):
            """Up to ``k`` rounds in one dispatch (stops when all rows are
            done) — amortizes the per-round host sync when no new requests
            are waiting to join."""

            def cond(c):
                s, i = c
                return (i < k) & jnp.any(~s.done)

            def body(c):
                s, i = c
                s2, _, _ = round_fn(params, draft, s)  # raw fn (jitted separately)
                return (s2, i + 1)

            s, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
            return s

        fns = (
            jax.jit(blank_state),
            jax.jit(insert_fn, donate_argnums=(1,)),
            jax.jit(round_fn, donate_argnums=(2,)),
            jax.jit(multi_round_fn, donate_argnums=(2,)),
            jax.jit(park_fn, donate_argnums=(0,)) if park_fn else None,
            narrow_insert,
            chunk_insert,
            finalize_insert,
        )
        self._stepped_cache[key] = fns
        return fns

    def continuous_session(
        self, gen_cfg: GenerationConfig, batch: int, prompt_bucket: int,
        eos_ids: Sequence[int] = (),
        paged_pool_pages: int = 0, page_size: int = 256,
        prefix_cache: bool = False,
    ) -> "ContinuousSession":
        """``paged_pool_pages > 0`` switches the session to paged KV: slots
        draw pages from a shared pool sized for the mean load instead of
        reserving worst-case contiguous buffers (ops/paged_kv.py), so the
        same HBM serves ~2x+ the slots under heterogeneous budgets.
        ``prefix_cache`` (paged only) additionally shares page-aligned
        prompt-prefix KV across requests and skips its prefill compute."""
        scfg = SamplingConfig(
            sample=gen_cfg.sample, temperature=gen_cfg.temperature,
            top_k=gen_cfg.top_k, top_p=gen_cfg.top_p,
        )
        eos = tuple(int(x) for x in eos_ids) or tuple(self.cfg.eos_token_ids)
        if gen_cfg.stop_token_ids:
            eos = eos + tuple(int(x) for x in gen_cfg.stop_token_ids)
        assert gen_cfg.exit_layer > 0 and gen_cfg.num_speculations > 0
        paged = (int(paged_pool_pages), int(page_size)) \
            if paged_pool_pages else None
        pld = (
            int(gen_cfg.pld_ngram or 0)
            if gen_cfg.generation_strategy in ("prompt_lookup", "hybrid")
            else 0
        )
        tree_width = int(gen_cfg.spec_tree_width or 0)
        if gen_cfg.generation_strategy != "self_speculative":
            tree_width = 0
        if tree_width > 1:
            assert not gen_cfg.draft_exit_prob, \
                "tree speculation excludes adaptive drafting"
        draft_quant = self._resolve_draft_quant(
            gen_cfg, gen_cfg.generation_strategy, tree_width
        )
        dq_head = bool(draft_quant) and bool(
            getattr(gen_cfg, "draft_quant_head", False))
        dq_mlp = bool(draft_quant) and bool(
            getattr(gen_cfg, "draft_quant_mlp_only", False))
        fns = self._compiled_continuous(
            prompt_bucket, batch, gen_cfg.max_steps, gen_cfg.exit_layer,
            gen_cfg.num_speculations, scfg, eos,
            int(gen_cfg.no_repeat_ngram_size or 0), bool(gen_cfg.kv_quant),
            paged, float(gen_cfg.draft_exit_prob or 0.0), pld,
            hybrid=(gen_cfg.generation_strategy == "hybrid"),
            tree_width=tree_width, draft_quant=draft_quant,
            draft_quant_head=dq_head, draft_quant_mlp=dq_mlp,
        )
        draft = (self._draft_params(gen_cfg.exit_layer, draft_quant, dq_head,
                                    dq_mlp)
                 if draft_quant else None)
        return ContinuousSession(
            self, fns, gen_cfg, batch, prompt_bucket, eos, paged=paged,
            prefix_cache=prefix_cache, draft=draft,
        )

    # -- stepped / streaming mode -------------------------------------------

    def _compiled_stepped(
        self,
        prompt_bucket: int,
        batch: int,
        max_steps: int,
        exit_layer: int,
        num_speculations: int,
        scfg: SamplingConfig,
        eos_ids: Tuple[int, ...],
        ngram: int = 0,
        draft_exit_prob: float = 0.0,
        pld_ngram: int = 0,
        hybrid: bool = False,
        tree_width: int = 0,
        draft_quant: int = 0,
        draft_quant_head: bool = False,
        draft_quant_mlp: bool = False,
    ):
        key = (prompt_bucket, batch, max_steps, exit_layer, num_speculations,
               scfg, eos_ids, ngram, draft_exit_prob, pld_ngram, hybrid,
               tree_width, draft_quant, draft_quant_head, draft_quant_mlp)
        if key in self._stepped_cache:
            return self._stepped_cache[key]
        max_cache_len = (prompt_bucket + max_steps
                         + num_speculations * max(tree_width, 1) + 2)

        def prefill(params, ids, true_len, rng):
            return _spec_prefill(
                params, self.cfg, ids, true_len, rng,
                max_steps=max_steps, exit_layer=exit_layer,
                num_speculations=num_speculations, scfg=scfg,
                eos_ids=eos_ids, max_cache_len=max_cache_len, ngram=ngram,
            )

        def round_fn(params, draft, state):
            if tree_width > 1:
                return _tree_round(
                    params, self.cfg, state,
                    exit_layer=exit_layer,
                    num_speculations=num_speculations,
                    tree_width=tree_width, scfg=scfg, eos_ids=eos_ids,
                    ngram=ngram,
                )
            return _spec_round(
                params, self.cfg, state,
                max_steps=max_steps, exit_layer=exit_layer,
                num_speculations=num_speculations, scfg=scfg, eos_ids=eos_ids,
                ngram=ngram, draft_exit_prob=draft_exit_prob,
                pld_ngram=pld_ngram, hybrid=hybrid, draft_params=draft,
            )

        self._stepped_cache[key] = (
            jax.jit(prefill),
            jax.jit(round_fn, donate_argnums=(2,)),
        )
        return self._stepped_cache[key]

    def stream_generate(
        self,
        prompt_ids,
        gen_cfg: GenerationConfig,
        rng: Optional[jax.Array] = None,
        eos_ids: Sequence[int] = (),
        on_round=None,
    ) -> GenerateOutput:
        """Self-speculative generation with a per-round host callback.

        ``on_round(drafted: list[int], accepted: list[int])`` fires after each
        draft+verify round — this is what drives the draft-repaint streaming
        UI (reference SpeculativeTextStreamer flow,
        self_speculation_generator.py:158-216). One device sync per round
        (the reference syncs per *token*). The plain ``generate`` path stays
        sync-free; use it when no streaming is needed.
        """
        import numpy as np

        padded, true_lens = _pad_prompts(prompt_ids)
        b, bucket = padded.shape

        scfg = SamplingConfig(
            sample=gen_cfg.sample, temperature=gen_cfg.temperature,
            top_k=gen_cfg.top_k, top_p=gen_cfg.top_p,
        )
        eos = tuple(int(x) for x in eos_ids) or tuple(self.cfg.eos_token_ids)
        if gen_cfg.stop_token_ids:
            eos = eos + tuple(int(x) for x in gen_cfg.stop_token_ids)
        assert gen_cfg.exit_layer > 0 and gen_cfg.num_speculations > 0
        w = gen_cfg.num_speculations
        tree_width = int(gen_cfg.spec_tree_width or 0)
        if gen_cfg.generation_strategy != "self_speculative":
            tree_width = 0
        if tree_width > 1:
            # same contract as Engine.generate: _tree_round has no
            # adaptive drafting — fail loudly, never silently
            assert not gen_cfg.draft_exit_prob, \
                "spec_tree_width excludes adaptive drafting"
        draft_quant = self._resolve_draft_quant(
            gen_cfg, gen_cfg.generation_strategy, tree_width
        )
        dq_head = bool(draft_quant) and bool(
            getattr(gen_cfg, "draft_quant_head", False))
        dq_mlp = bool(draft_quant) and bool(
            getattr(gen_cfg, "draft_quant_mlp_only", False))
        prefill, round_fn = self._compiled_stepped(
            bucket, b, gen_cfg.max_steps, gen_cfg.exit_layer, w, scfg, eos,
            int(gen_cfg.no_repeat_ngram_size or 0),
            float(gen_cfg.draft_exit_prob or 0.0),
            int(gen_cfg.pld_ngram or 0)
            if gen_cfg.generation_strategy in ("prompt_lookup", "hybrid")
            else 0,
            hybrid=(gen_cfg.generation_strategy == "hybrid"),
            tree_width=tree_width, draft_quant=draft_quant,
            draft_quant_head=dq_head, draft_quant_mlp=dq_mlp,
        )
        draft = (self._draft_params(gen_cfg.exit_layer, draft_quant, dq_head,
                                    dq_mlp)
                 if draft_quant else None)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        state = prefill(
            self.params, jnp.asarray(padded), jnp.asarray(true_lens), rng
        )
        first = int(np.asarray(state.next_tok)[0, 0])
        if on_round is not None:
            on_round([], [first])
        while not bool(np.asarray(state.done).all()):
            state, window, n = round_fn(self.params, draft, state)
            if on_round is not None:
                win = np.asarray(window)[0].tolist()
                n0 = int(np.asarray(n)[0])
                on_round(win[:w], win[: n0 + 1])
        return GenerateOutput(
            tokens=state.out,
            num_tokens=jnp.minimum(state.out_len, gen_cfg.max_steps),
            matches=jnp.sum(state.matches),
            drafts=jnp.sum(state.drafts),
        )


class ContinuousSession:
    """Live multi-slot decode state for continuous batching.

    Wraps the compiled (blank, insert, round) triple: rows are inserted and
    harvested independently while other rows keep decoding — the serving
    pattern the reference cannot express at batch=1. One small device->host
    sync per round (the per-row done flags / outputs).
    """

    def __init__(self, engine, fns, gen_cfg, batch, prompt_bucket, eos,
                 paged=None, prefix_cache=False, draft=None):
        import numpy as np

        self.engine = engine
        (self._blank, self._insert, self._round, self._multi_round,
         self._park, self._narrow_insert, self._chunk_insert,
         self._finalize_insert) = fns
        # quantized draft-layer weights (GenerationConfig.draft_quant);
        # None = draft with the base params
        self._draft = draft
        self.gen_cfg = gen_cfg
        self.batch = batch
        self.prompt_bucket = prompt_bucket
        self.eos = eos
        self.paged = paged  # (pool_pages, page_size) or None
        self.prefix_cache = None
        if paged:
            from layerskip_tpu.ops.paged_kv import (
                PageAllocator, PrefixCache, paged_geometry,
            )

            pool_pages, page_size = paged
            spec_slack = gen_cfg.num_speculations * max(
                int(gen_cfg.spec_tree_width or 0), 1
            )
            capacity = prompt_bucket + gen_cfg.max_steps + spec_slack + 2
            _, _, self._max_pages = paged_geometry(
                capacity, page_size, prompt_bucket
            )
            self.allocator = PageAllocator(pool_pages, page_size)
            if prefix_cache:
                self.prefix_cache = PrefixCache(self.allocator)
        else:
            assert not prefix_cache, "prefix_cache requires paged KV"
            self.allocator = None
        self.state = self._blank()
        self.active = np.zeros(batch, bool)  # slot occupied by a live request
        # host mirrors from the last sync, for min_rounds_bound()
        self._out_len = np.zeros(batch, np.int64)
        self._steps = np.full(batch, gen_cfg.max_steps, np.int64)
        self._done = np.ones(batch, bool)
        # chunked-prefill staging (begin_chunked_insert): queued chunk
        # passes + the finalize args, advanced one chunk per step()
        self._chunk_queue = []
        self._chunk_finalize = None
        self._pending = np.zeros(batch, bool)  # slots mid-chunked-prefill

    def free_slots(self):
        import numpy as np

        return [i for i in range(self.batch)
                if not self.active[i] and not self._pending[i]]

    def insert(self, rows, prompts, seeds=None, max_tokens=None) -> None:
        """Prefill ``prompts[k]`` into slot ``rows[k]`` (others untouched).

        ``seeds[k]`` gives each request its own reproducible sampling
        stream; ``max_tokens[k]`` its own step budget (clamped to the
        program's compiled ``max_steps``).
        """
        import numpy as np

        assert len(rows) == len(prompts) and rows
        mask = np.zeros(self.batch, bool)
        ids = np.zeros((self.batch, self.prompt_bucket), np.int32)
        lens = np.ones(self.batch, np.int32)
        seed_vec = np.zeros(self.batch, np.int32)
        steps_vec = np.full(self.batch, self.gen_cfg.max_steps, np.int32)
        for k, (r, prompt) in enumerate(zip(rows, prompts)):
            toks = list(prompt)[-self.prompt_bucket:]
            mask[r] = True
            ids[r, : len(toks)] = toks
            lens[r] = max(len(toks), 1)
            if seeds is not None:
                seed_vec[r] = int(seeds[k])
            if max_tokens is not None and max_tokens[k]:
                steps_vec[r] = int(max_tokens[k])
        args = ()
        slot_pages = {}
        if self.paged:
            # allocate exactly what each request's frontier can reach:
            # prompt + clipped budget + speculation overhang; everything
            # past that maps to trash (PagePoolExhausted propagates BEFORE
            # any device state changes — the scheduler's backpressure).
            # With a prefix cache, cached page-aligned prompt prefixes map
            # shared (refcounted) pages instead of fresh ones and skip
            # their prefill compute (the device runs the suffix only).
            from layerskip_tpu.ops.paged_kv import PagePoolExhausted

            pool_pages, page_size = self.paged
            w = self.gen_cfg.num_speculations * max(
                int(self.gen_cfg.spec_tree_width or 0), 1
            )
            clipped = np.clip(steps_vec, 1, self.gen_cfg.max_steps)
            prefix_vec = np.zeros(self.batch, np.int32)
            prompts_by_row = {
                r: list(p)[-self.prompt_bucket:]
                for r, p in zip(rows, prompts)
            }
            for attempt in (0, 1):
                table = np.full((self.batch, self._max_pages), pool_pages,
                                np.int32)
                snapshot = self.allocator.snapshot()
                try:
                    for r in rows:
                        shared, pmatch = [], 0
                        if self.prefix_cache is not None:
                            pmatch, shared = self.prefix_cache.match(
                                prompts_by_row[r]
                            )
                        need = int(lens[r]) + int(clipped[r]) + w + 2
                        pages = self.allocator.allocate(r, need, shared)
                        table[r, : len(pages)] = pages
                        prefix_vec[r] = pmatch
                        slot_pages[r] = pages
                    break
                except Exception as exc:
                    self.allocator.restore(snapshot)  # all-or-nothing
                    slot_pages.clear()
                    if (
                        attempt == 0
                        and isinstance(exc, PagePoolExhausted)
                        and self.prefix_cache is not None
                        # shed cold cache entries and retry once before
                        # surfacing backpressure to the scheduler
                        and self.prefix_cache.evict(self._max_pages)
                    ):
                        continue
                    raise
            args = (jnp.asarray(table), jnp.asarray(prefix_vec))
        insert_call, extra = self._insert, ()
        if self.paged and self.prefix_cache is not None \
                and self._narrow_insert is not None \
                and os.environ.get("LAYERSKIP_PREFIX_NARROW") == "1":
            # OPT-IN (LAYERSKIP_PREFIX_NARROW=1): drop to the narrowest
            # bucket covering every inserted row's suffix so the device
            # computes SB positions instead of prompt_bucket. Measured at
            # 1B/512-prompt this LOSES ~40%: dispatching a second insert
            # executable against the donated state forces buffer relayout
            # copies on every switch (the known two-executables trap),
            # outweighing the prefill FLOPs saved. Default path keeps ONE
            # insert executable; the prefix win comes from page sharing
            # (admission pressure), measured 2.0x on a mean-sized pool.
            max_suffix = max(int(lens[r]) - int(prefix_vec[r]) for r in rows)
            sb = _bucket(max_suffix, (32, 64, 128, 256, 512, 1024, 2048))
            if sb < self.prompt_bucket:
                sfx = np.zeros((self.batch, sb), np.int32)
                for r in rows:
                    tail = prompts_by_row[r][int(prefix_vec[r]):]
                    sfx[r, : len(tail)] = tail
                insert_call = self._narrow_insert(sb)
                extra = (jnp.asarray(sfx),)
        self.state = insert_call(
            self.engine.params, self.state,
            jnp.asarray(mask), jnp.asarray(ids), jnp.asarray(lens),
            jnp.asarray(seed_vec), jnp.asarray(steps_vec), *args, *extra,
        )
        if self.prefix_cache is not None:
            # the freshly prefilled full prompt pages are now immutable
            # (decode writes begin at prompt_len) — publish them
            for r in rows:
                self.prefix_cache.put(prompts_by_row[r], slot_pages[r])
        self.active |= mask
        # keep the host mirrors coherent without an extra device sync:
        # fresh rows start at out_len 1 (the prefill commits one token) and
        # a budget of clip(steps, 1, max_steps) (_spec_insert_rows)
        self._out_len[mask] = 1
        self._steps[mask] = np.clip(steps_vec, 1, self.gen_cfg.max_steps)[mask]
        self._done[mask] = False

    def begin_chunked_insert(self, rows, prompts, seeds=None,
                             max_tokens=None, chunk_tokens: int = 256):
        """Stage a CHUNKED prefill of ``prompts`` into ``rows`` (net-new;
        Sarathi-style — no reference counterpart, the reference prefills
        whole prompts at batch=1).

        Each subsequent ``step()`` advances ONE ``chunk_tokens``-wide
        prefill pass before running the decode round, so the in-flight
        rows' inter-token latency is bounded by a chunk pass instead of a
        full prompt pass. The staged rows are reserved (excluded from
        ``free_slots``) and become active on the finalize step; committed
        output is identical to a plain ``insert`` with the same seeds.
        """
        import numpy as np

        assert not self.paged, "chunked insert: contiguous KV only"
        assert not self._chunk_queue and self._chunk_finalize is None, \
            "a chunked insert is already in flight"
        assert rows and len(rows) == len(prompts)
        # parked rows keep participating in rounds: a tree round writes
        # 1 + W*k KV slots at the park position (draft scratch + verify),
        # a linear round W+1 — all must fit inside the prompt_bucket-wide
        # trash zone
        round_width = 1 + self.gen_cfg.num_speculations * max(
            int(self.gen_cfg.spec_tree_width or 0), 1
        )
        assert round_width <= self.prompt_bucket, \
            "trash zone too small for parked-row round writes"
        # a chunk wider than the prompt window is just a whole-prompt pass
        # (and would overflow the trash zone, which is prompt_bucket wide)
        c = min(int(chunk_tokens), self.prompt_bucket)
        assert c > 0
        mask = np.zeros(self.batch, bool)
        ids = np.zeros((self.batch, self.prompt_bucket), np.int32)
        lens = np.ones(self.batch, np.int32)
        seed_vec = np.zeros(self.batch, np.int32)
        steps_vec = np.full(self.batch, self.gen_cfg.max_steps, np.int32)
        for k, (r, prompt) in enumerate(zip(rows, prompts)):
            assert not self.active[r] and not self._pending[r]
            toks = list(prompt)[-self.prompt_bucket:]
            mask[r] = True
            ids[r, : len(toks)] = toks
            lens[r] = max(len(toks), 1)
            if seeds is not None:
                seed_vec[r] = int(seeds[k])
            if max_tokens is not None and max_tokens[k]:
                steps_vec[r] = int(max_tokens[k])
        # chunks must cover [0, max true_len - 1); the finalize itself
        # recomputes the last position from the already-written KV
        covered = int(lens[mask].max())
        n_chunks = max(-(-covered // c), 1)
        mask_d = jnp.asarray(mask)
        for i in range(n_chunks):
            win = np.zeros((self.batch, c), np.int32)
            src = ids[:, i * c: (i + 1) * c]
            win[:, : src.shape[1]] = src
            self._chunk_queue.append((mask_d, jnp.asarray(win),
                                      jnp.int32(i * c)))
        last_tok = np.take_along_axis(
            ids, np.maximum(lens - 1, 0)[:, None], axis=1
        ).astype(np.int32)
        self._chunk_finalize = (
            mask_d, jnp.asarray(ids), jnp.asarray(lens),
            jnp.asarray(seed_vec), jnp.asarray(steps_vec),
            jnp.asarray(last_tok), mask, np.clip(
                steps_vec, 1, self.gen_cfg.max_steps),
        )
        self._pending |= mask

    def _advance_chunked_insert(self) -> None:
        """Run one queued chunk pass; finalize when the queue drains."""
        import numpy as np

        if self._chunk_queue:
            mask_d, win, off = self._chunk_queue.pop(0)
            self.state = self._chunk_insert(win.shape[1])(
                self.engine.params, self.state, mask_d, win, off
            )
        if self._chunk_queue or self._chunk_finalize is None:
            return
        (mask_d, ids, lens, seed_vec, steps_vec, last_tok,
         mask, clipped) = self._chunk_finalize
        self._chunk_finalize = None
        self.state = self._finalize_insert(
            self.engine.params, self.state, mask_d, ids, lens,
            seed_vec, steps_vec, last_tok,
        )
        self._pending &= ~mask
        self.active |= mask
        self._out_len[mask] = 1
        self._steps[mask] = clipped[mask]
        self._done[mask] = False

    def has_pending_prefill(self) -> bool:
        """True while a chunked insert is staged but not yet finalized."""
        return bool(self._chunk_queue) or self._chunk_finalize is not None

    def min_rounds_bound(self) -> int:
        """Rounds no live row can finish within, judging by step budgets.

        Each round commits at least one token per active row, at most
        W+1 (num_speculations drafts + the extra token); a row whose
        remaining budget is R can therefore finish no sooner than
        ceil(R / (W+1)) rounds from the last sync. EOS can still end a row
        earlier — that delays its harvest (latency), never correctness.
        Used by the scheduler to dispatch one large fused multi-round step
        per completion wave instead of one tunnel round-trip per round."""
        live = self.active & ~self._done
        if not live.any():
            return 1
        remaining = (self._steps - self._out_len)[live].min()
        w1 = self.gen_cfg.num_speculations + 1
        return max(int(-(-int(remaining) // w1)), 1)

    def step(self, max_rounds: int = 1):
        """Run up to ``max_rounds`` draft+verify rounds in one dispatch
        (stops early when every row finishes). Returns
        [(row, tokens, acceptance), ...] for rows that finished."""
        import numpy as np

        if self._chunk_queue or self._chunk_finalize is not None:
            # one staged prefill chunk per step: in-flight rows' inter-token
            # latency is bounded by a chunk pass, not the whole prompt
            self._advance_chunked_insert()
            if not (self.active & ~self._done).any():
                return []  # nothing decoding yet; skip the round dispatch
        # always the same executable (k is traced): alternating between two
        # compiled programs forces buffer relayout/copies on every switch
        self.state = self._multi_round(
            self.engine.params, self._draft, self.state, jnp.int32(max_rounds)
        )
        # one combined device->host sync for all per-round scalars
        done, out_len_d, steps_d = jax.device_get(
            (self.state.done, self.state.out_len, self.state.steps)
        )
        done = np.array(done, dtype=bool)  # writable host copies
        self._done = done
        self._out_len = np.array(out_len_d, dtype=np.int64)
        self._steps = np.array(steps_d, dtype=np.int64)
        finished = []
        newly = [r for r in range(self.batch) if self.active[r] and done[r]]
        if newly:
            outs, matches, drafts = jax.device_get(
                (self.state.out, self.state.matches, self.state.drafts)
            )
            outs = np.asarray(outs)
            matches, drafts = np.asarray(matches), np.asarray(drafts)
            lens, steps_arr = self._out_len, self._steps
            for r in newly:
                toks = outs[r][: min(int(lens[r]), int(steps_arr[r]))]
                toks = toks.tolist()
                for e in self.eos:
                    if e in toks:
                        toks = toks[: toks.index(e)]
                acc = float(matches[r]) / max(int(drafts[r]), 1)
                finished.append((r, toks, acc))
                self.active[r] = False
        return finished

    def has_active(self) -> bool:
        return bool(self.active.any())

    def park_free_slots(self) -> int:
        """Reclaim pages of finished-but-not-refilled slots (paged only).

        A frozen row keeps writing at its frontier every round, so its pages
        cannot be handed to another slot while its table points at them: one
        small dispatch redirects all inactive rows' tables to the trash
        pages, after which their physical pages are safe to free. Called by
        the scheduler only on PagePoolExhausted (cross-slot reclaim);
        ordinary slot reuse frees pages inside PageAllocator.allocate().
        Returns the number of pages reclaimed."""
        import numpy as np

        if not self.paged:
            return 0
        idle = ~self.active
        owned = [r for r in range(self.batch)
                 if idle[r] and self.allocator._owned.get(r)]
        if not owned:
            return 0
        self.state = self._park(self.state, jnp.asarray(idle))
        freed = 0
        for r in owned:
            freed += len(self.allocator._owned.get(r, ()))
            self.allocator.release(r)
        return freed


def _pad_prompts(prompt_ids, fixed_bucket=None):
    """Normalize prompts to a right-padded [B, bucket] array + [B] lengths.

    Accepts a flat list of ints (batch=1), a list of per-row token lists
    (ragged batch), or a rectangular array. ``fixed_bucket`` (from
    GenerationConfig.max_prompt_len) pins the pad width so every request
    shares one executable; prompts longer than it are left-truncated (the
    recent context wins, as in serving practice).
    """
    import numpy as np

    if (
        isinstance(prompt_ids, (list, tuple))
        and prompt_ids
        and isinstance(prompt_ids[0], (list, tuple))
    ):
        rows = [list(r) for r in prompt_ids]
    else:
        arr = np.asarray(prompt_ids)
        rows = [arr.tolist()] if arr.ndim == 1 else [r.tolist() for r in arr]
    if fixed_bucket:
        rows = [r[-fixed_bucket:] for r in rows]
    lens = [max(len(r), 1) for r in rows]
    bucket = fixed_bucket or _bucket(max(lens))
    padded = np.zeros((len(rows), bucket), np.int32)
    for i, r in enumerate(rows):
        padded[i, : len(r)] = r
    return padded, np.asarray(lens, np.int32)


def postprocess_batch(
    out: GenerateOutput, eos_ids: Sequence[int], max_steps: int
) -> list:
    """Host-side EOS truncation per batch row (reference excludes the EOS
    token itself, self_speculation_generator.py:82-91)."""
    import numpy as np

    tokens = np.asarray(out.tokens)
    counts = np.asarray(out.num_tokens)
    result = []
    for r in range(tokens.shape[0]):
        toks = tokens[r][: int(counts[r])][:max_steps].tolist()
        for e in eos_ids:
            if e in toks:
                toks = toks[: toks.index(e)]
        result.append(toks)
    return result


def postprocess_output(
    out: GenerateOutput, eos_ids: Sequence[int], max_steps: int
) -> list:
    """Row-0 convenience wrapper (the reference is B=1, eval.py:82)."""
    return postprocess_batch(out, eos_ids, max_steps)[0]
