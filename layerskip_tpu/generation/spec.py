"""Self-speculative decoding rounds (the heart of the framework).

Split out of engine.py (round 5, zero behavior change): prompt prefill,
the draft+verify round (early-exit scan, prompt-lookup and hybrid draft
sources, confidence-adaptive drafting, quantized drafters), rejection-
sampling acceptance, and the whole-generation ``lax.while_loop`` program.
TPU-native re-design of the reference's SelfSpeculativeGenerationStrategy
(self_speculation_generator.py:32-229) — see engine.py's module docstring
for the static-shape design notes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from layerskip_tpu.config import ModelConfig
from layerskip_tpu.generation.core import (
    GenerateOutput,
    _SpecState,
    _is_eos,
    _mk_group_cache,
    _row_keys,
    _row_update,
    _split_rows,
)
from layerskip_tpu.generation.processors import (
    apply_ban,
    no_repeat_ngram_banned,
)
from layerskip_tpu.generation.sampling import (
    SamplingConfig,
    draw,
    token_distribution,
)
from layerskip_tpu.generation.tree import _tree_round
from layerskip_tpu.models import llama
from layerskip_tpu.models.llama import LlamaParams
from layerskip_tpu.ops.kv_cache import KVCache


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
    assert draft_params is None or (pld_ngram == 0 and not hybrid), \
        "draft_params applies only to early-exit drafting (static or " \
        "confidence-adaptive), not PLD/hybrid draft sources"
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
        # adaptive + quantized drafter composes: the gate saves exactly the
        # draft passes that would have been wasted, and they are the int8
        # copy's passes; the verify below re-runs the full-precision stack
        # either way, so committed tokens are invariant
        dparams = params if draft_params is None else draft_params
        hid_dtype = params.embed.dtype
        carry0 = (
            s.early, s.next_tok, s.rng, s.hist,
            jnp.int32(0),  # i
            ~s.done,  # drafting: done rows never draft
            jnp.zeros((b,), jnp.int32),  # w_dyn
            jnp.zeros((b, w), jnp.int32),  # drafts
            jnp.zeros((b, w, v_size), jnp.float32),  # p_draft
            # exit_hidden: consumed only by the bf16 stitched verify; the
            # quantized-draft verify re-runs forward_split instead, so a
            # 1-element dummy avoids a dead [B, W, D] loop-carried buffer
            # (while_loop carries cannot be DCE'd by XLA)
            jnp.zeros(
                (b, w, cfg.hidden_size) if draft_params is None else (1, 1, 1),
                hid_dtype,
            ),
        )

        def dcond(c):
            return (c[4] < w) & jnp.any(c[5])

        def dbody(c):
            (early, tok, rng, hist, i, drafting, w_dyn,
             d_toks, p_dr, ex_h) = c
            r = llama.forward_early(dparams, cfg, tok, early, s.ctx + i, e)
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
            if draft_params is None:
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
        if draft_params is not None:
            # quantized drafts: the exit hiddens came through int8 layers,
            # so the verify must NOT reuse them — re-run the stitched
            # window through the FULL base stack from the pre-draft caches
            # (identical to the static draft-quant verify; positions past
            # a row's w_dyn hold garbage ids whose KV lands beyond the
            # committed frontier and is legitimately overwritten)
            window_ids = jnp.concatenate([s.next_tok, drafts], axis=1)
            vres = llama.forward_split(
                params, cfg, window_ids, s.early, s.full, s.ctx, e
            )
            vlogits = vres.logits
            early_after = vres.early_cache
            full_after = vres.full_cache
        else:
            # per-row stitched window: the last draft token's exit hidden
            # goes at window position w_dyn (not the static W), garbage
            # beyond it — position j's verifier logits depend only on
            # tokens < j, so positions <= w_dyn are exactly the static
            # semantics
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


