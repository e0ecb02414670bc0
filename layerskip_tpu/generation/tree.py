"""Multi-candidate (tree) speculation (net-new; no reference counterpart).

Split out of engine.py (round 5, zero behavior change): SpecInfer/Medusa-
style tree speculation redesigned for TPU — k chains in interleaved cache
slots past the committed frontier, tree visibility as one extra attention-
mask clause, affine-strided KV compaction of the winning chain. Measured
negative at batch=1 (PROGRESS.md r4: the k-wide draft steps cost ~k x the
HBM-bound linear draft); a serving feature for batched/paged schedulers.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from layerskip_tpu.config import ModelConfig
from layerskip_tpu.generation.core import (
    _SpecState,
    _is_eos,
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
from layerskip_tpu.models import llama
from layerskip_tpu.models.llama import LlamaParams
from layerskip_tpu.ops.kv_cache import KVCache


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



