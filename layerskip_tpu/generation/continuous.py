"""Continuous batching: row-level insert/prefill into live state + session.

Split out of engine.py (round 5, zero behavior change): the continuous-
batching primitives (masked-row prefill into a live speculation state,
Sarathi-style chunked prefill) and the host-side ContinuousSession that
drives them — paged-KV tables, prefix caching, per-request seeds/budgets,
multi-round fused stepping. Net-new capability (the reference is batch=1,
eval.py:82).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from layerskip_tpu.config import ModelConfig
from layerskip_tpu.generation.core import (
    _SpecState,
    _bucket,
    _is_eos,
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
from layerskip_tpu.models import llama
from layerskip_tpu.models.llama import LlamaParams
from layerskip_tpu.ops.kv_cache import KVCache


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
        for r in rows:
            # a row mid-chunked-prefill must not be plain-inserted over:
            # the staged chunk passes would park its ctx into the trash
            # zone and the queued finalize would resurrect the stale
            # prompt — silently destroying the new request (same contract
            # begin_chunked_insert enforces)
            assert not self._pending[r], \
                f"slot {r} has a chunked prefill in flight"
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


