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
from typing import Optional, Sequence, Tuple

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
from layerskip_tpu.ops.kv_cache import KVCache

# Round-5 split: the engine package is engine.py (AR + Engine facade),
# core.py (shared primitives/state), spec.py (self-speculative rounds),
# tree.py (multi-candidate speculation), continuous.py (continuous
# batching). Every previously-module-level name is re-exported here so
# external imports (`from layerskip_tpu.generation.engine import X`) are
# unchanged.
from layerskip_tpu.generation.core import (  # noqa: F401
    GenerateOutput,
    _SpecState,
    _bucket,
    _is_eos,
    _mk_group_cache,
    _row_gather,
    _row_keys,
    _row_update,
    _split_rows,
)
from layerskip_tpu.generation.spec import (  # noqa: F401
    _pld_propose,
    _spec_prefill,
    _spec_round,
    spec_generate,
)
from layerskip_tpu.generation.tree import (  # noqa: F401
    _tree_compact,
    _tree_round,
)
from layerskip_tpu.generation.continuous import (  # noqa: F401
    ContinuousSession,
    _chunk_prefill_rows,
    _spec_insert_rows,
)


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
                             tree_width: int):
        """Effective ``(bits, quantize_head, mlp_only)`` for this request:
        only the early-exit draft path drafts with a separate weight copy,
        and a base model that is ALREADY quantized drafts cheaply as-is.
        The fidelity knobs normalize to False whenever bits resolves to 0,
        so configs differing only in dead knobs share one executable (the
        one-executable-per-donated-state invariant) — this is the single
        home of that rule for all three entry points."""
        draft_quant = int(getattr(gen_cfg, "draft_quant", 0) or 0)
        if strategy != "self_speculative" or tree_width > 1:
            draft_quant = 0
        if draft_quant:
            from layerskip_tpu.ops.linear import QuantTensor

            if isinstance(self.params.layers.wq, QuantTensor):
                draft_quant = 0
        on = bool(draft_quant)
        return (
            draft_quant,
            on and bool(getattr(gen_cfg, "draft_quant_head", False)),
            on and bool(getattr(gen_cfg, "draft_quant_mlp_only", False)),
        )

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
        draft_quant, dq_head, dq_mlp = self._resolve_draft_quant(
            gen_cfg, strategy, tree_width
        )
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
        draft_quant, dq_head, dq_mlp = self._resolve_draft_quant(
            gen_cfg, gen_cfg.generation_strategy, tree_width
        )
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
        draft_quant, dq_head, dq_mlp = self._resolve_draft_quant(
            gen_cfg, gen_cfg.generation_strategy, tree_width
        )
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
