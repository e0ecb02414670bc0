"""Paged KV cache: shared page pool + per-slot page tables.

Many-slot continuous serving cannot afford one worst-case-length KV buffer
per slot: at B slots x (prompt_bucket + max_steps) tokens, most of the HBM
reserved is never written (short prompts, short budgets, early EOS). Paged
allocation decouples *logical* per-slot capacity from *physical* HBM: a slot
owns just enough fixed-size pages to cover its prompt + token budget +
speculation overhang, drawn from a pool shared by every slot, so the pool is
sized for the mean load rather than slots x worst case.

No reference counterpart — the reference holds one contiguous torch KV per
generation at batch=1 (self_speculation/llama_model_utils.py:134-149); this
is the TPU-native scale-out of its cache model (SURVEY §5.7 long-context /
serving gap; vLLM-style paging re-thought for static shapes).

Design (all shapes static, everything jit-compatible):

  * pool: ``[P, Hkv, page, Dh]`` per layer (stacked ``[L, P, Hkv, page,
    Dh]`` at rest) — page-major, head-contiguous so a Pallas KV block is
    one ``(page, Dh)`` tile per head.
  * table: ``[B, max_pages]`` int32 — slot row -> pool page per logical
    page index. A logical position ``p`` lives at
    ``pool[table[b, p // page], :, p % page]``.
  * Unmapped/overflow entries point at dedicated **trash pages** at the
    pool's end. Writes beyond a slot's mapped capacity land there (e.g.
    padded prompt tails, frozen rows parked during other rows' prefills —
    generation/engine.py insert path) and are never visible to attention:
    the masking rule ``key <= q_pos`` combined with the allocator mapping
    every position a frontier can reach guarantees trash is never read as
    a live key.
  * Allocation/free is host-side (ContinuousSession holds the free list);
    the device program only ever sees a fully-built table per dispatch.

The table is replicated per layer (``[L, B, max_pages]``, a few KB) so the
pool + table travel together through ``lax.scan`` over layers exactly like
the dense/int8 caches — no model-code signature changes (write_kv and
gqa_attention dispatch on the ``PagedKV`` type, as with ``QuantKV``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from layerskip_tpu.config import ModelConfig


@struct.dataclass
class PagedKV:
    """One K or V paged buffer (per layer group; leaves stacked over L).

    pool: [(L,) P, Hkv, page, Dh]; table: [(L,) B, max_pages] int32.
    ``capacity`` is the logical per-slot token capacity the table maps
    (excluding the trash region); ``trash_start`` is the page-aligned
    logical position where park/overflow writes begin.
    """

    pool: jnp.ndarray
    table: jnp.ndarray
    capacity: int = struct.field(pytree_node=False)
    trash_start: int = struct.field(pytree_node=False)

    @property
    def page_size(self) -> int:
        return self.pool.shape[-2]

    @property
    def max_pages(self) -> int:
        return self.table.shape[-1]

    def write(self, new: jnp.ndarray, write_pos: jnp.ndarray) -> "PagedKV":
        """Scatter a [B, T, Hkv, Dh] block at logical offset ``write_pos``
        ([] or [B]) through the page table (per-layer view: pool
        [P, Hkv, pg, Dh], table [B, maxp])."""
        b, t, hkv, dh = new.shape
        pg = self.page_size
        pos = jnp.broadcast_to(
            write_pos.astype(jnp.int32).reshape(-1, 1) if write_pos.ndim
            else write_pos.astype(jnp.int32), (b, 1)
        ) + jnp.arange(t, dtype=jnp.int32)[None, :]  # [B, T] logical
        # clamp into the table (positions past the trash region wrap onto
        # the last trash page; they are never read back)
        lp = jnp.minimum(pos // pg, self.max_pages - 1)  # [B, T] logical page
        pidx = jnp.take_along_axis(self.table, lp, axis=1)  # [B, T] pool page
        poff = pos % pg
        # advanced indices at axes 0 and 2 -> scatter of [B, T, Hkv, Dh]
        pool = self.pool.at[pidx, :, poff].set(
            new.astype(self.pool.dtype), mode="drop"
        )
        return PagedKV(pool=pool, table=self.table,
                       capacity=self.capacity, trash_start=self.trash_start)

    def tree_compact(self, start: jnp.ndarray, idx: jnp.ndarray
                     ) -> "PagedKV":
        """Move W arbitrary logical slots to ``start..start+W-1`` (tree
        speculation's winning-chain compaction, engine.py::_tree_round) —
        a W-slot gather + scatter through the page table, O(W) traffic.
        Handles both the per-layer [P, ...] and stacked [L, P, ...] forms
        (the destination overlaps the source only as the identity at
        depth 0, and the gather completes before the scatter)."""
        if self.pool.ndim == 5:  # stacked over layers
            def per_layer(pool_l, table_l):
                return PagedKV(
                    pool=pool_l, table=table_l, capacity=self.capacity,
                    trash_start=self.trash_start,
                ).tree_compact(start, idx).pool

            return self.replace(pool=jax.vmap(per_layer)(self.pool, self.table))
        pg = self.page_size
        idx = idx.astype(jnp.int32)
        lp = jnp.minimum(idx // pg, self.max_pages - 1)
        pidx = jnp.take_along_axis(self.table, lp, axis=1)  # [B, W]
        block = self.pool[pidx, :, idx % pg]  # [B, W, Hkv, Dh]
        return self.write(block, start)

    def gather_view(self, dtype=None) -> jnp.ndarray:
        """Materialize the logical [B, max_pages*page, Hkv, Dh] view (XLA
        fallback path / tests; the Pallas kernel reads pages in place)."""
        b = self.table.shape[0]
        pg, hkv, dh = self.page_size, self.pool.shape[1], self.pool.shape[3]
        v = jnp.take(self.pool, self.table.reshape(-1), axis=0)
        v = v.reshape(b, self.max_pages, hkv, pg, dh)
        v = v.transpose(0, 1, 3, 2, 4).reshape(b, self.max_pages * pg, hkv, dh)
        return v if dtype is None else v.astype(dtype)


@struct.dataclass
class PagedQuantKV:
    """int8 paged K or V buffer: PagedKV's layout with ``QuantKV``'s
    per-(token, head) symmetric quantization (ops/kv_cache.py QuantKV).

    pool: [(L,) P, Hkv, page, Dh] int8; scale: [(L,) P, Hkv, page]
    (bf16); table as in PagedKV. Halves the KV bytes behind the page
    table — the production 7B serving configuration (KV is ~512 KB/token
    bf16 at Llama2-7B; int8 paging serves 4x the context per HBM GB vs a
    contiguous bf16 cache)."""

    pool: jnp.ndarray
    scale: jnp.ndarray
    table: jnp.ndarray
    capacity: int = struct.field(pytree_node=False)
    trash_start: int = struct.field(pytree_node=False)

    @property
    def page_size(self) -> int:
        return self.pool.shape[-2]

    @property
    def max_pages(self) -> int:
        return self.table.shape[-1]

    def write(self, new: jnp.ndarray, write_pos: jnp.ndarray) -> "PagedQuantKV":
        """Quantize a [B, T, Hkv, Dh] block and scatter it through the page
        table at logical offset ``write_pos`` ([] or [B])."""
        b, t, hkv, dh = new.shape
        pg = self.page_size
        pos = jnp.broadcast_to(
            write_pos.astype(jnp.int32).reshape(-1, 1) if write_pos.ndim
            else write_pos.astype(jnp.int32), (b, 1)
        ) + jnp.arange(t, dtype=jnp.int32)[None, :]
        lp = jnp.minimum(pos // pg, self.max_pages - 1)
        pidx = jnp.take_along_axis(self.table, lp, axis=1)
        poff = pos % pg
        nf = new.astype(jnp.float32)
        amax = jnp.max(jnp.abs(nf), axis=-1)  # [B, T, Hkv]
        scale = jnp.maximum(amax / 127.0, 1e-8)
        q = jnp.clip(jnp.round(nf / scale[..., None]), -127, 127).astype(jnp.int8)
        pool = self.pool.at[pidx, :, poff].set(q, mode="drop")
        scales = self.scale.at[pidx, :, poff].set(
            scale.astype(self.scale.dtype), mode="drop"
        )
        return self.replace(pool=pool, scale=scales)

    def tree_compact(self, start: jnp.ndarray, idx: jnp.ndarray
                     ) -> "PagedQuantKV":
        """PagedKV.tree_compact for the int8 pool: moves the raw int8
        values AND their per-(token, head) scales (no requantization)."""
        if self.pool.ndim == 5:  # stacked over layers
            def per_layer(pool_l, scale_l, table_l):
                out = PagedQuantKV(
                    pool=pool_l, scale=scale_l, table=table_l,
                    capacity=self.capacity, trash_start=self.trash_start,
                ).tree_compact(start, idx)
                return out.pool, out.scale

            pool, scale = jax.vmap(per_layer)(self.pool, self.scale, self.table)
            return self.replace(pool=pool, scale=scale)
        pg = self.page_size
        idx = idx.astype(jnp.int32)
        w = idx.shape[1]
        lp = jnp.minimum(idx // pg, self.max_pages - 1)
        pidx = jnp.take_along_axis(self.table, lp, axis=1)
        qblk = self.pool[pidx, :, idx % pg]  # [B, W, Hkv, Dh] int8
        sblk = self.scale[pidx, :, idx % pg]  # [B, W, Hkv]
        pos = (start.astype(jnp.int32).reshape(-1, 1)
               + jnp.arange(w, dtype=jnp.int32)[None])
        lp2 = jnp.minimum(pos // pg, self.max_pages - 1)
        pidx2 = jnp.take_along_axis(self.table, lp2, axis=1)
        poff2 = pos % pg
        pool = self.pool.at[pidx2, :, poff2].set(qblk, mode="drop")
        scale = self.scale.at[pidx2, :, poff2].set(sblk, mode="drop")
        return self.replace(pool=pool, scale=scale)

    def gather_view(self, dtype=None):
        """Dequantized logical [B, max_pages*page, Hkv, Dh] view (XLA
        fallback; the Pallas kernel dequantizes pages in VMEM)."""
        b = self.table.shape[0]
        pg, hkv, dh = self.page_size, self.pool.shape[1], self.pool.shape[3]
        flat = self.table.reshape(-1)
        q = jnp.take(self.pool, flat, axis=0).astype(jnp.float32)
        s = jnp.take(self.scale, flat, axis=0).astype(jnp.float32)
        v = q * s[..., None]
        v = v.reshape(b, self.max_pages, hkv, pg, dh)
        v = v.transpose(0, 1, 3, 2, 4).reshape(b, self.max_pages * pg, hkv, dh)
        return v.astype(dtype) if dtype is not None else v


def paged_geometry(
    capacity: int, page_size: int, prompt_bucket: int
) -> Tuple[int, int, int]:
    """(cap_pages, trash_pages, max_pages) for a logical per-slot
    ``capacity`` plus a trash region absorbing ``prompt_bucket`` parked
    writes starting at the page-aligned ``trash_start = cap_pages * page``."""
    cap_pages = -(-capacity // page_size)
    trash_pages = -(-prompt_bucket // page_size)
    return cap_pages, trash_pages, cap_pages + trash_pages


def init_paged_group(
    cfg: ModelConfig,
    nlayers: int,
    batch: int,
    pool_pages: int,
    page_size: int,
    capacity: int,
    prompt_bucket: int,
    dtype=None,
    quant: bool = False,
):
    """KVCache-shaped (k, v) pair of stacked PagedKV/PagedQuantKV buffers.

    ``pool_pages`` counts *allocatable* pages; the trash pages are appended
    on top. All table entries start pointing at the first trash page."""
    from layerskip_tpu.ops.kv_cache import KVCache

    dtype = dtype or cfg.dtype
    cap_pages, trash_pages, max_pages = paged_geometry(
        capacity, page_size, prompt_bucket
    )
    total = pool_pages + trash_pages
    shape = (nlayers, total, cfg.num_key_value_heads, page_size, cfg.head_dim)
    table = jnp.full((nlayers, batch, max_pages), pool_pages, jnp.int32)
    cap, trash = cap_pages * page_size, cap_pages * page_size
    if quant:
        mk = lambda: PagedQuantKV(  # noqa: E731
            pool=jnp.zeros(shape, jnp.int8),
            scale=jnp.zeros(shape[:-1], jnp.bfloat16),
            table=table, capacity=cap, trash_start=trash,
        )
    else:
        mk = lambda: PagedKV(  # noqa: E731
            pool=jnp.zeros(shape, dtype), table=table,
            capacity=cap, trash_start=trash,
        )
    return KVCache(k=mk(), v=mk())


class PageAllocator:
    """Host-side refcounted free-list allocator over ``pool_pages`` pages.

    Trash pages (indices >= pool_pages) are permanently mapped and never
    allocated. Raised ``PagePoolExhausted`` is the scheduler's backpressure
    signal: the request waits until a finished slot frees its pages.

    Pages are refcounted so the prefix cache can share read-only prompt
    pages across slots (each sharer + the cache itself holds one reference;
    a page returns to the free list when the last reference drops)."""

    def __init__(self, pool_pages: int, page_size: int):
        self.page_size = page_size
        self.pool_pages = pool_pages
        self._free = list(range(pool_pages - 1, -1, -1))  # pop() -> page 0 first
        self._owned = {}  # slot -> [page, ...]
        self._refs = {}  # page -> live reference count (absent == free)

    def free_pages(self) -> int:
        return len(self._free)

    def pages_needed(self, tokens: int) -> int:
        return -(-max(int(tokens), 1) // self.page_size)

    def addref(self, pages) -> None:
        for p in pages:
            self._refs[p] = self._refs.get(p, 0) + 1

    def decref(self, pages) -> None:
        for p in pages:
            n = self._refs.get(p, 0) - 1
            if n <= 0:
                self._refs.pop(p, None)
                self._free.append(p)
            else:
                self._refs[p] = n

    def allocate(self, slot: int, tokens: int, shared=()):
        """Map ``tokens`` logical positions for ``slot``; returns the page
        list. ``shared`` pages (an already-referenced prefix) are reference-
        bumped and prepended; only the remainder draws fresh pages. Frees
        the slot's previous pages first (slot reuse)."""
        self.release(slot)
        shared = list(shared)
        need = self.pages_needed(tokens) - len(shared)
        if need > len(self._free):
            raise PagePoolExhausted(
                f"need {need} pages for slot {slot}, "
                f"{len(self._free)} free of {self.pool_pages}"
            )
        fresh = [self._free.pop() for _ in range(max(need, 0))]
        self.addref(shared)
        self.addref(fresh)
        pages = shared + fresh
        self._owned[slot] = pages
        return pages

    def release(self, slot: int) -> None:
        self.decref(self._owned.pop(slot, ()))

    def snapshot(self):
        return (
            list(self._free),
            {s: list(p) for s, p in self._owned.items()},
            dict(self._refs),
        )

    def restore(self, snap) -> None:
        self._free = list(snap[0])
        self._owned = {s: list(p) for s, p in snap[1].items()}
        self._refs = dict(snap[2])


class PrefixCache:
    """Host-side prompt-prefix page cache (paged serving, vLLM-style
    automatic prefix caching re-thought for this static-shape engine).

    Keys are page-aligned token prefixes (a page is cacheable only when
    FULLY covered by prompt tokens: decode writes begin at ``prompt_len``,
    so full prompt pages are immutable after prefill — the sharing-safety
    invariant). An entry holds one allocator reference per page; sharers
    add their own. ``match`` returns the longest cached aligned prefix
    strictly shorter than the prompt (the engine always re-processes >= 1
    suffix token to produce the first logits). Eviction is LRU over
    entries and only frees pages whose last reference is the cache's."""

    def __init__(self, allocator: PageAllocator):
        self.alloc = allocator
        self.page_size = allocator.page_size
        self._entries = {}  # key(tuple tokens) -> [pages]
        self._clock = 0
        self._last_used = {}  # key -> clock
        self.hits = 0
        self.hit_tokens = 0

    def match(self, prompt):
        """-> (prefix_tokens, pages) for the longest cached aligned prefix
        shorter than ``prompt``; (0, []) on miss."""
        pg = self.page_size
        toks = tuple(prompt)
        max_pages = (len(toks) - 1) // pg  # strictly shorter than the prompt
        for n in range(max_pages, 0, -1):
            key = toks[: n * pg]
            pages = self._entries.get(key)
            if pages is not None:
                self._clock += 1
                self._last_used[key] = self._clock
                self.hits += 1
                self.hit_tokens += n * pg
                return n * pg, list(pages)
        return 0, []

    def put(self, prompt, pages) -> None:
        """Register every aligned full-page prefix of ``prompt`` whose pages
        are ``pages[:n]`` (the slot's prompt pages, in logical order)."""
        pg = self.page_size
        toks = tuple(prompt)
        for n in range(1, len(toks) // pg + 1):
            key = toks[: n * pg]
            if key in self._entries:
                continue
            entry = pages[:n]
            if len(entry) < n:
                break
            self.alloc.addref(entry)
            self._entries[key] = list(entry)
            self._clock += 1
            self._last_used[key] = self._clock

    def evict(self, pages_wanted: int) -> int:
        """Drop LRU entries until ~``pages_wanted`` pages could return to
        the free list (pages still shared by live slots survive, they just
        lose their cache reference). Returns entries dropped."""
        order = sorted(self._entries, key=lambda k: self._last_used[k])
        dropped = 0
        freed_before = self.alloc.free_pages()
        for key in order:
            if self.alloc.free_pages() - freed_before >= pages_wanted:
                break
            self.alloc.decref(self._entries.pop(key))
            self._last_used.pop(key, None)
            dropped += 1
        return dropped

    def clear(self) -> None:
        for key in list(self._entries):
            self.alloc.decref(self._entries.pop(key))
        self._last_used.clear()


class PagePoolExhausted(RuntimeError):
    pass
