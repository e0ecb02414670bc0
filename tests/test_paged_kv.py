"""Paged KV cache: write/gather parity, attention equivalence, allocator,
and the paged Pallas kernel (interpret mode).

The paged cache must be *observationally identical* to the contiguous cache
for any logical access pattern — pages only change where bytes live, never
what attention sees (ops/paged_kv.py; no reference counterpart, the
reference's cache is one contiguous torch buffer at batch=1,
self_speculation/llama_model_utils.py:134-149)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layerskip_tpu.config import tiny_config
from layerskip_tpu.ops import attention as attn_mod
from layerskip_tpu.ops.paged_kv import (
    PageAllocator,
    PagePoolExhausted,
    PagedKV,
    init_paged_group,
    paged_geometry,
)


def _mk_paged(b=2, pool_pages=8, pg=16, cap=48, hkv=2, dh=128, seed=0):
    """Single-layer-view PagedKV with an identity-ish table mapping."""
    cap_pages, trash_pages, maxp = paged_geometry(cap, pg, prompt_bucket=16)
    total = pool_pages + trash_pages
    pool = jnp.zeros((total, hkv, pg, dh), jnp.float32)
    # map rows to disjoint page runs, deliberately scrambled
    table = np.full((b, maxp), pool_pages, np.int32)  # default: trash
    perm = np.random.RandomState(seed).permutation(pool_pages)
    per = cap_pages
    for r in range(b):
        table[r, :per] = perm[r * per:(r + 1) * per]
    return PagedKV(
        pool=pool, table=jnp.asarray(table),
        capacity=cap_pages * pg, trash_start=cap_pages * pg,
    )


def test_paged_write_gather_roundtrip():
    pg, cap = 16, 48
    kv = _mk_paged(pg=pg, cap=cap)
    rng = np.random.default_rng(0)
    # scattered writes: a prompt block at 0, then decode steps at offsets
    blk = jnp.asarray(rng.standard_normal((2, 7, 2, 128)), jnp.float32)
    kv = kv.write(blk, jnp.asarray([0, 3], jnp.int32))  # per-row offsets
    one = jnp.asarray(rng.standard_normal((2, 1, 2, 128)), jnp.float32)
    kv = kv.write(one, jnp.asarray([15, 16], jnp.int32))  # page-boundary

    view = np.asarray(kv.gather_view())
    np.testing.assert_allclose(view[0, 0:7], np.asarray(blk)[0])
    np.testing.assert_allclose(view[1, 3:10], np.asarray(blk)[1])
    np.testing.assert_allclose(view[0, 15:16], np.asarray(one)[0])
    np.testing.assert_allclose(view[1, 16:17], np.asarray(one)[1])


def test_paged_write_beyond_capacity_lands_in_trash():
    """Park writes (frozen rows) go to trash pages, never into mapped KV."""
    kv = _mk_paged()
    marked = kv.write(
        jnp.full((2, 4, 2, 128), 7.0, jnp.float32),
        jnp.asarray([0, 0], jnp.int32),
    )
    trashed = marked.write(
        jnp.full((2, 4, 2, 128), 99.0, jnp.float32),
        jnp.full((2,), marked.trash_start, jnp.int32),
    )
    view = np.asarray(trashed.gather_view())
    assert (view[:, :4] == 7.0).all()
    assert not (view[:, :trashed.capacity] == 99.0).any()


def test_paged_attention_matches_dense():
    """gqa_attention over PagedKV == over the equivalent contiguous cache."""
    b, t, hkv, g, dh, pg, cap = 2, 3, 2, 2, 128, 16, 48
    rng = np.random.default_rng(2)
    kv_k = _mk_paged(b=b, pg=pg, cap=cap, seed=3)
    kv_v = _mk_paged(b=b, pg=pg, cap=cap, seed=3)  # same table as k
    prompt = jnp.asarray(rng.standard_normal((b, 20, hkv, dh)), jnp.float32)
    kv_k = kv_k.write(prompt, jnp.asarray([0, 0], jnp.int32))
    vv = jnp.asarray(rng.standard_normal((b, 20, hkv, dh)), jnp.float32)
    kv_v = kv_v.write(vv, jnp.asarray([0, 0], jnp.int32))

    q = jnp.asarray(rng.standard_normal((b, t, hkv * g, dh)), jnp.float32)
    qpos = jnp.asarray([[17, 18, 19], [12, 13, 14]], jnp.int32)

    got = attn_mod.gqa_attention(q, kv_k, kv_v, qpos, q_heads_per_kv=g)

    # contiguous reference: logical view, same positions
    k_dense = kv_k.gather_view()
    v_dense = kv_v.gather_view()
    want = attn_mod.gqa_attention(q, k_dense, v_dense, qpos, q_heads_per_kv=g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("t,g,window", [(1, 2, 0), (7, 2, 0), (4, 1, 9)])
def test_paged_kernel_matches_fallback(t, g, window):
    """Pallas paged kernel (interpret) == XLA gather fallback."""
    from layerskip_tpu.ops.pallas.paged_decode import paged_decode_attention

    b, hkv, dh, pg, cap = 2, 2, 128, 128, 256
    rng = np.random.default_rng(4)
    kv_k = _mk_paged(b=b, pool_pages=6, pg=pg, cap=cap, hkv=hkv, seed=5)
    kv_v = _mk_paged(b=b, pool_pages=6, pg=pg, cap=cap, hkv=hkv, seed=5)
    kb = jnp.asarray(rng.standard_normal((b, 200, hkv, dh)), jnp.float32)
    vb = jnp.asarray(rng.standard_normal((b, 200, hkv, dh)), jnp.float32)
    kv_k = kv_k.write(kb, jnp.asarray([0, 0], jnp.int32))
    kv_v = kv_v.write(vb, jnp.asarray([0, 0], jnp.int32))

    q = jnp.asarray(rng.standard_normal((b, t, hkv * g, dh)), jnp.float32)
    qpos = jnp.asarray(
        [np.arange(150, 150 + t), np.arange(90, 90 + t)], jnp.int32
    )
    got = paged_decode_attention(
        q, kv_k.pool, kv_v.pool, kv_k.table, qpos,
        q_heads_per_kv=g, sliding_window=window, interpret=True,
    )
    k_dense = kv_k.gather_view()
    v_dense = kv_v.gather_view()
    want = attn_mod.gqa_attention(
        q, k_dense, v_dense, qpos, q_heads_per_kv=g, sliding_window=window,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_page_allocator():
    al = PageAllocator(pool_pages=6, page_size=16)
    p0 = al.allocate(0, 40)  # 3 pages
    assert len(p0) == 3 and al.free_pages() == 3
    p1 = al.allocate(1, 33)  # 3 pages
    assert al.free_pages() == 0 and not (set(p0) & set(p1))
    with pytest.raises(PagePoolExhausted):
        al.allocate(2, 1)
    al.release(0)
    assert al.free_pages() == 3
    p2 = al.allocate(2, 16 * 3)
    assert sorted(p2) == sorted(p0)
    # slot reuse frees the old mapping first
    al.allocate(1, 16)
    assert al.free_pages() == 2


# --- end-to-end: paged continuous serving ----------------------------------


def _tiny_engine():
    from layerskip_tpu.generation.engine import Engine
    from layerskip_tpu.models.params import init_params

    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(1), cfg)
    return Engine(params, cfg)


def test_paged_session_equals_static_session():
    """Paged continuous decoding is observationally identical to the
    contiguous-cache session (same tokens, row by row)."""
    from layerskip_tpu.config import GenerationConfig

    engine = _tiny_engine()
    gen = GenerationConfig(
        max_steps=16, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3,
    )
    prompts = [[3, 17, 52], [5, 9], [7, 7, 7, 11], [2]]
    budgets = [16, 9, 12, 16]

    # simpler deterministic drive: run pairs to completion, then next pair
    def drive2(session):
        results = {}
        pair = [(0, prompts[0], budgets[0]), (1, prompts[1], budgets[1])]
        session.insert([r for r, _, _ in pair], [p for _, p, _ in pair],
                       seeds=[0, 0], max_tokens=[b for _, _, b in pair])
        while session.has_active():
            for r, toks, _ in session.step(max_rounds=3):
                results[r] = toks
        pair = [(0, prompts[2], budgets[2]), (1, prompts[3], budgets[3])]
        session.insert([r for r, _, _ in pair], [p for _, p, _ in pair],
                       seeds=[0, 0], max_tokens=[b for _, _, b in pair])
        while session.has_active():
            for r, toks, _ in session.step(max_rounds=3):
                results[2 + r] = toks
        return results

    static = drive2(engine.continuous_session(gen, batch=2, prompt_bucket=16))
    paged = drive2(engine.continuous_session(
        gen, batch=2, prompt_bucket=16,
        paged_pool_pages=8, page_size=16,
    ))
    assert static == paged
    assert all(len(static[i]) == min(budgets[i], 16) or static[i]
               for i in range(4))


def test_paged_scheduler_backpressure():
    """Pool deliberately too small for all slots at once: requests must
    queue behind page availability and still all complete correctly."""
    from layerskip_tpu.config import GenerationConfig
    from layerskip_tpu.serving import ContinuousBatchScheduler

    engine = _tiny_engine()
    gen = GenerationConfig(
        max_steps=12, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3,
    )
    # per request: 16 prompt-bucket cap, need <= ceil((3+12+5)/16)=2 pages;
    # 4 slots x 2 = 8 pages to run all at once — give it only 5
    sched = ContinuousBatchScheduler(
        engine, gen, batch_size=4, prompt_bucket=16,
        paged_pool_pages=5, page_size=16,
    ).start()
    try:
        futs = [sched.submit([3 + i, 17, 52], max_tokens=12)
                for i in range(8)]
        outs = [f.result(timeout=600) for f in futs]
    finally:
        sched.stop()
    # all complete, and a given prompt yields the solo-engine tokens
    from layerskip_tpu.generation.engine import postprocess_output
    import dataclasses as dc

    for i, toks in enumerate(outs):
        want = postprocess_output(
            engine.generate([3 + i, 17, 52], dc.replace(gen, max_steps=12),
                            jax.random.PRNGKey(0), engine.cfg.eos_token_ids),
            engine.cfg.eos_token_ids, 12)
        assert toks == want, i


def test_paged_request_too_large_fails_cleanly():
    from layerskip_tpu.config import GenerationConfig
    from layerskip_tpu.serving import ContinuousBatchScheduler
    from layerskip_tpu.ops.paged_kv import PagePoolExhausted

    engine = _tiny_engine()
    gen = GenerationConfig(
        max_steps=32, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3,
    )
    sched = ContinuousBatchScheduler(
        engine, gen, batch_size=2, prompt_bucket=16,
        paged_pool_pages=2, page_size=16,  # can never fit 16+32+5 tokens
    ).start()
    try:
        with pytest.raises(PagePoolExhausted):
            sched.generate([1, 2, 3], timeout=120)
    finally:
        sched.stop()


# --- int8 paged KV ----------------------------------------------------------


def _mk_paged_q8(b=2, pool_pages=8, pg=16, cap=48, hkv=2, dh=128, seed=0):
    from layerskip_tpu.ops.paged_kv import PagedQuantKV

    cap_pages, trash_pages, maxp = paged_geometry(cap, pg, prompt_bucket=16)
    total = pool_pages + trash_pages
    table = np.full((b, maxp), pool_pages, np.int32)
    perm = np.random.RandomState(seed).permutation(pool_pages)
    for r in range(b):
        table[r, :cap_pages] = perm[r * cap_pages:(r + 1) * cap_pages]
    return PagedQuantKV(
        pool=jnp.zeros((total, hkv, pg, dh), jnp.int8),
        scale=jnp.zeros((total, hkv, pg), jnp.bfloat16),
        table=jnp.asarray(table),
        capacity=cap_pages * pg, trash_start=cap_pages * pg,
    )


def test_paged_q8_write_matches_quantkv():
    """Paged int8 quantization == contiguous QuantKV quantization."""
    from layerskip_tpu.ops.kv_cache import QuantKV

    b, hkv, dh, pg = 2, 2, 128, 16
    rng = np.random.default_rng(7)
    blk = jnp.asarray(rng.standard_normal((b, 9, hkv, dh)), jnp.float32)

    paged = _mk_paged_q8(b=b, pg=pg).write(blk, jnp.asarray([0, 5], jnp.int32))
    dense = QuantKV(
        q=jnp.zeros((b, 48, hkv, dh), jnp.int8),
        scale=jnp.zeros((b, 48, hkv), jnp.bfloat16),
    ).write(blk, jnp.asarray([0, 5], jnp.int32))

    got = np.asarray(paged.gather_view())
    want = np.asarray(dense.dequantize(jnp.float32))
    np.testing.assert_allclose(got[0, 0:9], want[0, 0:9], atol=1e-6)
    np.testing.assert_allclose(got[1, 5:14], want[1, 5:14], atol=1e-6)


@pytest.mark.parametrize("t,g", [(1, 2), (7, 1)])
def test_paged_q8_kernel_matches_fallback(t, g):
    from layerskip_tpu.ops.pallas.paged_decode import paged_decode_attention_q8

    b, hkv, dh, pg, cap = 2, 2, 128, 128, 256
    rng = np.random.default_rng(8)
    kv_k = _mk_paged_q8(b=b, pool_pages=6, pg=pg, cap=cap, hkv=hkv, seed=5)
    kv_v = _mk_paged_q8(b=b, pool_pages=6, pg=pg, cap=cap, hkv=hkv, seed=5)
    kb = jnp.asarray(rng.standard_normal((b, 200, hkv, dh)), jnp.float32)
    vb = jnp.asarray(rng.standard_normal((b, 200, hkv, dh)), jnp.float32)
    kv_k = kv_k.write(kb, jnp.asarray([0, 0], jnp.int32))
    kv_v = kv_v.write(vb, jnp.asarray([0, 0], jnp.int32))

    q = jnp.asarray(rng.standard_normal((b, t, hkv * g, dh)), jnp.float32)
    qpos = jnp.asarray(
        [np.arange(150, 150 + t), np.arange(90, 90 + t)], jnp.int32
    )
    got = paged_decode_attention_q8(
        q, kv_k.pool, kv_k.scale, kv_v.pool, kv_v.scale, kv_k.table, qpos,
        q_heads_per_kv=g, interpret=True,
    )
    want = attn_mod.gqa_attention(
        q, kv_k.gather_view(jnp.float32), kv_v.gather_view(jnp.float32),
        qpos, q_heads_per_kv=g,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_paged_q8_session_equals_static_q8_session():
    """Paged int8 continuous session == contiguous int8 session, token for
    token (identical quantization math, different storage)."""
    import dataclasses as dc

    from layerskip_tpu.config import GenerationConfig

    engine = _tiny_engine()
    gen = GenerationConfig(
        max_steps=12, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3, kv_quant=True,
    )

    def drive(session):
        results = {}
        session.insert([0, 1], [[3, 17, 52], [5, 9]], seeds=[0, 0],
                       max_tokens=[12, 9])
        while session.has_active():
            for r, toks, _ in session.step(max_rounds=3):
                results[r] = toks
        return results

    static = drive(engine.continuous_session(gen, batch=2, prompt_bucket=16))
    paged = drive(engine.continuous_session(
        gen, batch=2, prompt_bucket=16, paged_pool_pages=8, page_size=16,
    ))
    assert static == paged and len(static[0]) == 12 and len(static[1]) == 9


# --- prefix caching ---------------------------------------------------------


def test_allocator_refcounted_sharing():
    """Shared pages return to the free list only when the LAST reference
    (slots and/or the prefix cache) drops."""
    al = PageAllocator(pool_pages=6, page_size=16)
    a = al.allocate(0, 3 * 16)  # 3 pages
    assert al.free_pages() == 3
    b = al.allocate(1, 3 * 16, shared=a[:2])  # shares 2, draws 1 fresh
    assert b[:2] == a[:2] and al.free_pages() == 2
    al.release(0)  # pages a[:2] still referenced by slot 1
    assert al.free_pages() == 3
    al.release(1)
    assert al.free_pages() == 6


def test_prefix_cache_match_put_evict():
    from layerskip_tpu.ops.paged_kv import PrefixCache

    al = PageAllocator(pool_pages=8, page_size=4)
    pc = PrefixCache(al)
    prompt = list(range(10))  # 2 full pages + tail
    pages = al.allocate(0, len(prompt) + 8)
    pc.put(prompt, pages)
    # longest cached aligned prefix strictly shorter than the query
    n, shared = pc.match(prompt)
    assert n == 8 and shared == pages[:2]
    # a query equal to a cached prefix re-processes >= 1 token
    n, shared = pc.match(prompt[:8])
    assert n == 4 and shared == pages[:1]
    # diverging tail after one page: only the first page matches
    n, shared = pc.match(prompt[:4] + [99, 98, 97, 96, 95])
    assert n == 4 and shared == pages[:1]
    # no match
    assert pc.match([42, 43, 44, 45, 46])[0] == 0
    # cache keeps pages alive after the slot frees them; evict returns them
    al.release(0)
    free_before = al.free_pages()
    assert pc.evict(pages_wanted=100) >= 1
    assert al.free_pages() > free_before


def test_prefix_cached_session_matches_cold():
    """Warm-prefix inserts produce exactly the cold-engine token streams,
    and actually hit the cache (prefill skips the shared pages)."""
    from layerskip_tpu.config import GenerationConfig
    from layerskip_tpu.generation.engine import postprocess_output
    import dataclasses as dc

    engine = _tiny_engine()
    gen = GenerationConfig(
        max_steps=12, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3,
    )
    system = [7, 13, 19, 23, 29, 31, 37, 41]  # 2 full pages at page_size=4
    prompts = [system + tail for tail in ([3, 17], [5], [9, 11, 2])]

    session = engine.continuous_session(
        gen, batch=2, prompt_bucket=16,
        paged_pool_pages=24, page_size=4, prefix_cache=True,
    )
    results = {}
    session.insert([0], [prompts[0]], seeds=[0], max_tokens=[12])
    while session.has_active():
        for r, toks, _ in session.step(max_rounds=2):
            results[0] = toks
    assert session.prefix_cache.hits == 0  # cold
    # second + third share the system prefix -> served from cached pages
    session.insert([0, 1], [prompts[1], prompts[2]], seeds=[0, 0],
                   max_tokens=[12, 12])
    while session.has_active():
        for r, toks, _ in session.step(max_rounds=2):
            results[1 + r] = toks
    assert session.prefix_cache.hits == 2
    assert session.prefix_cache.hit_tokens == 16  # 2 pages x 4 tokens, x2

    for i, p in enumerate(prompts):
        want = postprocess_output(
            engine.generate(p, dc.replace(gen, max_steps=12),
                            jax.random.PRNGKey(0), engine.cfg.eos_token_ids),
            engine.cfg.eos_token_ids, 12)
        assert results[i] == want, (i, results[i], want)


def test_prefix_cache_eviction_under_pressure():
    """When the pool runs dry, cold cache entries are evicted and the
    insert retries instead of surfacing backpressure."""
    from layerskip_tpu.config import GenerationConfig

    engine = _tiny_engine()
    gen = GenerationConfig(
        max_steps=8, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3,
    )
    # need per request: ceil((prompt<=16 + 8 + 5)/8) <= 4 pages; pool of 7
    # pages can't hold two slots + a populated cache without eviction
    session = engine.continuous_session(
        gen, batch=1, prompt_bucket=16,
        paged_pool_pages=7, page_size=8, prefix_cache=True,
    )

    def run(prompt):
        session.insert([0], [prompt], seeds=[0], max_tokens=[8])
        out = None
        while session.has_active():
            for _, toks, _ in session.step(max_rounds=2):
                out = toks
        return out

    a = run([1, 2, 3, 4, 5, 6, 7, 8, 9])   # caches 1 page
    b = run([9, 8, 7, 6, 5, 4, 3, 2, 1])   # unrelated: more cache pressure
    c = run([4, 4, 4, 4, 4, 4, 4, 4, 4])   # forces eviction of a/b entries
    assert all(x is not None for x in (a, b, c))
    from layerskip_tpu.generation.engine import postprocess_output
    import dataclasses as dc

    want = postprocess_output(
        engine.generate([4] * 9, dc.replace(gen, max_steps=8),
                        jax.random.PRNGKey(0), engine.cfg.eos_token_ids),
        engine.cfg.eos_token_ids, 8)
    assert c == want


def test_prefix_cache_narrow_suffix_insert_matches(monkeypatch):
    """When every inserted suffix fits a narrower bucket, the (opt-in)
    narrow insert program runs suffix-width prefills — token streams must
    still exactly match the cold engine."""
    monkeypatch.setenv("LAYERSKIP_PREFIX_NARROW", "1")
    from layerskip_tpu.config import GenerationConfig
    from layerskip_tpu.generation.engine import postprocess_output
    import dataclasses as dc

    engine = _tiny_engine()
    gen = GenerationConfig(
        max_steps=10, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3,
    )
    system = list(range(60, 100))  # 40 tokens = 10 full pages at size 4
    prompts = [system + [3, 17], system + [5, 9, 11]]

    session = engine.continuous_session(
        gen, batch=2, prompt_bucket=64,
        paged_pool_pages=64, page_size=4, prefix_cache=True,
    )
    results = {}
    session.insert([0], [prompts[0]], seeds=[0], max_tokens=[10])
    while session.has_active():
        for r, toks, _ in session.step(max_rounds=2):
            results[0] = toks
    # warm: suffix (2-3 toks) fits the 32-bucket -> narrow insert program
    session.insert([0, 1], [prompts[0], prompts[1]], seeds=[0, 0],
                   max_tokens=[10, 10])
    while session.has_active():
        for r, toks, _ in session.step(max_rounds=2):
            results[1 + r] = toks
    assert session.prefix_cache.hits == 2
    assert session.prefix_cache.hit_tokens == 80  # 10 pages x 4, x2 hits

    for i, p in enumerate([prompts[0], prompts[0], prompts[1]]):
        want = postprocess_output(
            engine.generate(p, dc.replace(gen, max_steps=10),
                            jax.random.PRNGKey(0), engine.cfg.eos_token_ids),
            engine.cfg.eos_token_ids, 10)
        assert results[i] == want, (i, results[i], want)


def test_prefix_cache_int8_pool_matches_cold():
    """Prefix sharing over the int8 paged pool (kv_quant=True): quantized
    prompt pages are shared bit-identically, so warm streams equal cold."""
    from layerskip_tpu.config import GenerationConfig
    from layerskip_tpu.generation.engine import postprocess_output
    import dataclasses as dc

    engine = _tiny_engine()
    gen = GenerationConfig(
        max_steps=10, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3, kv_quant=True,
    )
    system = [7, 13, 19, 23, 29, 31, 37, 41]
    prompts = [system + [3, 17], system + [5]]

    session = engine.continuous_session(
        gen, batch=2, prompt_bucket=16,
        paged_pool_pages=24, page_size=4, prefix_cache=True,
    )
    results = {}
    session.insert([0], [prompts[0]], seeds=[0], max_tokens=[10])
    while session.has_active():
        for r, toks, _ in session.step(max_rounds=2):
            results[0] = toks
    session.insert([0, 1], [prompts[0], prompts[1]], seeds=[0, 0],
                   max_tokens=[10, 10])
    while session.has_active():
        for r, toks, _ in session.step(max_rounds=2):
            results[1 + r] = toks
    assert session.prefix_cache.hits == 2

    for i, p in enumerate([prompts[0], prompts[0], prompts[1]]):
        want = postprocess_output(
            engine.generate(p, dc.replace(gen, max_steps=10),
                            jax.random.PRNGKey(0), engine.cfg.eos_token_ids),
            engine.cfg.eos_token_ids, 10)
        assert results[i] == want, i


@pytest.mark.parametrize("quant", [False, True])
def test_paged_kernel_tree_matches_dense(quant):
    """Pallas paged kernels with the tree clause (interpret) == the dense
    XLA tree-mask path on the gathered view — the serving-side attention
    for multi-candidate speculation over paged KV."""
    from layerskip_tpu.ops.pallas.paged_decode import (
        paged_decode_attention, paged_decode_attention_q8,
    )
    from layerskip_tpu.ops.paged_kv import init_paged_group

    b, hkv, g, dh, pg = 2, 2, 2, 128, 128
    w, k = 3, 3  # depths x chains
    cfg = tiny_config(num_key_value_heads=hkv, num_attention_heads=hkv * g,
                      hidden_size=hkv * g * dh)
    group = init_paged_group(
        cfg, 1, b, pool_pages=8, page_size=pg, capacity=220,
        prompt_bucket=16, quant=quant,
    )
    kv_k, kv_v = group.k, group.v  # [L=1, ...] leaves
    kk = jax.tree.map(lambda x: x[0], kv_k)
    vv = jax.tree.map(lambda x: x[0], kv_v)

    rng = np.random.default_rng(9)
    ctx = jnp.asarray([150, 90], jnp.int32)  # committed frontiers
    scratch = ctx + 1
    # committed prefix + next_tok slot
    kk = kk.write(jnp.asarray(rng.standard_normal((b, 151, hkv, dh)),
                              jnp.float32), jnp.zeros((b,), jnp.int32))
    vv = vv.write(jnp.asarray(rng.standard_normal((b, 151, hkv, dh)),
                              jnp.float32), jnp.zeros((b,), jnp.int32))
    # tree scratch: w depth-blocks of k chain slots at scratch + d*k
    for d in range(w):
        kk = kk.write(jnp.asarray(rng.standard_normal((b, k, hkv, dh)),
                                  jnp.float32), scratch + d * k)
        vv = vv.write(jnp.asarray(rng.standard_normal((b, k, hkv, dh)),
                                  jnp.float32), scratch + d * k)

    # verify-shaped queries: root + w*k nodes
    t = 1 + w * k
    q = jnp.asarray(rng.standard_normal((b, t, hkv * g, dh)), jnp.float32)
    offs = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        1 + jnp.repeat(jnp.arange(w, dtype=jnp.int32), k)])
    qpos = ctx[:, None] + offs[None, :]
    q_chain = jnp.broadcast_to(jnp.concatenate([
        -jnp.ones((1,), jnp.int32),
        jnp.tile(jnp.arange(k, dtype=jnp.int32), w)])[None], (b, t))

    if quant:
        got = paged_decode_attention_q8(
            q, kk.pool, kk.scale, vv.pool, vv.scale, kk.table, qpos,
            q_heads_per_kv=g, tree_chain=q_chain, tree_scratch=scratch,
            tree_fanout=k, interpret=True,
        )
    else:
        got = paged_decode_attention(
            q, kk.pool, vv.pool, kk.table, qpos,
            q_heads_per_kv=g, tree_chain=q_chain, tree_scratch=scratch,
            tree_fanout=k, interpret=True,
        )
    want = attn_mod.gqa_attention(
        q, kk.gather_view(jnp.float32), vv.gather_view(jnp.float32), qpos,
        q_heads_per_kv=g, tree_meta=(q_chain, scratch, k),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("quant", [False, True])
def test_paged_kernel_gemma_score_math_matches_fallback(quant):
    """Gemma support in the paged kernels (r5): score soft-capping, a
    custom query scale, and a TRACED sliding window (the per-layer
    alternation) must match the XLA dense path exactly. The window is
    passed as a traced scalar — the kernel reads it from an operand."""
    from layerskip_tpu.ops.pallas.paged_decode import (
        paged_decode_attention,
        paged_decode_attention_q8,
    )

    t, g = 4, 2
    b, hkv, dh, pg, cap = 2, 2, 128, 128, 256
    rng = np.random.default_rng(11)
    mk = _mk_paged_q8 if quant else _mk_paged
    kv_k = mk(b=b, pool_pages=6, pg=pg, cap=cap, hkv=hkv, seed=5)
    kv_v = mk(b=b, pool_pages=6, pg=pg, cap=cap, hkv=hkv, seed=5)
    kb = jnp.asarray(rng.standard_normal((b, 200, hkv, dh)), jnp.float32)
    vb = jnp.asarray(rng.standard_normal((b, 200, hkv, dh)), jnp.float32)
    kv_k = kv_k.write(kb, jnp.asarray([0, 0], jnp.int32))
    kv_v = kv_v.write(vb, jnp.asarray([0, 0], jnp.int32))

    q = jnp.asarray(rng.standard_normal((b, t, hkv * g, dh)), jnp.float32)
    qpos = jnp.asarray(
        [np.arange(150, 150 + t), np.arange(90, 90 + t)], jnp.int32
    )
    softcap, scale = 50.0, 32.0 ** -0.5
    win = jnp.int32(48)  # traced, like the per-layer scan value
    if quant:
        got = paged_decode_attention_q8(
            q, kv_k.pool, kv_k.scale, kv_v.pool, kv_v.scale, kv_k.table,
            qpos, q_heads_per_kv=g, sliding_window=win,
            score_scale=scale, logit_softcap=softcap, interpret=True,
        )
        tol = dict(atol=2e-2, rtol=2e-2)  # int8 pages
    else:
        got = paged_decode_attention(
            q, kv_k.pool, kv_v.pool, kv_k.table, qpos, q_heads_per_kv=g,
            sliding_window=win, score_scale=scale, logit_softcap=softcap,
            interpret=True,
        )
        tol = dict(atol=2e-5, rtol=1e-5)
    k_dense = kv_k.gather_view(jnp.float32)
    v_dense = kv_v.gather_view(jnp.float32)
    want = attn_mod.gqa_attention(
        q, k_dense, v_dense, qpos, q_heads_per_kv=g, sliding_window=win,
        score_scale=scale, logit_softcap=softcap,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **tol)
