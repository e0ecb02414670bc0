"""Serving layer: dynamic batcher + HTTP endpoint.

The reference has no serving surface at all (SURVEY: REPL only); these pin
the scheduler's correctness (batched results == direct engine results, mixed
configs split into separate programs) and the HTTP contract end-to-end on
localhost.
"""

import json
import threading
import urllib.request

import pytest

import jax

from layerskip_tpu.config import GenerationConfig, tiny_config
from layerskip_tpu.generation.engine import Engine, postprocess_output
from layerskip_tpu.models.params import init_params
from layerskip_tpu.serving import BatchScheduler


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_config(num_hidden_layers=4, hidden_size=64, vocab_size=128)
    params = init_params(jax.random.PRNGKey(7), cfg)
    return Engine(params, cfg)


GEN = GenerationConfig(
    max_steps=12, sample=False, generation_strategy="self_speculative",
    exit_layer=2, num_speculations=3,
)


def test_scheduler_matches_direct(engine):
    sched = BatchScheduler(engine, batch_size=4, eos_ids=[127]).start()
    try:
        prompts = [[3, 17, 52], [5, 9], [100, 2, 44, 8, 61], [7, 7, 7, 7]]
        futures = [sched.submit(p, GEN) for p in prompts]
        got = [f.result(timeout=300) for f in futures]
        want = [
            postprocess_output(
                engine.generate(p, GEN, jax.random.PRNGKey(0), [127]), [127], 12
            )
            for p in prompts
        ]
        assert got == want
        assert sched.stats["requests"] == 4
    finally:
        sched.stop()


def test_scheduler_pads_partial_batches(engine):
    sched = BatchScheduler(engine, batch_size=4, eos_ids=[127]).start()
    try:
        got = sched.generate([3, 17, 52], GEN, timeout=300)
        want = postprocess_output(
            engine.generate([3, 17, 52], GEN, jax.random.PRNGKey(0), [127]),
            [127], 12,
        )
        assert got == want
        assert sched.stats["padded_rows"] == 3
    finally:
        sched.stop()


def test_scheduler_splits_incompatible_configs(engine):
    sched = BatchScheduler(engine, batch_size=4, eos_ids=[127],
                           gather_window_s=0.2).start()
    try:
        other = GenerationConfig(
            max_steps=8, sample=False, generation_strategy="autoregressive"
        )
        f1 = sched.submit([3, 17, 52], GEN)
        f2 = sched.submit([3, 17, 52], other)
        r1, r2 = f1.result(timeout=300), f2.result(timeout=300)
        assert len(r1) == 12 and len(r2) == 8
        assert sched.stats["batches"] == 2
    finally:
        sched.stop()


def test_http_serving(engine):
    """Full localhost round-trip through the stdlib HTTP server."""
    import socket
    from http.server import ThreadingHTTPServer

    from layerskip_tpu import serving as serving_mod

    class Tok:
        eos_token_id = 127

        def encode(self, s):
            return [3, 17, 52]

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(int(t)) for t in ids)

    sched = BatchScheduler(engine, batch_size=2, eos_ids=[127]).start()
    # find a free port
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    server_thread = threading.Thread(
        target=serving_mod.serve,
        args=(sched, Tok(), GEN, "127.0.0.1", port),
        daemon=True,
    )
    server_thread.start()
    import time

    deadline = time.time() + 10
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=1
            ) as r:
                assert json.load(r)["ok"] is True
            break
        except Exception:
            time.sleep(0.2)
    else:
        pytest.fail("server did not come up")

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate",
        data=json.dumps({"prompt": "hi", "max_steps": 6}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        payload = json.load(r)
    assert len(payload["tokens"]) == 6
    assert payload["text"]
    sched.stop()


def test_gather_per_request_seeds(engine):
    """Each gathered request samples from its own seed (not row 0's), and a
    request's stream is independent of batch composition (ADVICE r1:
    batch[0].rng_seed silently overrode everyone)."""
    gen = GenerationConfig(
        max_steps=12, sample=True, temperature=1.2, top_k=0, top_p=1.0,
        generation_strategy="self_speculative", exit_layer=2,
        num_speculations=3,
    )
    prompt = [3, 17, 52]
    sched = BatchScheduler(engine, batch_size=4, eos_ids=[127],
                           gather_window_s=0.5).start()
    try:
        futs = [
            sched.submit(prompt, gen, rng_seed=7),
            sched.submit(prompt, gen, rng_seed=99),
            sched.submit(prompt, gen, rng_seed=7),
        ]
        a, b, c = [f.result(timeout=300) for f in futs]
        assert a == c  # same seed -> same stream
        assert a != b  # different seed -> diverges (overwhelmingly likely)
        # solo (padded) run of the same seed matches the batched run:
        # results don't depend on which rows happened to batch together
        solo = sched.generate(prompt, gen, rng_seed=99, timeout=300)
        assert solo == b
    finally:
        sched.stop()


def test_continuous_http_rejects_overrides(engine):
    """Continuous mode serves ONE compiled config: per-request sampling
    overrides (other than max_steps/seed) get a 400, not silent defaults."""
    import socket
    import time
    import urllib.error

    from layerskip_tpu import serving as serving_mod
    from layerskip_tpu.serving import ContinuousBatchScheduler

    class Tok:
        eos_token_id = 127

        def encode(self, s):
            return [3, 17, 52]

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(int(t)) for t in ids)

    gen = GenerationConfig(
        max_steps=8, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=2,
    )
    sched = ContinuousBatchScheduler(
        engine, gen, batch_size=2, prompt_bucket=16, eos_ids=[127]
    ).start()
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    threading.Thread(
        target=serving_mod.serve, args=(sched, Tok(), gen, "127.0.0.1", port),
        daemon=True,
    ).start()
    deadline = time.time() + 10
    while time.time() < deadline:
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=1
            ).read()
            break
        except Exception:
            time.sleep(0.2)
    else:
        pytest.fail("server did not come up")

    def post(payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        return urllib.request.urlopen(req, timeout=300)

    # temperature override is not servable by the compiled session -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        post({"prompt": "hi", "temperature": 0.1})
    assert ei.value.code == 400
    assert "temperature" in json.load(ei.value)["error"]

    # max_steps + seed remain allowed; no-op overrides equal to the session
    # config pass through too
    with post({"prompt": "hi", "max_steps": 4, "seed": 3,
               "num_speculations": 2}) as r:
        assert len(json.load(r)["tokens"]) == 4
    sched.stop()


def test_continuous_batching_matches_direct(engine):
    """In-flight batching: staggered requests produce exactly the tokens the
    same prompts produce alone."""
    from layerskip_tpu.serving import ContinuousBatchScheduler

    gen = GenerationConfig(
        max_steps=10, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3,
    )
    prompts = [[3, 17, 52], [5, 9], [100, 2, 44, 8], [7, 7, 7], [11, 23, 5, 8, 2]]
    want = [
        postprocess_output(
            engine.generate(p, gen, jax.random.PRNGKey(0), [127]), [127], 10
        )
        for p in prompts
    ]
    sched = ContinuousBatchScheduler(
        engine, gen, batch_size=2, prompt_bucket=16, eos_ids=[127]
    ).start()
    try:
        # more requests than slots: rows must recycle in-flight
        futures = [sched.submit(p) for p in prompts]
        got = [f.result(timeout=300) for f in futures]
        assert got == want
        assert sched.stats["completed"] == len(prompts)
        assert sched.stats["rounds"] >= 3
    finally:
        sched.stop()


def test_continuous_batching_staggered_submissions(engine):
    from layerskip_tpu.serving import ContinuousBatchScheduler
    import time as _time

    gen = GenerationConfig(
        max_steps=8, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=2,
    )
    sched = ContinuousBatchScheduler(
        engine, gen, batch_size=2, prompt_bucket=16, eos_ids=[127]
    ).start()
    try:
        f1 = sched.submit([3, 17, 52])
        _time.sleep(0.1)  # join mid-flight
        f2 = sched.submit([5, 9])
        r1, r2 = f1.result(timeout=300), f2.result(timeout=300)
        w1 = postprocess_output(
            engine.generate([3, 17, 52], gen, jax.random.PRNGKey(0), [127]),
            [127], 8,
        )
        w2 = postprocess_output(
            engine.generate([5, 9], gen, jax.random.PRNGKey(0), [127]), [127], 8
        )
        assert r1 == w1 and r2 == w2
    finally:
        sched.stop()


def test_continuous_per_request_seeds(engine):
    """Sampling requests with distinct seeds produce distinct streams; the
    same seed reproduces the same stream (per-row rng keys)."""
    from layerskip_tpu.serving import ContinuousBatchScheduler

    gen = GenerationConfig(
        max_steps=12, sample=True, temperature=1.2, top_k=0, top_p=1.0,
        generation_strategy="self_speculative", exit_layer=2,
        num_speculations=3,
    )
    session = engine.continuous_session(gen, batch=2, prompt_bucket=16,
                                        eos_ids=[127])
    prompt = [3, 17, 52]

    def run(seed, slot):
        session.insert([slot], [prompt], seeds=[seed])
        while True:
            finished = session.step()
            for row, toks, _ in finished:
                if row == slot:
                    return toks

    a = run(7, 0)
    b = run(99, 1)
    c = run(7, 1)  # same seed, different slot
    assert a == c  # seed determines the stream, not the slot
    assert a != b  # different seeds diverge (overwhelmingly likely)


def test_continuous_per_request_max_tokens(engine):
    """Requests with different token budgets share one compiled program."""
    from layerskip_tpu.serving import ContinuousBatchScheduler

    gen = GenerationConfig(
        max_steps=16, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3,
    )
    sched = ContinuousBatchScheduler(
        engine, gen, batch_size=2, prompt_bucket=16, eos_ids=[127]
    ).start()
    try:
        futs = [
            sched.submit([3, 17, 52], max_tokens=4),
            sched.submit([5, 9], max_tokens=11),
            sched.submit([7, 7, 7]),  # default 16
        ]
        lens = [len(f.result(timeout=300)) for f in futs]
        assert lens == [4, 11, 16]
        # content still matches a solo run at the same budget
        import dataclasses as dc

        want4 = postprocess_output(
            engine.generate([3, 17, 52], dc.replace(gen, max_steps=4),
                            jax.random.PRNGKey(0), [127]), [127], 4)
        assert futs[0].result() == want4
    finally:
        sched.stop()


def test_continuous_min_rounds_bound(engine):
    """min_rounds_bound: wave-sized dispatches stay within budget safety.

    A row with remaining budget R commits at most W+1 tokens per round, so
    it cannot finish in fewer than ceil(R / (W+1)) rounds — the scheduler
    dispatches exactly that many rounds per tunnel round-trip."""
    gen = GenerationConfig(
        max_steps=16, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3,
    )
    sess = engine.continuous_session(gen, batch=2, prompt_bucket=16,
                                     eos_ids=[250])
    assert sess.min_rounds_bound() == 1  # nothing live
    sess.insert([0, 1], [[3, 17, 52], [5, 9]], max_tokens=[9, 16])
    # row 0: 1 committed, 8 remaining, W+1=4 -> ceil(8/4)=2
    assert sess.min_rounds_bound() == 2
    done_rows = []
    while sess.has_active():
        done_rows += sess.step(max_rounds=sess.min_rounds_bound())
    lens = {r: len(t) for r, t, _ in done_rows}
    assert lens == {0: 9, 1: 16}
    # outputs equal the solo engine run at the same budget
    import dataclasses as dc

    want = postprocess_output(
        engine.generate([3, 17, 52], dc.replace(gen, max_steps=9),
                        jax.random.PRNGKey(0), [250]), [250], 9)
    got = next(t for r, t, _ in done_rows if r == 0)
    assert got == want


def test_continuous_pld_matches_solo():
    """Prompt-lookup decoding in the continuous session: each slot's
    stream equals its solo run (greedy)."""
    import dataclasses as dc

    from layerskip_tpu.config import GenerationConfig, tiny_config
    from layerskip_tpu.generation.engine import Engine, postprocess_output
    from layerskip_tpu.models.params import init_params

    cfg = tiny_config()
    engine = Engine(init_params(jax.random.PRNGKey(1), cfg), cfg)
    gen = GenerationConfig(
        max_steps=12, sample=False, generation_strategy="prompt_lookup",
        exit_layer=2, num_speculations=3, pld_ngram=2,
    )
    session = engine.continuous_session(gen, batch=2, prompt_bucket=16)
    results = {}
    session.insert([0, 1], [[3, 17, 52], [5, 9, 5, 9, 5]], seeds=[0, 0],
                   max_tokens=[12, 12])
    while session.has_active():
        for r, toks, _ in session.step(max_rounds=2):
            results[r] = toks
    for r, p in enumerate([[3, 17, 52], [5, 9, 5, 9, 5]]):
        want = postprocess_output(
            engine.generate(p, dc.replace(gen), jax.random.PRNGKey(0),
                            engine.cfg.eos_token_ids),
            engine.cfg.eos_token_ids, 12)
        assert results[r] == want, r


def test_cfg_key_covers_every_field():
    """VERDICT r2 #2: requests differing in ANY GenerationConfig field must
    not batch together (draft_exit_prob / pld_ngram were omitted; in round 1
    it was max_prompt_len / stop_words). Perturb every dataclass field and
    require the batching key to change — future fields cannot be forgotten
    silently."""
    import dataclasses

    from layerskip_tpu.serving import _cfg_key

    base = GenerationConfig()
    for f in dataclasses.fields(GenerationConfig):
        v = getattr(base, f.name)
        if f.name == "stop_words":
            new = ["STOP"]
        elif f.name == "stop_token_ids":
            new = [42]
        elif f.name == "no_repeat_ngram_size":
            new = 5
        elif isinstance(v, bool):
            new = not v
        elif isinstance(v, int):
            new = v + 7
        elif isinstance(v, float):
            new = v + 0.125
        else:
            new = str(v) + "_x"
        mod = dataclasses.replace(base, **{f.name: new})
        assert _cfg_key(mod) != _cfg_key(base), (
            f"GenerationConfig.{f.name} missing from serving._cfg_key"
        )


def test_scheduler_splits_on_draft_exit_prob(engine):
    """Two requests identical except draft_exit_prob run as two batches."""
    sched = BatchScheduler(engine, batch_size=4, eos_ids=[127],
                           gather_window_s=0.2).start()
    try:
        import dataclasses

        f1 = sched.submit([3, 17, 52], GEN)
        f2 = sched.submit([3, 17, 52], dataclasses.replace(GEN, draft_exit_prob=0.3))
        f1.result(timeout=300), f2.result(timeout=300)
        assert sched.stats["batches"] == 2
    finally:
        sched.stop()


# ---- chunked prefill (net-new; Sarathi-style — reference prefills whole
# prompts at batch=1) ----

def test_chunked_insert_equals_plain_insert(engine):
    """A chunked insert commits exactly the tokens a plain insert does."""
    gen = GenerationConfig(
        max_steps=10, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3,
    )
    prompt = [3, 17, 52, 9, 30, 8, 61, 100, 2, 44, 7, 5, 9]  # 13 toks

    def run(chunk):
        sess = engine.continuous_session(gen, batch=2, prompt_bucket=16,
                                         eos_ids=[127])
        if chunk:
            sess.begin_chunked_insert([0], [prompt], seeds=[4],
                                      chunk_tokens=chunk)
            assert sess.free_slots() == [1]  # pending slot is reserved
        else:
            sess.insert([0], [prompt], seeds=[4])
        for _ in range(60):
            for r, toks, _ in sess.step():
                if r == 0:
                    return toks
        raise AssertionError("did not finish")

    want = run(0)
    assert run(4) == want  # multi-chunk
    assert run(5) == want  # ragged final chunk
    assert run(64) == want  # single chunk wider than the prompt


def test_chunked_insert_sampling_matches_plain(engine):
    """Per-request seed streams are invariant to chunked vs plain prefill."""
    gen = GenerationConfig(
        max_steps=8, sample=True, temperature=0.8, top_p=0.9,
        generation_strategy="self_speculative", exit_layer=2,
        num_speculations=3,
    )
    prompt = [3, 17, 52, 9, 30, 8, 61, 100]

    def run(chunk):
        sess = engine.continuous_session(gen, batch=2, prompt_bucket=16,
                                         eos_ids=[127])
        if chunk:
            sess.begin_chunked_insert([1], [prompt], seeds=[11],
                                      chunk_tokens=chunk)
        else:
            sess.insert([1], [prompt], seeds=[11])
        for _ in range(60):
            for r, toks, _ in sess.step():
                if r == 1:
                    return toks
        raise AssertionError("did not finish")

    assert run(3) == run(0)


def test_chunked_insert_interleaves_with_decode(engine):
    """In-flight rows keep decoding between prefill chunks, and every row's
    output equals its solo run."""
    import dataclasses as dc
    import numpy as np

    gen = GenerationConfig(
        max_steps=14, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3,
    )
    p0 = [3, 17, 52]
    p1 = [5, 9, 5, 9, 30, 8, 61, 100, 2, 44, 7, 5]
    sess = engine.continuous_session(gen, batch=2, prompt_bucket=16,
                                     eos_ids=[127])
    sess.insert([0], [p0], seeds=[0])
    sess.step()  # row 0 decodes alone for one round
    before = int(sess._out_len[0])
    sess.begin_chunked_insert([1], [p1], seeds=[0], chunk_tokens=4)
    results = {}
    progressed = False
    for _ in range(80):
        pending = bool(sess._chunk_queue)
        for r, toks, _ in sess.step():
            results[r] = toks
        if pending and int(sess._out_len[0]) > before and 0 not in results:
            progressed = True  # row 0 advanced during row 1's chunked prefill
        if len(results) == 2:
            break
    assert len(results) == 2
    assert progressed or 0 in results  # row 0 was never stalled to the end
    for r, p in ((0, p0), (1, p1)):
        want = postprocess_output(
            engine.generate(p, gen, jax.random.PRNGKey(0), [127]), [127], 14
        )
        assert results[r] == want


def test_continuous_scheduler_chunked_prefill(engine):
    """Scheduler with chunk_prefill_tokens returns the same results as the
    direct engine runs (and as the unchunked scheduler)."""
    from layerskip_tpu.serving import ContinuousBatchScheduler

    gen = GenerationConfig(
        max_steps=10, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3,
    )
    prompts = [[3, 17, 52, 9, 30, 8, 61, 100], [5, 9, 5, 9, 30],
               [100, 2, 44], [7, 7, 7, 7, 7, 7, 7, 7, 7, 7]]
    sched = ContinuousBatchScheduler(
        engine, gen, batch_size=2, prompt_bucket=16, eos_ids=[127],
        chunk_prefill_tokens=4,
    ).start()
    try:
        futures = [sched.submit(p, seed=0) for p in prompts]
        got = [f.result(timeout=300) for f in futures]
    finally:
        sched.stop()
    want = [
        postprocess_output(
            engine.generate(p, gen, jax.random.PRNGKey(0), [127]), [127], 10
        )
        for p in prompts
    ]
    assert got == want


def test_latency_stats_recorded(engine):
    """Both schedulers record per-request latency percentiles (queue wait,
    serve time, per-token ms) and expose them via /healthz's stats dict."""
    from layerskip_tpu.serving import ContinuousBatchScheduler

    gen = GenerationConfig(
        max_steps=8, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3,
    )
    sched = BatchScheduler(engine, batch_size=2, eos_ids=[127]).start()
    try:
        futs = [sched.submit([3, 17, 52], gen) for _ in range(3)]
        for f in futs:
            f.result(timeout=300)
    finally:
        sched.stop()
    s = sched.latency.summary()
    assert s["window"] == 3
    for k in ("queue_ms", "serve_ms", "per_token_ms"):
        assert s[k]["p50"] >= 0 and s[k]["p99"] >= s[k]["p50"]

    cont = ContinuousBatchScheduler(
        engine, gen, batch_size=2, prompt_bucket=16, eos_ids=[127],
    ).start()
    try:
        futs = [cont.submit([5, 9, 30], seed=i) for i in range(3)]
        for f in futs:
            f.result(timeout=300)
    finally:
        cont.stop()
    s2 = cont.latency.summary()
    assert s2["window"] == 3 and s2["per_token_ms"]["p50"] > 0


@pytest.mark.parametrize("kv_quant", [False, True])
def test_paged_tree_continuous_matches_ar(engine, kv_quant):
    """Tree speculation over PAGED KV (bf16 and int8 pools): the continuous
    session must emit exactly the greedy AR streams — scratch slots map
    through page tables, the tree mask rides the paged kernels' slot->
    (position, chain) recovery (XLA fallback on CPU), and the winning
    chain compacts through the tables."""
    gen = GenerationConfig(
        max_steps=10, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3, spec_tree_width=3,
        kv_quant=kv_quant,
    )
    prompts = [[3, 17, 52, 9, 30], [5, 9, 30, 8]]
    want = [
        postprocess_output(
            engine.generate(p, GenerationConfig(
                max_steps=10, sample=False, kv_quant=kv_quant,
                generation_strategy="autoregressive"),
                jax.random.PRNGKey(0), [127]), [127], 10)
        for p in prompts
    ]
    sess = engine.continuous_session(
        gen, batch=2, prompt_bucket=16, eos_ids=[127],
        paged_pool_pages=48, page_size=16,
    )
    sess.insert([0, 1], prompts, seeds=[0, 0])
    got = {}
    for _ in range(40):
        for r, toks, _ in sess.step():
            got[r] = toks
        if len(got) == 2:
            break
    assert [got[0], got[1]] == want


def test_paged_tree_with_prefix_cache(engine):
    """Tree speculation composes with prompt-prefix page sharing: a warm
    stream (shared prefix pages) equals the cold stream exactly."""
    gen = GenerationConfig(
        max_steps=8, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3, spec_tree_width=2,
    )
    shared = [7] * 16  # one full page of shared prefix (page_size=16)
    p = shared + [3, 17, 52]
    sess = engine.continuous_session(
        gen, batch=2, prompt_bucket=32, eos_ids=[127],
        paged_pool_pages=64, page_size=16, prefix_cache=True,
    )

    def run(slot, seed):
        sess.insert([slot], [p], seeds=[seed])
        for _ in range(40):
            for r, toks, _ in sess.step():
                if r == slot:
                    return toks
        raise AssertionError("did not finish")

    cold = run(0, 0)
    warm = run(1, 0)  # prefix pages now shared from the cache
    assert cold == warm
