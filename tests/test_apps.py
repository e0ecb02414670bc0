"""App-layer tests: data, metrics, args, streamer, benchmark/correctness CLIs,
and the lm-eval scoring core.

Mirrors the reference's test strategy tiers (SURVEY §4): pure unit tests for
metrics/args/data, mock-tokenizer streamer tests
(tests/test_speculative_streamer.py), and small-real-model integration runs
— here with random-weight tiny models instead of a network fixture.
"""

import io
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layerskip_tpu import data as data_mod
from layerskip_tpu import metrics as metrics_mod
from layerskip_tpu.cli.args import (
    Arguments,
    parse_dataclasses,
    simple_parse_args_string,
)
from layerskip_tpu.config import GenerationConfig, tiny_config
from layerskip_tpu.models.params import init_params


# --- data -------------------------------------------------------------------


def test_custom_jsonl_and_shuffle(tmp_path):
    p = tmp_path / "d.jsonl"
    rows = [{"prompt": f"p{i}", "response": f"r{i}"} for i in range(10)]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    ex = data_mod.get_data(
        random_shuffle=False, num_samples=4, dataset="custom_jsonl",
        data_path=str(p),
    )
    assert [e.input for e in ex] == ["p0", "p1", "p2", "p3"]
    ex_a = data_mod.get_data(
        random_shuffle=True, num_samples=10, dataset="custom_jsonl",
        data_path=str(p), seed=7,
    )
    ex_b = data_mod.get_data(
        random_shuffle=True, num_samples=10, dataset="custom_jsonl",
        data_path=str(p), seed=7,
    )
    assert [e.input for e in ex_a] == [e.input for e in ex_b]  # deterministic


def test_chat_format(tmp_path):
    p = tmp_path / "c.jsonl"
    row = {
        "data": [
            {"role": "SYSTEM", "message": "s"},
            {"role": "USER", "message": "hi"},
            {"role": "PARSER", "message": "[IN:X]"},
        ]
    }
    p.write_text(json.dumps(row))
    ex = data_mod.get_data(
        random_shuffle=False, num_samples=0, dataset="chat_format",
        data_path=str(p),
    )
    assert len(ex) == 1
    assert ex[0].input.endswith("[PARSER]\n")
    assert "[USER]" in ex[0].input
    assert "[IN:X]" in ex[0].output


def test_apply_template():
    assert data_mod.apply_template("x", None) == "x"
    assert data_mod.apply_template("x", "Q: {message} A:") == "Q: x A:"


# --- metrics ----------------------------------------------------------------


def test_rouge_identical_and_disjoint():
    m = metrics_mod.RougeMetric("rouge1")
    m.update("the cat sat", "the cat sat")
    assert m.compute() == pytest.approx(1.0)
    m2 = metrics_mod.RougeMetric("rouge2")
    m2.update("aa bb cc", "xx yy zz")
    assert m2.compute() == 0.0


def test_rouge_l_subsequence():
    # pred 'a b d', target 'a b c d' -> LCS 3, P=1.0, R=0.75 -> F=6/7
    assert metrics_mod.rouge_l("a b d", "a b c d") == pytest.approx(6 / 7)


def test_bleu_perfect():
    b = metrics_mod.BleuMetric(4)
    b.update("the quick brown fox jumps", "the quick brown fox jumps")
    assert b.compute() == pytest.approx(1.0)


def test_edit_distance():
    assert metrics_mod.edit_distance("kitten", "sitting") == 3
    assert metrics_mod.edit_distance("", "abc") == 3


def test_evaluation_metrics_schema():
    from layerskip_tpu.data import EvaluationExample
    from layerskip_tpu.generation.generator import (
        GenerationResult,
        GenerationStrategyResult,
    )

    em = metrics_mod.EvaluationMetrics.build_metrics()
    res = GenerationResult(
        generation_strategy_result=GenerationStrategyResult(
            predicted_tokens=[1, 2], acceptance_rate=0.5
        ),
        decoded_prediction="a summary",
        num_tokens_generated=2, total_time=0.5,
        time_per_token=0.25, tokens_per_second=4.0,
    )
    em.update(EvaluationExample(input="i", output="a summary"), res)
    out = em.compute()
    assert set(out) == {
        "predicted_text", "acceptance_rate", "total_time",
        "time_per_token", "tokens_per_second",
    }
    assert out["predicted_text"]["rouge-l"] == pytest.approx(1.0)
    assert out["acceptance_rate"]["mean"] == pytest.approx(0.5)


# --- args -------------------------------------------------------------------


def test_simple_parse_args_string():
    d = simple_parse_args_string("a=1,b=true,c=2.5,d=x")
    assert d == {"a": 1, "b": True, "c": 2.5, "d": "x"}
    assert simple_parse_args_string(None) == {}


def test_parse_dataclasses_roundtrip():
    a, g = parse_dataclasses(
        (Arguments, GenerationConfig),
        ["--model", "m", "--exit_layer", "4", "--sample", "false"],
    )
    assert a.model == "m" and a.seed == 42
    assert g.exit_layer == 4 and g.sample is False


# --- streamer ---------------------------------------------------------------


class FakeTokenizer:
    def decode(self, ids, skip_special_tokens=True):
        return "".join(f"<{i}>" for i in ids)


def test_streamer_put_and_delete():
    from layerskip_tpu.generation.streamer import SpeculativeTextStreamer

    buf = io.StringIO()
    s = SpeculativeTextStreamer(FakeTokenizer(), out=buf)
    s.put([1, 2])
    assert "<1><2>" in buf.getvalue()
    s.put([3, 4], is_draft=True)
    assert "<3><4>" in buf.getvalue()
    s.delete(2)  # erase both draft tokens
    # backspace repaint for the 6 chars of '<3><4>'
    assert buf.getvalue().count("\b \b") == 6
    s.put([5])
    final_visible = buf.getvalue()
    assert "<5>" in final_visible


def test_streamer_incremental_plain():
    from layerskip_tpu.generation.streamer import TextStreamer

    buf = io.StringIO()
    s = TextStreamer(FakeTokenizer(), out=buf)
    s.put([1])
    s.put([2])
    assert buf.getvalue() == "<1><2>"


# --- CLI integration (tiny random model, offline) ---------------------------


@pytest.fixture(scope="module")
def jsonl_dataset(tmp_path_factory):
    p = tmp_path_factory.mktemp("d") / "tiny.jsonl"
    rows = [{"prompt": f"question {i}", "response": f"answer {i}"} for i in range(2)]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    return str(p)


def test_benchmark_cli(jsonl_dataset, tmp_path):
    from layerskip_tpu.cli.benchmark import BenchmarkArguments, main

    args = Arguments(model="random:tiny", output_dir=str(tmp_path))
    bench_args = BenchmarkArguments(
        dataset="custom_jsonl", data_path=jsonl_dataset, random_shuffle=False,
        num_samples=2,
    )
    gen_cfg = GenerationConfig(
        max_steps=8, generation_strategy="self_speculative", exit_layer=2,
        num_speculations=3, sample=False,
    )
    result = main(args, bench_args, gen_cfg)
    assert result["tokens_per_second"]["mean"] > 0
    files = [f for f in os.listdir(tmp_path) if f.startswith("benchmark_")]
    assert files
    with open(tmp_path / files[0]) as f:
        dumped = json.load(f)  # single VALID json (reference wart fixed)
    assert "metric_result" in dumped


def test_correctness_cli(jsonl_dataset, tmp_path):
    from layerskip_tpu.cli.benchmark import BenchmarkArguments
    from layerskip_tpu.cli.correctness import main

    args = Arguments(model="random:tiny", output_dir=str(tmp_path))
    bench_args = BenchmarkArguments(
        dataset="custom_jsonl", data_path=jsonl_dataset, random_shuffle=False,
        num_samples=2,
    )
    gen_cfg = GenerationConfig(
        max_steps=8, exit_layer=2, num_speculations=3, sample=False
    )
    result = main(args, bench_args, gen_cfg)
    assert result["total_errors"] == 0 and result["error_pct"] == 0.0


# --- lm-eval scoring core ---------------------------------------------------


def test_token_scorer_loglikelihood():
    from layerskip_tpu.cli.eval import TokenScorer
    from layerskip_tpu.models import llama
    from layerskip_tpu.ops.kv_cache import init_kv_cache

    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(3), cfg)
    scorer = TokenScorer(params, cfg)
    context, cont = [5, 8, 2], [7, 1]
    ll, greedy = scorer.loglikelihood_tokens(context, cont)

    # manual: full forward, fp32 log-softmax
    ids = jnp.asarray([context + cont], jnp.int32)
    cache = init_kv_cache(cfg, batch=1, max_len=16)
    res = llama.forward(params, cfg, ids, cache, jnp.int32(0))
    lp = jax.nn.log_softmax(res.logits, axis=-1)
    expect = float(lp[0, 2, 7] + lp[0, 3, 1])
    assert ll == pytest.approx(expect, abs=1e-3)
    assert isinstance(greedy, bool)


def test_token_scorer_truncation_and_batching():
    """Left-truncation to max_position_embeddings (reference eval.py:241-254)
    and batched == single-row scoring."""
    from layerskip_tpu.cli.eval import TokenScorer

    cfg = tiny_config(max_position_embeddings=32)
    params = init_params(jax.random.PRNGKey(3), cfg)
    scorer = TokenScorer(params, cfg, max_batch=4)

    # joint length 40 > max_len 32: must score as if the first 7 context
    # tokens were dropped — (ctx+cont)[-(max_len+1):][:-1] semantics
    rng = np.random.RandomState(0)
    ctx = rng.randint(1, 200, size=36).tolist()
    cont = rng.randint(1, 200, size=4).tolist()
    ll_long, _ = scorer.loglikelihood_tokens(ctx, cont)
    ll_manual, _ = scorer.loglikelihood_tokens(ctx[-(33 - 4):], cont)
    assert ll_long == pytest.approx(ll_manual, abs=1e-4)

    # continuation longer than the model's range is rejected (reference
    # eval.py:246 asserts this)
    with pytest.raises(ValueError):
        scorer.loglikelihood_tokens([1], list(range(1, 40)))

    # batched dispatch (mixed lengths/buckets, incl. a padded batch) equals
    # per-row scoring, original order preserved
    rows = [
        (rng.randint(1, 200, size=n).tolist(),
         rng.randint(1, 200, size=m).tolist())
        for n, m in [(3, 2), (50, 4), (7, 1), (12, 3), (3, 2)]
    ]
    batched = scorer.score_batch(rows)
    for got, (c, k) in zip(batched, rows):
        single = scorer.loglikelihood_tokens(c, k)
        assert got[0] == pytest.approx(single[0], abs=1e-4)
        assert got[1] == single[1]


def test_eval_cli_local_mc(tmp_path):
    """End-to-end offline MC eval through the CLI main (--tasks local:...)."""
    from layerskip_tpu.cli.eval import EvalArguments, main

    task = tmp_path / "mc.jsonl"
    rows = [
        {"query": f"q {i} is", "choices": [" alpha", " beta", " gam"],
         "gold": i % 3}
        for i in range(5)
    ]
    task.write_text("\n".join(json.dumps(r) for r in rows))
    args = Arguments(model="random:tiny", output_dir=str(tmp_path / "out"))
    res = main(
        args,
        EvalArguments(tasks=f"local:{task}", batch_size=4, num_fewshot=1),
        GenerationConfig(max_steps=4, sample=False),
    )
    r = res["results"]["mc.jsonl"]
    assert r["num_docs"] == 4  # 1 doc consumed as the fewshot example
    assert r["num_requests"] == 12
    assert 0.0 <= r["acc"] <= 1.0 and 0.0 <= r["acc_norm"] <= 1.0
    assert os.path.isdir(str(tmp_path / "out"))


def test_eval_harness_wrapper_generate_until():
    from layerskip_tpu.cli.eval import EvalHarnessLM
    from layerskip_tpu.cli.loading import SimpleTokenizer
    from layerskip_tpu.generation.generator import LlamaGenerator

    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(4), cfg)
    gen = LlamaGenerator(SimpleTokenizer(cfg.vocab_size), params, cfg, eos_ids=[0])
    wrap = EvalHarnessLM(gen, GenerationConfig(max_steps=6, sample=False))

    class Req:
        args = ("hello", {"until": []})

    out = wrap.generate_until([Req()])
    assert len(out) == 1 and isinstance(out[0], str)
    lls = wrap._loglikelihood_tokens([("k", [3, 4], [5])])
    assert len(lls) == 1 and lls[0][0] < 0


def test_sweep_cli(jsonl_dataset, tmp_path):
    from layerskip_tpu.cli.benchmark import BenchmarkArguments
    from layerskip_tpu.cli.sweep import SweepArguments, sweep

    args = Arguments(model="random:tiny", output_dir=str(tmp_path))
    bench_args = BenchmarkArguments(
        dataset="custom_jsonl", data_path=jsonl_dataset, random_shuffle=False,
        num_samples=1,
    )
    sweep_args = SweepArguments(
        exit_layer_first=1, exit_layer_last=3, exit_layer_step=2,
        num_speculations_first=2, num_speculations_last=2,
    )
    gen_cfg = GenerationConfig(max_steps=6, sample=False)
    rows = sweep(args, bench_args, sweep_args, gen_cfg)
    assert len(rows) == 2  # exit 1, 3 x spec 2
    assert all(r["tokens_per_second"] > 0 for r in rows)
    csvs = [f for f in os.listdir(tmp_path) if f.endswith(".csv")]
    assert csvs


def test_rolling_token_windows_exact():
    """lm-eval ``get_rolling_token_windows(context_len=1, prefix_token=eot)``
    + ``make_disjoint_window`` semantics, hand-computed (VERDICT r2 #4):
    EOT-prefixed first window, every token scored exactly once."""
    from layerskip_tpu.cli.eval import rolling_token_windows

    EOT = 99
    assert rolling_token_windows([], EOT, 5) == []
    # shorter than max_len: one EOT-prefixed window covering every token
    assert rolling_token_windows([0, 1, 2], EOT, 5) == [([EOT], [0, 1, 2])]
    # exactly max_len
    assert rolling_token_windows(list(range(5)), EOT, 5) == [
        ([EOT], [0, 1, 2, 3, 4]),
    ]
    # remainder window: disjoint context is the lookback before it
    assert rolling_token_windows(list(range(8)), EOT, 5) == [
        ([EOT], [0, 1, 2, 3, 4]),
        ([2, 3, 4], [5, 6, 7]),
    ]
    # two full windows: context_len=1 leaves a single-token context
    assert rolling_token_windows(list(range(10)), EOT, 5) == [
        ([EOT], [0, 1, 2, 3, 4]),
        ([4], [5, 6, 7, 8, 9]),
    ]


def test_rolling_token_windows_cover_once():
    from layerskip_tpu.cli.eval import rolling_token_windows

    for n in (1, 4, 5, 6, 11, 23):
        toks = list(range(n))
        ws = rolling_token_windows(toks, -1, 5)
        # concatenated continuations == the text: each token scored once
        assert sum((cont for _, cont in ws), []) == toks
        for ctx, cont in ws:
            assert len(ctx) >= 1  # never an empty context
            assert len(ctx) + len(cont) <= 5 + 1  # model input <= max_len


def test_loglikelihood_rolling_matches_single_window():
    """A text that fits one window: rolling == EOT-prefixed single score."""
    from layerskip_tpu.cli.eval import EvalHarnessLM
    from layerskip_tpu.cli.loading import SimpleTokenizer
    from layerskip_tpu.generation.generator import LlamaGenerator

    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(4), cfg)
    gen = LlamaGenerator(SimpleTokenizer(cfg.vocab_size), params, cfg, eos_ids=[0])
    wrap = EvalHarnessLM(gen, GenerationConfig(max_steps=4, sample=False))

    class Req:
        args = ("hi there",)

    (got,) = wrap.loglikelihood_rolling([Req()])
    toks = wrap.tok_encode("hi there")
    want, _ = wrap.scorer.loglikelihood_tokens([wrap.eot_token_id], toks)
    assert got == pytest.approx(want, abs=1e-4)


def test_generator_reports_prompt_lookup_acceptance():
    """VERDICT r2 #3: acceptance must be reported for prompt_lookup too
    (the engine tracks matches/drafts for it identically)."""
    from layerskip_tpu.cli.loading import SimpleTokenizer
    from layerskip_tpu.generation.generator import LlamaGenerator

    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(4), cfg)
    gen = LlamaGenerator(SimpleTokenizer(cfg.vocab_size), params, cfg, eos_ids=[0])
    res = gen.generate(
        "ab cd ab cd ab",
        GenerationConfig(
            max_steps=6, sample=False, generation_strategy="prompt_lookup",
            num_speculations=3, pld_ngram=2,
        ),
    )
    acc = res.generation_strategy_result.acceptance_rate
    assert acc is not None and 0.0 <= acc <= 1.0


def test_cli_quantize_flag(tmp_path, capsys):
    """--quantize int8/int4 loads a quantized engine through every CLI app's
    shared loader and still satisfies greedy spec == AR."""
    import jax

    from layerskip_tpu.cli.loading import load_model_and_tokenizer
    from layerskip_tpu.config import GenerationConfig
    from layerskip_tpu.generation.engine import Engine, postprocess_output
    from layerskip_tpu.ops.linear import QuantTensor

    for quant, bits in (("int8", 8), ("int4", 4)):
        params, cfg, _ = load_model_and_tokenizer(
            "random:tiny", seed=3, quantize=quant
        )
        assert isinstance(params.layers.wq, QuantTensor)
        if bits == 4:
            import jax.numpy as jnp

            assert params.layers.wq.q.dtype == jnp.uint8  # nibble-packed
        eng = Engine(params, cfg)
        ar = postprocess_output(eng.generate([3, 5, 9], GenerationConfig(
            max_steps=8, sample=False,
            generation_strategy="autoregressive")), (), 8)
        sp = postprocess_output(eng.generate([3, 5, 9], GenerationConfig(
            max_steps=8, sample=False,
            generation_strategy="self_speculative", exit_layer=2,
            num_speculations=3)), (), 8)
        assert ar == sp and len(ar) == 8


def test_random_loader_tail_eps_knob():
    """random:<preset>?tail_eps=E&tail_from=F scales wo/w_down of layers
    >= F by E (bench.py's acceptance dial, exposed to the CLI apps so
    sweeps on random weights measure meaningful tradeoffs — the on-chip
    sweep artifact, benchmarks/sweep_7b_onchip.csv)."""
    import numpy as np

    from layerskip_tpu.cli.loading import load_model_and_tokenizer

    p0, cfg, _ = load_model_and_tokenizer("random:tiny", seed=0)
    p1, _, _ = load_model_and_tokenizer(
        "random:tiny?tail_eps=0.5&tail_from=2", seed=0
    )
    w0, w1 = np.asarray(p0.layers.wo), np.asarray(p1.layers.wo)
    assert np.array_equal(w1[:2], w0[:2])
    assert np.allclose(w1[2:], w0[2:] * 0.5, atol=1e-3)
    d0 = np.asarray(p0.layers.w_down)
    d1 = np.asarray(p1.layers.w_down)
    assert np.allclose(d1[2:], d0[2:] * 0.5, atol=1e-3)
    # attention inputs untouched (only the OUTPUT projections are scaled)
    assert np.array_equal(
        np.asarray(p0.layers.wq), np.asarray(p1.layers.wq)
    )
    # eps=0: identity tail — the acceptance~1 ceiling configuration
    p2, _, _ = load_model_and_tokenizer("random:tiny?tail_eps=0", seed=0)
    assert np.all(np.asarray(p2.layers.wo)[1:] == 0)
