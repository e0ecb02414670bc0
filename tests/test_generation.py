"""Generation-engine invariants.

The reference's core correctness oracle is *greedy self-speculative output ==
greedy autoregressive output* (correctness.py:82-92, README.md:145-156); we
make that a unit test on a tiny random-weights model (SURVEY §4 recommends
exactly this upgrade). Plus: early-exit AR, EOS stopping, acceptance-rate
bounds, and sampling-mode smoke tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layerskip_tpu.config import GenerationConfig, tiny_config
from layerskip_tpu.generation.engine import Engine, postprocess_output
from layerskip_tpu.generation.sampling import SamplingConfig, top_k_top_p_filter
from layerskip_tpu.models.params import init_params


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_config(num_hidden_layers=4, hidden_size=64, vocab_size=128)
    params = init_params(jax.random.PRNGKey(7), cfg)
    return params, cfg


def _greedy_cfg(strategy, max_steps=24, exit_layer=-1, num_spec=-1):
    return GenerationConfig(
        max_steps=max_steps,
        exit_layer=exit_layer,
        num_speculations=num_spec,
        generation_strategy=strategy,
        sample=False,
    )


_ENGINES = {}


def _run(params, cfg, gen_cfg, prompt, eos=()):
    eng = _ENGINES.setdefault(id(params), Engine(params, cfg))
    out = eng.generate(prompt, gen_cfg, jax.random.PRNGKey(0), eos_ids=eos)
    return postprocess_output(out, eos, gen_cfg.max_steps), out


def test_greedy_spec_equals_greedy_ar(tiny_model):
    """The reference's correctness bar (correctness.py:82-92)."""
    params, cfg = tiny_model
    prompt = [3, 17, 52, 9, 30, 77, 11]
    ar, _ = _run(params, cfg, _greedy_cfg("autoregressive"), prompt)
    for exit_layer, nspec in [(1, 3), (2, 4), (3, 6), (2, 1)]:
        spec, _ = _run(
            params, cfg,
            _greedy_cfg("self_speculative", exit_layer=exit_layer, num_spec=nspec),
            prompt,
        )
        assert spec == ar, (exit_layer, nspec, spec, ar)


def test_greedy_spec_equals_ar_across_prompts(tiny_model):
    params, cfg = tiny_model
    rng = np.random.default_rng(0)
    for _ in range(3):
        prompt = rng.integers(0, cfg.vocab_size, size=rng.integers(3, 40)).tolist()
        ar, _ = _run(params, cfg, _greedy_cfg("autoregressive"), prompt)
        spec, _ = _run(
            params, cfg, _greedy_cfg("self_speculative", exit_layer=2, num_spec=4),
            prompt,
        )
        assert spec == ar


def test_early_exit_ar_runs(tiny_model):
    """exit_layer>0 AR = pure early-exit inference (autoregressive_generator.py:44-51).

    (A tiny random model's stream may coincide with the full model's — both
    collapse to a fixed point — so we assert shape/validity, not difference;
    numerical equivalence of the early path is pinned by test_model_parity.)
    """
    params, cfg = tiny_model
    prompt = [5, 9, 23]
    early, _ = _run(params, cfg, _greedy_cfg("autoregressive", exit_layer=2), prompt)
    assert len(early) == 24  # no EOS in tiny random model
    assert all(0 <= t < cfg.vocab_size for t in early)


def test_eos_truncation(tiny_model):
    """EOS is excluded from output (self_speculation_generator.py:82-91)."""
    params, cfg = tiny_model
    prompt = [3, 17, 52, 9]
    ar, _ = _run(params, cfg, _greedy_cfg("autoregressive"), prompt)
    # use a generated token as a fake EOS: output must stop before its FIRST
    # occurrence (reference breaks at first EOS, excluding it)
    eos = (ar[2],)
    expected = ar[: ar.index(ar[2])]
    ar_stopped, _ = _run(params, cfg, _greedy_cfg("autoregressive"), prompt, eos=eos)
    assert ar_stopped == expected
    spec_stopped, _ = _run(
        params, cfg, _greedy_cfg("self_speculative", exit_layer=2, num_spec=4),
        prompt, eos=eos,
    )
    assert spec_stopped == expected


def test_acceptance_rate_bounds(tiny_model):
    params, cfg = tiny_model
    prompt = [3, 17, 52, 9, 30]
    _, out = _run(
        params, cfg, _greedy_cfg("self_speculative", exit_layer=3, num_spec=4), prompt
    )
    matches, drafts = int(out.matches), int(out.drafts)
    assert drafts >= 1
    assert 0 <= matches <= drafts


def test_max_steps_respected(tiny_model):
    params, cfg = tiny_model
    prompt = [3, 17]
    for strat, kw in [
        ("autoregressive", {}),
        ("self_speculative", dict(exit_layer=2, num_spec=5)),
    ]:
        toks, _ = _run(params, cfg, _greedy_cfg(strat, max_steps=7, **kw), prompt)
        assert len(toks) == 7


def test_sampling_mode_runs(tiny_model):
    params, cfg = tiny_model
    prompt = [3, 17, 52]
    gen_cfg = GenerationConfig(
        max_steps=12, exit_layer=2, num_speculations=3,
        generation_strategy="self_speculative",
        sample=True, temperature=0.8, top_k=20, top_p=0.9,
    )
    toks, out = _run(params, cfg, gen_cfg, prompt)
    assert 1 <= len(toks) <= 12
    assert all(0 <= t < cfg.vocab_size for t in toks)
    # different seeds should (almost surely) differ somewhere
    eng = Engine(params, cfg)
    out2 = eng.generate(prompt, gen_cfg, jax.random.PRNGKey(123))
    t2 = postprocess_output(out2, (), gen_cfg.max_steps)
    assert isinstance(t2, list)


def test_top_k_top_p_filter():
    """Filter semantics vs the reference's HF warpers (llama_model_utils.py:75-107)."""
    logits = jnp.asarray([[1.0, 2.0, 3.0, 4.0, 0.0]], jnp.float32)
    out = np.asarray(top_k_top_p_filter(logits, top_k=2, top_p=0.0))
    kept = out[0] > -1e29
    assert kept.tolist() == [False, False, True, True, False]
    # top_p=1.0 keeps everything
    out = np.asarray(top_k_top_p_filter(logits, top_k=0, top_p=1.0))
    assert (out[0] > -1e29).all()
    # tiny top_p keeps only the max (min_tokens_to_keep=1)
    out = np.asarray(top_k_top_p_filter(logits, top_k=0, top_p=1e-6))
    assert (out[0] > -1e29).tolist() == [False, False, False, True, False]


def test_strategy_classes_api(tiny_model):
    """Reference-style class API (generator_base.py:51-62) delegates to the
    engines and produces the same tokens as the direct path."""
    from layerskip_tpu.generation.strategies import (
        AutoRegressiveGenerationStrategy,
        SelfSpeculativeGenerationStrategy,
    )

    params, cfg = tiny_model
    eng = _ENGINES.setdefault(id(params), Engine(params, cfg))
    prompt = [3, 17, 52, 9, 30, 77, 11]
    direct, _ = _run(params, cfg, _greedy_cfg("autoregressive"), prompt)

    ar = AutoRegressiveGenerationStrategy().generate_token_ids(
        eng, prompt, (), _greedy_cfg("autoregressive")
    )
    assert ar.predicted_tokens == direct
    assert ar.acceptance_rate is None

    sp = SelfSpeculativeGenerationStrategy().generate_token_ids(
        eng, prompt, (), _greedy_cfg("self_speculative", exit_layer=2, num_spec=4)
    )
    assert sp.predicted_tokens == direct
    assert 0.0 <= sp.acceptance_rate <= 1.0
