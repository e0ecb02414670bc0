"""Engine edge cases: boundary lengths, config combinations, truncation."""

import numpy as np
import pytest

import jax

from layerskip_tpu.config import GenerationConfig, tiny_config
from layerskip_tpu.generation.engine import Engine, postprocess_output
from layerskip_tpu.models.params import init_params


@pytest.fixture(scope="module")
def eng():
    cfg = tiny_config(num_hidden_layers=4, hidden_size=64, vocab_size=128)
    return Engine(init_params(jax.random.PRNGKey(7), cfg), cfg), cfg


def _go(eng, gen_cfg, prompt, eos=()):
    out = eng.generate(prompt, gen_cfg, jax.random.PRNGKey(0), eos_ids=eos)
    return postprocess_output(out, eos, gen_cfg.max_steps)


def test_single_token_prompt(eng):
    eng, cfg = eng
    for strat, kw in [("autoregressive", {}),
                      ("self_speculative", dict(exit_layer=2, num_speculations=3))]:
        toks = _go(eng, GenerationConfig(
            max_steps=6, sample=False, generation_strategy=strat, **kw), [42])
        assert len(toks) == 6


def test_max_steps_one(eng):
    eng, cfg = eng
    ar = _go(eng, GenerationConfig(
        max_steps=1, sample=False, generation_strategy="autoregressive"), [3, 5])
    sp = _go(eng, GenerationConfig(
        max_steps=1, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3), [3, 5])
    assert len(ar) == 1 and ar == sp


def test_spec_window_larger_than_max_steps(eng):
    eng, cfg = eng
    ar = _go(eng, GenerationConfig(
        max_steps=3, sample=False, generation_strategy="autoregressive"), [3, 5, 9])
    sp = _go(eng, GenerationConfig(
        max_steps=3, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=8), [3, 5, 9])
    assert sp == ar and len(sp) == 3


def test_prompt_truncation_with_fixed_bucket(eng):
    eng, cfg = eng
    long_prompt = list(np.random.default_rng(0).integers(0, 128, size=100))
    gen_cfg = GenerationConfig(
        max_steps=4, sample=False, generation_strategy="autoregressive",
        max_prompt_len=32,
    )
    toks = _go(eng, gen_cfg, long_prompt)
    # must match generating from the LAST 32 tokens explicitly
    want = _go(eng, GenerationConfig(
        max_steps=4, sample=False, generation_strategy="autoregressive"),
        long_prompt[-32:])
    assert toks == want


def test_kv_quant_plus_ngram_combo(eng):
    eng, cfg = eng
    gen = dict(max_steps=10, sample=False, no_repeat_ngram_size=2, kv_quant=True)
    ar = _go(eng, GenerationConfig(generation_strategy="autoregressive", **gen),
             [3, 17, 52])
    sp = _go(eng, GenerationConfig(
        generation_strategy="self_speculative", exit_layer=2,
        num_speculations=3, **gen), [3, 17, 52])
    assert ar == sp
    grams = [tuple(([3, 17, 52] + ar)[i:i + 2]) for i in range(len(ar) + 1)]
    assert len(set(grams)) == len(grams)


def test_exit_layer_last_minus_one(eng):
    """Deepest legal exit: draft runs all but one layer."""
    eng, cfg = eng
    ar = _go(eng, GenerationConfig(
        max_steps=8, sample=False, generation_strategy="autoregressive"),
        [3, 5, 9])
    sp = _go(eng, GenerationConfig(
        max_steps=8, sample=False, generation_strategy="self_speculative",
        exit_layer=cfg.num_hidden_layers - 1, num_speculations=2), [3, 5, 9])
    assert sp == ar


def test_max_seq_len_caps_generation(eng):
    """max_steps is clamped so prompt + generation stay inside the model's
    (or the config's) position range."""
    eng_, cfg = eng
    gen_cfg = GenerationConfig(
        max_steps=500, sample=False, generation_strategy="autoregressive",
        max_seq_len=80,
    )
    toks = _go(eng_, gen_cfg, [3, 5, 9])  # bucket 64 -> cap at 16 steps
    assert len(toks) == 16
