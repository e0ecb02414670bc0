"""Batched (continuous-batch-style) generation.

Net-new vs the reference, which hard-asserts batch_size == 1 (eval.py:82).
Each row of a ragged batch must produce exactly the tokens the same prompt
produces alone: per-row RoPE positions, attention frontiers, KV writes, EOS
freezing, and speculative acceptance are all row-independent.
"""

import numpy as np
import pytest

import jax

from layerskip_tpu.config import GenerationConfig, tiny_config
from layerskip_tpu.generation.engine import (
    Engine,
    postprocess_batch,
    postprocess_output,
)
from layerskip_tpu.models.params import init_params


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config(num_hidden_layers=4, hidden_size=64, vocab_size=128)
    params = init_params(jax.random.PRNGKey(7), cfg)
    return Engine(params, cfg), cfg


PROMPTS = [
    [3, 17, 52, 9, 30, 77, 11],
    [5, 9],
    [100, 2, 44, 8, 61, 23, 7, 19, 90, 3, 3, 12],
]


def _single_rows(eng, gen_cfg, eos=()):
    return [
        postprocess_output(
            eng.generate(p, gen_cfg, jax.random.PRNGKey(0), eos),
            eos, gen_cfg.max_steps,
        )
        for p in PROMPTS
    ]


def test_batched_ar_matches_single(model):
    eng, cfg = model
    gen_cfg = GenerationConfig(
        max_steps=16, sample=False, generation_strategy="autoregressive"
    )
    singles = _single_rows(eng, gen_cfg)
    out = eng.generate(PROMPTS, gen_cfg, jax.random.PRNGKey(0))
    batched = postprocess_batch(out, (), 16)
    assert batched == singles


def test_batched_spec_matches_single(model):
    eng, cfg = model
    gen_cfg = GenerationConfig(
        max_steps=16, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=4,
    )
    singles = _single_rows(eng, gen_cfg)
    out = eng.generate(PROMPTS, gen_cfg, jax.random.PRNGKey(0))
    batched = postprocess_batch(out, (), 16)
    assert batched == singles


def test_batched_eos_freezing(model):
    """Rows hitting EOS at different times freeze without corrupting others."""
    eng, cfg = model
    base_cfg = GenerationConfig(
        max_steps=16, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3,
    )
    # pick an EOS from row 1's solo stream so that row stops mid-generation
    solo = postprocess_output(
        eng.generate(PROMPTS[1], base_cfg, jax.random.PRNGKey(0)), (), 16
    )
    eos = (solo[4],)
    singles = _single_rows(eng, base_cfg, eos)
    out = eng.generate(PROMPTS, base_cfg, jax.random.PRNGKey(0), eos)
    batched = postprocess_batch(out, eos, 16)
    assert batched == singles
    # sanity: at least one row actually stopped early
    assert any(len(r) < 16 for r in batched)


def test_batched_ar_with_ngram(model):
    eng, cfg = model
    gen_cfg = GenerationConfig(
        max_steps=12, sample=False, generation_strategy="autoregressive",
        no_repeat_ngram_size=2,
    )
    singles = _single_rows(eng, gen_cfg)
    out = eng.generate(PROMPTS, gen_cfg, jax.random.PRNGKey(0))
    assert postprocess_batch(out, (), 12) == singles
