"""Randomized greedy-equivalence sweep.

Many random weight draws and prompts run through the SAME compiled engine
programs (params are traced arguments), so this covers far more numeric
cases than it costs compiles. The invariant is the reference's correctness
bar: greedy self-speculative == greedy autoregressive, token for token.
"""

import numpy as np
import pytest

import jax

from layerskip_tpu.config import GenerationConfig, tiny_config
from layerskip_tpu.generation.engine import Engine, postprocess_output
from layerskip_tpu.models.params import init_params


def test_fuzz_greedy_equivalence():
    cfg = tiny_config(num_hidden_layers=4, hidden_size=64, vocab_size=128)
    rng = np.random.default_rng(123)
    mismatches = []
    engines = {}
    for trial in range(12):
        params = init_params(jax.random.PRNGKey(1000 + trial), cfg)
        eng = Engine(params, cfg)
        # share compiled fns across engines via identical static config
        if engines:
            eng._exec_cache = next(iter(engines.values()))._exec_cache
        engines[trial] = eng
        prompt = rng.integers(0, cfg.vocab_size, size=rng.integers(2, 30)).tolist()
        e = int(rng.integers(1, cfg.num_hidden_layers))
        w = int(rng.integers(1, 7))
        ar = postprocess_output(
            eng.generate(prompt, GenerationConfig(
                max_steps=18, sample=False,
                generation_strategy="autoregressive")),
            (), 18,
        )
        sp = postprocess_output(
            eng.generate(prompt, GenerationConfig(
                max_steps=18, sample=False,
                generation_strategy="self_speculative",
                exit_layer=e, num_speculations=w)),
            (), 18,
        )
        if ar != sp:
            mismatches.append((trial, e, w, prompt, ar, sp))
    assert not mismatches, mismatches[:2]
