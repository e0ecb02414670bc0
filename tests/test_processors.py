"""no_repeat_ngram + stop_words behavior.

The reference wires HF NoRepeatNGramLogitsProcessor / StopStringCriteria
(generator_base.py:77-95) but feeds processors only the last-fed token, so
the n-gram ban can never see enough history to fire; our on-device processor
works over the true history (documented deviation — processors.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layerskip_tpu.config import GenerationConfig, tiny_config
from layerskip_tpu.generation.engine import Engine, postprocess_output
from layerskip_tpu.generation.processors import no_repeat_ngram_banned
from layerskip_tpu.models.params import init_params


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config(num_hidden_layers=4, hidden_size=64, vocab_size=128)
    params = init_params(jax.random.PRNGKey(7), cfg)
    return Engine(params, cfg), cfg


def _ngrams(seq, n):
    return [tuple(seq[i : i + n]) for i in range(len(seq) - n + 1)]


def test_banned_mask_semantics():
    # history: 5 6 5 6 -> with n=2, context [6], "6 5" seen => ban 5... wait:
    # windows: (5,6)@0, (6,5)@1, (5,6)@2; context = last token 6 => banned = {5}
    hist = jnp.asarray([[5, 6, 5, 6, 0, 0]], jnp.int32)
    banned = no_repeat_ngram_banned(hist, jnp.int32(4), 2, 10)
    assert np.asarray(banned)[0].nonzero()[0].tolist() == [5]
    # n=3: context [5, 6]; window (5,6,5)@0 => ban 5
    banned3 = no_repeat_ngram_banned(hist, jnp.int32(4), 3, 10)
    assert np.asarray(banned3)[0].nonzero()[0].tolist() == [5]
    # insufficient history: nothing banned
    banned_empty = no_repeat_ngram_banned(hist, jnp.int32(1), 3, 10)
    assert not np.asarray(banned_empty).any()


def test_ar_no_repeat_ngram(model):
    eng, cfg = model
    prompt = [3, 17, 52, 9]
    plain = postprocess_output(
        eng.generate(prompt, GenerationConfig(
            max_steps=20, sample=False, generation_strategy="autoregressive")),
        (), 20,
    )
    # degenerate tiny model repeats itself; with the ban it cannot
    assert len(set(_ngrams(plain, 2))) < len(_ngrams(plain, 2))
    banned = postprocess_output(
        eng.generate(prompt, GenerationConfig(
            max_steps=20, sample=False, generation_strategy="autoregressive",
            no_repeat_ngram_size=2)),
        (), 20,
    )
    grams = _ngrams(prompt + banned, 2)
    assert len(set(grams)) == len(grams), banned


def test_spec_equals_ar_with_ngram(model):
    eng, cfg = model
    prompt = [3, 17, 52, 9, 30]
    ar = postprocess_output(
        eng.generate(prompt, GenerationConfig(
            max_steps=16, sample=False, generation_strategy="autoregressive",
            no_repeat_ngram_size=3)),
        (), 16,
    )
    spec = postprocess_output(
        eng.generate(prompt, GenerationConfig(
            max_steps=16, sample=False, generation_strategy="self_speculative",
            exit_layer=2, num_speculations=4, no_repeat_ngram_size=3)),
        (), 16,
    )
    assert spec == ar


def test_stop_words_truncation(model):
    eng, cfg = model

    class Tok:
        eos_token_id = None

        def encode(self, s):
            return [3, 17, 52]

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(int(t)) for t in ids)

    from layerskip_tpu.generation.generator import LlamaGenerator

    gen = LlamaGenerator(Tok(), eng.params, cfg, eos_ids=[127])
    res = gen.generate("x", GenerationConfig(
        max_steps=12, sample=False, generation_strategy="autoregressive"))
    full_tokens = res.generation_strategy_result.predicted_tokens
    assert len(full_tokens) == 12
    stop_word = str(full_tokens[3])
    res2 = gen.generate("x", GenerationConfig(
        max_steps=12, sample=False, generation_strategy="autoregressive",
        stop_words=[stop_word]))
    toks2 = res2.generation_strategy_result.predicted_tokens
    # shortest prefix whose decoding contains the stop word
    assert stop_word in " ".join(str(t) for t in toks2)
    assert len(toks2) <= full_tokens.index(int(stop_word)) + 1


def test_stop_words_truncation_logarithmic(model):
    """VERDICT r2 #8: the stop-word trim bisects — O(log n) tokenizer.decode
    calls instead of one per prefix length."""
    eng, cfg = model
    calls = {"n": 0}

    class Tok:
        eos_token_id = None

        def encode(self, s):
            return [1]

        def decode(self, ids, skip_special_tokens=True):
            calls["n"] += 1
            return " ".join(str(int(t)) for t in ids)

    from layerskip_tpu.generation.generator import LlamaGenerator

    gen = LlamaGenerator(Tok(), eng.params, cfg, eos_ids=[127])
    tokens = list(range(1, 257))
    out = gen._truncate_at_stop_words(tokens, ["17"])
    # shortest prefix whose decoding contains "17" is tokens[:17]
    assert out == tokens[:17]
    # 1 full-string check + ceil(log2(256)) bisection probes
    assert calls["n"] <= 1 + 8, calls["n"]
    # no stop-word hit: exactly one decode, tokens unchanged
    calls["n"] = 0
    assert gen._truncate_at_stop_words([1, 2, 3], ["zzz"]) == [1, 2, 3]
    assert calls["n"] == 1
