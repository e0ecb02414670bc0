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


def test_fuzz_greedy_equivalence_tree_and_quant():
    """Random (weights, prompt, exit, W, k) draws through tree speculation,
    with int8-KV and int4-weight variants mixed in — greedy tree == greedy
    AR must hold for every combination."""
    cfg = tiny_config(num_hidden_layers=4, hidden_size=64, vocab_size=128)
    rng = np.random.default_rng(321)
    mismatches = []
    for trial in range(8):
        params = init_params(jax.random.PRNGKey(2000 + trial), cfg)
        if trial % 3 == 2:  # int4 weights every third trial
            from layerskip_tpu.quant import quantize_llama_params

            params = quantize_llama_params(params, bits=4, group=16)
        eng = Engine(params, cfg)
        prompt = rng.integers(0, cfg.vocab_size, size=rng.integers(2, 24)).tolist()
        e = int(rng.integers(1, cfg.num_hidden_layers))
        w = int(rng.integers(1, 5))
        k = int(rng.integers(2, 5))
        kvq = bool(trial % 2)  # int8 KV on odd trials
        ar = postprocess_output(
            eng.generate(prompt, GenerationConfig(
                max_steps=14, sample=False, kv_quant=kvq,
                generation_strategy="autoregressive")),
            (), 14,
        )
        tr = postprocess_output(
            eng.generate(prompt, GenerationConfig(
                max_steps=14, sample=False, kv_quant=kvq,
                generation_strategy="self_speculative",
                exit_layer=e, num_speculations=w, spec_tree_width=k)),
            (), 14,
        )
        if ar != tr:
            mismatches.append((trial, e, w, k, kvq, prompt, ar, tr))
    assert not mismatches, mismatches[:2]


def test_fuzz_chunked_insert_equivalence():
    """Random prompts/chunk widths: chunked continuous inserts must commit
    exactly the plain-insert streams (greedy), with a second live row
    decoding throughout."""
    cfg = tiny_config(num_hidden_layers=4, hidden_size=64, vocab_size=128)
    params = init_params(jax.random.PRNGKey(31), cfg)
    eng = Engine(params, cfg)
    gen = GenerationConfig(
        max_steps=10, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3,
    )
    rng = np.random.default_rng(77)
    sess = eng.continuous_session(gen, batch=2, prompt_bucket=16,
                                  eos_ids=[127])
    for trial in range(6):
        prompt = rng.integers(0, 126, size=rng.integers(2, 15)).tolist()
        chunk = int(rng.integers(2, 9))
        want = postprocess_output(
            eng.generate(prompt, gen, jax.random.PRNGKey(0), [127]),
            [127], 10,
        )
        row = trial % 2
        sess.begin_chunked_insert([row], [prompt], seeds=[0],
                                  chunk_tokens=chunk)
        got = None
        for _ in range(60):
            for r, toks, _ in sess.step():
                if r == row:
                    got = toks
            if got is not None:
                break
        assert got == want, (trial, chunk, prompt, got, want)


def test_fuzz_greedy_equivalence_draft_quant_adaptive():
    """Random draws through the quantized drafter (int8/int4), alone and
    composed with confidence-adaptive drafting (r5) and int8 KV — greedy
    must equal greedy AR for every combination (the verify re-runs the
    full-precision stack from the pre-draft caches either way)."""
    cfg = tiny_config(num_hidden_layers=4, hidden_size=64, vocab_size=128)
    rng = np.random.default_rng(555)
    mismatches = []
    for trial in range(8):
        params = init_params(jax.random.PRNGKey(3000 + trial), cfg)
        eng = Engine(params, cfg)
        prompt = rng.integers(
            0, cfg.vocab_size, size=rng.integers(2, 24)).tolist()
        e = int(rng.integers(1, cfg.num_hidden_layers))
        w = int(rng.integers(1, 6))
        bits = 8 if trial % 2 else 4
        tau = float(rng.choice([0.0, 0.2, 0.5]))
        kvq = bool(trial % 3 == 1)
        ar = postprocess_output(
            eng.generate(prompt, GenerationConfig(
                max_steps=14, sample=False, kv_quant=kvq,
                generation_strategy="autoregressive")),
            (), 14,
        )
        dq = postprocess_output(
            eng.generate(prompt, GenerationConfig(
                max_steps=14, sample=False, kv_quant=kvq,
                generation_strategy="self_speculative",
                exit_layer=e, num_speculations=w,
                draft_quant=bits, draft_exit_prob=tau)),
            (), 14,
        )
        if ar != dq:
            mismatches.append((trial, e, w, bits, tau, kvq, ar, dq))
    assert not mismatches, mismatches[:2]


def test_fuzz_greedy_equivalence_new_families():
    """Random draws through the r5 families: Gemma-2 (alternating
    sliding/global attention, softcaps, post-norms) and Qwen3 (per-head
    qk-norm), across linear and tree speculation — greedy must equal
    greedy AR for every draw (exercises the traced per-layer window and
    the family-specific block math under the split layer groups)."""
    gemma2 = tiny_config(
        num_hidden_layers=4, hidden_size=64, vocab_size=128,
        hidden_act="gelu_pytorch_tanh", rms_norm_offset=True,
        scale_embeddings=True, tie_word_embeddings=True,
        attn_logit_softcap=50.0, final_logit_softcap=30.0,
        query_pre_attn_scalar=32.0, sliding_window=6,
        sliding_window_pattern=2, post_norms=True,
    )
    qwen3 = tiny_config(
        num_hidden_layers=4, hidden_size=64, vocab_size=128,
        qk_norm=True, tie_word_embeddings=True,
    )
    gemma3 = tiny_config(
        num_hidden_layers=6, hidden_size=64, vocab_size=128,
        hidden_act="gelu_pytorch_tanh", rms_norm_offset=True,
        scale_embeddings=True, tie_word_embeddings=True, qk_norm=True,
        post_norms=True, query_pre_attn_scalar=32.0, sliding_window=6,
        sliding_window_pattern=6, rope_theta=100000.0,
        rope_local_theta=10000.0,
    )
    qwen3moe = tiny_config(
        num_hidden_layers=4, hidden_size=64, vocab_size=128,
        qk_norm=True, tie_word_embeddings=True, num_local_experts=4,
        num_experts_per_tok=2, norm_topk_prob=False,
    )
    rng = np.random.default_rng(777)
    mismatches = []
    fams = (gemma2, qwen3, gemma3, qwen3moe)
    for trial in range(8):
        cfg = fams[trial % 4]
        params = init_params(jax.random.PRNGKey(4000 + trial), cfg)
        eng = Engine(params, cfg)
        prompt = rng.integers(
            0, cfg.vocab_size, size=rng.integers(2, 20)).tolist()
        e = int(rng.integers(1, cfg.num_hidden_layers))
        w = int(rng.integers(1, 5))
        tree = int(rng.choice([0, 2, 3]))
        ar = postprocess_output(
            eng.generate(prompt, GenerationConfig(
                max_steps=14, sample=False,
                generation_strategy="autoregressive")),
            (), 14,
        )
        sp = postprocess_output(
            eng.generate(prompt, GenerationConfig(
                max_steps=14, sample=False,
                generation_strategy="self_speculative",
                exit_layer=e, num_speculations=w, spec_tree_width=tree)),
            (), 14,
        )
        if ar != sp:
            mismatches.append(
                (trial, ("gemma2", "qwen3", "gemma3", "qwen3moe")[trial % 4],
                 e, w, tree, ar, sp))
    assert not mismatches, mismatches[:2]
