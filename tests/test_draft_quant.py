"""Quantized-drafter tests (GenerationConfig.draft_quant).

Net-new capability, no reference counterpart (the reference drafts and
verifies in one fp16 model, self_speculation_generator.py:102-229): the
draft window runs through an int8/int4 copy of layers [0, exit_layer)
(quant.quantize_draft_params) while the verify re-runs the FULL bf16
stack via forward_split — so committed tokens are judged by the exact
base model. These pin the load-bearing invariants:

  * greedy draft-quant spec == greedy AR, bit-exact, in all three engine
    modes (whole-generation, streaming, continuous batching);
  * the drafter shares embeddings/norms/head with the base (no extra HBM
    beyond the quantized layer stack);
  * param swaps invalidate the cached drafter (bench tail_eps sweeps);
  * already-quantized bases and non-linear draft paths resolve to no-op;
  * serving keys split on draft_quant (the _cfg_key bug class from
    ADVICE r1 / VERDICT r2 #2).
"""

import numpy as np
import pytest

import jax

from layerskip_tpu.config import GenerationConfig, tiny_config
from layerskip_tpu.generation.engine import Engine, postprocess_output
from layerskip_tpu.models.params import init_params
from layerskip_tpu.ops.linear import QuantTensor
from layerskip_tpu.quant import (_MLP_FIELDS, quantize_draft_params,
                                 quantize_llama_params)


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config(num_hidden_layers=4, hidden_size=64, vocab_size=128)
    params = init_params(jax.random.PRNGKey(11), cfg)
    return params, cfg


def _gc(dq=0, **kw):
    base = dict(max_steps=16, sample=False,
                generation_strategy="self_speculative", exit_layer=2,
                num_speculations=3, draft_quant=dq)
    base.update(kw)
    return GenerationConfig(**base)


def _ar(engine, prompt, steps=16):
    return postprocess_output(
        engine.generate(prompt, GenerationConfig(
            max_steps=steps, sample=False,
            generation_strategy="autoregressive")), (), steps)


def test_quantize_draft_params_structure(model):
    params, cfg = model
    dp = quantize_draft_params(params, exit_layer=2, bits=8)
    # only the draft layer group, quantized
    assert isinstance(dp.layers.wq, QuantTensor)
    assert dp.layers.wq.q.shape[0] == 2
    assert dp.layers.attn_norm.shape[0] == 2
    # embeddings / norms are SHARED device arrays, not copies; the head is
    # quantized (proposal-only — verify applies the base bf16 head)
    assert dp.embed is params.embed
    assert dp.final_norm is params.final_norm
    if params.lm_head is None:
        assert dp.lm_head is None
    else:
        assert isinstance(dp.lm_head, QuantTensor)


@pytest.mark.parametrize("dq", [8, 4])
def test_greedy_draft_quant_matches_ar(model, dq):
    params, cfg = model
    eng = Engine(params, cfg)
    prompt = [3, 5, 7, 9]
    ar = _ar(eng, prompt)
    sp = postprocess_output(eng.generate(prompt, _gc(dq)), (), 16)
    assert sp == ar


def test_sampled_draft_quant_runs_and_tracks_stats(model):
    params, cfg = model
    eng = Engine(params, cfg)
    out = eng.generate([3, 5, 7, 9], _gc(8, sample=True))
    assert int(out.drafts) > 0
    assert 0 <= int(out.matches) <= int(out.drafts)


def test_streaming_draft_quant_matches_ar(model):
    params, cfg = model
    eng = Engine(params, cfg)
    prompt = [3, 5, 7, 9]
    ar = _ar(eng, prompt)
    rounds = []
    out = eng.stream_generate(
        [prompt], _gc(8), on_round=lambda d, a: rounds.append((d, a)))
    sp = postprocess_output(out, (), 16)
    assert sp == ar
    assert len(rounds) >= 2  # prefill callback + at least one round


def test_continuous_draft_quant_matches_ar(model):
    params, cfg = model
    eng = Engine(params, cfg)
    prompt = [3, 5, 7, 9]
    ar = _ar(eng, prompt, steps=12)
    ses = eng.continuous_session(_gc(8, max_steps=12), batch=2,
                                 prompt_bucket=8)
    ses.insert([0], [prompt])
    toks = {}
    for _ in range(40):
        for r, t, _acc in ses.step(max_rounds=2):
            toks[r] = t
        if 0 in toks:
            break
    assert toks[0] == ar[: len(toks[0])] and len(toks[0]) == 12


def test_draft_cache_reuse_and_invalidation(model):
    params, cfg = model
    eng = Engine(params, cfg)
    eng.generate([3, 5], _gc(8))
    first = eng._draft_cache[(2, 8, False, False)]
    eng.generate([3, 5, 7], _gc(8))
    assert eng._draft_cache[(2, 8, False, False)] is first  # reused across calls
    # swapping params (bench tail_eps sweep) must drop the stale drafter
    eng.params = init_params(jax.random.PRNGKey(12), cfg)
    assert eng._draft_cache == {}


def test_draft_quant_noop_on_quantized_base(model):
    params, cfg = model
    qparams = quantize_llama_params(params)
    eng = Engine(qparams, cfg)
    out = eng.generate([3, 5, 7, 9], _gc(8))
    # resolved to 0: no drafter built, generation still runs
    assert eng._draft_cache == {}
    assert int(out.num_tokens[0]) > 0


def test_draft_quant_ignored_for_other_strategies(model):
    params, cfg = model
    eng = Engine(params, cfg)
    out = eng.generate(
        [3, 5, 7, 9],
        _gc(8, generation_strategy="prompt_lookup", pld_ngram=2))
    assert eng._draft_cache == {}
    assert int(out.num_tokens[0]) > 0


def test_serving_cfg_key_splits_on_draft_quant():
    from layerskip_tpu.serving import _cfg_key

    a = _gc(0)
    b = _gc(8)
    assert _cfg_key(a) != _cfg_key(b)
    # the head knob is output-affecting too (different draft distribution
    # under sampling): must not batch together (VERDICT r2 #2 bug class)
    c = _gc(8, draft_quant_head=True)
    assert _cfg_key(b) != _cfg_key(c)


def test_draft_head_shared_when_not_quantized(model):
    """draft_quant_head=False (the default): the drafter's exit head IS
    the base bf16 array — zero extra HBM — and only the layer stack is
    quantized. quant.quantize_draft_params(quantize_head=False)."""
    params, cfg = model
    dp = quantize_draft_params(params, exit_layer=2, bits=8,
                               quantize_head=False)
    assert isinstance(dp.layers.wq, QuantTensor)
    if params.lm_head is not None:
        assert dp.lm_head is params.lm_head
        assert not isinstance(dp.lm_head, QuantTensor)


@pytest.mark.parametrize("head", [False, True])
def test_greedy_draft_quant_head_matches_ar(model, head):
    """Greedy output is bit-identical to bf16 AR for BOTH head modes (the
    verify pass applies the base bf16 head either way)."""
    params, cfg = model
    eng = Engine(params, cfg)
    prompt = [3, 5, 7, 9]
    ar = _ar(eng, prompt)
    sp = postprocess_output(
        eng.generate(prompt, _gc(8, draft_quant_head=head)), (), 16)
    assert sp == ar
    assert (2, 8, head, False) in eng._draft_cache


def test_draft_cache_splits_on_head(model):
    params, cfg = model
    eng = Engine(params, cfg)
    eng.generate([3, 5], _gc(8, draft_quant_head=False))
    eng.generate([3, 5], _gc(8, draft_quant_head=True))
    assert (2, 8, False, False) in eng._draft_cache
    assert (2, 8, True, False) in eng._draft_cache
    assert (eng._draft_cache[(2, 8, False, False)].lm_head
            is not eng._draft_cache[(2, 8, True, False)].lm_head)


def test_draft_quant_mlp_only(model):
    """draft_quant_mlp_only: attention weights stay bf16 (exact in-window
    draft KV), only the MLP triple is quantized; greedy == bf16 AR."""
    params, cfg = model
    dp = quantize_draft_params(params, exit_layer=2, bits=8,
                               quantize_head=False, fields=_MLP_FIELDS)
    assert not isinstance(dp.layers.wq, QuantTensor)
    assert isinstance(dp.layers.w_gate, QuantTensor)
    eng = Engine(params, cfg)
    prompt = [3, 5, 7, 9]
    ar = _ar(eng, prompt)
    sp = postprocess_output(
        eng.generate(prompt, _gc(8, draft_quant_mlp_only=True)), (), 16)
    assert sp == ar
    assert (2, 8, False, True) in eng._draft_cache
    dcp = eng._draft_cache[(2, 8, False, True)]
    assert not isinstance(dcp.layers.wq, QuantTensor)

    from layerskip_tpu.serving import _cfg_key
    assert _cfg_key(_gc(8)) != _cfg_key(_gc(8, draft_quant_mlp_only=True))


def test_int4_per_layer_quantize_matches_whole_stack(model):
    """The r5 OOM fix (per-layer fori_loop int4 quantization,
    quant._quantize_layer_slice) must be bit-identical to quantizing the
    whole [E, ...] stack at once — same q bytes, scales, and static
    metadata for every field. (The whole-stack form planned 16.05 GiB at
    7B E=8 and OOM'd the v5e; the per-layer form plans 13.44.)"""
    from layerskip_tpu.quant import _K_LAST_FIELDS, _QUANT_FIELDS, \
        quantize_tensor

    params, cfg = model
    E = 2
    dq = quantize_draft_params(params, E, bits=4, quantize_head=False)
    sl = params.layers.slice(0, E)
    for f in _QUANT_FIELDS:
        w = getattr(sl, f)
        if w is None:
            continue
        ref = quantize_tensor(w, k_last=f in _K_LAST_FIELDS, bits=4)
        got = getattr(dq.layers, f)
        assert np.array_equal(np.asarray(ref.q), np.asarray(got.q)), f
        assert np.allclose(np.asarray(ref.scale), np.asarray(got.scale)), f
        assert ref.group == got.group and ref.k_last == got.k_last, f


def test_draft_quant_composes_with_adaptive(model):
    """Adaptive drafting (draft_exit_prob) + quantized drafter (r5): the
    confidence gate saves int8 draft passes; the verify re-runs the full
    base stack from the pre-draft caches, so greedy == bf16 AR exactly."""
    params, cfg = model
    eng = Engine(params, cfg)
    prompt = [3, 5, 7, 9]
    ar = _ar(eng, prompt)
    for bits in (8, 4):
        sp = postprocess_output(
            eng.generate(
                prompt, _gc(bits, draft_exit_prob=0.3)), (), 16)
        assert sp == ar, (bits, sp, ar)
