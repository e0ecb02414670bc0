"""Exact-match validation against the reference implementation itself.

BASELINE.md's correctness bar is "greedy decoding outputs vs reference:
exact match". When the reference checkout is present (read-only at
/root/reference), we run its actual torch implementation
(self_speculation/*.py) on a tiny random HF Llama and require our engine to
produce the *identical greedy token stream* — for plain AR, early-exit AR,
and self-speculative decoding across (exit_layer, num_speculations) combos.

The strategies are driven directly with token lists (bypassing the
tokenizer-bound facade), so no network or tokenizer assets are needed.
"""

import os
import sys

import numpy as np
import pytest

import jax

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "self_speculation")),
    reason="reference checkout not available",
)


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, REFERENCE)
    try:
        from self_speculation.autoregressive_generator import (
            AutoRegressiveGenerationStrategy,
        )
        from self_speculation.generator_base import GenerationConfig
        from self_speculation.self_speculation_generator import (
            SelfSpeculativeGenerationStrategy,
        )
    finally:
        sys.path.remove(REFERENCE)
    return GenerationConfig, AutoRegressiveGenerationStrategy, SelfSpeculativeGenerationStrategy


def _shim_layers(hf_model):
    """Adapt modern transformers decoder layers to the 4.50-era call protocol
    the reference uses (layer(...) -> (hidden, cache); rotary computed inside
    the layer). Wraps each layer to inject position_embeddings and restore
    the tuple return."""
    import torch

    class _LayerShim(torch.nn.Module):
        def __init__(self, layer, rotary):
            super().__init__()
            self.inner = layer
            self.rotary = rotary

        def forward(
            self,
            hidden_states,
            attention_mask=None,
            position_ids=None,
            past_key_value=None,
            output_attentions=False,
            use_cache=True,
            padding_mask=None,
        ):
            pe = self.rotary(hidden_states, position_ids)
            out = self.inner(
                hidden_states,
                attention_mask=attention_mask,
                position_ids=position_ids,
                past_key_values=past_key_value,
                use_cache=use_cache,
                position_embeddings=pe,
            )
            if isinstance(out, tuple):
                out = out[0]
            return out, past_key_value

    rotary = hf_model.model.rotary_emb
    hf_model.model.layers = torch.nn.ModuleList(
        [_LayerShim(layer, rotary) for layer in hf_model.model.layers]
    )
    return hf_model


@pytest.fixture(scope="module")
def models():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from layerskip_tpu.config import tiny_config
    from layerskip_tpu.models.params import params_from_torch_state_dict

    cfg = tiny_config(
        num_hidden_layers=4, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
    )
    hf_cfg = LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        attention_bias=False, tie_word_embeddings=False,
    )
    torch.manual_seed(1234)
    hf_model = LlamaForCausalLM(hf_cfg).eval()
    params = params_from_torch_state_dict(hf_model.state_dict(), cfg)
    hf_model = _shim_layers(hf_model)
    return hf_model, params, cfg


PROMPT = [7, 31, 50, 101, 4, 88, 9]
EOS = 255  # not produced by the tiny random model within 24 steps (checked)


def _ours(params, cfg, strategy, max_steps=20, exit_layer=-1, nspec=-1):
    from layerskip_tpu.config import GenerationConfig
    from layerskip_tpu.generation.engine import Engine, postprocess_output

    eng = _ours.engines.setdefault(id(params), Engine(params, cfg))
    out = eng.generate(
        PROMPT,
        GenerationConfig(
            max_steps=max_steps, sample=False, generation_strategy=strategy,
            exit_layer=exit_layer, num_speculations=nspec,
        ),
        jax.random.PRNGKey(0),
        eos_ids=[EOS],
    )
    return postprocess_output(out, [EOS], max_steps)


_ours.engines = {}


def test_ar_exact_match(ref_modules, models):
    RefCfg, RefAR, _ = ref_modules
    hf_model, params, cfg = models
    ref = RefAR().generate_token_ids(
        model=hf_model, input_ids=list(PROMPT), eos_token_ids=[EOS],
        generation_config=RefCfg(
            max_steps=20, exit_layer=-1, num_speculations=-1, sample=False,
        ),
    )
    ours = _ours(params, cfg, "autoregressive", max_steps=20)
    assert ours == list(ref.predicted_tokens)


def test_early_exit_ar_exact_match(ref_modules, models):
    RefCfg, RefAR, _ = ref_modules
    hf_model, params, cfg = models
    ref = RefAR().generate_token_ids(
        model=hf_model, input_ids=list(PROMPT), eos_token_ids=[EOS],
        generation_config=RefCfg(
            max_steps=20, exit_layer=2, num_speculations=-1, sample=False,
        ),
    )
    ours = _ours(params, cfg, "autoregressive", max_steps=20, exit_layer=2)
    assert ours == list(ref.predicted_tokens)


@pytest.mark.parametrize(
    "exit_layer,nspec",
    [(1, 3), (2, 4), (3, 2), (2, 1), (1, 1), (1, 6), (3, 5), (2, 8)],
)
def test_self_speculative_exact_match(ref_modules, models, exit_layer, nspec):
    RefCfg, _, RefSpec = ref_modules
    hf_model, params, cfg = models
    ref = RefSpec().generate_token_ids(
        model=hf_model, input_ids=list(PROMPT), eos_token_ids=[EOS],
        generation_config=RefCfg(
            max_steps=20, exit_layer=exit_layer, num_speculations=nspec,
            sample=False,
        ),
    )
    ours = _ours(
        params, cfg, "self_speculative", max_steps=20,
        exit_layer=exit_layer, nspec=nspec,
    )
    assert ours == list(ref.predicted_tokens), (exit_layer, nspec)
