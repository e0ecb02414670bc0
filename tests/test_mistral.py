"""Mistral-family support: sliding-window attention + HF logit parity.

One more model family beyond the reference's Llama-only scope: Mistral's
checkpoint keys match Llama's exactly; the only behavioral difference is the
sliding attention window, which in this framework is a second clause on the
single masking rule (``q_pos - W < k_slot <= q_pos``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from layerskip_tpu.config import GenerationConfig, ModelConfig
from layerskip_tpu.generation.engine import Engine, postprocess_output
from layerskip_tpu.models import llama
from layerskip_tpu.models.params import params_from_torch_state_dict
from layerskip_tpu.ops.kv_cache import init_kv_cache


@pytest.fixture(scope="module")
def mistral_model():
    from transformers import MistralConfig, MistralForCausalLM

    cfg = ModelConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=10000.0, sliding_window=8, tie_word_embeddings=False,
        dtype=jnp.float32,
    )
    hf_cfg = MistralConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        sliding_window=8, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(11)
    model = MistralForCausalLM(hf_cfg).eval()
    return model, cfg


def test_config_reads_sliding_window():
    cfg = ModelConfig.from_hf_dict({
        "model_type": "mistral", "vocab_size": 128, "hidden_size": 32,
        "intermediate_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 2, "sliding_window": 4096,
    })
    assert cfg.sliding_window == 4096


def test_mistral_forward_matches_torch(mistral_model):
    """Sequence longer than the window so the window actually matters."""
    model, cfg = mistral_model
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    rng = np.random.default_rng(0)
    ids_np = rng.integers(0, cfg.vocab_size, size=(1, 20), dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids_np)).logits.float().numpy()
    cache = init_kv_cache(cfg, batch=1, max_len=32)
    res = llama.forward(params, cfg, jnp.asarray(ids_np), cache, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(res.logits), ref, atol=3e-4, rtol=1e-3)


def test_window_changes_logits(mistral_model):
    """Same weights without the window must differ beyond the window."""
    import dataclasses

    model, cfg = mistral_model
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 20)), jnp.int32)
    cache = init_kv_cache(cfg, batch=1, max_len=32)
    win = llama.forward(params, cfg, ids, cache, jnp.int32(0))
    nowin_cfg = dataclasses.replace(cfg, sliding_window=None)
    nowin = llama.forward(params, nowin_cfg, ids, cache, jnp.int32(0))
    # early positions (inside window) identical, late positions differ
    np.testing.assert_allclose(
        np.asarray(win.logits[:, :8]), np.asarray(nowin.logits[:, :8]),
        atol=1e-5,
    )
    assert np.abs(np.asarray(win.logits[:, -1]) -
                  np.asarray(nowin.logits[:, -1])).max() > 1e-3


def test_mistral_greedy_spec_equals_ar(mistral_model):
    model, cfg = mistral_model
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    eng = Engine(params, cfg)
    prompt = [3, 17, 52, 9, 30, 44, 8, 61, 2, 90, 12, 7]
    ar = postprocess_output(
        eng.generate(prompt, GenerationConfig(
            max_steps=16, sample=False, generation_strategy="autoregressive")),
        (), 16,
    )
    spec = postprocess_output(
        eng.generate(prompt, GenerationConfig(
            max_steps=16, sample=False, generation_strategy="self_speculative",
            exit_layer=2, num_speculations=3)),
        (), 16,
    )
    assert ar == spec and len(ar) == 16
