"""Qwen2-family support: QKV biases + logit parity vs HF Qwen2ForCausalLM.

Extends the model-family coverage beyond the reference (Llama-only); the
same engines/kernels serve both since Qwen2 differs only by attention input
biases (and config defaults).
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
def qwen_model():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = ModelConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rms_norm_eps=1e-6,
        rope_theta=10000.0, attention_bias=True, tie_word_embeddings=False,
        dtype=jnp.float32,
    )
    hf_cfg = Qwen2Config(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        tie_word_embeddings=False,
    )
    torch.manual_seed(5)
    model = Qwen2ForCausalLM(hf_cfg).eval()
    return model, cfg


def test_config_detects_qwen2_bias():
    cfg = ModelConfig.from_hf_dict({
        "model_type": "qwen2", "vocab_size": 128, "hidden_size": 32,
        "intermediate_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 2,
    })
    assert cfg.attention_bias is True


def test_qwen2_forward_matches_torch(qwen_model):
    model, cfg = qwen_model
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    assert params.layers.bq is not None
    rng = np.random.default_rng(0)
    ids_np = rng.integers(0, cfg.vocab_size, size=(1, 10), dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids_np)).logits.float().numpy()
    cache = init_kv_cache(cfg, batch=1, max_len=16)
    res = llama.forward(params, cfg, jnp.asarray(ids_np), cache, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(res.logits), ref, atol=3e-4, rtol=1e-3)


def test_qwen2_greedy_spec_equals_ar(qwen_model):
    model, cfg = qwen_model
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    eng = Engine(params, cfg)
    prompt = [3, 17, 52, 9]
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
