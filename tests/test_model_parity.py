"""Numeric parity of the JAX Llama against torch ``LlamaForCausalLM``.

The reference has no golden-output tests (SURVEY §4); its correctness oracle
is runtime greedy-equivalence. We add a stronger oracle: a tiny random-weight
HF torch model's logits must match our model's logits, both for full prefill
and for incremental KV-cache decode. This pins down RoPE convention, GQA,
RMSNorm, and the cache write/mask logic against the de-facto Llama semantics
the reference inherits from transformers (llama_model_utils.py:155-209).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from layerskip_tpu.config import tiny_config
from layerskip_tpu.models import llama
from layerskip_tpu.models.params import params_from_torch_state_dict
from layerskip_tpu.ops.kv_cache import init_kv_cache


@pytest.fixture(scope="module")
def torch_model_and_cfg():
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = tiny_config(num_hidden_layers=4, hidden_size=64, num_attention_heads=4,
                      num_key_value_heads=2, intermediate_size=128, vocab_size=256)
    hf_cfg = LlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        attention_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()
    return model, cfg


def _torch_logits(model, ids_np):
    with torch.no_grad():
        out = model(torch.from_numpy(ids_np))
    return out.logits.float().numpy()


def test_full_forward_matches_torch(torch_model_and_cfg):
    model, cfg = torch_model_and_cfg
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    rng = np.random.default_rng(0)
    ids_np = rng.integers(0, cfg.vocab_size, size=(2, 12), dtype=np.int64)

    ref = _torch_logits(model, ids_np)

    cache = init_kv_cache(cfg, batch=2, max_len=32)
    res = llama.forward(
        params, cfg, jnp.asarray(ids_np), cache, jnp.int32(0)
    )
    got = np.asarray(res.logits)
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-3)


def test_incremental_decode_matches_full(torch_model_and_cfg):
    """Prefill 8 tokens then 4 single-token KV-cache steps == one 12-token pass."""
    model, cfg = torch_model_and_cfg
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    rng = np.random.default_rng(1)
    ids_np = rng.integers(0, cfg.vocab_size, size=(1, 12), dtype=np.int64)
    ids = jnp.asarray(ids_np)

    cache = init_kv_cache(cfg, batch=1, max_len=32)
    full = llama.forward(params, cfg, ids, cache, jnp.int32(0))

    cache = init_kv_cache(cfg, batch=1, max_len=32)
    res = llama.forward(params, cfg, ids[:, :8], cache, jnp.int32(0))
    step_logits = [np.asarray(res.logits[:, -1])]
    cache = res.cache
    for t in range(8, 12):
        res = llama.forward(params, cfg, ids[:, t : t + 1], cache, jnp.int32(t))
        cache = res.cache
        step_logits.append(np.asarray(res.logits[:, -1]))

    for i, sl in enumerate(step_logits):
        np.testing.assert_allclose(
            sl, np.asarray(full.logits[:, 7 + i]), atol=2e-4, rtol=1e-3
        )


def test_early_exit_matches_truncated_model(torch_model_and_cfg):
    """forward_early == running only the first E layers + shared norm/head.

    Mirrors what the reference's forward_early computes
    (llama_model_utils.py:213-276): truncate the torch model to E layers and
    compare logits.
    """
    model, cfg = torch_model_and_cfg
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    rng = np.random.default_rng(2)
    ids_np = rng.integers(0, cfg.vocab_size, size=(1, 10), dtype=np.int64)
    exit_layer = 2

    import copy

    trunc = copy.deepcopy(model)
    trunc.model.layers = trunc.model.layers[:exit_layer]
    ref = _torch_logits(trunc, ids_np)

    cache = init_kv_cache(cfg, batch=1, max_len=32).slice_layers(0, exit_layer)
    res = llama.forward_early(
        params, cfg, jnp.asarray(ids_np), cache, jnp.int32(0), exit_layer
    )
    np.testing.assert_allclose(np.asarray(res.logits), ref, atol=3e-4, rtol=1e-3)


def test_llama3_rope_scaling_matches_hf():
    """rope_inv_freq's llama3 branch vs transformers' _compute_llama3_parameters."""
    from layerskip_tpu.config import RopeScaling, tiny_config
    from layerskip_tpu.ops.rope import rope_inv_freq

    cfg = tiny_config(
        hidden_size=128, num_attention_heads=2,  # head_dim 64
        rope_scaling=RopeScaling(
            rope_type="llama3", factor=8.0, low_freq_factor=1.0,
            high_freq_factor=4.0, original_max_position_embeddings=8192,
        ),
        rope_theta=500000.0,
    )
    ours = np.asarray(rope_inv_freq(cfg))

    from transformers import LlamaConfig
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    hf_cfg = LlamaConfig(
        hidden_size=cfg.hidden_size,
        num_attention_heads=cfg.num_attention_heads,
        head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta,
        rope_scaling={
            "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 8192,
        },
        max_position_embeddings=cfg.max_position_embeddings,
    )
    hf_inv, _ = ROPE_INIT_FUNCTIONS["llama3"](hf_cfg, device="cpu")
    np.testing.assert_allclose(ours, hf_inv.numpy(), rtol=1e-6)
