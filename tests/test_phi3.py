"""Phi-3-family parity: fused qkv_proj / gate_up_proj checkpoint layout.

Phi-3 is the Llama architecture (RMSNorm, RoPE, GQA, SiLU-gated MLP,
untied head) with FUSED projection storage: ``self_attn.qkv_proj``
holds q|k|v stacked on the output axis and ``mlp.gate_up_proj`` holds
gate|up. The loader splits them into this framework's per-projection
fields; everything downstream (engines, sharding, quant, training) is
the plain Llama path. Oracle: torch ``Phi3ForCausalLM`` logits.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from layerskip_tpu.config import GenerationConfig, ModelConfig, tiny_config
from layerskip_tpu.models import llama
from layerskip_tpu.models.params import params_from_torch_state_dict
from layerskip_tpu.ops.kv_cache import init_kv_cache


def _phi3_cfg(**kw):
    return tiny_config(
        num_hidden_layers=4,
        hidden_size=64,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=128,
        vocab_size=256,
        tie_word_embeddings=False,  # Phi-3 has an untied head
        **kw,
    )


@pytest.fixture(scope="module")
def torch_phi3_and_cfg():
    from transformers import Phi3Config, Phi3ForCausalLM

    cfg = _phi3_cfg()
    hf_cfg = Phi3Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        tie_word_embeddings=False,
        pad_token_id=0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Phi3ForCausalLM(hf_cfg).eval()
    return model, cfg


def test_from_hf_dict_phi3_is_llama_shaped():
    cfg = ModelConfig.from_hf_dict({
        "model_type": "phi3",
        "vocab_size": 256, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 4, "num_attention_heads": 4,
        "num_key_value_heads": 2,
    })
    # Phi-3 needs no family flags — plain Llama block semantics
    assert not cfg.attention_bias and not cfg.qk_norm
    assert not cfg.post_norms and cfg.hidden_act == "silu"


def test_full_forward_matches_torch(torch_phi3_and_cfg):
    model, cfg = torch_phi3_and_cfg
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    assert params.lm_head is not None  # untied
    rng = np.random.default_rng(0)
    ids_np = rng.integers(0, cfg.vocab_size, size=(2, 12), dtype=np.int64)

    with torch.no_grad():
        ref = model(torch.from_numpy(ids_np)).logits.float().numpy()
    cache = init_kv_cache(cfg, batch=2, max_len=32)
    res = jax.jit(llama.forward, static_argnums=(1,))(
        params, cfg, jnp.asarray(ids_np, jnp.int32), cache, jnp.int32(0)
    )
    np.testing.assert_allclose(
        np.asarray(res.logits), ref, rtol=2e-4, atol=2e-4
    )


def test_incremental_decode_matches_torch(torch_phi3_and_cfg):
    model, cfg = torch_phi3_and_cfg
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, cfg.vocab_size, size=(1, 6), dtype=np.int64)

    ids = torch.from_numpy(prompt)
    with torch.no_grad():
        for _ in range(8):
            nxt = model(ids).logits[:, -1].argmax(-1, keepdim=True)
            ids = torch.cat([ids, nxt], dim=-1)
    ref_stream = ids[0, 6:].numpy().tolist()

    fwd = jax.jit(llama.forward, static_argnums=(1,))
    cache = init_kv_cache(cfg, batch=1, max_len=32)
    res = fwd(params, cfg, jnp.asarray(prompt, jnp.int32), cache, jnp.int32(0))
    cache, past = res.cache, prompt.shape[1]
    tok = int(np.asarray(res.logits)[0, -1].argmax())
    stream = [tok]
    for _ in range(7):
        res = fwd(
            params, cfg, jnp.full((1, 1), tok, jnp.int32), cache,
            jnp.int32(past),
        )
        cache, past = res.cache, past + 1
        tok = int(np.asarray(res.logits)[0, -1].argmax())
        stream.append(tok)
    assert stream == ref_stream


def test_phi3_greedy_spec_equals_ar(torch_phi3_and_cfg):
    from layerskip_tpu.generation.engine import Engine, postprocess_output

    model, cfg = torch_phi3_and_cfg
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    eng = Engine(params, cfg)
    prompt = [3, 17, 52, 9]
    common = dict(max_steps=12, sample=False)
    ar = postprocess_output(
        eng.generate(
            prompt,
            GenerationConfig(generation_strategy="autoregressive", **common),
            jax.random.PRNGKey(0),
        ), (), 12,
    )
    sp = postprocess_output(
        eng.generate(
            prompt,
            GenerationConfig(generation_strategy="self_speculative",
                             exit_layer=2, num_speculations=3, **common),
            jax.random.PRNGKey(0),
        ), (), 12,
    )
    assert ar == sp
