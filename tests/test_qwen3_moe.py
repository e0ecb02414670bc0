"""Qwen3-MoE family parity: qk-norm x mixture-of-experts composition.

Qwen3-MoE = the Qwen3 attention block (per-head q/k RMSNorm pre-RoPE)
over a Mixtral-style top-k expert MLP, with its own checkpoint naming
(``mlp.gate`` router + ``mlp.experts.N.{gate,up,down}_proj``) and a
``norm_topk_prob`` switch for renormalizing the routing weights (Mixtral
always renormalizes). Oracle: torch ``Qwen3MoeForCausalLM`` logits.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from layerskip_tpu.config import GenerationConfig, ModelConfig, tiny_config
from layerskip_tpu.models import llama
from layerskip_tpu.models.params import (
    init_params,
    params_from_torch_state_dict,
)
from layerskip_tpu.ops.kv_cache import init_kv_cache


def _qwen3moe_cfg(norm_topk=False, **kw):
    return tiny_config(
        num_hidden_layers=4,
        hidden_size=64,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=96,  # = moe_intermediate_size (experts)
        vocab_size=256,
        qk_norm=True,
        tie_word_embeddings=True,
        num_local_experts=4,
        num_experts_per_tok=2,
        norm_topk_prob=norm_topk,
        **kw,
    )


@pytest.fixture(scope="module", params=[False, True],
                ids=["rawtopk", "normtopk"])
def torch_qwen3moe_and_cfg(request):
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    norm_topk = request.param
    cfg = _qwen3moe_cfg(norm_topk=norm_topk)
    hf_cfg = Qwen3MoeConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=128,  # dense size; unused (every layer is MoE)
        moe_intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        num_experts=cfg.num_local_experts,
        num_experts_per_tok=cfg.num_experts_per_tok,
        norm_topk_prob=norm_topk,
        attention_bias=False,
        tie_word_embeddings=True,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Qwen3MoeForCausalLM(hf_cfg).eval()
    return model, cfg


def test_from_hf_dict_detects_qwen3_moe():
    cfg = ModelConfig.from_hf_dict({
        "model_type": "qwen3_moe",
        "vocab_size": 256, "hidden_size": 64, "intermediate_size": 128,
        "moe_intermediate_size": 96, "num_hidden_layers": 4,
        "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 16,
        "num_experts": 4, "num_experts_per_tok": 2,
        "norm_topk_prob": False,
    })
    assert cfg.qk_norm and cfg.is_moe
    assert cfg.num_local_experts == 4
    assert cfg.intermediate_size == 96  # experts use moe_intermediate_size
    assert cfg.norm_topk_prob is False


def test_full_forward_matches_torch(torch_qwen3moe_and_cfg):
    model, cfg = torch_qwen3moe_and_cfg
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    assert params.layers.q_norm is not None
    assert params.layers.w_router is not None
    assert params.layers.w_gate.shape[:2] == (4, cfg.num_local_experts)
    rng = np.random.default_rng(0)
    ids_np = rng.integers(0, cfg.vocab_size, size=(2, 12), dtype=np.int64)

    with torch.no_grad():
        ref = model(torch.from_numpy(ids_np)).logits.float().numpy()
    cache = init_kv_cache(cfg, batch=2, max_len=32)
    res = jax.jit(llama.forward, static_argnums=(1,))(
        params, cfg, jnp.asarray(ids_np, jnp.int32), cache, jnp.int32(0)
    )
    np.testing.assert_allclose(
        np.asarray(res.logits), ref, rtol=3e-4, atol=3e-4
    )


def test_incremental_decode_matches_torch(torch_qwen3moe_and_cfg):
    model, cfg = torch_qwen3moe_and_cfg
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, cfg.vocab_size, size=(1, 6), dtype=np.int64)

    ids = torch.from_numpy(prompt)
    with torch.no_grad():
        for _ in range(6):
            nxt = model(ids).logits[:, -1].argmax(-1, keepdim=True)
            ids = torch.cat([ids, nxt], dim=-1)
    ref_stream = ids[0, 6:].numpy().tolist()

    fwd = jax.jit(llama.forward, static_argnums=(1,))
    cache = init_kv_cache(cfg, batch=1, max_len=32)
    res = fwd(params, cfg, jnp.asarray(prompt, jnp.int32), cache, jnp.int32(0))
    cache, past = res.cache, prompt.shape[1]
    tok = int(np.asarray(res.logits)[0, -1].argmax())
    stream = [tok]
    for _ in range(5):
        res = fwd(
            params, cfg, jnp.full((1, 1), tok, jnp.int32), cache,
            jnp.int32(past),
        )
        cache, past = res.cache, past + 1
        tok = int(np.asarray(res.logits)[0, -1].argmax())
        stream.append(tok)
    assert stream == ref_stream


def test_qwen3_moe_greedy_spec_equals_ar():
    from layerskip_tpu.generation.engine import Engine, postprocess_output

    cfg = _qwen3moe_cfg(norm_topk=False)
    params = init_params(jax.random.PRNGKey(7), cfg)
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


def test_qwen3_moe_checkpoint_round_trip(tmp_path, torch_qwen3moe_and_cfg):
    from layerskip_tpu.models.params import load_params, save_params

    model, cfg = torch_qwen3moe_and_cfg
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    save_params(params, str(tmp_path), cfg)

    cfg2 = ModelConfig.from_pretrained(str(tmp_path), dtype=jnp.float32)
    assert cfg2.qk_norm and cfg2.is_moe
    assert cfg2.norm_topk_prob == cfg.norm_topk_prob
    assert cfg2.intermediate_size == cfg.intermediate_size
    params2 = load_params(str(tmp_path), cfg2)

    ids = jnp.asarray([[5, 9, 2, 40]], jnp.int32)
    cache = init_kv_cache(cfg, batch=1, max_len=16)
    fwd = jax.jit(llama.forward, static_argnums=(1,))
    a = fwd(params, cfg, ids, cache, jnp.int32(0)).logits
    b = fwd(params2, cfg2, ids, cache, jnp.int32(0)).logits
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_qwen3_moe_ep_sharded_matches_single_device():
    """Qwen3-MoE under an (ep=2, tp=4) mesh: the qk-norm fields and the
    expert-sharded MLP both carry specs, and the expert-parallel decode
    emits the single-device stream."""
    from layerskip_tpu.generation.engine import Engine, postprocess_output
    from layerskip_tpu.parallel.mesh import make_mesh
    from layerskip_tpu.parallel.sharding import shard_params

    cfg = _qwen3moe_cfg(norm_topk=False, dtype=jnp.bfloat16)
    params = init_params(jax.random.PRNGKey(7), cfg)
    gc = GenerationConfig(
        max_steps=12, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3,
    )
    prompt = [3, 17, 52, 9]
    ref = postprocess_output(
        Engine(params, cfg).generate(prompt, gc, jax.random.PRNGKey(0)),
        (), 12,
    )
    mesh = make_mesh(dp=1, ep=2, tp=4)
    got = postprocess_output(
        Engine(shard_params(params, mesh), cfg).generate(
            prompt, gc, jax.random.PRNGKey(0)), (), 12,
    )
    assert got == ref


def test_from_hf_dict_matches_hf_defaults_when_keys_omitted():
    """HF to_diff_dict omits config fields equal to the class default, so
    a qwen3_moe config.json may carry NONE of num_experts /
    num_experts_per_tok / norm_topk_prob — the parser must reproduce the
    HF Qwen3MoeConfig defaults (128 / 8 / False), not Mixtral's (r5
    review finding: the old fallbacks silently flipped the routing
    convention and dropped the expert axis)."""
    cfg = ModelConfig.from_hf_dict({
        "model_type": "qwen3_moe",
        "vocab_size": 256, "hidden_size": 64, "intermediate_size": 128,
        "moe_intermediate_size": 96, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 16,
    })
    assert cfg.num_local_experts == 128
    assert cfg.num_experts_per_tok == 8
    assert cfg.norm_topk_prob is False
    # Mixtral keeps its own defaults and always renormalizes
    cfg2 = ModelConfig.from_hf_dict({
        "model_type": "mixtral",
        "vocab_size": 256, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16, "num_local_experts": 8,
    })
    assert cfg2.num_experts_per_tok == 2 and cfg2.norm_topk_prob is True
