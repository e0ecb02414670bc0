"""Gemma-2-family parity: alternating sliding/global attention, attention
and final logit soft-capping, post-sublayer norms, query_pre_attn_scalar.

Same oracle stack as the other families: logits must match torch
``Gemma2ForCausalLM`` for full prefill and incremental KV decode, and
greedy self-speculative == greedy AR must hold (the reference's
correctness bar, /root/reference/correctness.py). The alternating window
is exercised with sliding_window < sequence length so even/odd layers
genuinely mask differently.
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


def _gemma2_cfg(**kw):
    return tiny_config(
        num_hidden_layers=4,
        hidden_size=64,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=128,
        vocab_size=256,
        hidden_act="gelu_pytorch_tanh",
        rms_norm_offset=True,
        scale_embeddings=True,
        tie_word_embeddings=True,
        attn_logit_softcap=50.0,
        final_logit_softcap=30.0,
        query_pre_attn_scalar=32.0,  # != head_dim 16: exercises the scale
        sliding_window=8,  # < test sequence lengths: really masks
        sliding_window_pattern=2,  # even layers sliding, odd global
        post_norms=True,
        **kw,
    )


@pytest.fixture(scope="module")
def torch_gemma2_and_cfg():
    from transformers import Gemma2Config, Gemma2ForCausalLM

    cfg = _gemma2_cfg()
    hf_cfg = Gemma2Config(
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
        hidden_activation="gelu_pytorch_tanh",
        attention_bias=False,
        tie_word_embeddings=True,
        attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
        query_pre_attn_scalar=32,
        sliding_window=8,
        attn_implementation="eager",  # soft-capping needs the eager path
    )
    torch.manual_seed(0)
    model = Gemma2ForCausalLM(hf_cfg).eval()
    return model, cfg


def test_from_hf_dict_detects_gemma2():
    cfg = ModelConfig.from_hf_dict({
        "model_type": "gemma2",
        "vocab_size": 256, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 4, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16,
        "attn_logit_softcapping": 50.0, "final_logit_softcapping": 30.0,
        "query_pre_attn_scalar": 32, "sliding_window": 8,
    })
    assert cfg.rms_norm_offset and cfg.scale_embeddings and cfg.post_norms
    assert cfg.attn_logit_softcap == 50.0
    assert cfg.final_logit_softcap == 30.0
    assert cfg.query_pre_attn_scalar == 32.0
    assert cfg.sliding_window == 8 and cfg.sliding_window_pattern == 2


def test_full_forward_matches_torch(torch_gemma2_and_cfg):
    model, cfg = torch_gemma2_and_cfg
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    assert params.layers.post_attn_norm is not None
    assert params.layers.post_mlp_norm is not None
    rng = np.random.default_rng(0)
    # T=20 > sliding_window=8 so windowed layers genuinely mask
    ids_np = rng.integers(0, cfg.vocab_size, size=(2, 20), dtype=np.int64)

    with torch.no_grad():
        ref = model(torch.from_numpy(ids_np)).logits.float().numpy()
    cache = init_kv_cache(cfg, batch=2, max_len=40)
    res = jax.jit(llama.forward, static_argnums=(1,))(
        params, cfg, jnp.asarray(ids_np, jnp.int32), cache, jnp.int32(0)
    )
    np.testing.assert_allclose(
        np.asarray(res.logits), ref, rtol=2e-4, atol=2e-4
    )


def test_alternating_window_matters(torch_gemma2_and_cfg):
    """A long-enough prompt must produce DIFFERENT logits with the
    alternating window vs all-global attention — guards against the
    per-layer window clause silently no-opping."""
    import dataclasses

    model, cfg = torch_gemma2_and_cfg
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(
        rng.integers(0, cfg.vocab_size, size=(1, 20)), jnp.int32
    )
    cache = init_kv_cache(cfg, batch=1, max_len=40)
    fwd = jax.jit(llama.forward, static_argnums=(1,))
    a = fwd(params, cfg, ids, cache, jnp.int32(0)).logits
    cfg_glob = dataclasses.replace(cfg, sliding_window=None)
    b = fwd(params, cfg_glob, ids, cache, jnp.int32(0)).logits
    assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_incremental_decode_matches_torch(torch_gemma2_and_cfg):
    model, cfg = torch_gemma2_and_cfg
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    rng = np.random.default_rng(1)
    # prompt + generated crosses the window boundary (6 + 8 > 8)
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


def test_gemma2_greedy_spec_equals_ar():
    from layerskip_tpu.generation.engine import Engine, postprocess_output

    cfg = _gemma2_cfg()
    params = init_params(jax.random.PRNGKey(7), cfg)
    eng = Engine(params, cfg)
    prompt = [3, 17, 52, 9]
    common = dict(max_steps=14, sample=False)
    ar = postprocess_output(
        eng.generate(
            prompt,
            GenerationConfig(generation_strategy="autoregressive", **common),
            jax.random.PRNGKey(0),
        ), (), 14,
    )
    sp = postprocess_output(
        eng.generate(
            prompt,
            GenerationConfig(generation_strategy="self_speculative",
                             exit_layer=2, num_speculations=3, **common),
            jax.random.PRNGKey(0),
        ), (), 14,
    )
    # the early group [0, 2) contains one sliding + one global layer and
    # the full group [2, 4) the other pair: the absolute alternation must
    # survive the layer split for the streams to agree
    assert ar == sp


def test_gemma2_checkpoint_round_trip(tmp_path, torch_gemma2_and_cfg):
    from layerskip_tpu.models.params import load_params, save_params

    model, cfg = torch_gemma2_and_cfg
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    save_params(params, str(tmp_path), cfg)

    cfg2 = ModelConfig.from_pretrained(str(tmp_path), dtype=jnp.float32)
    assert cfg2.post_norms and cfg2.sliding_window_pattern == 2
    assert cfg2.attn_logit_softcap == 50.0
    assert cfg2.final_logit_softcap == 30.0
    assert cfg2.query_pre_attn_scalar == 32.0
    params2 = load_params(str(tmp_path), cfg2)

    ids = jnp.asarray([[5, 9, 2, 40]], jnp.int32)
    cache = init_kv_cache(cfg, batch=1, max_len=16)
    fwd = jax.jit(llama.forward, static_argnums=(1,))
    a = fwd(params, cfg, ids, cache, jnp.int32(0)).logits
    b = fwd(params2, cfg2, ids, cache, jnp.int32(0)).logits
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_gemma2_tp_sharded_matches_single_device():
    """Gemma-2 under a tp=8 mesh: the post-norm fields must carry specs
    (parallel/sharding.py post_norms) and the alternating-window decode
    must emit the single-device stream under GSPMD."""
    from layerskip_tpu.generation.engine import Engine, postprocess_output
    from layerskip_tpu.parallel.mesh import make_mesh
    from layerskip_tpu.parallel.sharding import shard_params

    cfg = _gemma2_cfg(dtype=jnp.bfloat16)
    params = init_params(jax.random.PRNGKey(7), cfg)
    gc = GenerationConfig(
        max_steps=14, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3,
    )
    prompt = [3, 17, 52, 9]
    ref = postprocess_output(
        Engine(params, cfg).generate(prompt, gc, jax.random.PRNGKey(0)),
        (), 14,
    )
    mesh = make_mesh(dp=1, tp=8, devices=jax.devices())
    got = postprocess_output(
        Engine(shard_params(params, mesh), cfg).generate(
            prompt, gc, jax.random.PRNGKey(0)), (), 14,
    )
    assert got == ref
