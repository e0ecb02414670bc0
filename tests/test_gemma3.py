"""Gemma-3-family parity: 5-of-6 grouped sliding/global attention layout,
per-layer RoPE base (local theta on sliding layers), (1+w) qk-norm, the
Gemma-2 four-norm block WITHOUT soft-capping.

Same oracle stack as the other families: logits must match torch
``Gemma3ForCausalLM`` for full prefill and incremental KV decode, and
greedy self-speculative == greedy AR must hold. Six layers exercise a
genuinely mixed layout (layers 0-4 sliding, layer 5 global), and
rope_theta (global) != rope_local_theta so the per-layer RoPE select
really matters.
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

_LAYER_TYPES = ["sliding_attention"] * 5 + ["full_attention"]


def _gemma3_cfg(**kw):
    return tiny_config(
        num_hidden_layers=6,
        hidden_size=64,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=128,
        vocab_size=256,
        hidden_act="gelu_pytorch_tanh",
        rms_norm_offset=True,
        scale_embeddings=True,
        tie_word_embeddings=True,
        qk_norm=True,
        post_norms=True,
        query_pre_attn_scalar=32.0,
        sliding_window=8,
        sliding_layers=tuple(t == "sliding_attention" for t in _LAYER_TYPES),
        rope_theta=100000.0,  # global layers
        rope_local_theta=10000.0,  # sliding layers
        **kw,
    )


@pytest.fixture(scope="module")
def torch_gemma3_and_cfg():
    from transformers import Gemma3ForCausalLM, Gemma3TextConfig

    cfg = _gemma3_cfg()
    hf_cfg = Gemma3TextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=100000.0,
        rope_local_base_freq=10000.0,
        hidden_activation="gelu_pytorch_tanh",
        attention_bias=False,
        tie_word_embeddings=True,
        query_pre_attn_scalar=32,
        sliding_window=8,
        layer_types=list(_LAYER_TYPES),
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Gemma3ForCausalLM(hf_cfg).eval()
    return model, cfg


def test_from_hf_dict_detects_gemma3():
    cfg = ModelConfig.from_hf_dict({
        "model_type": "gemma3_text",
        "vocab_size": 256, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 6, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16,
        "query_pre_attn_scalar": 32, "sliding_window": 8,
        "rope_local_base_freq": 10000.0, "rope_theta": 100000.0,
        "layer_types": _LAYER_TYPES,
    })
    assert cfg.post_norms and cfg.qk_norm and cfg.rms_norm_offset
    assert cfg.rope_local_theta == 10000.0
    assert cfg.sliding_layer_flags == (True,) * 5 + (False,)
    assert cfg.attn_logit_softcap == 0.0  # Gemma-3 dropped soft-capping
    # pattern fallback (older configs without layer_types): 5-of-6 slide
    cfg2 = ModelConfig.from_hf_dict({
        "model_type": "gemma3_text",
        "vocab_size": 256, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 6, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16, "sliding_window": 8,
    })
    assert cfg2.sliding_layer_flags == (True,) * 5 + (False,)


def test_full_forward_matches_torch(torch_gemma3_and_cfg):
    model, cfg = torch_gemma3_and_cfg
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    assert params.layers.q_norm is not None
    assert params.layers.post_attn_norm is not None
    rng = np.random.default_rng(0)
    # T=20 > sliding_window=8: windowed layers genuinely mask
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


def test_local_rope_matters(torch_gemma3_and_cfg):
    """Dropping the local RoPE base (all layers on the global theta) must
    change the logits — guards the per-layer cos/sin select."""
    import dataclasses

    model, cfg = torch_gemma3_and_cfg
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(
        rng.integers(0, cfg.vocab_size, size=(1, 16)), jnp.int32
    )
    cache = init_kv_cache(cfg, batch=1, max_len=40)
    fwd = jax.jit(llama.forward, static_argnums=(1,))
    a = fwd(params, cfg, ids, cache, jnp.int32(0)).logits
    cfg_g = dataclasses.replace(cfg, rope_local_theta=None)
    b = fwd(params, cfg_g, ids, cache, jnp.int32(0)).logits
    assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_incremental_decode_matches_torch(torch_gemma3_and_cfg):
    model, cfg = torch_gemma3_and_cfg
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


def test_gemma3_greedy_spec_equals_ar():
    from layerskip_tpu.generation.engine import Engine, postprocess_output

    cfg = _gemma3_cfg()
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
    # exit 3 splits the sliding run; the absolute per-layer layout (and
    # each layer's RoPE base) must survive the early/full group split
    sp = postprocess_output(
        eng.generate(
            prompt,
            GenerationConfig(generation_strategy="self_speculative",
                             exit_layer=3, num_speculations=3, **common),
            jax.random.PRNGKey(0),
        ), (), 14,
    )
    assert ar == sp


def test_gemma3_checkpoint_round_trip(tmp_path, torch_gemma3_and_cfg):
    from layerskip_tpu.models.params import load_params, save_params

    model, cfg = torch_gemma3_and_cfg
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    save_params(params, str(tmp_path), cfg)

    cfg2 = ModelConfig.from_pretrained(str(tmp_path), dtype=jnp.float32)
    assert cfg2.post_norms and cfg2.qk_norm
    assert cfg2.rope_local_theta == 10000.0
    assert cfg2.sliding_layer_flags == cfg.sliding_layer_flags
    params2 = load_params(str(tmp_path), cfg2)

    ids = jnp.asarray([[5, 9, 2, 40]], jnp.int32)
    cache = init_kv_cache(cfg, batch=1, max_len=16)
    fwd = jax.jit(llama.forward, static_argnums=(1,))
    a = fwd(params, cfg, ids, cache, jnp.int32(0)).logits
    b = fwd(params2, cfg2, ids, cache, jnp.int32(0)).logits
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_gemma3_paged_serving_and_kv_quant_match_solo():
    """Gemma-3 composes with the serving stack: a paged + prefix-cache
    continuous session (the XLA fallback reads through gather_view with
    the traced per-layer window) and the int8 KV cache both reproduce
    the solo greedy stream."""
    import dataclasses

    from layerskip_tpu.generation.engine import Engine, postprocess_output

    cfg = _gemma3_cfg(dtype=jnp.bfloat16)
    params = init_params(jax.random.PRNGKey(3), cfg)
    eng = Engine(params, cfg)
    gc = GenerationConfig(
        max_steps=10, sample=False, generation_strategy="self_speculative",
        exit_layer=3, num_speculations=3,
    )
    p0 = [3, 17, 52, 9, 30, 11, 7]
    ref = postprocess_output(
        eng.generate(p0, gc, jax.random.PRNGKey(0)), (), 10)
    sess = eng.continuous_session(
        gc, batch=2, prompt_bucket=16, paged_pool_pages=32, page_size=16,
        prefix_cache=True,
    )
    sess.insert([0], [p0], seeds=[0])
    got = {}
    for _ in range(30):
        for r, toks, _a in sess.step():
            got[r] = toks
        if got:
            break
    assert got[0] == ref
    gq = dataclasses.replace(gc, kv_quant=True)
    q = postprocess_output(
        eng.generate(p0, gq, jax.random.PRNGKey(0)), (), 10)
    assert q == ref
