"""Mixtral-family mixture-of-experts: HF parity, path equality, generation.

Net-new relative to the reference (LayerSkip is dense-Llama only). The
oracle stack mirrors the other model families:
  * logit parity against torch ``MixtralForCausalLM`` (full prefill and
    incremental KV decode) pins router semantics (fp32 softmax, top-k,
    renormalize) and expert FFN math to the de-facto HF Mixtral;
  * the dense-combine and grouped (ragged_dot) execution paths of
    ops/moe.py must be numerically equal — both are exact by construction;
  * greedy self-speculative == greedy AR (the reference's correctness bar,
    /root/reference/correctness.py) must hold with MoE layers.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from layerskip_tpu.config import GenerationConfig, tiny_config
from layerskip_tpu.models import llama
from layerskip_tpu.models.params import (
    init_params,
    params_from_torch_state_dict,
)
from layerskip_tpu.ops.kv_cache import init_kv_cache


def _moe_cfg(**kw):
    return tiny_config(
        num_hidden_layers=4,
        hidden_size=64,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=96,
        vocab_size=256,
        num_local_experts=4,
        num_experts_per_tok=2,
        **kw,
    )


@pytest.fixture(scope="module")
def torch_mixtral_and_cfg():
    from transformers import MixtralConfig, MixtralForCausalLM

    cfg = _moe_cfg()
    hf_cfg = MixtralConfig(
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
        num_local_experts=cfg.num_local_experts,
        num_experts_per_tok=cfg.num_experts_per_tok,
        sliding_window=None,
        tie_word_embeddings=False,
        attention_dropout=0.0,
        router_jitter_noise=0.0,
    )
    torch.manual_seed(0)
    model = MixtralForCausalLM(hf_cfg).eval()
    return model, cfg


def _torch_logits(model, ids_np):
    with torch.no_grad():
        out = model(torch.from_numpy(ids_np))
    return out.logits.float().numpy()


@pytest.mark.parametrize("impl", ["dense", "grouped"])
def test_full_forward_matches_torch(torch_mixtral_and_cfg, impl, monkeypatch):
    monkeypatch.setenv("LAYERSKIP_MOE_IMPL", impl)
    model, cfg = torch_mixtral_and_cfg
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    rng = np.random.default_rng(0)
    ids_np = rng.integers(0, cfg.vocab_size, size=(2, 12), dtype=np.int64)

    ref = _torch_logits(model, ids_np)
    cache = init_kv_cache(cfg, batch=2, max_len=32)
    res = jax.jit(llama.forward, static_argnums=(1,))(
        params, cfg, jnp.asarray(ids_np, jnp.int32), cache, jnp.int32(0)
    )
    np.testing.assert_allclose(
        np.asarray(res.logits), ref, rtol=2e-4, atol=2e-4
    )


def test_incremental_decode_matches_torch(torch_mixtral_and_cfg):
    """Prefill + per-token KV decode must produce the same argmax stream."""
    model, cfg = torch_mixtral_and_cfg
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, cfg.vocab_size, size=(1, 7), dtype=np.int64)

    # torch greedy continuation
    ids = torch.from_numpy(prompt)
    with torch.no_grad():
        for _ in range(8):
            nxt = model(ids).logits[:, -1].argmax(-1, keepdim=True)
            ids = torch.cat([ids, nxt], dim=-1)
    ref_stream = ids[0, 7:].numpy().tolist()

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


@pytest.mark.parametrize("shape", [(3, 40), (1, 1)])
def test_moe_paths_equal(shape):
    """All three MoE execution paths are exact — same outputs to tolerance.

    (1, 1) is the decode shape where the auto dispatch picks the
    expert-gather ``few`` path (reads only routed experts' bytes)."""
    from layerskip_tpu.ops.moe import moe_mlp

    cfg = _moe_cfg()
    params = init_params(jax.random.PRNGKey(3), cfg)
    lp = jax.tree.map(lambda x: x[0], params.layers)
    x = jax.random.normal(jax.random.PRNGKey(4), (*shape, cfg.hidden_size))

    outs = {}
    for impl in ("dense", "grouped", "few"):
        os.environ["LAYERSKIP_MOE_IMPL"] = impl
        try:
            outs[impl], aux = jax.jit(
                lambda x: moe_mlp(
                    x, lp.w_router, lp.w_gate, lp.w_up, lp.w_down,
                    cfg.num_experts_per_tok,
                )
            )(x)
        finally:
            del os.environ["LAYERSKIP_MOE_IMPL"]
        assert np.isfinite(float(aux))
    for impl in ("grouped", "few"):
        np.testing.assert_allclose(
            np.asarray(outs["dense"]), np.asarray(outs[impl]),
            rtol=1e-5, atol=1e-5,
        )


def test_router_weights_normalized():
    from layerskip_tpu.ops.moe import route

    cfg = _moe_cfg()
    x = jax.random.normal(jax.random.PRNGKey(0), (16, cfg.hidden_size))
    w = jax.random.normal(
        jax.random.PRNGKey(1), (cfg.hidden_size, cfg.num_local_experts)
    )
    topv, topi, aux = route(x, w, cfg.num_experts_per_tok)
    np.testing.assert_allclose(np.asarray(topv).sum(-1), 1.0, rtol=1e-6)
    assert np.asarray(topi).max() < cfg.num_local_experts
    # perfectly balanced routing gives aux == 1; any routing is >= 1 - eps
    assert float(aux) >= 0.99


def test_moe_greedy_spec_equals_ar():
    """The reference's correctness bar holds with MoE layers."""
    from layerskip_tpu.generation.engine import Engine, postprocess_output

    cfg = _moe_cfg()
    params = init_params(jax.random.PRNGKey(7), cfg)
    eng = Engine(params, cfg)
    prompt = [3, 17, 52, 9, 30]
    ar = postprocess_output(
        eng.generate(
            prompt,
            GenerationConfig(
                max_steps=14, sample=False,
                generation_strategy="autoregressive",
            ),
            jax.random.PRNGKey(0),
        ), (), 14,
    )
    sp = postprocess_output(
        eng.generate(
            prompt,
            GenerationConfig(
                max_steps=14, sample=False,
                generation_strategy="self_speculative",
                exit_layer=2, num_speculations=3,
            ),
            jax.random.PRNGKey(0),
        ), (), 14,
    )
    assert ar == sp


def test_moe_hf_checkpoint_round_trip(tmp_path, torch_mixtral_and_cfg):
    """save_params -> load_params reproduces identical logits + config."""
    from layerskip_tpu.config import ModelConfig
    from layerskip_tpu.models.params import load_params, save_params

    model, cfg = torch_mixtral_and_cfg
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    save_params(params, str(tmp_path), cfg)

    cfg2 = ModelConfig.from_pretrained(str(tmp_path), dtype=jnp.float32)
    assert cfg2.num_local_experts == cfg.num_local_experts
    assert cfg2.num_experts_per_tok == cfg.num_experts_per_tok
    params2 = load_params(str(tmp_path), cfg2)

    ids = jnp.asarray([[5, 9, 2, 40, 7]], jnp.int32)
    cache = init_kv_cache(cfg, batch=1, max_len=16)
    fwd = jax.jit(llama.forward, static_argnums=(1,))
    a = fwd(params, cfg, ids, cache, jnp.int32(0)).logits
    b = fwd(params2, cfg2, ids, cache, jnp.int32(0)).logits
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_moe_ep_sharded_generation_matches():
    """(ep=2, tp=4): expert-parallel + tensor-parallel MoE decode == solo.

    Expert weights shard their [E] dim over ep and feature dims over tp
    (parallel/sharding.py); GSPMD turns the all-experts combine into a psum
    over ep. Token stream must equal the single-device engine's.
    """
    from layerskip_tpu.generation.engine import Engine, postprocess_output
    from layerskip_tpu.parallel.mesh import make_mesh
    from layerskip_tpu.parallel.sharding import shard_params

    cfg = _moe_cfg()
    params = init_params(jax.random.PRNGKey(5), cfg)
    gen_cfg = GenerationConfig(
        max_steps=12, sample=False, generation_strategy="self_speculative",
        exit_layer=2, num_speculations=3,
    )
    prompt = [11, 4, 250, 33, 7]
    ref = postprocess_output(
        Engine(params, cfg).generate(prompt, gen_cfg, jax.random.PRNGKey(0)),
        (), 12,
    )
    mesh = make_mesh(dp=1, ep=2, tp=4)
    p_sh = shard_params(params, mesh)
    got = postprocess_output(
        Engine(p_sh, cfg).generate(prompt, gen_cfg, jax.random.PRNGKey(0)),
        (), 12,
    )
    assert got == ref


def test_moe_train_step_and_aux_loss():
    """LayerSkip recipe trains a MoE model: loss finite, router gets
    gradients, and the Mixtral-style load-balance aux contributes."""
    from layerskip_tpu.training.recipe import (
        TrainConfig, layerskip_loss, make_train_step,
    )

    cfg = _moe_cfg()
    params = init_params(jax.random.PRNGKey(13), cfg)
    tcfg = TrainConfig(p_max=0.1, early_exit_layers=(2,), moe_aux_coef=0.02)

    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    labels = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, cfg.vocab_size)

    (total, metrics), grads = jax.value_and_grad(
        lambda p: layerskip_loss(
            p, cfg, tcfg, ids, labels, jax.random.PRNGKey(3), jnp.int32(0)
        ),
        has_aux=True,
    )(params)
    assert np.isfinite(float(total))
    # perfectly balanced aux == 1.0; any routing is >= ~1
    assert float(metrics["moe_aux"]) >= 0.99
    # the router is trained (load-balance + downstream CE gradients)
    assert float(jnp.abs(grads.layers.w_router).sum()) > 0.0
    # aux actually moves the total
    tcfg0 = TrainConfig(p_max=0.1, early_exit_layers=(2,), moe_aux_coef=0.0)
    total0, _ = layerskip_loss(
        params, cfg, tcfg0, ids, labels, jax.random.PRNGKey(3), jnp.int32(0)
    )
    assert float(total) > float(total0)

    train_step, init_opt = make_train_step(cfg, tcfg)
    opt_state = init_opt(params)
    p2, _, aux = jax.jit(train_step)(
        params, opt_state, ids, labels, jax.random.PRNGKey(5), jnp.int32(0)
    )
    assert np.isfinite(float(aux["loss"]))
    # expert weights updated
    delta = float(jnp.abs(p2.layers.w_gate - params.layers.w_gate).sum())
    assert delta > 0.0


def test_moe_int8_quantized_runs():
    """int8 expert weights route through the dequant einsum path."""
    from layerskip_tpu.generation.engine import Engine, postprocess_output
    from layerskip_tpu.quant import quantize_llama_params

    cfg = _moe_cfg()
    params = init_params(jax.random.PRNGKey(11), cfg)
    qparams = quantize_llama_params(params)
    eng = Engine(qparams, cfg)
    out = postprocess_output(
        eng.generate(
            [4, 8, 15],
            GenerationConfig(
                max_steps=8, sample=False,
                generation_strategy="self_speculative",
                exit_layer=2, num_speculations=2,
            ),
            jax.random.PRNGKey(0),
        ), (), 8,
    )
    assert len(out) == 8
