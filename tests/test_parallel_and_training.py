"""Multi-device sharding + LayerSkip training-recipe tests.

Runs on the 8 virtual CPU devices set up in conftest.py — the reference has
no distributed tests at all (SURVEY §4); this is net-new coverage for the
TPU-native mesh/sharding layer and the training recipe the reference defers
to torchtune (README.md:166-167).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from layerskip_tpu.config import GenerationConfig, tiny_config
from layerskip_tpu.models import llama
from layerskip_tpu.models.params import init_params
from layerskip_tpu.ops.kv_cache import init_kv_cache
from layerskip_tpu.parallel.mesh import make_mesh
from layerskip_tpu.parallel.sharding import param_specs, shard_params, to_named
from layerskip_tpu.training.recipe import (
    TrainConfig,
    depth_scale,
    exit_loss_weights,
    layerskip_loss,
    make_train_step,
)


@pytest.fixture(scope="module")
def cfg():
    # dims divisible by tp=4: heads 8, kv-heads 4, vocab 256, ffn 128
    return tiny_config(
        num_hidden_layers=4, hidden_size=64, num_attention_heads=8,
        num_key_value_heads=4, intermediate_size=128, vocab_size=256,
    )


@pytest.fixture(scope="module")
def params(cfg):
    return init_params(jax.random.PRNGKey(0), cfg)


def test_mesh_has_8_devices():
    assert jax.device_count() == 8


def test_sharded_forward_matches_single_device(cfg, params):
    """TP+DP sharded prefill must be numerically identical to single-device."""
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    cache = init_kv_cache(cfg, batch=2, max_len=32)
    ref = llama.forward(params, cfg, ids, cache, jnp.int32(0))

    mesh = make_mesh(dp=2, tp=4)
    p_sh = shard_params(params, mesh)
    ids_sh = jax.device_put(ids, NamedSharding(mesh, P("dp", None)))
    kv_sh = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(None, "dp", None, "tp", None))
        ),
        cache,
    )
    fn = jax.jit(lambda p, i, c: llama.forward(p, cfg, i, c, jnp.int32(0)))
    out = fn(p_sh, ids_sh, kv_sh)
    np.testing.assert_allclose(
        np.asarray(out.logits), np.asarray(ref.logits), atol=2e-4, rtol=1e-3
    )


def test_sharded_spec_generate_matches(cfg, params):
    """Whole self-speculative generation under a TP=4 mesh == unsharded."""
    from layerskip_tpu.generation.engine import Engine, postprocess_output

    gen_cfg = GenerationConfig(
        max_steps=12, exit_layer=2, num_speculations=3,
        generation_strategy="self_speculative", sample=False,
    )
    prompt = [3, 17, 52, 9, 30]
    eng = Engine(params, cfg)
    ref = postprocess_output(
        eng.generate(prompt, gen_cfg, jax.random.PRNGKey(0)), (), 12
    )

    mesh = make_mesh(dp=1, tp=8, devices=jax.devices())
    p_sh = shard_params(params, mesh)
    eng_sh = Engine(p_sh, cfg)
    got = postprocess_output(
        eng_sh.generate(prompt, gen_cfg, jax.random.PRNGKey(0)), (), 12
    )
    assert got == ref


def test_kv_seq_sharded_decode_matches(cfg, params):
    """Sequence-sharded KV decode == unsharded (SURVEY §5.7 long-context).

    The KV cache's sequence dim is sharded over a mesh axis
    (Engine(kv_shard_axis=...)): each device holds a contiguous KV slab and
    GSPMD partitions the attention reductions across chips — contexts larger
    than one chip's HBM spread over ICI. Token-stream must be identical."""
    from jax.sharding import Mesh

    from layerskip_tpu.generation.engine import Engine, postprocess_output

    gen_cfg = GenerationConfig(
        max_steps=12, exit_layer=2, num_speculations=3,
        generation_strategy="self_speculative", sample=False,
    )
    prompt = [3, 17, 52, 9, 30]
    ref = postprocess_output(
        Engine(params, cfg).generate(prompt, gen_cfg, jax.random.PRNGKey(0)),
        (), 12,
    )

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("sp",))
    eng = Engine(params, cfg, mesh=mesh, kv_shard_axis="sp")
    got = postprocess_output(
        eng.generate(prompt, gen_cfg, jax.random.PRNGKey(0)), (), 12
    )
    assert got == ref


def test_kv_seq_shard_composes_with_tp(cfg, params):
    """(sp=2, tp=4): tensor-parallel params + sequence-sharded KV together.

    AR strategy; params sharded over tp (heads/features), KV sequence dim
    sharded over sp — the layout for serving long contexts on a pod slice."""
    from jax.sharding import Mesh

    from layerskip_tpu.generation.engine import Engine, postprocess_output
    from layerskip_tpu.parallel.sharding import shard_params

    gen_cfg = GenerationConfig(max_steps=10, sample=False)
    prompt = [11, 4, 250, 33]
    ref = postprocess_output(
        Engine(params, cfg).generate(prompt, gen_cfg, jax.random.PRNGKey(0)),
        (), 10,
    )

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("sp", "tp"))
    p_sh = shard_params(params, mesh)
    eng = Engine(p_sh, cfg, mesh=mesh, kv_shard_axis="sp")
    got = postprocess_output(
        eng.generate(prompt, gen_cfg, jax.random.PRNGKey(0)), (), 10
    )
    assert got == ref


def test_depth_scale_monotone():
    idx = jnp.arange(8)
    for kind in ("exp", "linear"):
        d = np.asarray(depth_scale(idx, 8, kind))
        assert d[0] == 0.0 and abs(d[-1] - 1.0) < 1e-6
        assert (np.diff(d) > 0).all()


def test_exit_loss_weights_rotational():
    w0 = np.asarray(exit_loss_weights((1, 2, 3), 4, 1.0, 2, jnp.int32(0)))
    w1 = np.asarray(exit_loss_weights((1, 2, 3), 4, 1.0, 2, jnp.int32(1)))
    assert (w0 > 0).tolist() == [True, False, True]
    assert (w1 > 0).tolist() == [False, True, False]
    assert abs(w0.sum() - 1.0) < 1e-6 and abs(w1.sum() - 1.0) < 1e-6


def test_layerskip_loss_and_train_step(cfg, params):
    tcfg = TrainConfig(p_max=0.2, early_exit_layers=(1, 2), e_scale=0.5)
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, cfg.vocab_size)
    labels = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0, cfg.vocab_size)
    loss, aux = layerskip_loss(
        params, cfg, tcfg, ids, labels, jax.random.PRNGKey(4), jnp.int32(0)
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert aux["exit_losses"].shape == (2,)

    train_step, init_opt = make_train_step(cfg, tcfg)
    opt_state = init_opt(params)
    step = jax.jit(train_step)
    p2, opt2, aux = step(
        params, opt_state, ids, labels, jax.random.PRNGKey(5), jnp.int32(0)
    )
    # params actually moved
    delta = float(jnp.abs(p2.layers.wq - params.layers.wq).max())
    assert delta > 0
    assert np.isfinite(float(aux["loss"]))


def test_chunked_ce_matches_dense(cfg, params):
    """Token-chunked (rematerialized) CE == dense [B,T,V] CE, loss and grads.

    The chunked path is what lets the 7B default config train on one v5e
    (VERDICT r1 #8: dense exit CE is ~1 GB fp32 per exit per step)."""
    import dataclasses as dc

    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 24), 0, cfg.vocab_size)
    labels = jax.random.randint(jax.random.PRNGKey(3), (2, 24), 0, cfg.vocab_size)
    labels = labels.at[0, :3].set(-100)  # ignored positions span chunks
    dense = TrainConfig(p_max=0.2, early_exit_layers=(1, 2), e_scale=0.5,
                        ce_chunk_tokens=0, label_smoothing=0.1)
    chunked = dc.replace(dense, ce_chunk_tokens=16)  # 48 tokens -> 3 chunks

    def run(tcfg):
        def loss_fn(p):
            return layerskip_loss(
                p, cfg, tcfg, ids, labels, jax.random.PRNGKey(4), jnp.int32(0)
            )
        (loss, aux), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(params)
        return loss, aux, grads

    l_d, aux_d, g_d = run(dense)
    l_c, aux_c, g_c = run(chunked)
    np.testing.assert_allclose(float(l_d), float(l_c), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(aux_d["exit_losses"]), np.asarray(aux_c["exit_losses"]),
        rtol=1e-5,
    )
    for a, b in zip(jax.tree.leaves(g_d), jax.tree.leaves(g_c)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=2e-5, rtol=2e-3,
        )


def test_default_exit_layers_sparse():
    from layerskip_tpu.training.recipe import default_exit_layers

    assert default_exit_layers(32) == (8, 16, 24)
    assert default_exit_layers(4) == (1, 2, 3)
    assert default_exit_layers(2) == (1,)


def test_dryrun_multichip_entry():
    """The driver-facing entry points must work on the virtual mesh."""
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.logits.shape[0] == 1
    mod.dryrun_multichip(8)


def test_train_cli_with_checkpoint_resume(tmp_path):
    """End-to-end training driver: loss decreases, checkpoints resume, and
    the exported checkpoint loads back into the inference engine."""
    import json

    from layerskip_tpu.cli.args import Arguments
    from layerskip_tpu.cli.train import TrainArguments, main

    data = tmp_path / "corpus.jsonl"
    rows = [{"prompt": f"ab cd ef {i} ", "response": "gh ij kl"} for i in range(8)]
    data.write_text("\n".join(json.dumps(r) for r in rows))

    args = Arguments(model="random:tiny", output_dir=str(tmp_path))
    targs = TrainArguments(
        dataset="custom_jsonl", data_path=str(data), steps=6, batch_size=2,
        seq_len=32, checkpoint_dir=str(tmp_path / "ckpt"), save_every=3,
        log_every=2, early_exit_layers="1,2", e_scale=0.5,
        export_dir=str(tmp_path / "export"),
    )
    params, history = main(args, targs)
    assert len(history) >= 2
    assert (tmp_path / "export" / "model.safetensors").exists()

    # resume from the saved step-6 checkpoint and run a bit further
    targs2 = TrainArguments(
        dataset="custom_jsonl", data_path=str(data), steps=8, batch_size=2,
        seq_len=32, checkpoint_dir=str(tmp_path / "ckpt"), save_every=100,
        log_every=1, early_exit_layers="1,2", e_scale=0.5,
    )
    params2, history2 = main(args, targs2)
    assert history2  # continued from step 6 to 8

    # exported checkpoint round-trips into the inference engine
    from layerskip_tpu.config import GenerationConfig, ModelConfig
    from layerskip_tpu.generation.engine import Engine, postprocess_output
    from layerskip_tpu.models.params import load_params

    cfg2 = ModelConfig.from_pretrained(str(tmp_path / "export"), dtype=jnp.float32)
    loaded = load_params(str(tmp_path / "export"), cfg2)
    eng = Engine(loaded, cfg2)
    toks = postprocess_output(
        eng.generate([3, 5, 7], GenerationConfig(
            max_steps=6, sample=False, generation_strategy="self_speculative",
            exit_layer=2, num_speculations=2)),
        (), 6,
    )
    assert len(toks) == 6


def test_sharded_tree_generate_matches(cfg, params):
    """Tree speculation under a TP=8 mesh == unsharded (the interleaved
    scratch slots, tree mask, and winning-chain compaction must all be
    GSPMD-safe)."""
    from layerskip_tpu.generation.engine import Engine, postprocess_output

    gen_cfg = GenerationConfig(
        max_steps=12, exit_layer=2, num_speculations=3, spec_tree_width=3,
        generation_strategy="self_speculative", sample=False,
    )
    prompt = [3, 17, 52, 9, 30]
    ref = postprocess_output(
        Engine(params, cfg).generate(prompt, gen_cfg, jax.random.PRNGKey(0)),
        (), 12,
    )
    mesh = make_mesh(dp=1, tp=8, devices=jax.devices())
    got = postprocess_output(
        Engine(shard_params(params, mesh), cfg).generate(
            prompt, gen_cfg, jax.random.PRNGKey(0)), (), 12,
    )
    assert got == ref


def test_sharded_continuous_session_matches(cfg, params):
    """Continuous batching (insert/step + chunked insert) over a TP=8
    sharded engine returns the same streams as the unsharded engine —
    the serving x parallelism intersection."""
    from layerskip_tpu.generation.engine import Engine, postprocess_output

    gen_cfg = GenerationConfig(
        max_steps=10, exit_layer=2, num_speculations=3,
        generation_strategy="self_speculative", sample=False,
    )
    p0, p1 = [3, 17, 52], [5, 9, 30, 8, 61, 100, 2]
    eng = Engine(params, cfg)
    want = {
        0: postprocess_output(
            eng.generate(p0, gen_cfg, jax.random.PRNGKey(0), [99]), [99], 10),
        1: postprocess_output(
            eng.generate(p1, gen_cfg, jax.random.PRNGKey(0), [99]), [99], 10),
    }
    mesh = make_mesh(dp=1, tp=8, devices=jax.devices())
    eng_sh = Engine(shard_params(params, mesh), cfg)
    sess = eng_sh.continuous_session(gen_cfg, batch=2, prompt_bucket=16,
                                     eos_ids=[99])
    sess.insert([0], [p0], seeds=[0])
    sess.begin_chunked_insert([1], [p1], seeds=[0], chunk_tokens=4)
    got = {}
    for _ in range(60):
        for r, toks, _ in sess.step():
            got[r] = toks
        if len(got) == 2:
            break
    assert got == want


@pytest.mark.parametrize("family", ["gemma2", "qwen3"])
def test_train_step_runs_on_new_families(family):
    """The LayerSkip training recipe (layer dropout + rotational early-exit
    loss) must run unchanged on the r5 model families — the optional
    post-norm / qk-norm fields flow through grads and the optimizer."""
    import jax.numpy as jnp

    from layerskip_tpu.config import tiny_config
    from layerskip_tpu.models.params import init_params
    from layerskip_tpu.training.recipe import TrainConfig, make_train_step

    if family == "gemma2":
        fcfg = tiny_config(
            dtype=jnp.bfloat16, hidden_act="gelu_pytorch_tanh",
            rms_norm_offset=True, scale_embeddings=True,
            tie_word_embeddings=True, attn_logit_softcap=50.0,
            final_logit_softcap=30.0, query_pre_attn_scalar=32.0,
            sliding_window=8, sliding_window_pattern=2, post_norms=True,
        )
    else:
        fcfg = tiny_config(
            dtype=jnp.bfloat16, qk_norm=True, tie_word_embeddings=True,
        )
    tcfg = TrainConfig(
        p_max=0.1, early_exit_layers=(1, 2, 3), e_scale=0.5, rotational_r=2
    )
    step, init_opt = make_train_step(fcfg, tcfg)
    params = init_params(jax.random.PRNGKey(0), fcfg)
    opt = init_opt(params)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0,
                             fcfg.vocab_size)
    labels = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0,
                                fcfg.vocab_size)
    p2, _, aux = jax.jit(step)(
        params, opt, ids, labels, jax.random.PRNGKey(3), jnp.int32(0)
    )
    loss = float(aux["loss"])
    assert loss == loss and loss > 0.0
    # weights update (one bf16 step on norm weights near 1.0 can round to
    # no visible change, so assert on the matmul weights at ~0.02 scale)
    import numpy as np

    assert not np.array_equal(
        np.asarray(p2.layers.wq), np.asarray(params.layers.wq)
    )
    # the family-specific fields flow through the optimizer (same pytree)
    if family == "gemma2":
        assert p2.layers.post_attn_norm.shape \
            == params.layers.post_attn_norm.shape
    else:
        assert p2.layers.q_norm.shape == params.layers.q_norm.shape


@pytest.mark.parametrize("family", ["llama", "mistral", "gemma2", "gemma3",
                                    "qwen3"])
def test_training_forward_matches_inference(family):
    """The training pass must compute EXACTLY the inference architecture
    (r5 code-review finding: qk-norm / per-layer windows / local RoPE /
    post-norms were missing from _one_layer_dropped, so training would
    have optimized a different model than inference runs). With layer
    dropout off and no exit losses, the training final CE must equal the
    CE of the inference forward's logits."""
    import jax.numpy as jnp
    import numpy as np

    from layerskip_tpu.config import tiny_config
    from layerskip_tpu.models import llama as llama_mod
    from layerskip_tpu.models.params import init_params
    from layerskip_tpu.ops.kv_cache import init_kv_cache
    from layerskip_tpu.training.recipe import (
        TrainConfig,
        layerskip_loss,
        token_cross_entropy,
    )

    kw = dict(num_hidden_layers=6, vocab_size=128)
    fcfg = {
        "llama": tiny_config(**kw),
        "mistral": tiny_config(sliding_window=5, **kw),
        "gemma2": tiny_config(
            hidden_act="gelu_pytorch_tanh", rms_norm_offset=True,
            scale_embeddings=True, tie_word_embeddings=True,
            attn_logit_softcap=50.0, final_logit_softcap=30.0,
            query_pre_attn_scalar=32.0, sliding_window=5,
            sliding_window_pattern=2, post_norms=True, **kw,
        ),
        "gemma3": tiny_config(
            hidden_act="gelu_pytorch_tanh", rms_norm_offset=True,
            scale_embeddings=True, tie_word_embeddings=True, qk_norm=True,
            post_norms=True, query_pre_attn_scalar=32.0, sliding_window=5,
            sliding_window_pattern=6, rope_theta=100000.0,
            rope_local_theta=10000.0, **kw,
        ),
        "qwen3": tiny_config(qk_norm=True, tie_word_embeddings=True, **kw),
    }[family]
    params = init_params(jax.random.PRNGKey(5), fcfg)
    rng = np.random.default_rng(9)
    t = 12  # > sliding_window so the windowed layers genuinely mask
    ids = jnp.asarray(rng.integers(0, fcfg.vocab_size, (2, t)), jnp.int32)
    labels = jnp.concatenate(
        [ids[:, 1:], jnp.full((2, 1), -100, jnp.int32)], axis=1
    )
    tcfg = TrainConfig(p_max=0.0, early_exit_layers=(99,))  # filtered empty
    total, aux = layerskip_loss(
        params, fcfg, tcfg, ids, labels, jax.random.PRNGKey(0),
        jnp.int32(0),
    )
    cache = init_kv_cache(fcfg, batch=2, max_len=t + 2)
    res = jax.jit(llama_mod.forward, static_argnums=(1,))(
        params, fcfg, ids, cache, jnp.int32(0)
    )
    ref = token_cross_entropy(res.logits, labels)
    np.testing.assert_allclose(
        float(aux["final_loss"]), float(ref), rtol=1e-5,
        err_msg=f"{family}: training forward != inference forward",
    )
