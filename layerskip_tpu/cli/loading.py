"""Model + tokenizer loading for the CLI apps.

Counterpart of the reference's ``load_model_and_tokenizer``
(generate.py:54-67: HF ``from_pretrained`` with fp16/safetensors/device_map).
Here: local HF checkpoint dir -> ModelConfig + stacked-layer LlamaParams
(bf16 by default), tokenizer via ``transformers.AutoTokenizer``.

For offline/smoke use, ``--model random:<preset>`` builds a random-weights
model (presets: tiny, 1b, 7b) with a byte-level whitespace tokenizer — the
zero-egress counterpart of pointing the reference at a hub model id.
"""

from __future__ import annotations

import os
from typing import Tuple

# Persistent XLA compile cache for every CLI app (they all import this
# module before building an engine): 7B whole-generation programs take
# minutes to compile through a remote-compile tunnel; a second process
# start replays them in seconds. Override the location with
# JAX_COMPILATION_CACHE_DIR; the reference instead warms up per-process
# (generate.py:100-104) — we do both (see cli/generate.py warmup).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.expanduser("~"), ".cache", "layerskip_tpu", "jax_cache"
    ),
)

import jax
import jax.numpy as jnp

# sitecustomize imports jax at interpreter startup (before the env default
# above), so pin the config value directly as well
try:
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
except Exception:
    pass

from layerskip_tpu.config import ModelConfig, tiny_config
from layerskip_tpu.models.llama import LlamaParams
from layerskip_tpu.models.params import init_params, load_params


class SimpleTokenizer:
    """Whitespace/byte fallback tokenizer for random-weights smoke runs."""

    eos_token_id = 0

    def __init__(self, vocab_size: int):
        self.vocab_size = vocab_size

    def encode(self, text: str):
        return [1 + (b % (self.vocab_size - 2)) for b in text.encode()[:512]]

    def __call__(self, text: str):
        return {"input_ids": self.encode(text)}

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(int(t)) for t in ids)


def _preset_config(name: str) -> ModelConfig:
    if name == "tiny":
        return tiny_config(dtype=jnp.bfloat16)
    if name == "qwen3":  # tiny Qwen3: per-head q/k RMSNorm pre-RoPE
        return tiny_config(
            dtype=jnp.bfloat16, qk_norm=True, tie_word_embeddings=True,
        )
    if name == "gemma2":  # tiny Gemma-2: alternating windows + softcaps
        return tiny_config(
            dtype=jnp.bfloat16, hidden_act="gelu_pytorch_tanh",
            rms_norm_offset=True, scale_embeddings=True,
            tie_word_embeddings=True, attn_logit_softcap=50.0,
            final_logit_softcap=30.0, query_pre_attn_scalar=32.0,
            sliding_window=8, sliding_window_pattern=2, post_norms=True,
        )
    if name == "gemma2-2b":
        # Gemma-2-2b architecture (HF google/gemma-2-2b config.json):
        # 26 layers, head_dim 256, GeGLU, alternating 4096-window
        # attention, softcaps 50/30 — ~2.6B params, 5.2 GB bf16
        return ModelConfig(
            vocab_size=256000, hidden_size=2304, intermediate_size=9216,
            num_hidden_layers=26, num_attention_heads=8,
            num_key_value_heads=4, head_dim=256,
            max_position_embeddings=8192, rms_norm_eps=1e-6,
            rope_theta=10000.0, hidden_act="gelu_pytorch_tanh",
            rms_norm_offset=True, scale_embeddings=True,
            tie_word_embeddings=True, attn_logit_softcap=50.0,
            final_logit_softcap=30.0, query_pre_attn_scalar=256.0,
            sliding_window=4096, sliding_window_pattern=2, post_norms=True,
            dtype=jnp.bfloat16,
        )
    if name == "gemma3":  # tiny Gemma-3: 5-of-6 sliding + local rope
        return tiny_config(
            dtype=jnp.bfloat16, num_hidden_layers=6,
            hidden_act="gelu_pytorch_tanh", rms_norm_offset=True,
            scale_embeddings=True, tie_word_embeddings=True, qk_norm=True,
            post_norms=True, query_pre_attn_scalar=32.0, sliding_window=8,
            sliding_window_pattern=6, rope_theta=100000.0,
            rope_local_theta=10000.0,
        )
    if name == "qwen3moe":  # tiny Qwen3-MoE: qk-norm x top-k experts
        return tiny_config(
            dtype=jnp.bfloat16, qk_norm=True, tie_word_embeddings=True,
            num_local_experts=4, num_experts_per_tok=2,
            norm_topk_prob=False,
        )
    if name == "moe":  # tiny Mixtral-style MoE for offline smoke runs
        return tiny_config(
            dtype=jnp.bfloat16, num_local_experts=4, num_experts_per_tok=2,
        )
    if name == "moe-3b":
        # Mixtral-architecture bench preset: ~3.5B total / ~1.1B active
        # params — a single v5e holds the full expert set in bf16, decode
        # reads only the routed top-2 experts per token
        return ModelConfig(
            vocab_size=32000, hidden_size=2048, intermediate_size=4096,
            num_hidden_layers=16, num_attention_heads=16,
            num_key_value_heads=8, head_dim=128, rope_theta=500000.0,
            num_local_experts=8, num_experts_per_tok=2,
            dtype=jnp.bfloat16, tie_word_embeddings=True,
        )
    if name == "1b":
        return ModelConfig(
            vocab_size=128256, hidden_size=2048, intermediate_size=8192,
            num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
            head_dim=64, rope_theta=500000.0, dtype=jnp.bfloat16,
            tie_word_embeddings=True,
        )
    if name == "7b":
        return ModelConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=11008,
            num_hidden_layers=32, num_attention_heads=32,
            num_key_value_heads=32, head_dim=128, dtype=jnp.bfloat16,
            tie_word_embeddings=True,
        )
    raise ValueError(f"unknown random preset: {name}")


def maybe_shard(params: LlamaParams, dp: int = 1, tp: int = 1) -> LlamaParams:
    """Shard params over a (dp, tp) mesh when more than one device is asked.

    TPU-native counterpart of the reference's ``device_map="auto"``
    (generate.py:59-64) — proper tensor parallelism instead of naive
    pipeline placement.
    """
    if dp * tp <= 1:
        return params
    from layerskip_tpu.parallel.mesh import make_mesh
    from layerskip_tpu.parallel.sharding import shard_params

    return shard_params(params, make_mesh(dp=dp, tp=tp))


def _maybe_quantize(params: LlamaParams, quantize: str, dp: int, tp: int):
    """Weight-only quantization at load time (``none`` | ``int8`` | ``int4``;
    layerskip_tpu/quant.py). Single-device only from the CLI: the shard
    specs describe the dense pytree, so quantize composes with dp/tp=1."""
    if quantize in ("", "none", None):
        return params
    assert dp * tp <= 1, "--quantize requires dp=tp=1 (dense shard specs)"
    from layerskip_tpu.quant import quantize_llama_params

    bits = {"int8": 8, "int4": 4}[quantize]
    return quantize_llama_params(params, bits=bits)


def _scale_tail(params: LlamaParams, tail_eps: float, tail_from: int):
    """Scale wo/w_down of layers >= tail_from by tail_eps (bench.py's
    acceptance dial, applied post-init so CLI sweeps measure meaningful
    acceptance tradeoffs on random weights). Donated: no second 7B copy."""
    import dataclasses
    from functools import partial

    @partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
    def scale(layers, eps, tail_from):
        nl = layers.wo.shape[0] if not hasattr(layers.wo, "q") \
            else layers.wo.q.shape[0]
        factor = jnp.where(
            jnp.arange(nl) >= tail_from, eps, 1.0
        )

        def app(w):
            f = factor.reshape((nl,) + (1,) * (w.ndim - 1)).astype(w.dtype)
            return w * f

        return dataclasses.replace(
            layers, wo=app(layers.wo), w_down=app(layers.w_down)
        )

    return dataclasses.replace(
        params,
        layers=scale(params.layers, jnp.float32(tail_eps), tail_from),
    )


def load_model_and_tokenizer(
    model: str, dtype=jnp.bfloat16, seed: int = 0, dp: int = 1, tp: int = 1,
    quantize: str = "none",
) -> Tuple[LlamaParams, ModelConfig, object]:
    """``model`` is a local HF checkpoint dir or ``random:<preset>``;
    ``dp``/``tp`` > 1 shards the weights over the local device mesh;
    ``quantize`` applies weight-only int8/int4 at load."""
    if model.startswith("random:"):
        # optional query params: random:7b?tail_eps=0.0124&tail_from=8
        # scales the output projections (wo/w_down) of layers >= tail_from
        # by tail_eps — the same acceptance dial bench.py uses (tail_eps=0
        # makes the tail an identity map, so early-exit drafts are accepted
        # ~always; larger values dial acceptance down continuously). This
        # is what makes exit_layer x num_speculations sweeps on random
        # weights produce trained-model-like tradeoff structure.
        # CAVEAT (measured on-chip): the dial is INERT for post-norm
        # families (Gemma-2/3) — their post-sublayer RMSNorms renormalize
        # the scaled outputs, so a uniform wo/w_down scale preserves
        # direction and is normalized away (gemma2-2b stayed at
        # acceptance 1.0 from eps 0.012 through 0.08). Use ceiling
        # (eps=0-equivalent) measurements for those families.
        spec = model.split(":", 1)[1]
        preset, _, query = spec.partition("?")
        cfg = _preset_config(preset)
        params = init_params(jax.random.PRNGKey(seed), cfg)
        if query:
            kv = dict(p.split("=", 1) for p in query.split("&") if p)
            if "tail_eps" in kv:
                tail_from = int(kv.get(
                    "tail_from", max(cfg.num_hidden_layers // 4, 1)
                ))
                params = _scale_tail(
                    params, float(kv["tail_eps"]), tail_from
                )
        params = _maybe_quantize(params, quantize, dp, tp)
        return maybe_shard(params, dp, tp), cfg, SimpleTokenizer(cfg.vocab_size)

    if not os.path.isdir(model):
        raise FileNotFoundError(
            f"model '{model}' is not a local directory; this container has no "
            "network access — download checkpoints out-of-band or use "
            "random:<tiny|1b|7b>"
        )
    cfg = ModelConfig.from_pretrained(model, dtype=dtype)
    params = load_params(model, cfg)
    params = _maybe_quantize(params, quantize, dp, tp)
    try:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model)
    except Exception as exc:  # checkpoint without tokenizer files (e.g. one
        # exported by save_params / the train CLI) — fall back to the smoke
        # tokenizer rather than refusing to drive the model at all
        import sys

        print(
            f"[loading] no usable tokenizer in {model} ({type(exc).__name__});"
            " falling back to the byte-level smoke tokenizer",
            file=sys.stderr,
        )
        tokenizer = SimpleTokenizer(cfg.vocab_size)
    return maybe_shard(params, dp, tp), cfg, tokenizer
