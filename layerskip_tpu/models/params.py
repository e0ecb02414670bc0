"""Weight initialisation and HF checkpoint loading.

TPU-native counterpart of the reference's model loading
(``AutoModelForCausalLM.from_pretrained(use_safetensors=True,
torch_dtype=float16, device_map="auto")`` — generate.py:54-67). Here:
safetensors shards are read host-side and assembled into the stacked-layer
``LlamaParams`` pytree with a dtype policy (bf16 on TPU by default).
"""

from __future__ import annotations

import glob
import os
import re
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from layerskip_tpu.config import ModelConfig
from layerskip_tpu.models.llama import LayerParams, LlamaParams


def init_params(rng: jax.Array, cfg: ModelConfig) -> LlamaParams:
    """Random init (normal(0, 0.02), HF default) — used by tests/benchmarks."""
    d, f, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    hq, hkv, dh, l = (
        cfg.num_attention_heads,
        cfg.num_key_value_heads,
        cfg.head_dim,
        cfg.num_hidden_layers,
    )
    keys = jax.random.split(rng, 9)

    def nrm(key, shape):
        # sample directly in the target dtype: avoids fp32 transients that
        # double peak HBM during 7B-scale init (bf16 normal is exact enough
        # for random-weight benchmarking)
        sample_dtype = cfg.dtype if jnp.issubdtype(cfg.dtype, jnp.floating) else jnp.float32
        return jax.random.normal(key, shape, sample_dtype) * jnp.asarray(0.02, sample_dtype)

    # MoE (Mixtral-family): expert axis on the MLP weights + a router
    mlp_lead = (l, cfg.num_local_experts) if cfg.is_moe else (l,)
    # Gemma stores norm weights as deltas around 1 ((1+w) convention): the
    # identity init is zeros there, ones elsewhere
    norm_init = jnp.zeros if cfg.rms_norm_offset else jnp.ones
    layers = LayerParams(
        attn_norm=norm_init((l, d), cfg.dtype),
        wq=nrm(keys[0], (l, hq * dh, d)),
        wk=nrm(keys[1], (l, hkv * dh, d)),
        wv=nrm(keys[2], (l, hkv * dh, d)),
        wo=nrm(keys[3], (l, hq * dh, d)),
        mlp_norm=norm_init((l, d), cfg.dtype),
        w_gate=nrm(keys[4], (*mlp_lead, d, f)),
        w_up=nrm(keys[5], (*mlp_lead, d, f)),
        w_down=nrm(keys[6], (*mlp_lead, f, d)),
        bq=jnp.zeros((l, hq * dh), cfg.dtype) if cfg.attention_bias else None,
        bk=jnp.zeros((l, hkv * dh), cfg.dtype) if cfg.attention_bias else None,
        bv=jnp.zeros((l, hkv * dh), cfg.dtype) if cfg.attention_bias else None,
        w_router=(
            nrm(keys[8], (l, d, cfg.num_local_experts)) if cfg.is_moe else None
        ),
        post_attn_norm=(
            norm_init((l, d), cfg.dtype) if cfg.post_norms else None
        ),
        post_mlp_norm=(
            norm_init((l, d), cfg.dtype) if cfg.post_norms else None
        ),
        q_norm=norm_init((l, dh), cfg.dtype) if cfg.qk_norm else None,
        k_norm=norm_init((l, dh), cfg.dtype) if cfg.qk_norm else None,
    )
    embed = nrm(keys[7], (v, d))
    lm_head = None if cfg.tie_word_embeddings else jnp.transpose(embed)
    return LlamaParams(
        embed=embed, layers=layers, final_norm=norm_init((d,), cfg.dtype),
        lm_head=lm_head,
    )


# ---------------------------------------------------------------------------
# HF name mapping.
#
# HF nn.Linear stores weights [out, in]. We keep that orientation for the
# attention input projections (wq/wk/wv — layout-friendly for TPU decode, see
# models/llama.py) and transpose the rest to [in, out] so those forwards are
# plain ``x @ w``.
# ---------------------------------------------------------------------------

_LAYER_KEY_MAP = {
    "input_layernorm.weight": ("attn_norm", False),
    # q/k/v keep HF's [out, in] orientation (no transpose) — see LayerParams
    "self_attn.q_proj.weight": ("wq", False),
    "self_attn.k_proj.weight": ("wk", False),
    "self_attn.v_proj.weight": ("wv", False),
    "self_attn.q_proj.bias": ("bq", False),
    "self_attn.k_proj.bias": ("bk", False),
    "self_attn.v_proj.bias": ("bv", False),
    "self_attn.o_proj.weight": ("wo", True),
    # Qwen3-family per-head q/k norms ([Dh]; absent for other families)
    "self_attn.q_norm.weight": ("q_norm", False),
    "self_attn.k_norm.weight": ("k_norm", False),
    "post_attention_layernorm.weight": ("mlp_norm", False),
    "mlp.gate_proj.weight": ("w_gate", True),
    "mlp.up_proj.weight": ("w_up", True),
    "mlp.down_proj.weight": ("w_down", True),
}


# HF Mixtral expert naming: block_sparse_moe.experts.{e}.{w1,w2,w3}.weight
# (w1 = gate [F, D], w3 = up [F, D], w2 = down [D, F] — all [out, in],
# transposed into our [in, out] einsum orientation)
_EXPERT_PAT = re.compile(r"^block_sparse_moe\.experts\.(\d+)\.(w[123])\.weight$")
_EXPERT_FIELD = {"w1": "w_gate", "w3": "w_up", "w2": "w_down"}
# Qwen3-MoE naming: mlp.gate (router) + mlp.experts.{e}.{gate,up,down}_proj
_QWEN_EXPERT_PAT = re.compile(
    r"^mlp\.experts\.(\d+)\.(gate_proj|up_proj|down_proj)\.weight$"
)
_QWEN_EXPERT_FIELD = {
    "gate_proj": "w_gate", "up_proj": "w_up", "down_proj": "w_down",
}


def params_from_flat_dict(
    tensors: Dict[str, np.ndarray], cfg: ModelConfig
) -> LlamaParams:
    """Assemble LlamaParams from a flat HF-style name->array dict (fp32/np).

    Handles the Llama/Qwen2/Mistral dense naming and the Mixtral MoE naming
    (``block_sparse_moe.gate`` router + per-expert ``w1/w2/w3``).
    """
    l = cfg.num_hidden_layers
    n_exp = cfg.num_local_experts
    key_map = dict(_LAYER_KEY_MAP)
    if cfg.post_norms:
        # Gemma-2 block has FOUR norms: input_layernorm (attn_norm),
        # post_attention_layernorm (a true post-norm), pre_feedforward
        # (our mlp_norm slot) and post_feedforward
        key_map["post_attention_layernorm.weight"] = ("post_attn_norm", False)
        key_map["pre_feedforward_layernorm.weight"] = ("mlp_norm", False)
        key_map["post_feedforward_layernorm.weight"] = ("post_mlp_norm", False)
    layer_arrays: Dict[str, list] = {v[0]: [None] * l for v in key_map.values()}
    layer_arrays.setdefault("post_attn_norm", [None] * l)
    layer_arrays.setdefault("post_mlp_norm", [None] * l)
    layer_arrays["w_router"] = [None] * l
    if cfg.is_moe:
        for f in ("w_gate", "w_up", "w_down"):
            layer_arrays[f] = [[None] * n_exp for _ in range(l)]
    embed = final_norm = lm_head = None
    pat = re.compile(r"^model\.layers\.(\d+)\.(.+)$")
    for name, arr in tensors.items():
        m = pat.match(name)
        if m:
            i, sub = int(m.group(1)), m.group(2)
            if sub in key_map and not (
                cfg.is_moe and sub.startswith("mlp.")
            ):
                field, transpose = key_map[sub]
                layer_arrays[field][i] = arr.T if transpose else arr
            elif sub == "self_attn.qkv_proj.weight":
                # Phi-3 fused QKV [(Hq+2Hkv)*Dh, D]: split by output rows
                # (HF Phi3Attention chunks q, then k, then v)
                nq = cfg.num_attention_heads * cfg.head_dim
                nkv = cfg.num_key_value_heads * cfg.head_dim
                layer_arrays["wq"][i] = arr[:nq]
                layer_arrays["wk"][i] = arr[nq:nq + nkv]
                layer_arrays["wv"][i] = arr[nq + nkv:nq + 2 * nkv]
            elif sub == "mlp.gate_up_proj.weight":
                # Phi-3 fused gate/up [2F, D]: first F rows gate, rest up
                f = cfg.intermediate_size
                layer_arrays["w_gate"][i] = arr[:f].T
                layer_arrays["w_up"][i] = arr[f:].T
            elif sub in ("block_sparse_moe.gate.weight", "mlp.gate.weight"):
                layer_arrays["w_router"][i] = arr.T  # [E, D] -> [D, E]
            else:
                me = _EXPERT_PAT.match(sub)
                mq = _QWEN_EXPERT_PAT.match(sub)
                if me:
                    e, w = int(me.group(1)), me.group(2)
                    layer_arrays[_EXPERT_FIELD[w]][i][e] = arr.T
                elif mq:
                    e, w = int(mq.group(1)), mq.group(2)
                    layer_arrays[_QWEN_EXPERT_FIELD[w]][i][e] = arr.T
        elif name == "model.embed_tokens.weight":
            embed = arr
        elif name == "model.norm.weight":
            final_norm = arr
        elif name == "lm_head.weight":
            lm_head = arr.T

    def stack(field):
        mats = layer_arrays[field]
        if field in ("bq", "bk", "bv", "post_attn_norm", "post_mlp_norm",
                     "q_norm", "k_norm") \
                and all(m is None for m in mats):
            return None  # family-optional fields absent from the checkpoint
        if field == "w_router" and all(m is None for m in mats):
            return None  # dense-MLP families: no router
        if isinstance(mats[0], list):  # MoE: [l][e] -> stacked [L, E, ...]
            assert all(
                m is not None for row in mats for m in row
            ), f"missing experts for {field}"
            return jnp.asarray(
                np.stack([np.stack(row) for row in mats]), cfg.dtype
            )
        assert all(m is not None for m in mats), f"missing layers for {field}"
        return jnp.asarray(np.stack(mats), cfg.dtype)

    layers = LayerParams(**{f: stack(f) for f in layer_arrays})
    assert embed is not None and final_norm is not None
    if lm_head is None and not cfg.tie_word_embeddings:
        lm_head = embed.T  # some checkpoints tie implicitly
    return LlamaParams(
        embed=jnp.asarray(embed, cfg.dtype),
        layers=layers,
        final_norm=jnp.asarray(final_norm, cfg.dtype),
        lm_head=None if cfg.tie_word_embeddings else jnp.asarray(lm_head, cfg.dtype),
    )


def load_params(model_dir: str, cfg: ModelConfig) -> LlamaParams:
    """Load from a local HF checkpoint directory of ``*.safetensors`` shards.

    Uses the native mmap+thread-pool reader (layerskip_tpu/native.py) when
    the C++ library is available, falling back to the Python safetensors
    package otherwise.
    """
    from layerskip_tpu.native import load_shards

    shards = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if not shards:
        raise FileNotFoundError(f"no safetensors shards under {model_dir}")
    tensors: Dict[str, np.ndarray] = load_shards(shards)
    return params_from_flat_dict(tensors, cfg)


def save_params(params: LlamaParams, model_dir: str, cfg: ModelConfig) -> str:
    """Write LlamaParams as an HF-compatible safetensors checkpoint + config.

    Inverse of ``load_params`` (same name mapping / [out, in] transposition),
    so checkpoints produced by the training recipe round-trip through HF
    tooling and back into this framework. Always writes fp32 host arrays.
    """
    import json

    from safetensors.numpy import save_file

    os.makedirs(model_dir, exist_ok=True)
    tensors: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": np.asarray(params.embed, np.float32),
        "model.norm.weight": np.asarray(params.final_norm, np.float32),
    }
    if params.lm_head is not None:
        tensors["lm_head.weight"] = np.ascontiguousarray(
            np.asarray(params.lm_head, np.float32).T
        )
    save_map = dict(_LAYER_KEY_MAP)
    if cfg.post_norms:
        save_map["post_attention_layernorm.weight"] = ("post_attn_norm", False)
        save_map["pre_feedforward_layernorm.weight"] = ("mlp_norm", False)
        save_map["post_feedforward_layernorm.weight"] = ("post_mlp_norm", False)
    inv_map = {field: (hf, tr) for hf, (field, tr) in save_map.items()}
    qwen_moe = cfg.is_moe and cfg.qk_norm  # Qwen3-MoE vs Mixtral naming
    inv_qwen = {f: w for w, f in _QWEN_EXPERT_FIELD.items()}
    moe = cfg.is_moe
    inv_expert = {f: w for w, f in _EXPERT_FIELD.items()}
    for i in range(cfg.num_hidden_layers):
        for field, (hf_name, transpose) in inv_map.items():
            if moe and field in ("w_gate", "w_up", "w_down"):
                continue  # exported under the Mixtral expert naming below
            stacked = getattr(params.layers, field)
            if stacked is None:  # e.g. Llama has no attention biases
                continue
            w = np.asarray(stacked[i], np.float32)
            tensors[f"model.layers.{i}.{hf_name}"] = (
                np.ascontiguousarray(w.T) if transpose else w
            )
        if moe:
            gate = np.asarray(params.layers.w_router[i], np.float32)
            gate_key = "mlp.gate.weight" if qwen_moe \
                else "block_sparse_moe.gate.weight"
            tensors[f"model.layers.{i}.{gate_key}"] = (
                np.ascontiguousarray(gate.T)
            )
            for field in ("w_gate", "w_up", "w_down"):
                stacked = getattr(params.layers, field)
                for e in range(cfg.num_local_experts):
                    w = np.asarray(stacked[i, e], np.float32)
                    key = (
                        f"mlp.experts.{e}.{inv_qwen[field]}.weight"
                        if qwen_moe else
                        f"block_sparse_moe.experts.{e}."
                        f"{inv_expert[field]}.weight"
                    )
                    tensors[f"model.layers.{i}.{key}"] = (
                        np.ascontiguousarray(w.T)
                    )
    path = os.path.join(model_dir, "model.safetensors")
    save_file(tensors, path)
    # model_type/architectures: infer the HF family from the distinguishing
    # architecture features so a re-load (here or in HF) reconstructs the
    # same attention/RoPE behavior. Qwen2 is the only family with QKV
    # biases; Mistral the only one with a sliding window.
    if cfg.is_moe and cfg.qk_norm:
        model_type, arch = "qwen3_moe", "Qwen3MoeForCausalLM"
    elif cfg.is_moe:
        model_type, arch = "mixtral", "MixtralForCausalLM"
    elif cfg.post_norms and cfg.qk_norm:
        model_type, arch = "gemma3_text", "Gemma3ForCausalLM"
    elif cfg.qk_norm:
        model_type, arch = "qwen3", "Qwen3ForCausalLM"
    elif cfg.post_norms:
        model_type, arch = "gemma2", "Gemma2ForCausalLM"
    elif cfg.rms_norm_offset:
        model_type, arch = "gemma", "GemmaForCausalLM"
    elif cfg.attention_bias:
        model_type, arch = "qwen2", "Qwen2ForCausalLM"
    elif cfg.sliding_window is not None:
        model_type, arch = "mistral", "MistralForCausalLM"
    else:
        model_type, arch = "llama", "LlamaForCausalLM"
    config_json = {
        "model_type": model_type,
        "architectures": [arch],
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "num_key_value_heads": cfg.num_key_value_heads,
        "head_dim": cfg.head_dim,
        "max_position_embeddings": cfg.max_position_embeddings,
        "rms_norm_eps": cfg.rms_norm_eps,
        "rope_theta": cfg.rope_theta,
        "attention_bias": cfg.attention_bias,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "bos_token_id": cfg.bos_token_id,
        "eos_token_id": cfg.eos_token_id,
    }
    if cfg.sliding_window is not None:
        config_json["sliding_window"] = cfg.sliding_window
    if cfg.attn_logit_softcap:
        config_json["attn_logit_softcapping"] = cfg.attn_logit_softcap
    if cfg.final_logit_softcap:
        config_json["final_logit_softcapping"] = cfg.final_logit_softcap
    if cfg.query_pre_attn_scalar:
        config_json["query_pre_attn_scalar"] = cfg.query_pre_attn_scalar
    if cfg.sliding_window_pattern > 1:
        config_json["sliding_window_pattern"] = cfg.sliding_window_pattern
    if cfg.sliding_layers is not None:
        config_json["layer_types"] = [
            "sliding_attention" if f else "full_attention"
            for f in cfg.sliding_layers
        ]
    if cfg.rope_local_theta:
        config_json["rope_local_base_freq"] = cfg.rope_local_theta
    if cfg.is_moe:
        config_json["num_local_experts"] = cfg.num_local_experts
        config_json["num_experts"] = cfg.num_local_experts
        config_json["num_experts_per_tok"] = cfg.num_experts_per_tok
        config_json["norm_topk_prob"] = cfg.norm_topk_prob
        if cfg.qk_norm:  # qwen3_moe: experts sized moe_intermediate_size
            config_json["moe_intermediate_size"] = cfg.intermediate_size
    if cfg.hidden_act != "silu":
        config_json["hidden_activation"] = cfg.hidden_act
        config_json["hidden_act"] = cfg.hidden_act
    if cfg.rope_scaling.rope_type != "default":
        config_json["rope_scaling"] = {
            "rope_type": cfg.rope_scaling.rope_type,
            "factor": cfg.rope_scaling.factor,
            "low_freq_factor": cfg.rope_scaling.low_freq_factor,
            "high_freq_factor": cfg.rope_scaling.high_freq_factor,
            "original_max_position_embeddings": (
                cfg.rope_scaling.original_max_position_embeddings
            ),
        }
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(config_json, f, indent=2)
    return path


def params_from_torch_state_dict(state_dict, cfg: ModelConfig) -> LlamaParams:
    """Convert a torch ``LlamaForCausalLM.state_dict()`` (parity tests)."""
    tensors = {
        k: v.detach().to("cpu").float().numpy() for k, v in state_dict.items()
    }
    return params_from_flat_dict(tensors, cfg)
