"""Model and generation configuration.

TPU-native counterpart of the reference's config surface:
  * model architecture config (the reference reads HF ``config.json`` implicitly
    through ``transformers.LlamaForCausalLM``),
  * ``GenerationConfig`` (reference: self_speculation/generator_base.py:33-49).

All fields here are *static* from XLA's point of view: a given
(ModelConfig, GenerationConfig) pair compiles to one executable; changing
``exit_layer`` or ``num_speculations`` triggers (cached) recompilation, which is
the TPU-idiomatic trade for a host-sync-free hot loop.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, List, Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RopeScaling:
    """Llama-3 style RoPE frequency scaling (HF ``rope_scaling`` dict)."""

    rope_type: str = "default"  # "default" | "llama3" | "linear"
    factor: float = 1.0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position_embeddings: int = 8192

    @staticmethod
    def from_hf(d: Optional[dict]) -> "RopeScaling":
        if not d:
            return RopeScaling()
        return RopeScaling(
            rope_type=d.get("rope_type", d.get("type", "default")),
            factor=float(d.get("factor", 1.0)),
            low_freq_factor=float(d.get("low_freq_factor", 1.0)),
            high_freq_factor=float(d.get("high_freq_factor", 4.0)),
            original_max_position_embeddings=int(
                d.get("original_max_position_embeddings", 8192)
            ),
        )


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Llama-family architecture description (mirrors HF ``config.json``)."""

    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    head_dim: int = 128
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    rope_scaling: RopeScaling = dataclasses.field(default_factory=RopeScaling)
    attention_bias: bool = False  # Qwen2-family QKV biases
    qk_norm: bool = False  # Qwen3-family per-head RMSNorm on q/k (pre-RoPE)
    sliding_window: Optional[int] = None  # Mistral-family windowed attention
    # Mixtral-family mixture-of-experts MLP (0 => dense MLP)
    num_local_experts: int = 0
    num_experts_per_tok: int = 2
    # renormalize the top-k routing weights to sum 1 (Mixtral always does;
    # Qwen3-MoE makes it a config switch, norm_topk_prob)
    norm_topk_prob: bool = True
    # Gemma-family: gelu-tanh MLP activation, RMSNorm multiplies by
    # (1 + weight), and embeddings are scaled by sqrt(hidden_size)
    hidden_act: str = "silu"  # | "gelu_pytorch_tanh"
    rms_norm_offset: bool = False
    scale_embeddings: bool = False
    # Gemma-2-family: logit soft-capping (cap * tanh(x / cap)) on attention
    # scores and final logits, post-sublayer RMSNorms, a fixed query
    # pre-attention scalar replacing head_dim**-0.5, and ALTERNATING
    # sliding/global attention (layers with index % pattern == 0 use the
    # sliding window; pattern 1 = every layer, the Mistral behavior)
    attn_logit_softcap: float = 0.0
    final_logit_softcap: float = 0.0
    query_pre_attn_scalar: Optional[float] = None
    sliding_window_pattern: int = 1
    # explicit per-layer sliding flags (Gemma-3 ``layer_types``); overrides
    # the pattern rule when set. Tuple so the frozen config stays hashable.
    sliding_layers: Optional[tuple] = None
    post_norms: bool = False
    # Gemma-3: sliding layers use their own RoPE base frequency (the
    # global layers keep rope_theta + rope_scaling)
    rope_local_theta: Optional[float] = None
    tie_word_embeddings: bool = False
    bos_token_id: int = 1
    eos_token_id: Any = 2  # int or list[int] (llama3 uses a list)
    # dtype policy: weights/activations in ``dtype``; logits always fp32.
    dtype: Any = jnp.bfloat16

    @property
    def eos_token_ids(self) -> List[int]:
        e = self.eos_token_id
        if isinstance(e, (list, tuple)):
            return [int(x) for x in e]
        return [int(e)]

    @property
    def q_heads_per_kv(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    @property
    def is_moe(self) -> bool:
        return self.num_local_experts > 0

    @property
    def sliding_layer_flags(self) -> Optional[tuple]:
        """Per-layer sliding-attention flags, or None when the window (if
        any) applies to every layer. Explicit ``sliding_layers`` wins;
        otherwise ``sliding_window_pattern`` p > 1 gives the Gemma rule
        ``layer i slides iff (i + 1) % p != 0`` (p=2: even layers slide —
        Gemma-2; p=6: 5-of-6 slide — Gemma-3)."""
        if self.sliding_window is None:
            return None
        if self.sliding_layers is not None:
            flags = tuple(bool(x) for x in self.sliding_layers)
            # all-True collapses to the uniform static window (keeps the
            # Pallas kernels engaged); all-False stays explicit so the
            # per-layer rule (0 = global) disables the window everywhere
            return None if all(flags) else flags
        if self.sliding_window_pattern > 1:
            p = self.sliding_window_pattern
            return tuple(
                (i + 1) % p != 0 for i in range(self.num_hidden_layers)
            )
        return None

    @property
    def norm_offset(self) -> float:
        """RMSNorm weight offset: 1.0 for Gemma ((1 + w) convention)."""
        return 1.0 if self.rms_norm_offset else 0.0

    @staticmethod
    def from_hf_dict(d: dict, dtype=jnp.bfloat16) -> "ModelConfig":
        head_dim = d.get("head_dim") or (
            d["hidden_size"] // d["num_attention_heads"]
        )
        gemma = d.get("model_type", "").startswith("gemma")
        qwen3moe = d.get("model_type") == "qwen3_moe"
        if qwen3moe:
            # supported shape: every layer MoE with moe_intermediate_size
            # experts (the released Qwen3-MoE checkpoints' layout)
            assert int(d.get("decoder_sparse_step", 1)) <= 1 and not \
                d.get("mlp_only_layers"), \
                "qwen3_moe with dense layers interleaved is not supported"
        gemma2 = d.get("model_type") == "gemma2"
        gemma3 = d.get("model_type", "").startswith("gemma3")
        layer_types = d.get("layer_types")
        sliding_layers = (
            tuple(t == "sliding_attention" for t in layer_types)
            if layer_types else None
        )
        sliding_window = d.get("sliding_window")
        # newer transformers serializes layer_types for UNIFORM models too
        # (e.g. a re-saved Mistral: all "sliding_attention") — collapse the
        # uniform cases so the window stays static where it can (cheaper
        # masks; the kernels accept traced windows but a static 0 means
        # no window clause at all)
        if sliding_layers is not None:
            if all(sliding_layers):
                sliding_layers = None  # every layer slides: static window
            elif not any(sliding_layers):
                sliding_layers, sliding_window = None, None  # no window
        return ModelConfig(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=(
                d.get("moe_intermediate_size") or d["intermediate_size"]
            ) if qwen3moe else d["intermediate_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=d["num_attention_heads"],
            num_key_value_heads=d.get(
                "num_key_value_heads", d["num_attention_heads"]
            ),
            head_dim=head_dim,
            max_position_embeddings=d.get("max_position_embeddings", 4096),
            rms_norm_eps=d.get("rms_norm_eps", 1e-5),
            rope_theta=d.get("rope_theta", 10000.0),
            rope_scaling=RopeScaling.from_hf(d.get("rope_scaling")),
            # Qwen2 checkpoints predate the explicit flag; their model_type
            # implies QKV biases
            attention_bias=d.get(
                "attention_bias", d.get("model_type") == "qwen2"
            ),
            qk_norm=d.get("model_type", "").startswith("qwen3") or gemma3,
            sliding_window=sliding_window,
            # HF to_diff_dict omits fields equal to the class default, so
            # the fallbacks must MATCH each family's HF defaults:
            # Qwen3MoeConfig: num_experts=128, num_experts_per_tok=8,
            # norm_topk_prob=False; Mixtral: 8 / 2 / always-renormalize
            num_local_experts=d.get(
                "num_local_experts",
                d.get("num_experts", 128) if qwen3moe else 0
            ),
            num_experts_per_tok=d.get(
                "num_experts_per_tok", 8 if qwen3moe else 2
            ),
            norm_topk_prob=bool(d.get("norm_topk_prob", not qwen3moe)),
            # Gemma checkpoints may carry hidden_activation (new key) or
            # hidden_act; default to gelu-tanh for the family
            hidden_act=(
                d.get("hidden_activation") or d.get("hidden_act")
                or ("gelu_pytorch_tanh" if gemma else "silu")
            ),
            rms_norm_offset=gemma,
            scale_embeddings=gemma,
            attn_logit_softcap=float(
                d.get("attn_logit_softcapping") or 0.0
            ),
            final_logit_softcap=float(
                d.get("final_logit_softcapping") or 0.0
            ),
            query_pre_attn_scalar=(
                float(d["query_pre_attn_scalar"])
                if d.get("query_pre_attn_scalar") else None
            ),
            sliding_window_pattern=int(
                d.get("sliding_window_pattern")
                or (2 if gemma2 else 6 if gemma3 else 1)
            ),
            sliding_layers=sliding_layers,
            post_norms=gemma2 or gemma3,
            rope_local_theta=(
                float(d["rope_local_base_freq"])
                if d.get("rope_local_base_freq") else None
            ),
            tie_word_embeddings=d.get("tie_word_embeddings", gemma),
            bos_token_id=d.get("bos_token_id", 1),
            eos_token_id=d.get("eos_token_id", 2),
            dtype=dtype,
        )

    @staticmethod
    def from_json(path: str, dtype=jnp.bfloat16) -> "ModelConfig":
        with open(path) as f:
            return ModelConfig.from_hf_dict(json.load(f), dtype=dtype)

    @staticmethod
    def from_pretrained(path: str, dtype=jnp.bfloat16) -> "ModelConfig":
        """Load from a local HF checkpoint directory (``config.json``)."""
        return ModelConfig.from_json(os.path.join(path, "config.json"), dtype)


# Tiny configs for tests (avoid any network / big compiles).
def tiny_config(
    num_hidden_layers: int = 4,
    hidden_size: int = 64,
    num_attention_heads: int = 4,
    num_key_value_heads: int = 2,
    intermediate_size: int = 128,
    vocab_size: int = 256,
    max_position_embeddings: int = 256,
    dtype=jnp.float32,
    **kw,
) -> ModelConfig:
    return ModelConfig(
        vocab_size=vocab_size,
        hidden_size=hidden_size,
        intermediate_size=intermediate_size,
        num_hidden_layers=num_hidden_layers,
        num_attention_heads=num_attention_heads,
        num_key_value_heads=num_key_value_heads,
        head_dim=hidden_size // num_attention_heads,
        max_position_embeddings=max_position_embeddings,
        dtype=dtype,
        **kw,
    )


@dataclasses.dataclass
class GenerationConfig:
    """Generation knobs (reference: self_speculation/generator_base.py:33-49).

    ``max_steps``/``exit_layer``/``num_speculations`` keep the reference's
    names and defaults so CLI invocations translate one-to-one.
    """

    max_steps: int = 512
    exit_layer: int = -1
    num_speculations: int = -1
    # "autoregressive" | "self_speculative" | "prompt_lookup" (net-new:
    # n-gram drafts copied from the context, zero draft-model calls) |
    # "hybrid" (net-new: prompt-lookup drafts when the context matches,
    # early-exit model drafts otherwise — selected per round on device)
    generation_strategy: str = "autoregressive"
    pld_ngram: int = 3  # lookup match length (prompt_lookup / hybrid)
    sample: bool = True
    temperature: float = 0.6
    top_k: int = 0
    top_p: float = 0.9
    no_repeat_ngram_size: Optional[int] = None
    stop_words: Optional[List[str]] = None
    stop_token_ids: Optional[List[int]] = None
    # TPU additions (static shapes):
    max_prompt_len: int = 0  # 0 -> bucketed automatically
    max_seq_len: int = 0  # 0 -> model max_position_embeddings
    kv_quant: bool = False  # int8 KV cache (halves KV HBM traffic)
    # confidence-adaptive drafting (net-new): stop extending the draft
    # window once the drafted token's probability drops below this (0 =
    # always draft the full num_speculations window). Committed tokens are
    # invariant; low-acceptance rounds skip wasted early-layer passes.
    draft_exit_prob: float = 0.0
    # multi-candidate speculation (net-new, greedy only): k draft chains
    # branch at each round's first position (top-k of the early-exit head)
    # and verify in ONE full-model pass — nearly free on a bandwidth-bound
    # TPU decode. 0/1 = linear drafting; self_speculative only.
    spec_tree_width: int = 0
    # quantized drafter (net-new): draft the window with an int8 (8) or
    # groupwise-int4 (4) copy of layers [0, exit_layer) while verifying
    # through the full bf16 stack — greedy output stays bit-identical to
    # bf16 AR (quant.quantize_draft_params). 0 = draft with base weights.
    # self_speculative linear drafting only; no-op on quantized bases.
    draft_quant: int = 0
    # with draft_quant: also quantize the drafter's exit/LM head (True) or
    # share the base bf16 head (False). The 32k-channel head argmax is the
    # most quantization-sensitive draft op — a bf16 head costs ~13% extra
    # draft-step bandwidth but recovers most of the acceptance an int8
    # draft loses (on-chip A/B in PROGRESS.md r4). Zero extra HBM when
    # False (the head array is shared).
    draft_quant_head: bool = False
    # with draft_quant: quantize only the MLP triple (w_gate/w_up/w_down,
    # ~2/3 of draft weight bytes) and keep attention bf16. Draft-step KV
    # within a speculation window is then exact — the compounding
    # attention error is what drives draft acceptance loss (on-chip:
    # full-int8 drafts cost acceptance 0.98->0.73 at eps=0, and the exit
    # head's precision does NOT matter — see PROGRESS.md r4). Costs ~33%
    # more draft bandwidth than full-int8 drafts.
    draft_quant_mlp_only: bool = False
