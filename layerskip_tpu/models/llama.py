"""Pure-functional Llama decoder for TPU.

TPU-native counterpart of the reference's forward-pass engine
(self_speculation/llama_model_utils.py). Where the reference manually drives
HF ``model.model.layers[i]`` modules with legacy caches, this module is a
weight pytree plus jit-compatible functions:

  * ``forward``         — all layers (reference ``forward``, llama_model_utils.py:155-209)
  * ``forward_early``   — layers ``[0, exit_layer)`` + shared norm/head
                          (reference ``forward_early``, llama_model_utils.py:213-276)
  * ``forward_remainder`` — verification pass over the speculation window
                          (reference ``forward_remainder``, llama_model_utils.py:280-391)

Layer weights are stacked along a leading ``L`` axis so a layer range is a
static slice and the layer loop is a single ``lax.scan`` (one XLA while-op,
no per-layer dispatch). The shared final norm + LM head ("shared head" —
llama_model_utils.py:271-273) is one function applied at any exit depth, with
fp32 logits for greedy-parity robustness (SURVEY §7 hard parts).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from layerskip_tpu.config import ModelConfig
from layerskip_tpu.ops.attention import gqa_attention
from layerskip_tpu.ops.kv_cache import KVCache, write_kv
from layerskip_tpu.ops.linear import QuantTensor, apply_weight, apply_weight_t
from layerskip_tpu.ops.rmsnorm import rms_norm, rms_norm_residual
from layerskip_tpu.ops.rope import apply_rope, rope_cos_sin, rope_inv_freq


@struct.dataclass
class LayerParams:
    """Per-layer weights, stacked on a leading [L] axis."""

    attn_norm: jnp.ndarray  # [L, D]
    # wq/wk/wv are stored [out, in] (HF orientation): XLA wants them K-minor
    # in decode loops; [N, K] storage = default layout, no relayout copies.
    wq: jnp.ndarray  # [L, Hq*Dh, D]
    wk: jnp.ndarray  # [L, Hkv*Dh, D]
    wv: jnp.ndarray  # [L, Hkv*Dh, D]
    wo: jnp.ndarray  # [L, Hq*Dh, D]
    mlp_norm: jnp.ndarray  # [L, D]
    # dense MLP: [L, D, F] / [L, F, D]; MoE (w_router set): an extra expert
    # axis — [L, E, D, F] / [L, E, F, D] (Mixtral-family, ops/moe.py)
    w_gate: jnp.ndarray
    w_up: jnp.ndarray
    w_down: jnp.ndarray
    # optional attention input-projection biases (Qwen2-family; None for Llama)
    bq: Optional[jnp.ndarray] = None  # [L, Hq*Dh]
    bk: Optional[jnp.ndarray] = None  # [L, Hkv*Dh]
    bv: Optional[jnp.ndarray] = None  # [L, Hkv*Dh]
    # MoE router (Mixtral-family); None for dense models
    w_router: Optional[jnp.ndarray] = None  # [L, D, E]
    # Gemma-2-family post-sublayer norms (applied to the sublayer OUTPUT
    # before the residual add); None for every other family
    post_attn_norm: Optional[jnp.ndarray] = None  # [L, D]
    post_mlp_norm: Optional[jnp.ndarray] = None  # [L, D]
    # Qwen3-family per-head q/k RMSNorm over head_dim (pre-RoPE)
    q_norm: Optional[jnp.ndarray] = None  # [L, Dh]
    k_norm: Optional[jnp.ndarray] = None  # [L, Dh]

    def slice(self, start: int, end: int) -> "LayerParams":
        return jax.tree.map(lambda x: x[start:end], self)


@struct.dataclass
class LlamaParams:
    embed: jnp.ndarray  # [V, D]
    layers: LayerParams
    final_norm: jnp.ndarray  # [D]
    lm_head: Optional[jnp.ndarray]  # [D, V]; None => tied to embed


def embed_tokens(
    params: LlamaParams, ids: jnp.ndarray, cfg: Optional[ModelConfig] = None
) -> jnp.ndarray:
    h = jnp.take(params.embed, ids, axis=0)
    if cfg is not None and cfg.scale_embeddings:
        # Gemma: embeddings scaled by sqrt(D), normalizer cast to the model
        # dtype first (HF GemmaModel.forward semantics)
        h = h * jnp.asarray(cfg.hidden_size ** 0.5, h.dtype)
    return h


def _act(cfg: ModelConfig):
    """MLP gate activation: Llama-family silu or Gemma gelu-tanh."""
    if cfg.hidden_act in ("gelu_pytorch_tanh", "gelu"):
        return lambda x: jax.nn.gelu(x, approximate=True)
    return jax.nn.silu


def _one_layer(
    cfg: ModelConfig,
    lp: LayerParams,  # single layer (no leading L axis)
    h: jnp.ndarray,  # [B, T, D]
    k_layer: jnp.ndarray,  # [B, S, Hkv, Dh]
    v_layer: jnp.ndarray,
    cos: jnp.ndarray,  # [B, T, Dh]
    sin: jnp.ndarray,
    write_pos: jnp.ndarray,  # [] or [B] int32 (== past length for this layer)
    q_positions: jnp.ndarray,  # [B, T] absolute query positions
    past_scalar=None,  # scalar past when positions are shared+contiguous
    tree_meta=None,  # multi-candidate chains (see ops/attention.gqa_attention)
    window=None,  # per-layer window override (Gemma-2 alternating pattern):
    # a traced int32 scalar, 0 = global; None = cfg.sliding_window for all
):
    b, t, d = h.shape
    hq, hkv, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    x = rms_norm(h, lp.attn_norm, cfg.rms_norm_eps, cfg.norm_offset)
    q = apply_weight_t(x, lp.wq)
    k = apply_weight_t(x, lp.wk)
    v = apply_weight_t(x, lp.wv)
    if lp.bq is not None:  # Qwen2-family QKV biases
        q = q + lp.bq
        k = k + lp.bk
        v = v + lp.bv
    q = q.reshape(b, t, hq, dh)
    k = k.reshape(b, t, hkv, dh)
    v = v.reshape(b, t, hkv, dh)
    if lp.q_norm is not None:  # Qwen3: per-head RMSNorm before RoPE
        q = rms_norm(q, lp.q_norm, cfg.rms_norm_eps, cfg.norm_offset)
        k = rms_norm(k, lp.k_norm, cfg.rms_norm_eps, cfg.norm_offset)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    k_layer, v_layer = write_kv(k_layer, v_layer, k, v, write_pos)
    attn = gqa_attention(
        q, k_layer, v_layer, q_positions, q_heads_per_kv=cfg.q_heads_per_kv,
        past_scalar=past_scalar,
        sliding_window=cfg.sliding_window if window is None else window,
        tree_meta=tree_meta,
        score_scale=(
            cfg.query_pre_attn_scalar ** -0.5
            if cfg.query_pre_attn_scalar else None
        ),
        logit_softcap=cfg.attn_logit_softcap,
    )
    attn_out = apply_weight(attn.reshape(b, t, hq * dh), lp.wo)
    if lp.post_attn_norm is not None:  # Gemma-2: norm the sublayer OUTPUT
        attn_out = rms_norm(
            attn_out, lp.post_attn_norm, cfg.rms_norm_eps, cfg.norm_offset
        )
    # fused residual-add + norm: h += attn_out and rms_norm(h) in one kernel
    # on TPU (ops/rmsnorm.py dispatch). For Gemma-2, lp.mlp_norm holds the
    # pre_feedforward norm (models/params.py mapping).
    x, h = rms_norm_residual(
        attn_out, h, lp.mlp_norm, cfg.rms_norm_eps, cfg.norm_offset,
    )
    if lp.w_router is not None:  # Mixtral-family MoE MLP (ops/moe.py)
        from layerskip_tpu.ops.moe import moe_mlp

        mlp_out, _ = moe_mlp(
            x, lp.w_router, lp.w_gate, lp.w_up, lp.w_down,
            cfg.num_experts_per_tok, norm_topk=cfg.norm_topk_prob,
        )
    else:
        gated = _act(cfg)(apply_weight(x, lp.w_gate)) * apply_weight(x, lp.w_up)
        mlp_out = apply_weight(gated, lp.w_down)
    if lp.post_mlp_norm is not None:  # Gemma-2
        mlp_out = rms_norm(
            mlp_out, lp.post_mlp_norm, cfg.rms_norm_eps, cfg.norm_offset
        )
    h = h + mlp_out
    return h, k_layer, v_layer


def run_layers(
    cfg: ModelConfig,
    layers: LayerParams,  # FULL stacked [L, ...] weights (never pre-sliced)
    h: jnp.ndarray,  # [B, T, D]
    k: jnp.ndarray,  # [Lsub, B, S, Hkv, Dh] — KV for the layer group being run
    v: jnp.ndarray,
    past_len: jnp.ndarray,  # [] or [B] int32: past length for THIS layer group
    layer_offset: int = 0,  # static: group = layers [offset, offset + Lsub)
    q_positions: Optional[jnp.ndarray] = None,  # override: [B, T] or [T]
    write_pos: Optional[jnp.ndarray] = None,  # override: KV write slot(s)
    tree_meta=None,  # multi-candidate chains (ops/attention.gqa_attention)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run a contiguous layer range via lax.scan; returns (h, k, v).

    The layer group is selected by *indexing inside the scan body* (one
    layer's weights gathered per step) rather than slicing the stack:
    a materialized slice costs a full copy of the group's weights in HBM
    (12.6 GB at 7B — an OOM), while the per-step gather is fused by XLA
    into the matmuls at roofline bandwidth.

    ``past_len`` may be per-batch-row ([B]) — each row then gets its own
    RoPE positions, attention frontier, and KV write offset (continuous
    batching; the reference is hard batch=1, eval.py:82).

    ``q_positions`` / ``write_pos`` decouple logical positions from cache
    slots (multi-candidate speculation writes several same-position chain
    tokens to distinct interleaved slots — see engine ``_tree_round``).
    """
    b, t, _ = h.shape
    n_sub = jax.tree.leaves(k)[0].shape[0]
    past_len = past_len.astype(jnp.int32)
    if q_positions is None:
        # scalar past => positions are shared and contiguous; enables the
        # flash prefill kernel (per-row pasts fall back to the masked paths)
        past_scalar = past_len if past_len.ndim == 0 else None
        q_positions = past_len[..., None] + jnp.arange(t, dtype=jnp.int32)
    else:
        past_scalar = None
        q_positions = q_positions.astype(jnp.int32)
    q_positions = jnp.broadcast_to(q_positions, (b, t))  # [B, T]
    kv_write_pos = past_len if write_pos is None else write_pos
    inv_freq = rope_inv_freq(cfg)
    cos, sin = rope_cos_sin(q_positions, inv_freq)  # [B, T, Dh]
    # Gemma-3: sliding layers use a separate RoPE base (no scaling); the
    # per-layer select below picks between the two precomputed tables
    if cfg.rope_local_theta:
        import dataclasses as _dc

        from layerskip_tpu.config import RopeScaling

        local_cfg = _dc.replace(
            cfg, rope_theta=cfg.rope_local_theta, rope_scaling=RopeScaling()
        )
        cos_l, sin_l = rope_cos_sin(q_positions, rope_inv_freq(local_cfg))
    flags = cfg.sliding_layer_flags  # per-layer sliding attention (or None)
    flags_arr = (
        jnp.asarray(flags, bool) if flags is not None else None
    )
    layer_idx = jnp.arange(layer_offset, layer_offset + n_sub, dtype=jnp.int32)

    def body(h, xs):
        i, k_layer, v_layer = xs
        lp = jax.tree.map(
            lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False),
            layers,
        )
        if flags_arr is not None:
            # Gemma-2/3 mixed attention: the gathered ABSOLUTE layer index
            # selects this layer's window (a traced scalar — one extra
            # clause on the mask rule), so the early/full layer-group
            # split preserves the per-layer layout
            sliding_i = flags_arr[i]
            win = jnp.where(
                sliding_i, jnp.int32(cfg.sliding_window), jnp.int32(0)
            )
        else:
            win = None
        if cfg.rope_local_theta and flags_arr is not None:
            sel = flags_arr[i]
            cos_i = jnp.where(sel, cos_l, cos)
            sin_i = jnp.where(sel, sin_l, sin)
        elif cfg.rope_local_theta and cfg.sliding_window:
            # uniform-sliding collapse (all layers slide): every layer
            # uses the local RoPE base
            cos_i, sin_i = cos_l, sin_l
        else:
            cos_i, sin_i = cos, sin
        h, k_layer, v_layer = _one_layer(
            cfg, lp, h, k_layer, v_layer, cos_i, sin_i, kv_write_pos,
            q_positions, past_scalar=past_scalar, tree_meta=tree_meta,
            window=win,
        )
        return h, (k_layer, v_layer)

    h, (k, v) = jax.lax.scan(body, h, (layer_idx, k, v))
    return h, k, v


def lm_logits(params: LlamaParams, cfg: ModelConfig, h: jnp.ndarray) -> jnp.ndarray:
    """Shared final norm + LM head, fp32 logits (llama_model_utils.py:271-273)."""
    h = rms_norm(h, params.final_norm, cfg.rms_norm_eps, cfg.norm_offset)
    head = params.lm_head if params.lm_head is not None else params.embed.T
    if isinstance(head, QuantTensor):
        logits = apply_weight(h.astype(jnp.float32), head)
    else:
        logits = jnp.einsum(
            "btd,dv->btv", h, head, preferred_element_type=jnp.float32
        )
    if cfg.final_logit_softcap:
        cap = jnp.float32(cfg.final_logit_softcap)
        logits = cap * jnp.tanh(logits / cap)  # Gemma-2 soft-capping
    return logits


@struct.dataclass
class ForwardResult:
    """Counterpart of reference ForwardResult (llama_model_utils.py:14-18).

    ``exit_hidden`` replaces the reference's ``exit_query_cache`` concat-grown
    list: callers preallocate a [B, W, D] buffer and this module returns the
    pre-final-norm hidden states to be stashed there.
    """

    logits: jnp.ndarray  # [B, T, V] fp32
    cache: KVCache
    hidden: jnp.ndarray  # [B, T, D] pre-final-norm hidden at the last run layer


def forward(
    params: LlamaParams,
    cfg: ModelConfig,
    ids: jnp.ndarray,  # [B, T]
    cache: KVCache,
    past_len: jnp.ndarray,  # scalar int32
) -> ForwardResult:
    """Full-model forward (reference ``forward``, llama_model_utils.py:155-209)."""
    h = embed_tokens(params, ids, cfg)
    h, k, v = run_layers(cfg, params.layers, h, cache.k, cache.v, past_len)
    return ForwardResult(
        logits=lm_logits(params, cfg, h), cache=KVCache(k=k, v=v), hidden=h
    )


def forward_early(
    params: LlamaParams,
    cfg: ModelConfig,
    ids: jnp.ndarray,  # [B, T]
    early_cache: KVCache,  # the early layer group only ([E, B, S, Hkv, Dh])
    draft_len: jnp.ndarray,  # early-layer-group past length
    exit_layer: int,  # static
) -> ForwardResult:
    """Draft pass: layers [0, exit_layer) + shared norm/head
    (reference ``forward_early``, llama_model_utils.py:213-276).

    Takes (and returns) only the *early layer group's* KV cache — the engine
    keeps the early/full groups as separate buffers so the draft loop never
    touches full-layer KV (the reference shares one legacy cache and relies on
    layer indices; see SURVEY §2.2). ``hidden`` is the exit-layer pre-norm
    activation the engine stashes into its exit-hidden buffer (reference
    exit_query_cache, llama_model_utils.py:266-269).
    """
    h = embed_tokens(params, ids, cfg)
    h, ke, ve = run_layers(
        cfg, params.layers, h, early_cache.k, early_cache.v, draft_len,
        layer_offset=0,
    )
    return ForwardResult(
        logits=lm_logits(params, cfg, h), cache=KVCache(k=ke, v=ve), hidden=h
    )


@struct.dataclass
class RemainderResult:
    """Result of the verification pass: logits over the window + both KV groups."""

    logits: jnp.ndarray  # [B, W+1, V] fp32
    early_cache: KVCache
    full_cache: KVCache


def forward_remainder(
    params: LlamaParams,
    cfg: ModelConfig,
    last_draft_token: jnp.ndarray,  # [B, 1] — the one token early layers haven't seen
    exit_hidden: jnp.ndarray,  # [B, W, D] — exit-layer activations of the window prefix
    early_cache: KVCache,  # layers [0, E)
    full_cache: KVCache,  # layers [E, L)
    draft_len: jnp.ndarray,  # early-group past length (== full_len + W)
    full_len: jnp.ndarray,  # full-group past length
    exit_layer: int,  # static
) -> RemainderResult:
    """Verification pass (reference ``forward_remainder``, llama_model_utils.py:280-391).

    Early layers process exactly one token (the final draft token) against the
    draft-length past (reference :344,350-362, num_tokens_to_generate=1 :289);
    full layers process the stitched window ``concat(exit_hidden, h_last)``
    against the full-length past (reference :363-383). Returns fp32 logits
    over the whole [B, W+1, V] window. After this call both groups' KV holds
    ``full_len + W + 1`` valid positions — the re-alignment the reference
    achieves with crop_past_key_values (SURVEY §2.3 invariant) falls out of
    the engine's single length counter here.
    """
    e = exit_layer
    # --- early layers: 1 token at position draft_len ---
    h1 = embed_tokens(params, last_draft_token, cfg)  # [B, 1, D]
    h1, ke, ve = run_layers(
        cfg, params.layers, h1, early_cache.k, early_cache.v, draft_len,
        layer_offset=0,
    )
    # --- full layers: stitched window at positions full_len .. full_len+W ---
    full_h = jnp.concatenate([exit_hidden, h1], axis=1)  # [B, W+1, D]
    full_h, kf, vf = run_layers(
        cfg, params.layers, full_h, full_cache.k, full_cache.v, full_len,
        layer_offset=e,
    )
    return RemainderResult(
        logits=lm_logits(params, cfg, full_h),
        early_cache=KVCache(k=ke, v=ve),
        full_cache=KVCache(k=kf, v=vf),
    )


def forward_split(
    params: LlamaParams,
    cfg: ModelConfig,
    ids: jnp.ndarray,  # [B, T]
    early_cache: KVCache,  # layers [0, E)
    full_cache: KVCache,  # layers [E, L)
    past_len: jnp.ndarray,  # scalar or [B] int32 (both groups aligned)
    exit_layer: int,  # static
    last_pos: Optional[jnp.ndarray] = None,  # [B]: project logits ONLY at
    # this position per row (returned as [B, 1, V]). Prefill needs one
    # row's logits; the full [B, T, V] fp32 tensor is 15.8 GB at a
    # 30k-token window with a 128k vocab — an OOM, and wasted MXU time at
    # every bucket size (XLA does not DCE the unused logit rows).
) -> RemainderResult:
    """Full-model forward over the split early/full caches (engine prefill)."""
    e = exit_layer
    h = embed_tokens(params, ids, cfg)
    h, ke, ve = run_layers(
        cfg, params.layers, h, early_cache.k, early_cache.v, past_len,
        layer_offset=0,
    )
    h, kf, vf = run_layers(
        cfg, params.layers, h, full_cache.k, full_cache.v, past_len,
        layer_offset=e,
    )
    if last_pos is not None:
        b, _, d = h.shape
        idx = jnp.broadcast_to(
            last_pos.astype(jnp.int32).reshape(b, 1, 1), (b, 1, d)
        )
        h = jnp.take_along_axis(h, idx, axis=1)  # [B, 1, D]
    return RemainderResult(
        logits=lm_logits(params, cfg, h),
        early_cache=KVCache(k=ke, v=ve),
        full_cache=KVCache(k=kf, v=vf),
    )
