"""Sharding rules: how LlamaParams / KV / activations lay out on the mesh.

Net-new relative to the reference (it has zero parallelism — SURVEY §2.11,
§5.8). Megatron-style tensor parallelism expressed as GSPMD NamedShardings:

  * column-parallel (output features on ``tp``): wq, wk, wv, w_gate, w_up
  * row-parallel (input features on ``tp``):     wo, w_down
  * vocab-parallel: embed + lm_head
  * KV cache: kv-heads on ``tp``, batch on ``dp``
  * activations: batch on ``dp``, hidden replicated

With this layout each decoder layer needs exactly one all-reduce after
attention and one after the MLP (inserted by XLA from the shardings), riding
ICI. The shared early-exit head is vocab-sharded, so draft sampling's
softmax runs as a sharded reduction too.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from layerskip_tpu.models.llama import LayerParams, LlamaParams
from layerskip_tpu.ops.kv_cache import KVCache


def layer_specs(
    fsdp: bool = False,
    attention_bias: bool = False,
    moe: bool = False,
    ep: bool = False,
    post_norms: bool = False,
    qk_norm: bool = False,
) -> LayerParams:
    """PartitionSpecs for the stacked [L, ...] layer weights.

    With ``fsdp=True`` the leading (layer) axis is additionally sharded on
    the ``fsdp`` mesh axis (ZeRO-3-style: the layer scan all-gathers one
    layer's weights per step, overlapping with the previous layer's compute).

    With ``moe=True`` the MLP weights carry an expert axis ([L, E, ...]);
    ``ep=True`` shards it on the ``ep`` mesh axis (each device holds its
    resident experts; the all-experts combine einsum reduces over ep via a
    GSPMD psum riding ICI — ops/moe.py). The per-expert feature dims stay
    tp-sharded, so ep and tp compose.
    """
    l = "fsdp" if fsdp else None
    e = "ep" if (moe and ep) else None
    if moe:
        w_gate, w_up = P(l, e, None, "tp"), P(l, e, None, "tp")
        w_down = P(l, e, "tp", None)
    else:
        w_gate, w_up = P(l, None, "tp"), P(l, None, "tp")
        w_down = P(l, "tp", None)
    return LayerParams(
        attn_norm=P(l, None),
        # wq/wk/wv stored [L, out, in]: column-parallel = shard dim 1
        wq=P(l, "tp", None),
        wk=P(l, "tp", None),
        wv=P(l, "tp", None),
        wo=P(l, "tp", None),
        mlp_norm=P(l, None),
        w_gate=w_gate,
        w_up=w_up,
        w_down=w_down,
        bq=P(l, "tp") if attention_bias else None,
        bk=P(l, "tp") if attention_bias else None,
        bv=P(l, "tp") if attention_bias else None,
        # router stays replicated: [D, E] is tiny and every device routes
        w_router=P(l, None, None) if moe else None,
        # Gemma-2 post-sublayer norms: replicated like the other norms
        post_attn_norm=P(l, None) if post_norms else None,
        post_mlp_norm=P(l, None) if post_norms else None,
        # Qwen3 per-head q/k norms ([L, Dh], tiny): replicated
        q_norm=P(l, None) if qk_norm else None,
        k_norm=P(l, None) if qk_norm else None,
    )


def param_specs(
    tie_word_embeddings: bool = False,
    fsdp: bool = False,
    attention_bias: bool = False,
    moe: bool = False,
    ep: bool = False,
    post_norms: bool = False,
    qk_norm: bool = False,
) -> LlamaParams:
    return LlamaParams(
        embed=P("tp", None),  # vocab-parallel embedding
        layers=layer_specs(fsdp, attention_bias, moe=moe, ep=ep,
                           post_norms=post_norms, qk_norm=qk_norm),
        final_norm=P(None),
        lm_head=None if tie_word_embeddings else P(None, "tp"),
    )


def kv_cache_spec() -> KVCache:
    # [L, B, S, H_kv, Dh]: batch on dp, kv heads on tp.
    return KVCache(k=P(None, "dp", None, "tp", None), v=P(None, "dp", None, "tp", None))


def activation_spec() -> P:
    # [B, T, D]
    return P("dp", None, None)


def batch_spec() -> P:
    # [B, T] token ids
    return P("dp", None)


def to_named(mesh: Mesh, spec_tree: Any) -> Any:
    """Map a pytree of PartitionSpecs to NamedShardings on ``mesh``.

    ``None`` subtrees (e.g. tied lm_head) are empty pytree nodes on both
    sides, so they pass through untouched.
    """
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def param_specs_from(
    params: LlamaParams, fsdp: bool = False, ep: bool = False
) -> LlamaParams:
    """``param_specs`` with every family flag inferred from the pytree —
    the single safe way to build specs for an arbitrary model (a flag
    threaded by hand at one call site WILL be forgotten at the next; the
    r5 families crashed cli/train's device_put exactly that way)."""
    return param_specs(
        tie_word_embeddings=params.lm_head is None,
        fsdp=fsdp,
        attention_bias=params.layers.bq is not None,
        moe=params.layers.w_router is not None,
        ep=ep,
        post_norms=params.layers.post_attn_norm is not None,
        qk_norm=params.layers.q_norm is not None,
    )


def shard_params(params: LlamaParams, mesh: Mesh) -> LlamaParams:
    """Place a (host or single-device) param pytree onto the mesh."""
    shardings = to_named(
        mesh, param_specs_from(params, ep="ep" in mesh.axis_names)
    )
    return jax.tree.map(jax.device_put, params, shardings)
