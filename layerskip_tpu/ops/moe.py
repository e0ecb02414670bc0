"""Mixture-of-Experts MLP (Mixtral-family ``block_sparse_moe``).

Net-new relative to the reference (LayerSkip is dense-Llama only;
/root/reference has no MoE support): the Mixtral router + expert FFNs as a
drop-in replacement for the dense MLP in ``models/llama.py::_one_layer``.
Routing semantics mirror HF ``MixtralSparseMoeBlock`` — router logits in the
model dtype, fp32 softmax over all experts, top-k, renormalize the selected
weights — so logit parity against torch holds (tests/test_moe.py).

TPU-native design — two *exact* (never token-dropping) execution paths:

* ``dense``-combine: every expert's FFN is evaluated for every token and
  combined with the (mostly-zero) router weights. One einsum chain over a
  static ``[E]`` dim: shards over the ``ep`` mesh axis via GSPMD (each
  device computes its resident experts' partial contributions; the combine
  contraction becomes a psum over ``ep`` riding ICI). The right path for
  short decode/verify windows — with few tokens, reading expert weights
  from HBM dominates either way — and for ep-sharded meshes.

* ``grouped`` (ragged): tokens sorted by expert id, per-expert contiguous
  row segments multiplied via ``jax.lax.ragged_dot`` (MegaBlocks-style
  grouped matmul: k/E of the dense path's FLOPs), then unsorted and
  weight-combined. The right path for long prefill on one device.

Capacity-factor dispatch (GShard-style) is deliberately NOT used: it drops
tokens on expert overflow, which would break this framework's exactness bar
(greedy spec == greedy AR == HF logits, SURVEY §4).
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

from layerskip_tpu.ops.linear import QuantTensor

# Below this many tokens the dense-combine path wins; above it the grouped
# ragged_dot path's (k/E)x FLOP saving overcomes its sort/scatter overhead.
# Measured on the v5e at Mixtral-ish shapes (E=8, D=2048, F=4096, top-2),
# dense vs grouped ms: N=256: 2.4/3.2, N=1024: 6.5/10.4, N=4096: 33.8/18.6
# — crossover sits between 1k and 4k tokens.
_RAGGED_MIN_TOKENS = 2048


def _dense(w) -> jnp.ndarray:
    """Expert weights may be int8 QuantTensors; einsum paths dequantize and
    let XLA fuse the scale multiply into the dot."""
    if isinstance(w, QuantTensor):
        return w.dequantize()
    return w


def route(
    x2: jnp.ndarray,  # [N, D]
    w_router: jnp.ndarray,  # [D, E]
    k: int,
    norm_topk: bool = True,  # Mixtral renormalizes; Qwen3-MoE's
    # norm_topk_prob=False keeps the raw softmax'd top-k weights
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Mixtral top-k routing: (weights [N, k], expert ids [N, k], aux scalar).

    ``aux`` is the Switch/Mixtral load-balancing term for THIS layer,
    ``E * sum_e f_e * P_e`` (f_e = fraction of (token, slot) assignments to
    expert e, P_e = mean router probability of e). The training recipe
    averages it across layers (HF concatenates all layers' logits into one
    global estimate instead — a documented, minor deviation).
    """
    e = w_router.shape[-1]
    logits = x2 @ w_router  # model dtype, like HF's nn.Linear gate
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)  # [N, E]
    topv, topi = jax.lax.top_k(probs, k)
    if norm_topk:
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    # load-balance aux: one-hot assignment fractions x mean router probs
    assign = jnp.sum(jax.nn.one_hot(topi, e, dtype=jnp.float32), axis=1)  # [N, E]
    f = jnp.mean(assign, axis=0)  # [E], sums to k
    p = jnp.mean(probs, axis=0)  # [E]
    aux = jnp.float32(e) * jnp.sum(f / k * p)
    return topv, topi, aux


def _expert_mm(xt, w, e):
    """``xt [1, D] @ w[e]`` where ``w`` is stacked [E, D, F] (dense or int8).

    The gather stays adjacent to the matmul so XLA fuses the dynamic-slice
    into the dot — the same roofline-bandwidth pattern as the per-layer
    weight gather in models/llama.py::run_layers. For int8 the per-channel
    scale is applied AFTER the contraction (see ops/linear.py::_qdot): the
    dot's operand is then gather+convert only, and the int8 expert bytes
    stream from HBM once."""
    if isinstance(w, QuantTensor):
        from layerskip_tpu.ops.linear import _qdot

        q = jax.lax.dynamic_index_in_dim(w.q, e, 0, keepdims=False)
        s = jax.lax.dynamic_index_in_dim(w.scale, e, 0, keepdims=False)
        return _qdot(xt, QuantTensor(q=q, scale=s, k_last=w.k_last,
                                     group=w.group))
    we = jax.lax.dynamic_index_in_dim(w, e, 0, keepdims=False)
    return xt @ we


def _moe_few(x2, topv, topi, w_gate, w_up, w_down, k: int):
    """Per-assignment expert-gather scan: reads only the ROUTED experts.

    Decode reads weights once per step, so with N*k < E the dense-combine
    path wastes HBM bandwidth on never-routed experts (at Mixtral shapes,
    8/2 = 4x the bytes). Scanning the N*k (token, slot) assignments and
    gathering each expert's weights on demand reads exactly the routed
    bytes — the decode-side analogue of MegaBlocks' prefill sparsity.
    """
    n = x2.shape[0]
    flat_e = topi.reshape(n * k)
    flat_w = topv.reshape(n * k).astype(x2.dtype)

    # The (token, slot) loop is UNROLLED (n*k < E is small and static): a
    # nested lax.scan here puts the expert gather behind an extra while-loop
    # boundary, which blocks XLA from fusing the dynamic-slice into the
    # matmuls (measured: 2.5x slower than even the all-experts path).
    out = jnp.zeros_like(x2)
    for j in range(n * k):
        t = j // k
        xt = x2[t:t + 1]  # [1, D], static index
        e = flat_e[j]
        g = _expert_mm(xt, w_gate, e)
        u = _expert_mm(xt, w_up, e)
        y = _expert_mm(jax.nn.silu(g) * u, w_down, e)  # [1, D]
        out = out.at[t].add(flat_w[j] * y[0])
    return out


def _moe_dense(x2, topv, topi, w_gate, w_up, w_down, n_experts: int):
    """All-experts einsum combine: exact, [E]-sharded under GSPMD (ep)."""
    dt = x2.dtype
    # combine weights scattered over the full expert axis: [N, E]
    cw = jnp.sum(
        jax.nn.one_hot(topi, n_experts, dtype=jnp.float32)
        * topv[..., None].astype(jnp.float32),
        axis=1,
    ).astype(dt)
    g = jnp.einsum("nd,edf->nef", x2, _dense(w_gate))
    u = jnp.einsum("nd,edf->nef", x2, _dense(w_up))
    a = jax.nn.silu(g) * u * cw[:, :, None]  # [N, E, F] * [N, E, 1]
    return jnp.einsum("nef,efd->nd", a, _dense(w_down))


def _moe_grouped(x2, topv, topi, w_gate, w_up, w_down, n_experts: int, k: int):
    """Sort-by-expert + ragged_dot grouped matmuls: exact, k/E of dense FLOPs."""
    n = x2.shape[0]
    flat_e = topi.reshape(n * k)  # expert id per (token, slot)
    order = jnp.argsort(flat_e)  # stable: preserves token order within expert
    tok = order // k  # source token per sorted row
    xs = jnp.take(x2, tok, axis=0)  # [N*k, D], expert-contiguous
    group_sizes = jnp.bincount(flat_e, length=n_experts).astype(jnp.int32)
    g = jax.lax.ragged_dot(xs, _dense(w_gate), group_sizes)
    u = jax.lax.ragged_dot(xs, _dense(w_up), group_sizes)
    a = jax.nn.silu(g) * u
    y = jax.lax.ragged_dot(a, _dense(w_down), group_sizes)  # [N*k, D]
    w_sorted = jnp.take(topv.reshape(n * k), order).astype(x2.dtype)
    out = jnp.zeros_like(x2)
    return out.at[tok].add(y * w_sorted[:, None])


def moe_mlp(
    x: jnp.ndarray,  # [B, T, D]
    w_router: jnp.ndarray,  # [D, E]
    w_gate,  # [E, D, F] (dense or QuantTensor)
    w_up,  # [E, D, F]
    w_down,  # [E, F, D]
    num_experts_per_tok: int,
    norm_topk: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MoE feed-forward. Returns (output [B, T, D], load-balance aux scalar).

    Path selection is static (token count is a trace-time constant):
    grouped ragged_dot for big token counts, dense-combine otherwise.
    ``LAYERSKIP_MOE_IMPL=dense|grouped`` forces one path (tests/benchmarks).
    """
    b, t, d = x.shape
    n_experts = w_router.shape[-1]
    x2 = x.reshape(b * t, d)
    topv, topi, aux = route(x2, w_router, num_experts_per_tok, norm_topk)

    impl = os.environ.get("LAYERSKIP_MOE_IMPL", "auto")
    n, k = b * t, num_experts_per_tok
    if impl == "auto":
        # few:    decode/draft steps — read only the routed experts' bytes
        # grouped: long prefill — k/E of the dense FLOPs via ragged_dot
        # dense:  in between, and the ep-sharded combine
        impl = (
            "few" if n * k < n_experts
            else "grouped" if n >= _RAGGED_MIN_TOKENS
            else "dense"
        )
    if impl == "few":
        out = _moe_few(x2, topv, topi, w_gate, w_up, w_down, k)
    elif impl == "grouped":
        out = _moe_grouped(x2, topv, topi, w_gate, w_up, w_down, n_experts, k)
    else:
        out = _moe_dense(x2, topv, topi, w_gate, w_up, w_down, n_experts)
    return out.reshape(b, t, d).astype(x.dtype), aux
