"""Weight-only int8 quantization for LlamaParams.

No counterpart in the reference (fp16 torch end to end); this is the
TPU-native pillar for memory-bandwidth-bound decode: single-stream decoding
reads every weight byte once per token, so int8 weights halve time/token
versus bf16 at equal acceptance.

``QuantTensor`` is a pytree leaf-pair (int8 values + per-output-channel fp32
scales) that drops into ``LlamaParams`` wherever a dense [.., K, N] weight
lived — including the stacked [L, K, N] layer weights. The model applies it
through ``apply_weight`` (models/llama.py), which routes to the Pallas
dequant-matmul kernel on TPU and a dequantize-then-matmul fallback
elsewhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from layerskip_tpu.models.llama import LayerParams, LlamaParams
from layerskip_tpu.ops.linear import QuantTensor, pack_int4


def quantize_tensor(
    w: jnp.ndarray, k_last: bool = False, bits: int = 8, group: int = 0
) -> QuantTensor:
    """Symmetric int8 (per-output-channel) or int4 (K-groupwise).

    ``k_last=False``: w is [..., K, N] (contraction axis -2);
    ``k_last=True``:  w is [..., N, K] (HF orientation — wq/wk/wv).
    Works on single and stacked [L, ...] weights alike.

    ``bits=4`` quantizes to nibble-packed uint8 (two int4 per HBM byte —
    see ops/linear.py::pack_int4 for why not jnp.int4: S4 arrays cannot
    cross a jit boundary on the axon TPU backend) with one fp32 scale per
    (``group``-long K slice, output channel) — per-channel int4 loses too
    much signal at 15 levels. ``group`` defaults to 128 and clamps to K for
    small test models; K must divide by it.
    """
    assert bits in (8, 4)
    wf = w.astype(jnp.float32)
    if bits == 8:
        assert group == 0, "int8 is per-output-channel; group applies to int4"
        if k_last:
            amax = jnp.max(jnp.abs(wf), axis=-1)  # [..., N]
            scale = jnp.maximum(amax / 127.0, 1e-8)
            q = jnp.clip(jnp.round(wf / scale[..., :, None]), -127, 127).astype(jnp.int8)
            return QuantTensor(q=q, scale=scale, k_last=True)
        amax = jnp.max(jnp.abs(wf), axis=-2)  # [..., N]
        scale = jnp.maximum(amax / 127.0, 1e-8)
        q = jnp.clip(jnp.round(wf / scale[..., None, :]), -127, 127).astype(jnp.int8)
        return QuantTensor(q=q, scale=scale)
    k = wf.shape[-1] if k_last else wf.shape[-2]
    g = min(group or 128, k)
    assert k % g == 0, f"K={k} not divisible by group={g}"
    if k_last:  # [..., N, K] -> groups [..., N, K/G, G]
        *lead, n, _ = wf.shape
        wg = wf.reshape(*lead, n, k // g, g)
        scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=-1) / 7.0, 1e-8)
        q = jnp.clip(jnp.round(wg / scale[..., None]), -7, 7)
        return QuantTensor(
            q=pack_int4(q.reshape(*lead, n, k).astype(jnp.int8), k_last=True),
            scale=scale, k_last=True, group=g,
        )
    *lead, _, n = wf.shape
    wg = wf.reshape(*lead, k // g, g, n)  # groups along K
    scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=-2) / 7.0, 1e-8)
    q = jnp.clip(jnp.round(wg / scale[..., :, None, :]), -7, 7)
    return QuantTensor(
        q=pack_int4(q.reshape(*lead, k, n).astype(jnp.int8)), scale=scale,
        group=g,
    )


_QUANT_FIELDS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
_K_LAST_FIELDS = ("wq", "wk", "wv")  # stored [out, in] — see models/llama.py
# drafter fidelity variant (GenerationConfig.draft_quant_mlp_only): quantize
# only the MLP triple (~2/3 of layer weight bytes) and keep attention bf16 —
# draft-step KV entries within a speculation window are then exact, so the
# compounding attention error that drives draft/verify divergence is gone.
_MLP_FIELDS = ("w_gate", "w_up", "w_down")


def quantize_llama_params(
    params: LlamaParams, quantize_lm_head: bool = False,
    bits: int = 8, group: int = 0,
) -> LlamaParams:
    """Quantize the seven per-layer matmul weights (norms/embeddings stay
    bf16; the shared LM head only if ``quantize_lm_head`` — keeping it
    full-precision preserves greedy argmax parity at the exits).
    ``bits=4`` selects groupwise int4 (see quantize_tensor)."""
    layer_kw = {}
    for f in LayerParams.__dataclass_fields__:
        w = getattr(params.layers, f)
        layer_kw[f] = (
            quantize_tensor(w, k_last=f in _K_LAST_FIELDS, bits=bits,
                            group=group)
            if f in _QUANT_FIELDS else w
        )
    lm_head = params.lm_head
    if quantize_lm_head and lm_head is not None:
        lm_head = quantize_tensor(lm_head, bits=bits, group=group)
    return LlamaParams(
        embed=params.embed,
        layers=LayerParams(**layer_kw),
        final_norm=params.final_norm,
        lm_head=lm_head,
    )


def quantize_draft_params(
    params: LlamaParams, exit_layer: int, bits: int = 8, group: int = 0,
    quantize_head: bool = True, fields: tuple = _QUANT_FIELDS,
) -> LlamaParams:
    """Quantized copy of ONLY the draft layer group [0, exit_layer).

    Self-speculative rounds spend most of their time in the W early-exit
    draft passes (at acceptance ~0.8 and W=6: six E-layer draft steps per
    one verify). Quantizing just that group ~halves draft-step weight
    traffic for +E/L x bits/16 of the model's footprint (int8 at 7B E=8:
    +1.6 GB), while the verify pass re-runs the SAME window through the
    full bf16 stack (``forward_split``) — committed tokens are judged by
    the exact bf16 model, so greedy output is bit-identical to bf16 AR
    and sampling stays distribution-correct (rejection sampling is exact
    for ANY draft distribution). No reference counterpart (the reference
    drafts and verifies in one fp16 model, self_speculation_generator.py).

    Embeddings and norms are SHARED with ``params`` (same device arrays,
    zero extra HBM). The LM head is quantized too when untied AND
    ``quantize_head``: the drafter reads it once per draft step (262 MB
    bf16 at 7B — ~13% of an int8 draft step), and it only shapes
    *proposals* — the verify pass applies the base bf16 head, so committed
    tokens are untouched. ``quantize_head=False`` shares the base bf16
    head instead (zero extra HBM, +head read bandwidth per draft step):
    argmax over the 32k-channel head is the most quantization-noise-
    sensitive op in the draft, so a bf16 head recovers acceptance lost
    to int8/int4 drafting (measured on-chip: see PROGRESS.md r4). Tied
    heads (lm_head None -> embed.T) stay shared/unquantized either way.

    Jitted so XLA fuses the fp32 cast/amax/round chain into the int8/uint8
    output without materializing fp32 copies of the sliced stack (the
    transient would be ~1.4 GB per MLP tensor at 7B E=8).
    """
    qlayers = _quantize_layer_slice(params.layers, exit_layer, bits, group,
                                    fields)
    lm_head = params.lm_head
    if (quantize_head and lm_head is not None
            and not isinstance(lm_head, QuantTensor)):
        lm_head = _quantize_head(lm_head, bits, group)
    return LlamaParams(
        embed=params.embed,
        layers=qlayers,
        final_norm=params.final_norm,
        lm_head=lm_head,
    )


@partial(jax.jit, static_argnums=(1, 2))
def _quantize_head(w: jnp.ndarray, bits: int, group: int) -> QuantTensor:
    return quantize_tensor(w, bits=bits, group=group)


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _quantize_layer_slice(
    layers: LayerParams, exit_layer: int, bits: int, group: int,
    fields: tuple = _QUANT_FIELDS,
) -> LayerParams:
    # slice INSIDE the jit: XLA fuses the [0:E] slice into the quant
    # chain instead of materializing a bf16 copy of the group (3.2 GB
    # at 7B E=8 — a transient OOM on a 16 GB v5e holding bf16 params).
    # Module-level jit so repeated calls (bench tail_eps sweeps rebuild
    # params and requantize) reuse one executable.
    layers_slice = layers.slice(0, exit_layer)
    if bits != 4:
        kw = {}
        for f in LayerParams.__dataclass_fields__:
            w = getattr(layers_slice, f)
            kw[f] = (
                quantize_tensor(w, k_last=f in _K_LAST_FIELDS, bits=bits,
                                group=group)
                if f in fields else w
            )
        return LayerParams(**kw)

    # int4's group reshapes defeat XLA's fusion: quantizing the whole
    # [E, ...] stack at once plans 2.69 GiB of fp32 temps at 7B E=8 —
    # 12.31 (bf16 base) + 2.69 + 1.05 (output) = 16.05 GiB, an execution
    # OOM on the 16 GB v5e (the dq4h16_7b_eps0124 failure in
    # .onchip_queue_results.jsonl, surfacing asynchronously at the NEXT
    # dispatch, i.e. the generate call). A fori_loop gathers ONE layer per
    # step from the full stack (never materializing a bf16 copy of the
    # slice — lax.map's xs would) and writes the packed result into
    # preallocated buffers: transient = one layer's fp32 (~170 MB).
    # Same pattern as bench.py's in-jit int4 param builder.
    qfields = tuple(
        f for f in LayerParams.__dataclass_fields__
        if f in fields and getattr(layers, f) is not None
    )

    def quant_one(f: str, i) -> QuantTensor:
        w = jax.lax.dynamic_index_in_dim(
            getattr(layers, f), i, 0, keepdims=False
        )
        return quantize_tensor(w, k_last=f in _K_LAST_FIELDS, bits=4,
                               group=group)

    accs = {}
    for f in qfields:
        aval = jax.eval_shape(lambda i, f=f: quant_one(f, i), jnp.int32(0))
        accs[f] = QuantTensor(
            q=jnp.zeros((exit_layer,) + aval.q.shape, aval.q.dtype),
            scale=jnp.zeros((exit_layer,) + aval.scale.shape,
                            aval.scale.dtype),
            k_last=aval.k_last, group=aval.group,
        )

    def body(i, accs):
        out = {}
        for f in qfields:
            qt = quant_one(f, i)
            acc = accs[f]
            out[f] = QuantTensor(
                q=jax.lax.dynamic_update_slice(
                    acc.q, qt.q[None], (i,) + (0,) * qt.q.ndim),
                scale=jax.lax.dynamic_update_slice(
                    acc.scale, qt.scale[None], (i,) + (0,) * qt.scale.ndim),
                k_last=acc.k_last, group=acc.group,
            )
        return out

    accs = jax.lax.fori_loop(0, exit_layer, body, accs)
    kw = {
        f: accs[f] if f in accs else getattr(layers_slice, f)
        for f in LayerParams.__dataclass_fields__
    }
    return LayerParams(**kw)


def quantized_bytes(params: LlamaParams) -> int:
    """Total parameter bytes (for memory/bandwidth accounting).

    int4 weights are stored nibble-packed in uint8 (two per byte), so the
    plain size*itemsize sum is already exact; the jnp.int4 branch is kept
    for any caller-constructed S4 leaves."""
    total = 0
    for leaf in jax.tree.leaves(params):
        if leaf.dtype == jnp.int4:
            total += (leaf.size + 1) // 2
        else:
            total += leaf.size * leaf.dtype.itemsize
    return total
