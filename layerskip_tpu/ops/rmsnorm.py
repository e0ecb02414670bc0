"""RMSNorm (HF-Llama compatible): fp32 accumulation, weight multiply in fp32.

The reference applies the *shared* final ``model.model.norm`` at every exit
depth (self_speculation/llama_model_utils.py:271-273, :385-387); here the same
function serves per-layer norms and the shared final norm.

Why there is deliberately NO Pallas kernel here (round-2 investigation):
RMSNorm is elementwise-plus-rowreduce, which XLA fuses into the adjacent
matmuls/residual adds at roofline bandwidth already. A Pallas version (plain
+ fused-residual) was written, wired in, and measured on the v5e: the decode
hot path calls it at rows = B*T ∈ {1, W+1}, and Mosaic compiles for those
small-row shapes hang the remote-compile service (>4 min, killed), while the
large-row prefill shape compiled in ~168 s for zero measured speedup over
the XLA fusion. The kernel was therefore removed rather than left orphaned.
``rms_norm_residual`` keeps the fused call *shape* (one expression for
``h += sublayer_out; rms_norm(h)``) so the decoder reads the same either way
— XLA emits a single fused kernel for it.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


def rms_norm(
    x: jnp.ndarray, weight: jnp.ndarray, eps: float, offset: float = 0.0
) -> jnp.ndarray:
    """``offset=1.0`` gives the Gemma-family convention: the stored weight is
    a delta around 1 and the norm multiplies by ``(1 + weight)`` in fp32
    (HF GemmaRMSNorm)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * (weight.astype(jnp.float32) + offset)).astype(dtype)


def rms_norm_residual(
    x: jnp.ndarray, residual: jnp.ndarray, weight: jnp.ndarray, eps: float,
    offset: float = 0.0,
):
    """``(rms_norm(x + residual) * weight, x + residual)`` — the decoder's
    post-attention pattern as one expression; XLA fuses the add into the
    norm's reduction so the residual stream crosses HBM once."""
    h = x + residual
    return rms_norm(h, weight, eps, offset), h
