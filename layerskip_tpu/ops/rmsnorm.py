"""RMSNorm (HF-Llama compatible): fp32 accumulation, weight multiply in fp32.

The reference applies the *shared* final ``model.model.norm`` at every exit
depth (self_speculation/llama_model_utils.py:271-273, :385-387); here the same
function serves per-layer norms and the shared final norm.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(dtype)
