"""Rotary position embeddings (HF-Llama compatible).

The reference relies on ``transformers``' Llama rotary implementation (invoked
from self_speculation/llama_model_utils.py:192-201 via the HF decoder layers).
We reproduce the same math so HF checkpoints load bit-compatibly:

  * inverse frequencies ``theta ** (-2i / head_dim)`` computed in fp32,
  * optional Llama-3 frequency rescaling (``rope_scaling`` in config.json),
  * the "rotate_half" (non-interleaved) convention HF uses for Llama weights.
"""

from __future__ import annotations

import jax.numpy as jnp

from layerskip_tpu.config import ModelConfig


def rope_inv_freq(cfg: ModelConfig) -> jnp.ndarray:
    """Per-channel inverse frequencies, fp32, shape [head_dim // 2]."""
    half = cfg.head_dim // 2
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, half, dtype=jnp.float32) / half)
    )
    rs = cfg.rope_scaling
    if rs.rope_type == "llama3":
        # HF transformers _compute_llama3_parameters equivalent.
        low_wl = rs.original_max_position_embeddings / rs.low_freq_factor
        high_wl = rs.original_max_position_embeddings / rs.high_freq_factor
        wavelen = 2.0 * jnp.pi / inv_freq
        scaled = inv_freq / rs.factor
        smooth = (rs.original_max_position_embeddings / wavelen - rs.low_freq_factor) / (
            rs.high_freq_factor - rs.low_freq_factor
        )
        smoothed = (1.0 - smooth) * scaled + smooth * inv_freq
        is_low = wavelen > low_wl
        is_high = wavelen < high_wl
        mid = jnp.logical_and(~is_low, ~is_high)
        inv_freq = jnp.where(is_low, scaled, inv_freq)
        inv_freq = jnp.where(mid, smoothed, inv_freq)
    elif rs.rope_type == "linear":
        inv_freq = inv_freq / rs.factor
    return inv_freq


def rope_cos_sin(positions: jnp.ndarray, inv_freq: jnp.ndarray):
    """cos/sin tables for absolute ``positions`` (any shape), fp32.

    Returns (cos, sin) with shape ``positions.shape + (head_dim,)`` where the
    half-table is duplicated along the last axis (HF convention:
    ``emb = cat(freqs, freqs)``).
    """
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., half]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [..., head_dim]
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embedding.

    x:   [B, T, H, Dh]
    cos: [B, T, Dh] (broadcast over heads)
    """
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    out = x.astype(jnp.float32) * cos + _rotate_half(x.astype(jnp.float32)) * sin
    return out.astype(x.dtype)
