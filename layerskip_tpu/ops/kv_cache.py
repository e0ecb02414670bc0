"""Static-shape KV cache with length counters.

TPU-native replacement for the reference's legacy list-of-tuples cache that is
re-wrapped in ``DynamicCache`` per call and *physically sliced* for rollback
(self_speculation/llama_model_utils.py:134-149, :169, :229, :308). Here the
cache is a pair of preallocated ``[L, B, S_max, H_kv, Dh]`` buffers; "cropping"
is a counter decrement, never a copy, so speculative rollback is free and the
whole speculation round stays inside one XLA program.

The *two-length invariant* of self-speculative decoding (early layers' KV runs
ahead of full layers' KV during a round — SURVEY §5.7, reference
llama_model_utils.py:289-337) is carried by the engine as two scalars
(``draft_len``, ``full_len``); this module only stores the buffers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from layerskip_tpu.config import ModelConfig


@struct.dataclass
class KVCache:
    """Preallocated KV for all layers. k/v: [L, B, S_max, H_kv, Dh]."""

    k: jnp.ndarray
    v: jnp.ndarray

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]

    def slice_layers(self, start: int, end: int) -> "KVCache":
        """Static layer-range view (used for the early/full split)."""
        return KVCache(k=self.k[start:end], v=self.v[start:end])

    def merge_layers(self, other: "KVCache", start: int) -> "KVCache":
        """Write ``other``'s layers back at static offset ``start``."""
        end = start + other.num_layers
        k = self.k.at[start:end].set(other.k)
        v = self.v.at[start:end].set(other.v)
        return KVCache(k=k, v=v)


def init_kv_cache(
    cfg: ModelConfig, batch: int, max_len: int, dtype=None
) -> KVCache:
    dtype = dtype or cfg.dtype
    shape = (
        cfg.num_hidden_layers,
        batch,
        max_len,
        cfg.num_key_value_heads,
        cfg.head_dim,
    )
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def write_kv(
    k_layer,
    v_layer,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    write_pos: jnp.ndarray,
):
    """Insert [B, T, H, Dh] blocks at sequence offset ``write_pos`` (traced).

    Positions beyond the valid length may hold stale data; correctness relies
    on the attention mask (keys ``j <= q_pos``) and on the engine only ever
    advancing write positions past committed tokens. ``k_layer``/``v_layer``
    may be plain arrays or per-layer ``QuantKV`` buffers (int8 path);
    ``write_pos`` is a scalar (shared frontier) or a [B] vector (per-row
    frontiers — continuous batching).
    """
    from layerskip_tpu.ops.paged_kv import PagedKV, PagedQuantKV

    if isinstance(k_layer, (QuantKV, PagedKV, PagedQuantKV)):
        return (
            k_layer.write(k_new, write_pos),
            v_layer.write(v_new, write_pos),
        )
    pos = write_pos.astype(jnp.int32)
    if pos.ndim == 0:
        zero = jnp.zeros((), jnp.int32)
        k_layer = jax.lax.dynamic_update_slice(
            k_layer, k_new, (zero, pos, zero, zero)
        )
        v_layer = jax.lax.dynamic_update_slice(
            v_layer, v_new, (zero, pos, zero, zero)
        )
        return k_layer, v_layer

    def row(buf, new, p):
        zero = jnp.zeros((), jnp.int32)
        return jax.lax.dynamic_update_slice(buf, new, (p, zero, zero))

    k_layer = jax.vmap(row)(k_layer, k_new, pos)
    v_layer = jax.vmap(row)(v_layer, v_new, pos)
    return k_layer, v_layer


# ---------------------------------------------------------------------------
# int8 KV quantization
# ---------------------------------------------------------------------------


@struct.dataclass
class QuantKV:
    """int8 KV buffer with per-(token, head) symmetric scales.

    q: [..., S, H, Dh] int8; scale: [..., S, H] fp. Halves KV HBM traffic —
    the usual decode bottleneck at long context. Dequantization is an
    elementwise multiply that XLA fuses into the attention matmul, so the
    int8 bytes are read exactly once. No reference counterpart (the
    reference's cache is fp16 legacy tuples, SURVEY §5.7).
    """

    q: jnp.ndarray
    scale: jnp.ndarray

    @property
    def shape(self):
        return self.q.shape

    def write(self, new: jnp.ndarray, write_pos: jnp.ndarray) -> "QuantKV":
        """Quantize a [B, T, H, Dh] block and insert at ``write_pos``
        (scalar shared frontier or [B] per-row frontiers)."""
        zero = jnp.zeros((), jnp.int32)
        pos = write_pos.astype(jnp.int32)
        nf = new.astype(jnp.float32)
        amax = jnp.max(jnp.abs(nf), axis=-1)  # [B, T, H]
        scale = jnp.maximum(amax / 127.0, 1e-8)
        q = jnp.clip(jnp.round(nf / scale[..., None]), -127, 127).astype(jnp.int8)
        scale = scale.astype(self.scale.dtype)
        if pos.ndim == 0:
            return QuantKV(
                q=jax.lax.dynamic_update_slice(self.q, q, (zero, pos, zero, zero)),
                scale=jax.lax.dynamic_update_slice(
                    self.scale, scale, (zero, pos, zero)
                ),
            )
        return QuantKV(
            q=jax.vmap(
                lambda buf, n, p: jax.lax.dynamic_update_slice(
                    buf, n, (p, zero, zero)
                )
            )(self.q, q, pos),
            scale=jax.vmap(
                lambda buf, n, p: jax.lax.dynamic_update_slice(buf, n, (p, zero))
            )(self.scale, scale, pos),
        )

    def dequantize(self, dtype) -> jnp.ndarray:
        return (
            self.q.astype(jnp.float32) * self.scale.astype(jnp.float32)[..., None]
        ).astype(dtype)


def init_quant_kv_cache(cfg: ModelConfig, batch: int, max_len: int) -> KVCache:
    """KVCache whose k/v are stacked QuantKV buffers ([L, B, S, H, Dh])."""
    shape = (
        cfg.num_hidden_layers,
        batch,
        max_len,
        cfg.num_key_value_heads,
        cfg.head_dim,
    )
    mk = lambda: QuantKV(  # noqa: E731
        q=jnp.zeros(shape, jnp.int8),
        scale=jnp.zeros(shape[:-1], jnp.bfloat16),
    )
    return KVCache(k=mk(), v=mk())
