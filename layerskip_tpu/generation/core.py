"""Shared generation-engine primitives.

Split out of engine.py (round 5, zero behavior change): preallocated
KV-group construction, per-row RNG/update helpers, the device-side
GenerateOutput result, the speculative-decoding state pytree, and
prompt-length bucketing. engine.py re-exports every name here, so
``from layerskip_tpu.generation.engine import X`` keeps working for all
public and test-facing symbols.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from layerskip_tpu.config import ModelConfig
from layerskip_tpu.ops.kv_cache import KVCache, QuantKV


def _mk_group_cache(
    cfg: "ModelConfig", nlayers: int, b: int, max_len: int, kv_quant: bool
) -> KVCache:
    """Preallocate a layer-group KV cache (bf16 or int8-quantized).

    Under an active ``kv_seq_sharding`` context (sequence-sharded decode,
    ops/attention.py), the sequence dim is constrained to that mesh axis:
    each device holds a contiguous KV slab and GSPMD inserts the attention
    collectives — contexts larger than one chip's HBM spread over ICI."""
    from jax.sharding import PartitionSpec as P

    from layerskip_tpu.ops.attention import current_kv_seq_shard

    axis = current_kv_seq_shard()

    def seq_shard(x, spec_dims=5):
        if axis is None:
            return x
        spec = [None] * spec_dims
        spec[2] = axis  # [L, B, S, ...]: shard S
        return jax.lax.with_sharding_constraint(x, P(*spec))

    shape = (nlayers, b, max_len, cfg.num_key_value_heads, cfg.head_dim)
    if kv_quant:
        mk = lambda: QuantKV(  # noqa: E731
            q=seq_shard(jnp.zeros(shape, jnp.int8)),
            scale=seq_shard(jnp.zeros(shape[:-1], jnp.bfloat16), 4),
        )
        return KVCache(k=mk(), v=mk())
    return KVCache(
        k=seq_shard(jnp.zeros(shape, cfg.dtype)),
        v=seq_shard(jnp.zeros(shape, cfg.dtype)),
    )


def _is_eos(tokens: jnp.ndarray, eos_ids: Tuple[int, ...]) -> jnp.ndarray:
    """Elementwise membership in the (static) EOS id set."""
    hit = jnp.zeros(tokens.shape, dtype=bool)
    for e in eos_ids:
        hit = hit | (tokens == e)
    return hit


def _row_keys(rng: jax.Array, b: int) -> jax.Array:
    """One independent key per batch row ([B, 2])."""
    if rng.ndim == 2:
        return rng
    return jax.vmap(lambda i: jax.random.fold_in(rng, i))(jnp.arange(b))


def _split_rows(keys: jax.Array):
    """Per-row split: [B, 2] -> (use [B, 2], carry [B, 2])."""
    both = jax.vmap(lambda k: jax.random.split(k))(keys)  # [B, 2, 2]
    return both[:, 0], both[:, 1]


def _row_update(buf: jnp.ndarray, block: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Per-row dynamic update: buf [B, L], block [B, T], pos [B]."""
    return jax.vmap(
        lambda b_, n_, p_: jax.lax.dynamic_update_slice(b_, n_, (p_,))
    )(buf, block, pos.astype(jnp.int32))


def _row_gather(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x [B, T, ...] -> x[r, idx[r]] per row ([B, ...])."""
    return jax.vmap(lambda row, i: row[i])(x, idx.astype(jnp.int32))


class GenerateOutput(NamedTuple):
    """Device-side result of one generation (pre-EOS-truncation).

    ``tokens[:, :num_tokens]`` are committed tokens which may *include* an
    EOS; the facade truncates at the first EOS (reference excludes it).
    """

    tokens: jnp.ndarray  # [B, OUT] int32
    num_tokens: jnp.ndarray  # [B] int32 committed count (may exceed max_steps by <= W)
    matches: jnp.ndarray  # [] int32 total accepted drafts (spec only)
    drafts: jnp.ndarray  # [] int32 total drafted tokens (spec only)



@struct.dataclass
class _SpecState:
    early: KVCache  # layers [0, E)
    full: KVCache  # layers [E, L)
    ctx: jnp.ndarray  # [B] int32 committed context length (excl. next_tok)
    prompt_len: jnp.ndarray  # [B] int32 (true prompt lengths)
    next_tok: jnp.ndarray  # [B, 1] int32 committed but not yet in KV
    out: jnp.ndarray  # [B, OUT] int32
    hist: jnp.ndarray  # [B, P+OUT] prompt+generated (for logits processors)
    out_len: jnp.ndarray  # [B] int32
    steps: jnp.ndarray  # [B] int32 per-row step budget (<= program max_steps)
    done: jnp.ndarray  # [B] bool
    rng: jax.Array
    matches: jnp.ndarray  # [B] int32 accepted drafts per row
    drafts: jnp.ndarray  # [B] int32 drafted tokens per row



def _bucket(n: int, sizes: Sequence[int] = (64, 128, 256, 512, 1024, 2048, 4096)) -> int:
    for s in sizes:
        if n <= s:
            return s
    return ((n + 1023) // 1024) * 1024


