"""Ring attention: exact causal attention over a sequence-sharded mesh axis.

Net-new scaling capability (SURVEY §5.7 — the reference's masks are dense
O(T²) tensors on one device and its context is bounded by one GPU's memory).
Here Q/K/V are sharded along the sequence on a mesh axis: each device keeps
its Q shard resident and the K/V shards circulate around the ring with
``jax.lax.ppermute``, one hop per step, while flash-style online-softmax
accumulators (m, l, acc) combine the partial attention — so the full T×T
score matrix never exists anywhere and max context scales linearly with the
number of devices.

Causality is the global rule ``k_pos <= q_pos`` computed from shard indices,
exactly matching the single-device masks in ops/attention.py. Fully-masked
hops (K shard strictly in the future) are skipped with ``lax.cond``.

Use via ``ring_attention`` under ``shard_map`` (see ``ring_attention_sharded``
for the packaged wrapper), typically for training/prefill full-sequence
attention; decode stays on the single-shard kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _block_attend(q, k, v, q_pos, k_pos, scale):
    """Partial (un-normalized) attention of one Q shard vs one K/V shard.

    q: [B, Tq, Hq, Dh]; k/v: [B, Tk, Hkv, Dh]; returns (scores_max m [B,Hq,Tq,1],
    exp-sum l [B,Hq,Tq,1], weighted acc [B,Hq,Tq,Dh]) for online combination.
    """
    b, tq, hq, dh = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    qg = q.reshape(b, tq, hkv, g, dh)
    s = jnp.einsum(
        "bthgd,bshd->bhgts", qg, k, preferred_element_type=jnp.float32
    ) * scale  # [B, Hkv, G, Tq, Tk]
    mask = k_pos[None, :] <= q_pos[:, None]  # [Tq, Tk]
    s = jnp.where(mask[None, None, None], s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)  # [B, Hkv, G, Tq, 1]
    p = jnp.exp(s - m)
    p = jnp.where(mask[None, None, None], p, 0.0)  # exp(NEG_INF - NEG_INF) guard
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum(
        "bhgts,bshd->bhgtd", p, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return m, l, acc


def ring_attention(
    q: jnp.ndarray,  # [B, Tloc, Hq, Dh] local query shard (post-RoPE)
    k: jnp.ndarray,  # [B, Tloc, Hkv, Dh] local key shard
    v: jnp.ndarray,  # [B, Tloc, Hkv, Dh]
    axis_name: str,
) -> jnp.ndarray:
    """Per-shard body: run under shard_map with sequence sharded on
    ``axis_name``. Returns the local output shard [B, Tloc, Hq, Dh]."""
    b, t_loc, hq, dh = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    p_size = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    scale = 1.0 / (dh ** 0.5)

    q_pos = my * t_loc + jnp.arange(t_loc, dtype=jnp.int32)

    m0 = jnp.full((b, hkv, g, t_loc, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, hkv, g, t_loc, 1), jnp.float32)
    acc0 = jnp.zeros((b, hkv, g, t_loc, dh), jnp.float32)
    if hasattr(jax.lax, "pcast"):
        # newer shard_map tracks varying-per-axis types: constants entering
        # the scan carry must be marked device-varying up front
        m0, l0, acc0 = (
            jax.lax.pcast(x, (axis_name,), to="varying")
            for x in (m0, l0, acc0)
        )

    def step(carry, step_idx):
        m, l, acc, k_blk, v_blk = carry
        src = (my - step_idx) % p_size  # which shard this K/V block came from
        k_pos = src * t_loc + jnp.arange(t_loc, dtype=jnp.int32)

        # Fully-masked (future) blocks are an exact no-op of this update:
        # their block-max is NEG_INF so beta = exp(NEG_INF - m) = 0 — no
        # branch needed (and lax.cond branches disagree on varying-axis
        # types under shard_map).
        bm, bl, bacc = _block_attend(q, k_blk, v_blk, q_pos, k_pos, scale)
        m_new = jnp.maximum(m, bm)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(jnp.maximum(bm, NEG_INF) - m_new)
        m = m_new
        l = l * alpha + bl * beta
        acc = acc * alpha + bacc * beta

        # rotate K/V to the next device (receive from the left neighbor)
        k_blk = jax.lax.ppermute(
            k_blk, axis_name,
            [(i, (i + 1) % p_size) for i in range(p_size)],
        )
        v_blk = jax.lax.ppermute(
            v_blk, axis_name,
            [(i, (i + 1) % p_size) for i in range(p_size)],
        )
        return (m, l, acc, k_blk, v_blk), None

    (m, l, acc, _, _), _ = jax.lax.scan(
        step, (m0, l0, acc0, k, v), jnp.arange(p_size, dtype=jnp.int32)
    )
    out = acc / jnp.maximum(l, 1e-30)  # [B, Hkv, G, Tq, Dh]
    return (
        jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(b, t_loc, hq, dh)
    ).astype(q.dtype)


def ring_attention_sharded(
    q: jnp.ndarray,  # [B, T, Hq, Dh] (global, sequence on ``axis``)
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "sp",
) -> jnp.ndarray:
    """shard_map wrapper: shards T over ``axis`` and runs the ring."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    spec = P(None, axis, None, None)
    fn = shard_map(
        functools.partial(ring_attention, axis_name=axis),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
