"""Ring attention vs single-device reference on the virtual 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from layerskip_tpu.ops.attention import gqa_attention
from layerskip_tpu.ops.ring_attention import ring_attention_sharded


def _mesh(n, name="sp"):
    return Mesh(np.asarray(jax.devices()[:n]), axis_names=(name,))


@pytest.mark.parametrize("n_dev,t", [(4, 64), (8, 128)])
def test_ring_matches_dense_causal(n_dev, t):
    b, hkv, g, dh = 2, 2, 2, 32
    hq = hkv * g
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, t, hq, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, hkv, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, hkv, dh)), jnp.float32)

    # reference: dense causal self-attention via the cache-style op
    qpos = jnp.arange(t, dtype=jnp.int32)
    ref = gqa_attention(q, k, v, qpos, q_heads_per_kv=g)

    mesh = _mesh(n_dev)
    out = ring_attention_sharded(q, k, v, mesh, axis="sp")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_ring_is_actually_sharded():
    """The jitted ring program must keep activations sequence-sharded."""
    b, t, hkv, g, dh = 1, 64, 2, 1, 32
    mesh = _mesh(8)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, t, hkv * g, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, hkv, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, hkv, dh)), jnp.float32)
    out = jax.jit(
        lambda q, k, v: ring_attention_sharded(q, k, v, mesh, axis="sp")
    )(q, k, v)
    assert out.shape == (b, t, hkv * g, dh)
    # output sharding follows the sequence axis
    assert "sp" in str(out.sharding)


def test_training_loss_with_ring_attention():
    """layerskip_loss under ring attention == dense attention loss."""
    from layerskip_tpu.config import tiny_config
    from layerskip_tpu.models.params import init_params
    from layerskip_tpu.training.recipe import TrainConfig, layerskip_loss

    cfg = tiny_config(num_hidden_layers=2, hidden_size=64,
                      num_attention_heads=4, num_key_value_heads=2,
                      vocab_size=128)
    params = init_params(jax.random.PRNGKey(3), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(4), (2, 64), 0, cfg.vocab_size)
    labels = jax.random.randint(jax.random.PRNGKey(5), (2, 64), 0, cfg.vocab_size)

    dense_cfg = TrainConfig(p_max=0.0, early_exit_layers=(1,))
    loss_d, _ = layerskip_loss(
        params, cfg, dense_cfg, ids, labels, jax.random.PRNGKey(6), jnp.int32(0)
    )

    mesh = _mesh(8)
    ring_cfg = TrainConfig(p_max=0.0, early_exit_layers=(1,), ring_axis="sp")
    loss_r, _ = layerskip_loss(
        params, cfg, ring_cfg, ids, labels, jax.random.PRNGKey(6),
        jnp.int32(0), mesh=mesh,
    )
    np.testing.assert_allclose(float(loss_r), float(loss_d), rtol=2e-5)
