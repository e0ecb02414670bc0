"""Pallas kernel parity tests (interpreter mode on CPU).

Each kernel must match its jnp reference implementation exactly in fp32 —
the kernels are drop-in replacements on the TPU hot path (the reference has
no custom kernels at all; these are the TPU-native equivalents of the fused
CUDA kernels serving stacks rely on — SURVEY §2 preamble).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layerskip_tpu.ops import attention as attn_mod
from layerskip_tpu.ops.pallas.decode_attention import decode_attention
from layerskip_tpu.ops.pallas.quant_matmul import quant_matmul, quantize_weights
from layerskip_tpu.ops.rmsnorm import rms_norm as jnp_rms_norm
from layerskip_tpu.ops.rmsnorm import rms_norm_residual


@pytest.mark.parametrize("t,g", [(1, 2), (7, 2), (4, 1)])
def test_decode_attention_matches_reference(t, g):
    b, s, hkv, dh = 2, 64, 2, 128
    hq = hkv * g
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, t, hq, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    qpos = jnp.asarray(np.arange(10, 10 + t), jnp.int32)

    ref = attn_mod.gqa_attention(q, k, v, qpos, q_heads_per_kv=g)
    got = decode_attention(q, k, v, qpos, q_heads_per_kv=g, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_decode_attention_respects_mask():
    """Keys beyond q_pos must not influence the output."""
    b, t, s, hkv, g, dh = 1, 1, 32, 1, 1, 128
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, t, hkv * g, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    qpos = jnp.asarray([5], jnp.int32)
    out1 = decode_attention(q, k, v, qpos, q_heads_per_kv=g, interpret=True)
    # scribble on masked slots
    k2 = k.at[:, 6:].set(99.0)
    v2 = v.at[:, 6:].set(-99.0)
    out2 = decode_attention(q, k2, v2, qpos, q_heads_per_kv=g, interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_rmsnorm_residual_fused_shape():
    """The fused-call-shape helper must equal add-then-norm exactly.

    (There is intentionally no Pallas RMSNorm — see ops/rmsnorm.py docstring:
    small-row Mosaic compiles hang the axon remote-compile service and XLA
    already fuses the pattern; this guards the jnp helper the decoder uses.)
    """
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 256)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((2, 8, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256,)), jnp.float32)
    got, new_r = rms_norm_residual(x, r, w, 1e-5)
    np.testing.assert_allclose(np.asarray(new_r), np.asarray(x + r), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(jnp_rms_norm(x + r, w, 1e-5)), atol=1e-5,
        rtol=1e-5,
    )


def test_quantize_weights_roundtrip():
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.standard_normal((128, 256)), jnp.float32)
    q, scale = quantize_weights(w)
    assert q.dtype == jnp.int8 and scale.shape == (256,)
    deq = q.astype(jnp.float32) * scale[None, :]
    err = np.abs(np.asarray(deq - w)).max() / np.abs(np.asarray(w)).max()
    assert err < 0.01  # int8 per-channel: <1% relative error


def test_quant_matmul_matches_dequant():
    rng = np.random.default_rng(5)
    m, k, n = 64, 256, 384
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    wq, scale = quantize_weights(w)
    ref = x @ (wq.astype(jnp.float32) * scale[None, :])
    got = quant_matmul(x, wq, scale, block_m=32, block_n=128, block_k=128,
                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3, rtol=1e-4)


def test_quant_matmul_ragged_blocks():
    """Shapes not divisible by block sizes must still be exact."""
    rng = np.random.default_rng(6)
    m, k, n = 10, 192, 136
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    wq, scale = quantize_weights(w)
    ref = x @ (wq.astype(jnp.float32) * scale[None, :])
    got = quant_matmul(x, wq, scale, block_m=8, block_n=128, block_k=128,
                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3, rtol=1e-4)


@pytest.mark.parametrize("t,s,past", [(256, 512, 0), (256, 512, 100)])
def test_flash_prefill_matches_reference(t, s, past):
    from layerskip_tpu.ops.pallas.flash_prefill import flash_prefill_attention

    b, hkv, g, dh = 1, 2, 2, 128
    hq = hkv * g
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((b, t, hq, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    qpos = jnp.asarray(np.arange(past, past + t), jnp.int32)

    ref = attn_mod.gqa_attention(q, k, v, qpos, q_heads_per_kv=g)
    got = flash_prefill_attention(
        q, k, v, jnp.int32(past), q_heads_per_kv=g,
        block_q=128, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_quant_matmul_t_matches():
    from layerskip_tpu.ops.pallas.quant_matmul import quant_matmul_t
    from layerskip_tpu.quant import quantize_tensor

    rng = np.random.default_rng(8)
    m, k, n = 16, 256, 192
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)  # [N, K]
    qt = quantize_tensor(w, k_last=True)
    ref = x @ np.asarray(qt.dequantize(jnp.float32)).T
    got = quant_matmul_t(x, qt.q, qt.scale, block_m=8, block_n=128,
                         block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3,
                               rtol=1e-4)


@pytest.mark.parametrize("t,g,s", [(1, 2, 1200), (7, 2, 1536)])
def test_decode_attention_blocked_long_s(t, g, s):
    """KV-blocked online-softmax path: S > one block, S not a block multiple."""
    b, hkv, dh = 1, 2, 128
    hq = hkv * g
    rng = np.random.default_rng(10)
    q = jnp.asarray(rng.standard_normal((b, t, hq, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    qpos = jnp.asarray(np.arange(s - t - 3, s - 3), jnp.int32)

    ref = attn_mod.gqa_attention(q, k, v, qpos, q_heads_per_kv=g)
    got = decode_attention(q, k, v, qpos, q_heads_per_kv=g, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=2e-5)


@pytest.mark.parametrize("window", [16, 100])
def test_decode_attention_sliding_window(window):
    """In-kernel Mistral-style window must match the dense masked path."""
    b, t, s, hkv, g, dh = 2, 3, 640, 2, 2, 128
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.standard_normal((b, t, hkv * g, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    qpos = jnp.asarray(np.arange(500, 500 + t), jnp.int32)

    ref = attn_mod.gqa_attention(
        q, k, v, qpos, q_heads_per_kv=g, sliding_window=window
    )
    got = decode_attention(
        q, k, v, qpos, q_heads_per_kv=g, sliding_window=window, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=2e-5)


def test_flash_prefill_sliding_window():
    from layerskip_tpu.ops.pallas.flash_prefill import flash_prefill_attention

    b, t, s, hkv, g, dh, past, window = 1, 256, 512, 2, 2, 128, 100, 64
    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.standard_normal((b, t, hkv * g, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    qpos = jnp.asarray(np.arange(past, past + t), jnp.int32)

    ref = attn_mod.gqa_attention(
        q, k, v, qpos, q_heads_per_kv=g, sliding_window=window
    )
    got = flash_prefill_attention(
        q, k, v, jnp.int32(past), q_heads_per_kv=g, sliding_window=window,
        block_q=128, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=2e-5)


def test_decode_attention_q8_matches_dequant():
    from layerskip_tpu.ops.kv_cache import QuantKV
    from layerskip_tpu.ops.pallas.decode_attention import decode_attention_q8

    b, t, s, hkv, g, dh = 1, 4, 64, 2, 2, 128
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.standard_normal((b, t, hkv * g, dh)), jnp.float32)
    kf = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    kq = QuantKV(
        q=jnp.zeros((b, s, hkv, dh), jnp.int8),
        scale=jnp.zeros((b, s, hkv), jnp.float32),
    ).write(kf, jnp.int32(0))
    vq = QuantKV(
        q=jnp.zeros((b, s, hkv, dh), jnp.int8),
        scale=jnp.zeros((b, s, hkv), jnp.float32),
    ).write(vf, jnp.int32(0))
    qpos = jnp.asarray(np.arange(20, 24), jnp.int32)

    ref = attn_mod.gqa_attention(
        q, kq.dequantize(jnp.float32), vq.dequantize(jnp.float32), qpos,
        q_heads_per_kv=g,
    )
    got = decode_attention_q8(
        q, kq.q, kq.scale, vq.q, vq.scale, qpos, q_heads_per_kv=g,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


@pytest.mark.parametrize("t,s", [(1, 32768), (7, 32768)])
def test_decode_attention_32k_context(t, s):
    """KV-blocked kernel parity at S >= 32k (VERDICT r1 #3's bar): the
    online-softmax accumulator must stay exact across 256+ KV blocks."""
    b, hkv, g, dh = 1, 2, 2, 64
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.standard_normal((b, t, hkv * g, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    qpos = jnp.asarray(np.arange(s - t - 5, s - 5)[None], jnp.int32)

    ref = attn_mod.gqa_attention(q, k, v, qpos, q_heads_per_kv=g)
    got = decode_attention(q, k, v, qpos, q_heads_per_kv=g, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_decode_attention_32k_sliding_window():
    """In-kernel sliding window at long S: fully-masked distant blocks must
    contribute nothing (Mistral semantics at 32k context)."""
    b, t, hkv, g, dh, s, win = 1, 1, 2, 2, 64, 32768, 4096
    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.standard_normal((b, t, hkv * g, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    qpos = jnp.asarray([[s - 3]], jnp.int32)

    ref = attn_mod.gqa_attention(
        q, k, v, qpos, q_heads_per_kv=g, sliding_window=win
    )
    got = decode_attention(
        q, k, v, qpos, q_heads_per_kv=g, sliding_window=win, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)
