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
from layerskip_tpu.ops.pallas.quant_matmul import quant_matmul, quantize_weights
from layerskip_tpu.ops.rmsnorm import rms_norm as jnp_rms_norm
from layerskip_tpu.ops.rmsnorm import rms_norm_residual


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



@pytest.mark.parametrize("variant", ["fused", "groupdot"])
@pytest.mark.parametrize("m,k,n,bn,bkp,group", [
    # wrappers self-align blocks to Mosaic tile rules (lane % 128 == 0,
    # scale sublane % 8 == 0) — small groups keep multi-block K legal
    (1, 512, 384, 128, 128, 16),   # multi-block N and K (align 128)
    (8, 512, 384, 384, 256, 128),  # single cell (bkp == kp)
    (7, 896, 256, 128, 128, 32),   # ragged Kp tail (448 = 3*128 + 64)
])
def test_int4_matmul_matches_dequant(m, k, n, bn, bkp, group, variant):
    """In-kernel nibble unpack == QuantTensor.dequantize oracle.

    The oracle matmul must run precision='highest': at the default MXU
    precision fp32 operands truncate to one bf16 pass and the ORACLE
    becomes the imprecise side (the kernel accumulates fp32) — the same
    trap scripts/kernel_gate.py documents for quant_matmul.
    """
    from layerskip_tpu.ops.pallas.quant_matmul import int4_matmul
    from layerskip_tpu.quant import quantize_tensor

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    qt = quantize_tensor(w, bits=4, group=group)
    want = np.asarray(jnp.matmul(x, qt.dequantize(jnp.float32),
                                 precision="highest"))
    got = np.asarray(int4_matmul(x, qt.q, qt.scale, group=qt.group,
                                 block_n=bn, block_kp=bkp, interpret=True,
                                 variant=variant))
    np.testing.assert_allclose(got, want, atol=2e-3)


@pytest.mark.parametrize("variant", ["fused", "groupdot"])
@pytest.mark.parametrize("m,k,n,bn,bkp,group", [
    (1, 512, 384, 128, 128, 16),   # multi-block N and K
    (8, 896, 320, 320, 128, 32),   # ragged Kp (448 = 3*128 + 64), bn = n
])
def test_int4_matmul_t_matches_dequant(m, k, n, bn, bkp, group, variant):
    """Transposed ([out, in] packed) variant vs dequantize oracle."""
    from layerskip_tpu.ops.pallas.quant_matmul import int4_matmul_t
    from layerskip_tpu.quant import quantize_tensor

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    qt = quantize_tensor(w, k_last=True, bits=4, group=group)
    want = np.asarray(jnp.matmul(
        x, jnp.transpose(qt.dequantize(jnp.float32)), precision="highest"))
    got = np.asarray(int4_matmul_t(x, qt.q, qt.scale, group=qt.group,
                                   block_n=bn, block_kp=bkp, interpret=True,
                                   variant=variant))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_int4_matmul_bf16_activation():
    """Production dtype: bf16 activations, output rounds to bf16 only once."""
    from layerskip_tpu.ops.pallas.quant_matmul import int4_matmul
    from layerskip_tpu.quant import quantize_tensor

    rng = np.random.default_rng(17)
    m, k, n = 4, 512, 256
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    qt = quantize_tensor(w, bits=4, group=128)
    want = np.asarray(jnp.matmul(x.astype(jnp.float32),
                                 qt.dequantize(jnp.float32),
                                 precision="highest"))
    got = np.asarray(int4_matmul(x, qt.q, qt.scale, group=qt.group,
                                 interpret=True)).astype(np.float32)
    # bf16 output rounding (~0.4% relative) + bf16 dequant operand rounding
    np.testing.assert_allclose(got, want, atol=np.abs(want).max() * 2e-2)


def test_flash_prefill_gemma_score_math():
    """Gemma support in the flash prefill kernel (r5): score soft-capping,
    custom query scale, and a TRACED sliding window (the per-layer
    alternation reaches the kernel as an SMEM operand)."""
    from layerskip_tpu.ops.pallas.flash_prefill import flash_prefill_attention

    b, t, s, hkv, g, dh, past = 1, 256, 512, 2, 2, 128, 100
    rng = np.random.default_rng(13)
    q = jnp.asarray(rng.standard_normal((b, t, hkv * g, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    qpos = jnp.asarray(np.arange(past, past + t), jnp.int32)
    win = jnp.int32(64)  # traced
    kw = dict(score_scale=32.0 ** -0.5, logit_softcap=50.0)

    ref = attn_mod.gqa_attention(
        q, k, v, qpos, q_heads_per_kv=g, sliding_window=win, **kw
    )
    got = flash_prefill_attention(
        q, k, v, jnp.int32(past), q_heads_per_kv=g, sliding_window=win,
        block_q=128, block_k=128, interpret=True, **kw,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=5e-5, rtol=5e-5
    )
