"""Weight-only int8 quantization tests.

The reference has no quantization; these pin the TPU-native int8 path: the
quantized pytree drops into the same forwards/engines, logits stay close to
fp, and the greedy spec==AR invariant holds under quantization too.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layerskip_tpu.config import GenerationConfig, tiny_config
from layerskip_tpu.generation.engine import Engine, postprocess_output
from layerskip_tpu.models import llama
from layerskip_tpu.models.params import init_params
from layerskip_tpu.ops.kv_cache import init_kv_cache
from layerskip_tpu.ops.linear import QuantTensor, apply_weight
from layerskip_tpu.quant import quantize_llama_params, quantize_tensor


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config(num_hidden_layers=4, hidden_size=64, vocab_size=128)
    params = init_params(jax.random.PRNGKey(11), cfg)
    return params, cfg


def test_quantize_stacked_tensor():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 32, 48)), jnp.float32)  # [L, K, N]
    qt = quantize_tensor(w)
    assert qt.q.shape == (3, 32, 48) and qt.scale.shape == (3, 48)
    rel = np.abs(np.asarray(qt.dequantize(jnp.float32) - w)).max()
    assert rel < 0.02
    # leading-axis slice keeps the pair aligned
    sl = qt[1:3]
    assert sl.q.shape == (2, 32, 48) and sl.scale.shape == (2, 48)


def test_apply_weight_dense_vs_quant():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((5, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 48)), jnp.float32)
    qt = quantize_tensor(w)
    dense = apply_weight(x, w)
    quant = apply_weight(x, qt)
    np.testing.assert_allclose(
        np.asarray(quant), np.asarray(dense), atol=0.15, rtol=0.1
    )


def test_quantized_forward_close_to_fp(model):
    params, cfg = model
    qparams = quantize_llama_params(params)
    # structure: stacked layer weights became QuantTensor pytrees
    assert isinstance(qparams.layers.wq, QuantTensor)
    ids = jnp.asarray([[3, 17, 52, 9, 30]], jnp.int32)
    cache = init_kv_cache(cfg, batch=1, max_len=16)
    fp = llama.forward(params, cfg, ids, cache, jnp.int32(0))
    q = llama.forward(qparams, cfg, ids, cache, jnp.int32(0))
    # int8 per-channel on a 4-layer net: logits should track closely
    fp_l, q_l = np.asarray(fp.logits), np.asarray(q.logits)
    denom = np.abs(fp_l).max()
    assert np.abs(fp_l - q_l).max() / denom < 0.1


def test_quantized_greedy_spec_equals_ar(model):
    params, cfg = model
    qparams = quantize_llama_params(params)
    eng = Engine(qparams, cfg)
    prompt = [3, 17, 52, 9]
    ar = postprocess_output(
        eng.generate(prompt, GenerationConfig(
            max_steps=16, sample=False, generation_strategy="autoregressive")),
        (), 16,
    )
    spec = postprocess_output(
        eng.generate(prompt, GenerationConfig(
            max_steps=16, sample=False, generation_strategy="self_speculative",
            exit_layer=2, num_speculations=4)),
        (), 16,
    )
    assert ar == spec


def test_int8_kv_cache_generation(model):
    """int8 KV: generation runs and greedy spec==AR still holds; tokens track
    the bf16-KV stream closely (quantization noise may diverge late)."""
    params, cfg = model
    eng = Engine(params, cfg)
    prompt = [3, 17, 52, 9]
    ar_q = postprocess_output(
        eng.generate(prompt, GenerationConfig(
            max_steps=16, sample=False, generation_strategy="autoregressive",
            kv_quant=True)),
        (), 16,
    )
    spec_q = postprocess_output(
        eng.generate(prompt, GenerationConfig(
            max_steps=16, sample=False, generation_strategy="self_speculative",
            exit_layer=2, num_speculations=4, kv_quant=True)),
        (), 16,
    )
    assert ar_q == spec_q
    assert len(ar_q) == 16


def test_quant_kv_write_and_dequant():
    from layerskip_tpu.ops.kv_cache import QuantKV
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    buf = QuantKV(
        q=jnp.zeros((1, 8, 2, 4), jnp.int8),
        scale=jnp.zeros((1, 8, 2), jnp.bfloat16),
    )
    block = jnp.asarray(rng.standard_normal((1, 3, 2, 4)), jnp.float32)
    buf = buf.write(block, jnp.int32(2))
    deq = np.asarray(buf.dequantize(jnp.float32))
    np.testing.assert_allclose(deq[:, 2:5], np.asarray(block), atol=0.03, rtol=0.02)
    assert (deq[:, :2] == 0).all() and (deq[:, 5:] == 0).all()


# ---- int4 groupwise (net-new; no reference counterpart — TPU packs int4
# two per HBM byte, halving decode weight traffic again over int8) ----

def test_quantize_tensor_int4_shapes_and_error():
    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.standard_normal((64, 48)), jnp.float32)
    qt = quantize_tensor(w, bits=4, group=16)
    # nibble-packed uint8, two int4 per byte along K (S4 cannot cross a jit
    # boundary on the axon backend — ops/linear.py::pack_int4)
    assert qt.q.dtype == jnp.uint8 and qt.group == 16
    assert qt.q.shape == (32, 48) and qt.scale.shape == (4, 48)
    assert qt.shape == (64, 48)  # logical (dense-equivalent) shape
    err = np.abs(np.asarray(qt.dequantize(jnp.float32) - w))
    # max error bounded by half an int4 step of the group amax
    assert err.max() < np.abs(np.asarray(w)).max() / 7.0

    wt = jnp.asarray(rng.standard_normal((48, 64)), jnp.float32)  # [N, K]
    qtt = quantize_tensor(wt, k_last=True, bits=4, group=16)
    assert qtt.q.shape == (48, 32) and qtt.scale.shape == (48, 4)
    assert qtt.shape == (48, 64)
    errt = np.abs(np.asarray(qtt.dequantize(jnp.float32) - wt))
    assert errt.max() < np.abs(np.asarray(wt)).max() / 7.0

    # group clamps to K for small models
    small = quantize_tensor(jnp.ones((8, 8)), bits=4, group=128)
    assert small.group == 8 and small.scale.shape == (1, 8)


def test_pack_unpack_int4_roundtrip():
    from layerskip_tpu.ops.linear import pack_int4, unpack_int4

    rng = np.random.default_rng(7)
    vals = jnp.asarray(rng.integers(-7, 8, size=(3, 16, 5)), jnp.int8)
    packed = pack_int4(vals)
    assert packed.dtype == jnp.uint8 and packed.shape == (3, 8, 5)
    np.testing.assert_array_equal(np.asarray(unpack_int4(packed)),
                                  np.asarray(vals))

    valt = jnp.asarray(rng.integers(-7, 8, size=(5, 16)), jnp.int8)
    packt = pack_int4(valt, k_last=True)
    assert packt.shape == (5, 8)
    np.testing.assert_array_equal(np.asarray(unpack_int4(packt, k_last=True)),
                                  np.asarray(valt))


def test_apply_weight_int4_matches_dequant_matmul():
    from layerskip_tpu.ops.linear import apply_weight_t

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((5, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 48)), jnp.float32)
    qt = quantize_tensor(w, bits=4, group=8)
    got = apply_weight(x, qt)
    want = x @ qt.dequantize(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)
    # dense-vs-quant closeness: int4 noise accumulates over K random-sign
    # terms — bound the relative output error, not per element
    dense = np.asarray(apply_weight(x, w))
    assert np.abs(np.asarray(got) - dense).max() / np.abs(dense).max() < 0.2

    wt = jnp.asarray(rng.standard_normal((48, 32)), jnp.float32)  # [N, K]
    qtt = quantize_tensor(wt, k_last=True, bits=4, group=8)
    got_t = apply_weight_t(x, qtt)
    want_t = x @ qtt.dequantize(jnp.float32).T
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               atol=1e-3, rtol=1e-3)


def test_int4_forward_close_and_greedy_spec_equals_ar(model):
    params, cfg = model
    qparams = quantize_llama_params(params, bits=4, group=16)
    assert qparams.layers.wq.q.dtype == jnp.uint8
    ids = jnp.asarray([[3, 17, 52, 9, 30]], jnp.int32)
    cache = init_kv_cache(cfg, batch=1, max_len=16)
    fp = llama.forward(params, cfg, ids, cache, jnp.int32(0))
    q = llama.forward(qparams, cfg, ids, cache, jnp.int32(0))
    fp_l, q_l = np.asarray(fp.logits), np.asarray(q.logits)
    assert np.abs(fp_l - q_l).max() / np.abs(fp_l).max() < 0.2

    eng = Engine(qparams, cfg)
    prompt = [3, 17, 52, 9]
    ar = postprocess_output(
        eng.generate(prompt, GenerationConfig(
            max_steps=16, sample=False, generation_strategy="autoregressive")),
        (), 16,
    )
    spec = postprocess_output(
        eng.generate(prompt, GenerationConfig(
            max_steps=16, sample=False, generation_strategy="self_speculative",
            exit_layer=2, num_speculations=4)),
        (), 16,
    )
    assert ar == spec


def test_quantized_bytes_int4_halves_int8():
    cfg = tiny_config(num_hidden_layers=2, hidden_size=64, vocab_size=64)
    params = init_params(jax.random.PRNGKey(0), cfg)
    from layerskip_tpu.quant import quantized_bytes

    b8 = quantized_bytes(quantize_llama_params(params))
    b4 = quantize_llama_params(params, bits=4, group=16)
    # matmul weights dominate even at tiny size; int4 total must be well
    # below int8 (embeddings/norms stay bf16 in both)
    assert quantized_bytes(b4) < b8
