"""Native safetensors reader parity + end-to-end checkpoint loading.

Writes a real sharded safetensors checkpoint with the Python library, reads
it back through the C++ mmap reader, and loads it into LlamaParams — pinning
the native path against the de-facto format the reference consumes via HF
(generate.py:54-67).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layerskip_tpu import native
from layerskip_tpu.config import tiny_config
from layerskip_tpu.models import llama
from layerskip_tpu.models.params import init_params, load_params
from layerskip_tpu.ops.kv_cache import init_kv_cache


def _write_shard(path, tensors):
    from safetensors.numpy import save_file

    save_file(tensors, path)


def test_native_lib_builds():
    assert native.native_available(), "C++ reader should build in this image"


def test_read_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "a": rng.standard_normal((4, 8)).astype(np.float32),
        "b": rng.integers(0, 100, (3,)).astype(np.int64),
        "c.weight": rng.standard_normal((2, 2, 2)).astype(np.float16),
    }
    p = str(tmp_path / "t.safetensors")
    _write_shard(p, tensors)
    got = native.read_safetensors(p)
    assert set(got) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(got[k], tensors[k])


def test_read_bf16(tmp_path):
    import ml_dtypes

    x = np.asarray(jnp.asarray([[1.5, -2.25], [0.125, 3.0]], jnp.bfloat16))
    p = str(tmp_path / "bf.safetensors")
    _write_shard(p, {"x": x})
    got = native.read_safetensors(p)
    assert got["x"].dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(
        got["x"].astype(np.float32), x.astype(np.float32)
    )


def test_corrupt_headers_rejected(tmp_path):
    """Malicious/corrupt safetensors must fail st_open cleanly, never OOB-read.

    Safetensors is normally safe to parse from untrusted input; the native
    reader validates header length and every tensor's data_offsets against
    the mapped data section (safetensors_reader.cc st_open).
    """
    if not native.native_available():
        pytest.skip("native lib unavailable")

    def write(path, header_json, data=b""):
        h = header_json.encode()
        with open(path, "wb") as f:
            f.write(len(h).to_bytes(8, "little") + h + data)

    cases = {
        # data_offsets span past EOF
        "past_eof": (
            '{"t":{"dtype":"F32","shape":[2],"data_offsets":[0,1048576]}}',
            b"\x00" * 8,
        ),
        # negative offsets (cast to huge uint64)
        "negative": (
            '{"t":{"dtype":"F32","shape":[2],"data_offsets":[-16,-8]}}',
            b"\x00" * 8,
        ),
        # begin > end
        "inverted": (
            '{"t":{"dtype":"F32","shape":[2],"data_offsets":[8,0]}}',
            b"\x00" * 8,
        ),
        # negative shape dim
        "neg_shape": (
            '{"t":{"dtype":"F32","shape":[-2],"data_offsets":[0,8]}}',
            b"\x00" * 8,
        ),
    }
    for name, (hdr, data) in cases.items():
        p = str(tmp_path / f"{name}.safetensors")
        write(p, hdr, data)
        with pytest.raises(OSError):
            native.read_safetensors(p)

    # header length far beyond the file (and wrapping 8 + hlen)
    for hlen in (2**64 - 4, 2**32):
        p = str(tmp_path / f"hlen_{hlen % 97}.safetensors")
        with open(p, "wb") as f:
            f.write(hlen.to_bytes(8, "little") + b"{}")
        with pytest.raises(OSError):
            native.read_safetensors(p)

    # a well-formed file still opens after all that
    good = str(tmp_path / "good.safetensors")
    write(
        good,
        '{"t":{"dtype":"F32","shape":[2],"data_offsets":[0,8]}}',
        np.asarray([1.0, 2.0], np.float32).tobytes(),
    )
    got = native.read_safetensors(good)
    np.testing.assert_array_equal(got["t"], np.asarray([1.0, 2.0], np.float32))


def test_save_load_roundtrip(tmp_path):
    """save_params -> load_params preserves logits exactly (fp32)."""
    from layerskip_tpu.config import ModelConfig
    from layerskip_tpu.models.params import save_params

    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(5), cfg)
    save_params(params, str(tmp_path / "ckpt"), cfg)
    cfg2 = ModelConfig.from_pretrained(str(tmp_path / "ckpt"), dtype=jnp.float32)
    assert cfg2.hidden_size == cfg.hidden_size
    loaded = load_params(str(tmp_path / "ckpt"), cfg2)
    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    cache = init_kv_cache(cfg, batch=1, max_len=8)
    a = llama.forward(params, cfg, ids, cache, jnp.int32(0))
    b = llama.forward(loaded, cfg2, ids, cache, jnp.int32(0))
    np.testing.assert_allclose(
        np.asarray(a.logits), np.asarray(b.logits), atol=1e-5, rtol=1e-5
    )


def test_save_preserves_arch_features(tmp_path):
    """Exported config.json keeps rope_scaling / sliding_window / model_type.

    A finetuned Llama-3 (llama3 rope scaling) or Mistral (sliding window)
    checkpoint must reload with identical RoPE frequencies and attention
    behavior (ADVICE r1: these fields were silently dropped).
    """
    import dataclasses
    import json

    from layerskip_tpu.config import ModelConfig, RopeScaling
    from layerskip_tpu.models.params import save_params

    base = tiny_config()
    cfg = dataclasses.replace(
        base,
        sliding_window=4,
        rope_scaling=RopeScaling(
            rope_type="llama3",
            factor=8.0,
            low_freq_factor=1.0,
            high_freq_factor=4.0,
            original_max_position_embeddings=64,
        ),
    )
    params = init_params(jax.random.PRNGKey(1), cfg)
    save_params(params, str(tmp_path / "ckpt"), cfg)
    with open(tmp_path / "ckpt" / "config.json") as f:
        d = json.load(f)
    assert d["model_type"] == "mistral"  # sliding window => mistral family
    assert d["sliding_window"] == 4
    assert d["rope_scaling"]["rope_type"] == "llama3"

    cfg2 = ModelConfig.from_pretrained(str(tmp_path / "ckpt"), dtype=jnp.float32)
    assert cfg2.sliding_window == cfg.sliding_window
    assert cfg2.rope_scaling == cfg.rope_scaling
    loaded = load_params(str(tmp_path / "ckpt"), cfg2)
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6]], jnp.int32)
    cache = init_kv_cache(cfg, batch=1, max_len=8)
    a = llama.forward(params, cfg, ids, cache, jnp.int32(0))
    b = llama.forward(loaded, cfg2, ids, cache, jnp.int32(0))
    np.testing.assert_allclose(
        np.asarray(a.logits), np.asarray(b.logits), atol=1e-5, rtol=1e-5
    )

    # Qwen2-style (attention biases) round-trips its model_type too
    qcfg = dataclasses.replace(base, attention_bias=True)
    qparams = init_params(jax.random.PRNGKey(2), qcfg)
    save_params(qparams, str(tmp_path / "qckpt"), qcfg)
    with open(tmp_path / "qckpt" / "config.json") as f:
        assert json.load(f)["model_type"] == "qwen2"
    qcfg2 = ModelConfig.from_pretrained(str(tmp_path / "qckpt"), dtype=jnp.float32)
    assert qcfg2.attention_bias


def test_load_params_via_native(tmp_path):
    """Round-trip: save a tiny model as HF-style shards, load, compare logits."""
    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(0), cfg)

    # export in HF naming ([out, in] transposed linears)
    tensors = {
        "model.embed_tokens.weight": np.asarray(params.embed, np.float32),
        "model.norm.weight": np.asarray(params.final_norm, np.float32),
        # .copy(): save_file serializes the raw buffer, so transposed views
        # must be materialized
        "lm_head.weight": np.asarray(params.lm_head, np.float32).T.copy(),
    }
    name_map = {
        "attn_norm": ("input_layernorm.weight", False),
        "wq": ("self_attn.q_proj.weight", False),  # stored [out, in]
        "wk": ("self_attn.k_proj.weight", False),
        "wv": ("self_attn.v_proj.weight", False),
        "wo": ("self_attn.o_proj.weight", True),
        "mlp_norm": ("post_attention_layernorm.weight", False),
        "w_gate": ("mlp.gate_proj.weight", True),
        "w_up": ("mlp.up_proj.weight", True),
        "w_down": ("mlp.down_proj.weight", True),
    }
    for i in range(cfg.num_hidden_layers):
        for field, (hf_name, transpose) in name_map.items():
            w = np.asarray(getattr(params.layers, field)[i], np.float32)
            tensors[f"model.layers.{i}.{hf_name}"] = w.T.copy() if transpose else w

    # two shards to exercise the multi-shard path
    keys = sorted(tensors)
    half = len(keys) // 2
    _write_shard(str(tmp_path / "model-00001.safetensors"),
                 {k: tensors[k] for k in keys[:half]})
    _write_shard(str(tmp_path / "model-00002.safetensors"),
                 {k: tensors[k] for k in keys[half:]})

    loaded = load_params(str(tmp_path), cfg)
    ids = jnp.asarray([[5, 9, 23, 41]], jnp.int32)
    cache = init_kv_cache(cfg, batch=1, max_len=8)
    ref = llama.forward(params, cfg, ids, cache, jnp.int32(0))
    got = llama.forward(loaded, cfg, ids, cache, jnp.int32(0))
    np.testing.assert_allclose(
        np.asarray(got.logits), np.asarray(ref.logits), atol=1e-5, rtol=1e-5
    )


def test_native_text_metrics():
    from layerskip_tpu.native import lcs_length, levenshtein

    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein([1, 2, 3], [1, 3]) == 1
    assert lcs_length([1, 2, 3, 4], [1, 3, 4]) == 3
    assert lcs_length([], [1]) in (0, None)


def test_metrics_use_native_consistently():
    """metrics.py results identical whether the native lib resolves or not."""
    from layerskip_tpu import metrics as m

    pairs = [("kitten", "sitting"), ("abc def ghi", "abc xyz ghi"), ("", "x")]
    for a, b in pairs:
        assert m.edit_distance(a, b) == _py_edit(a, b)
    assert m.rouge_l("a b d", "a b c d") == pytest.approx(6 / 7)


def _py_edit(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]
