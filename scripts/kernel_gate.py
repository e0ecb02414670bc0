"""On-chip Pallas kernel parity gate (VERDICT r2 #7).

Runs every production Pallas kernel COMPILED on the current default backend
(the real TPU outside tests) against its XLA fallback formulation and prints
ONE JSON line: per-kernel max abs error + pass/fail. Run this after any
JAX/libtpu/Mosaic bump — the CI suite only covers interpret mode
(tests/test_pallas_kernels.py runs on the CPU conftest backend), so compiled
numerics need this explicit gate.

Kernels covered (the complete production set — ops/pallas/__init__.py):
  * flash_prefill_attention (causal + sliding-window) vs gqa_attention
  * paged_decode_attention (bf16 pool; t=1 decode and t=7 verify shapes)
  * paged_decode_attention_q8 (int8 pool + per-(page,head) scales)
  * quant_matmul / quant_matmul_t (int8 weight-only matmuls)

Usage: python scripts/kernel_gate.py [--interpret] [--long]
  --interpret  run kernels in interpreter mode (script self-test on CPU)
  --long       add a 32k-sequence flash-prefill case (slow compile)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _mk_paged(b, pool_pages, pg, cap, hkv, dh, seed, quant=False):
    """PagedKV with rows mapped to scrambled disjoint page runs (same
    construction as tests/test_paged_kv.py)."""
    from layerskip_tpu.ops.paged_kv import PagedKV, PagedQuantKV, paged_geometry

    cap_pages, trash_pages, maxp = paged_geometry(cap, pg, prompt_bucket=16)
    total = pool_pages + trash_pages
    table = np.full((b, maxp), pool_pages, np.int32)
    perm = np.random.RandomState(seed).permutation(pool_pages)
    for r in range(b):
        table[r, :cap_pages] = perm[r * cap_pages:(r + 1) * cap_pages]
    if quant:
        return PagedQuantKV(
            pool=jnp.zeros((total, hkv, pg, dh), jnp.int8),
            scale=jnp.zeros((total, hkv, pg), jnp.bfloat16),
            table=jnp.asarray(table),
            capacity=cap_pages * pg, trash_start=cap_pages * pg,
        )
    return PagedKV(
        pool=jnp.zeros((total, hkv, pg, dh), jnp.float32),
        table=jnp.asarray(table),
        capacity=cap_pages * pg, trash_start=cap_pages * pg,
    )


def _maxerr(got, want) -> float:
    return float(np.abs(np.asarray(got, np.float32)
                        - np.asarray(want, np.float32)).max())


def check_flash_prefill(interpret: bool, t: int = 256, s: int = 512,
                        past: int = 100, window: int = 0,
                        gemma: bool = False) -> float:
    from layerskip_tpu.ops import attention as attn_mod
    from layerskip_tpu.ops.pallas.flash_prefill import flash_prefill_attention

    b, hkv, g, dh = 1, 2, 2, 128
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((b, t, hkv * g, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    qpos = jnp.asarray(np.arange(past, past + t), jnp.int32)
    # gemma=True: softcap + query scale + the window as a TRACED operand
    kw = dict(score_scale=32.0 ** -0.5, logit_softcap=50.0) if gemma else {}
    win = jnp.int32(window) if gemma else window
    want = attn_mod.gqa_attention(
        q, k, v, qpos, q_heads_per_kv=g, sliding_window=win, **kw)
    got = flash_prefill_attention(
        q, k, v, jnp.int32(past), q_heads_per_kv=g, sliding_window=win,
        block_q=128, block_k=128, interpret=interpret, **kw)
    return _maxerr(got, want)


def check_paged(interpret: bool, t: int, g: int = 2, window: int = 0,
                gemma: bool = False) -> float:
    from layerskip_tpu.ops import attention as attn_mod
    from layerskip_tpu.ops.pallas.paged_decode import paged_decode_attention

    b, hkv, dh, pg, cap = 2, 2, 128, 128, 256
    rng = np.random.default_rng(4)
    kv_k = _mk_paged(b, 6, pg, cap, hkv, dh, seed=5)
    kv_v = _mk_paged(b, 6, pg, cap, hkv, dh, seed=5)
    kb = jnp.asarray(rng.standard_normal((b, 200, hkv, dh)), jnp.float32)
    vb = jnp.asarray(rng.standard_normal((b, 200, hkv, dh)), jnp.float32)
    kv_k = kv_k.write(kb, jnp.asarray([0, 0], jnp.int32))
    kv_v = kv_v.write(vb, jnp.asarray([0, 0], jnp.int32))
    q = jnp.asarray(rng.standard_normal((b, t, hkv * g, dh)), jnp.float32)
    qpos = jnp.asarray([np.arange(150, 150 + t), np.arange(90, 90 + t)],
                       jnp.int32)
    # gemma=True: Gemma-2 score math — soft-capping + query scale + the
    # window as a TRACED operand (the per-layer alternation path)
    kw = dict(score_scale=32.0 ** -0.5, logit_softcap=50.0) if gemma else {}
    win = jnp.int32(window) if gemma else window
    got = paged_decode_attention(
        q, kv_k.pool, kv_v.pool, kv_k.table, qpos,
        q_heads_per_kv=g, sliding_window=win, interpret=interpret, **kw)
    want = attn_mod.gqa_attention(
        q, kv_k.gather_view(), kv_v.gather_view(), qpos,
        q_heads_per_kv=g, sliding_window=win, **kw)
    return _maxerr(got, want)


def check_paged_q8(interpret: bool, t: int, g: int = 2) -> float:
    from layerskip_tpu.ops import attention as attn_mod
    from layerskip_tpu.ops.pallas.paged_decode import paged_decode_attention_q8

    b, hkv, dh, pg, cap = 2, 2, 128, 128, 256
    rng = np.random.default_rng(8)
    kv_k = _mk_paged(b, 6, pg, cap, hkv, dh, seed=5, quant=True)
    kv_v = _mk_paged(b, 6, pg, cap, hkv, dh, seed=5, quant=True)
    kb = jnp.asarray(rng.standard_normal((b, 200, hkv, dh)), jnp.float32)
    vb = jnp.asarray(rng.standard_normal((b, 200, hkv, dh)), jnp.float32)
    kv_k = kv_k.write(kb, jnp.asarray([0, 0], jnp.int32))
    kv_v = kv_v.write(vb, jnp.asarray([0, 0], jnp.int32))
    q = jnp.asarray(rng.standard_normal((b, t, hkv * g, dh)), jnp.float32)
    qpos = jnp.asarray([np.arange(150, 150 + t), np.arange(90, 90 + t)],
                       jnp.int32)
    got = paged_decode_attention_q8(
        q, kv_k.pool, kv_k.scale, kv_v.pool, kv_v.scale, kv_k.table, qpos,
        q_heads_per_kv=g, interpret=interpret)
    want = attn_mod.gqa_attention(
        q, kv_k.gather_view(jnp.float32), kv_v.gather_view(jnp.float32),
        qpos, q_heads_per_kv=g)
    return _maxerr(got, want)


def check_paged_tree(interpret: bool, quant: bool = False,
                     w: int = 3, k: int = 3, g: int = 2,
                     gemma: bool = False) -> float:
    """Tree-clause paged attention (verify-window shape) vs the dense XLA
    tree-mask path on the gathered view."""
    from layerskip_tpu.ops import attention as attn_mod
    from layerskip_tpu.ops.pallas.paged_decode import (
        paged_decode_attention, paged_decode_attention_q8,
    )

    b, hkv, dh, pg, cap = 2, 2, 128, 128, 256
    rng = np.random.default_rng(11)
    kv_k = _mk_paged(b, 6, pg, cap, hkv, dh, seed=7, quant=quant)
    kv_v = _mk_paged(b, 6, pg, cap, hkv, dh, seed=7, quant=quant)
    ctx = jnp.asarray([150, 90], jnp.int32)
    scratch = ctx + 1
    kv_k = kv_k.write(jnp.asarray(rng.standard_normal((b, 151, hkv, dh)),
                                  jnp.float32), jnp.zeros((b,), jnp.int32))
    kv_v = kv_v.write(jnp.asarray(rng.standard_normal((b, 151, hkv, dh)),
                                  jnp.float32), jnp.zeros((b,), jnp.int32))
    for d in range(w):
        kv_k = kv_k.write(jnp.asarray(
            rng.standard_normal((b, k, hkv, dh)), jnp.float32),
            scratch + d * k)
        kv_v = kv_v.write(jnp.asarray(
            rng.standard_normal((b, k, hkv, dh)), jnp.float32),
            scratch + d * k)
    t = 1 + w * k
    q = jnp.asarray(rng.standard_normal((b, t, hkv * g, dh)), jnp.float32)
    offs = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        1 + jnp.repeat(jnp.arange(w, dtype=jnp.int32), k)])
    qpos = ctx[:, None] + offs[None, :]
    q_chain = jnp.broadcast_to(jnp.concatenate([
        -jnp.ones((1,), jnp.int32),
        jnp.tile(jnp.arange(k, dtype=jnp.int32), w)])[None], (b, t))
    # gemma=True: tree clause composed with the Gemma score math (softcap
    # + query scale + traced window) — the serving tree-round path for
    # Gemma-family models
    kw = dict(score_scale=32.0 ** -0.5, logit_softcap=50.0) if gemma else {}
    win = jnp.int32(64) if gemma else 0
    if quant:
        got = paged_decode_attention_q8(
            q, kv_k.pool, kv_k.scale, kv_v.pool, kv_v.scale, kv_k.table,
            qpos, q_heads_per_kv=g, tree_chain=q_chain,
            tree_scratch=scratch, tree_fanout=k, sliding_window=win,
            interpret=interpret, **kw)
    else:
        got = paged_decode_attention(
            q, kv_k.pool, kv_v.pool, kv_k.table, qpos,
            q_heads_per_kv=g, tree_chain=q_chain, tree_scratch=scratch,
            tree_fanout=k, sliding_window=win, interpret=interpret, **kw)
    want = attn_mod.gqa_attention(
        q, kv_k.gather_view(jnp.float32), kv_v.gather_view(jnp.float32),
        qpos, q_heads_per_kv=g, tree_meta=(q_chain, scratch, k),
        sliding_window=win, **kw)
    return _maxerr(got, want)


def check_quant_matmul(interpret: bool) -> float:
    from layerskip_tpu.ops.pallas.quant_matmul import (
        quant_matmul, quantize_weights,
    )

    rng = np.random.default_rng(5)
    m, k, n = 64, 256, 384
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    wq, scale = quantize_weights(w)
    # precision='highest': the default MXU precision truncates fp32 operands
    # to one bf16 pass, making the *reference* the imprecise side on-chip
    # (the kernel accumulates fp32) — measured max_abs_err 0.109 vs the
    # kernel on v5e with the default, 'highest' restores a clean oracle.
    want = jnp.matmul(x, wq.astype(jnp.float32) * scale[None, :],
                      precision="highest")
    got = quant_matmul(x, wq, scale, block_m=32, block_n=128, block_k=128,
                       interpret=interpret)
    return _maxerr(got, want)


def check_quant_matmul_t(interpret: bool) -> float:
    from layerskip_tpu.ops.pallas.quant_matmul import quant_matmul_t
    from layerskip_tpu.quant import quantize_tensor

    rng = np.random.default_rng(9)
    m, k, n = 16, 256, 192
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    qt = quantize_tensor(w, k_last=True)
    want = jnp.matmul(x, jnp.transpose(qt.dequantize(jnp.float32)),
                      precision="highest")  # see check_quant_matmul
    got = quant_matmul_t(x, qt.q, qt.scale, block_m=8, block_n=128,
                         block_k=128, interpret=interpret)
    return _maxerr(got, want)


def check_int4_matmul(interpret: bool, variant: str) -> float:
    """In-kernel nibble-unpack dequant matmul vs dequantize oracle.

    bf16 activations (the production dtype): the kernel's dequant chain
    rounds scale products to bf16, so tolerance is int4-noise-scaled
    rather than the fp32 5e-3 (int4 quantization error is +-scale/2
    ~ 3% of weight magnitude; the extra bf16 rounding is ~0.4%)."""
    from layerskip_tpu.ops.pallas.quant_matmul import int4_matmul
    from layerskip_tpu.quant import quantize_tensor

    rng = np.random.default_rng(21)
    # M=1 is the AR-decode case AND the Mosaic trap (sublane-broadcast
    # failure at M<8 + ragged K — the wrapper pads M to the 8-sublane tile)
    m, k, n = 1, 1792, 768
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    qt = quantize_tensor(w, bits=4, group=128)
    want = jnp.matmul(x.astype(jnp.float32), qt.dequantize(jnp.float32),
                      precision="highest")
    # kp=896 with the Mosaic-aligned bkp=512 -> ragged tail block (384)
    got = int4_matmul(x, qt.q, qt.scale, group=qt.group,
                      block_n=256, block_kp=512,
                      interpret=interpret, variant=variant)
    return _maxerr(got.astype(jnp.float32), want)


def check_int4_matmul_t(interpret: bool, variant: str) -> float:
    from layerskip_tpu.ops.pallas.quant_matmul import int4_matmul_t
    from layerskip_tpu.quant import quantize_tensor

    rng = np.random.default_rng(23)
    m, k, n = 7, 1024, 512
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    qt = quantize_tensor(w, k_last=True, bits=4, group=128)
    want = jnp.matmul(x.astype(jnp.float32),
                      jnp.transpose(qt.dequantize(jnp.float32)),
                      precision="highest")
    # block_kp=448 self-aligns to 384 -> ragged tail (kp=512 = 384 + 128)
    got = int4_matmul_t(x, qt.q, qt.scale, group=qt.group,
                        block_n=256, block_kp=448,
                        interpret=interpret, variant=variant)
    return _maxerr(got.astype(jnp.float32), want)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--long", action="store_true",
                    help="add a 32k-seq flash prefill case (slow compile)")
    ap.add_argument("--tol", type=float, default=5e-3,
                    help="max abs error allowed (fp32 inputs; the q8 paged "
                         "kernel is held to a looser int8 tolerance)")
    ap.add_argument("--platform", default="",
                    help="force a jax platform (sitecustomize pins "
                         "JAX_PLATFORMS=axon; env vars don't override it)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    checks = [
        ("flash_prefill", lambda: check_flash_prefill(args.interpret), args.tol),
        ("flash_prefill_sliding",
         lambda: check_flash_prefill(args.interpret, window=64), args.tol),
        # Gemma score math in the prefill kernel (tol as the paged gemma
        # case: the larger query scale amplifies online-softmax divergence)
        ("flash_prefill_gemma",
         lambda: check_flash_prefill(args.interpret, window=64,
                                     gemma=True), 0.01),
        ("paged_decode_t1", lambda: check_paged(args.interpret, t=1), args.tol),
        ("paged_decode_t7", lambda: check_paged(args.interpret, t=7), args.tol),
        ("paged_decode_sliding",
         lambda: check_paged(args.interpret, t=4, g=1, window=9), args.tol),
        # Gemma-2 score math: softcap + query scale + traced window
        # operand. Tolerance 2x the default: the larger query scale
        # (query_pre_attn_scalar 32 vs head_dim 128) amplifies the score
        # dynamic range, and the online-softmax-vs-one-shot divergence
        # scales with it (measured 4.3e-3 even WITHOUT softcap; the
        # softcap itself adds ~1e-3 — attribution A/B in PROGRESS r5).
        ("paged_decode_gemma",
         lambda: check_paged(args.interpret, t=4, g=2, window=48,
                             gemma=True), 0.01),
        # int8 KV quantization itself costs ~1% relative error
        ("paged_decode_q8_t1",
         lambda: check_paged_q8(args.interpret, t=1), 0.2),
        ("paged_decode_q8_t7",
         lambda: check_paged_q8(args.interpret, t=7), 0.2),
        ("paged_decode_tree",
         lambda: check_paged_tree(args.interpret), args.tol),
        ("paged_decode_tree_q8",
         lambda: check_paged_tree(args.interpret, quant=True), 0.2),
        # tree x Gemma score math (bf16 + int8 KV): the Gemma serving
        # tree-round path, compiled
        ("paged_decode_tree_gemma",
         lambda: check_paged_tree(args.interpret, gemma=True), 0.01),
        ("paged_decode_tree_gemma_q8",
         lambda: check_paged_tree(args.interpret, quant=True, gemma=True),
         0.2),
        ("quant_matmul", lambda: check_quant_matmul(args.interpret), 0.05),
        ("quant_matmul_t", lambda: check_quant_matmul_t(args.interpret), 0.05),
        # int4: bf16 activations; tolerance covers bf16 rounding of the
        # dequant products (values ~ sqrt(K) with unit-variance inputs)
        ("int4_matmul_fused",
         lambda: check_int4_matmul(args.interpret, "fused"), 1.5),
        ("int4_matmul_bittrick",
         lambda: check_int4_matmul(args.interpret, "bittrick"), 1.5),
        ("int4_matmul_t_fused",
         lambda: check_int4_matmul_t(args.interpret, "fused"), 1.5),
        ("int4_matmul_t_bittrick",
         lambda: check_int4_matmul_t(args.interpret, "bittrick"), 1.5),
    ]
    if args.long:
        checks.append((
            "flash_prefill_32k",
            lambda: check_flash_prefill(args.interpret, t=4096, s=32768,
                                        past=28672), args.tol))

    results, ok = {}, True
    for name, fn, tol in checks:
        t0 = time.time()
        try:
            err = fn()
            passed = err <= tol
            results[name] = {"max_abs_err": round(err, 8), "tol": tol,
                             "pass": passed, "secs": round(time.time() - t0, 2)}
        except Exception as e:  # a compile/runtime failure is a hard fail
            results[name] = {"error": f"{type(e).__name__}: {e}",
                             "pass": False,
                             "secs": round(time.time() - t0, 2)}
            passed = False
        ok = ok and passed
        print(f"[kernel_gate] {name}: {results[name]}", file=sys.stderr)

    print(json.dumps({
        "metric": "kernel_gate_pass",
        "value": 1.0 if ok else 0.0,
        "unit": "bool",
        "vs_baseline": 1.0 if ok else 0.0,
        "backend": jax.default_backend(),
        "interpret": args.interpret,
        "kernels": results,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
